"""Boolean query syntax: ``spark +join -slow`` = score by BM25
(OR-union over plain and ``+`` terms), require every ``+`` term, exclude
any doc containing a ``-`` term.

The reference engine is OR-union only — every query term just adds
score, a term the doc lacks contributes nothing and cannot exclude
(SearchEngine Engine/Engine/Engine.cs:127-184). MUST/NOT is the standard
user-facing completion of that model, expressed relationally so Catalyst
plans it:

    scored      = tf ⋈ (should+must terms)  → per-doc BM25 sum
    must gate   = tf ⋈ must terms, groupBy(doc) HAVING
                  count(DISTINCT term) = |must|   (semi-join shape)
    not gate    = docs with any excluded term     (left_anti join)

Scale shape: all three legs are filters of the SAME tf relation by tiny
term IN-lists (pushed down to the scan), and the gates join on doc_id
after per-doc aggregation — candidate-sized, not corpus-sized. No new
shuffle class beyond the exhaustive scorer's.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.functions.tokenize import tokenize_py


def parse_query(query: str) -> tuple[Counter, set, set]:
    """-> (scored term qf (plain + must), must terms, must-not terms).
    A ``+``/``-`` prefix applies to every token its chunk tokenizes to;
    a term both excluded and required/scored stays excluded (the
    conservative reading)."""
    should: Counter = Counter()
    must: set = set()
    must_not: set = set()
    for chunk in query.split():
        if chunk.startswith("+"):
            toks = tokenize_py(chunk[1:])
            must.update(toks)
            should.update(toks)
        elif chunk.startswith("-"):
            must_not.update(tokenize_py(chunk[1:]))
        else:
            should.update(tokenize_py(chunk))
    for t in must_not:
        should.pop(t, None)
        must.discard(t)
    return should, must, must_not


def boolean_topk(
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars,
    query: str,
    k: int = 10,
) -> DataFrame:
    """Exhaustive BM25 top-k under MUST/NOT gating -> (doc_id, score),
    rank pinned (score desc, doc_id asc)."""
    from searchengine_spark.operators.topk import score_all

    should, must, must_not = parse_query(query)
    spark = tf_table.sparkSession
    if not should:
        return spark.createDataFrame([], "doc_id long, score double")
    scored = score_all(
        tf_table, term_stats, scalars, " ".join(should.elements()),
        mode="bm25",
    )
    if must:
        gate = (
            tf_table.filter(F.col("term").isin(sorted(must)))
            .groupBy("doc_id")
            .agg(F.count_distinct("term").alias("_nm"))
            .filter(F.col("_nm") == len(must))
            .select("doc_id")
        )
        scored = scored.join(gate, "doc_id")
    if must_not:
        excl = tf_table.filter(
            F.col("term").isin(sorted(must_not))
        ).select("doc_id").distinct()
        scored = scored.join(excl, "doc_id", "left_anti")
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
