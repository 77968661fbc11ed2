"""Analyzer variants — index-time term normalization beyond the reference's
fixed lowercase tokenizer (Indexer/Program.cs:94-121 keeps raw lowercased
letter runs; it has no stemming or stopword stage).

This module adds the classic IR analyzer pieces as *derived views of the
same tf table* — no second corpus pass, no re-tokenize:

- ``stem_expr`` / ``stem_py``: Harman's S-stemmer (Harman 1991, "How
  effective is suffixing?") as ONE portable SQL CASE expression, evaluated
  JVM-side in Spark and verbatim in the DuckDB oracle, plus a pure-Python
  mirror for query-side stemming. Three rules, applied first-match-only:
    1. ``*ies`` (not ``*eies``/``*aies``)        -> ``*y``
    2. ``*es``  (not ``*aes``/``*ees``/``*oes``) -> drop final ``s``
    3. ``*s``   (not ``*us``/``*ss``)            -> drop final ``s``
- ``stem_tf``: tf(term, doc_id, tf, dl) -> stemmed tf, same shape. Terms
  that collapse to one stem have their tfs summed; dl is unchanged (token
  count is stem-invariant).
- ``stemmed_topk``: BM25 over the stemmed index with the query stemmed the
  same way — recall-oriented retrieval ("tables" matches "table").
- ``stop_filter``: drop a broadcastable stopword list from a tf table
  (df/cf stats and dl are recomputed by the caller as needed).

Scale shape: everything here is a projection + one hash re-agg of the tf
relation — at 100 TB the stemmed index is built by the SAME one-shuffle
segment pipeline (operators/segments.py) with ``stem_expr`` applied in the
ingest projection; nothing is corpus-broadcast.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.functions.tokenize import tokenize_py
from searchengine_spark.operators.forward import CorpusScalars, build_term_stats
from searchengine_spark.operators.topk import score_all_terms

# One CASE expression, valid in BOTH Spark SQL and DuckDB (substr/length/
# ||/LIKE are shared dialect). Tokens are lowercase ASCII letter runs, so
# LIKE needs no escaping. ``{c}`` is the column reference.
# First-match-DECIDES semantics: the longest matching suffix rule owns the
# word — its exception means "leave unchanged", never "try the next rule"
# (so 'trees' stays 'trees'; a cascading CASE would wrongly hand it to the
# bare-'s' rule). Exceptions therefore appear as earlier WHEN arms.
STEM_CASE_SQL = (
    "CASE"
    " WHEN {c} LIKE '%eies' OR {c} LIKE '%aies' THEN {c}"
    " WHEN {c} LIKE '%ies' THEN substr({c}, 1, length({c}) - 3) || 'y'"
    " WHEN {c} LIKE '%aes' OR {c} LIKE '%ees' OR {c} LIKE '%oes' THEN {c}"
    " WHEN {c} LIKE '%es' THEN substr({c}, 1, length({c}) - 1)"
    " WHEN {c} LIKE '%us' OR {c} LIKE '%ss' THEN {c}"
    " WHEN {c} LIKE '%s' THEN substr({c}, 1, length({c}) - 1)"
    " ELSE {c} END"
)


def stem_py(term: str) -> str:
    """Pure-Python mirror of STEM_CASE_SQL (query-side + test oracle)."""
    if term.endswith("ies"):
        return term if term.endswith(("eies", "aies")) else term[:-3] + "y"
    if term.endswith("es"):
        return term if term.endswith(("aes", "ees", "oes")) else term[:-1]
    if term.endswith("s"):
        return term if term.endswith(("us", "ss")) else term[:-1]
    return term


def stem_col(col: str = "term"):
    """JVM Column applying the S-stemmer to ``col`` (whole-stage codegen —
    no Python in the per-row path)."""
    return F.expr(STEM_CASE_SQL.format(c=col))


def stem_tf(tf_table: DataFrame) -> DataFrame:
    """tf(term, doc_id, tf, dl) -> stemmed tf of the same shape.

    One hash agg on (doc_id, stem): terms collapsing to the same stem sum
    their tfs; dl rides as max() (constant per doc). At scale this is the
    same shuffle the stats build already pays — stemming adds no pass.
    """
    return (
        tf_table.withColumn("term", stem_col("term"))
        .groupBy("doc_id", "term")
        .agg(F.sum("tf").alias("tf"), F.max("dl").alias("dl"))
    )


def stemmed_query_terms(spark: SparkSession, query: str) -> DataFrame:
    """(term, qf) with query tokens stemmed by the SAME rules, qf summed
    post-stem (so 'table tables' is one stem with qf=2)."""
    counts = Counter(stem_py(t) for t in tokenize_py(query))
    return spark.createDataFrame(
        [(t, int(q)) for t, q in sorted(counts.items())], "term string, qf long"
    )


def stemmed_topk(
    tf_table: DataFrame,
    scalars: CorpusScalars,
    query: str,
    k: int = 10,
) -> DataFrame:
    """BM25 top-k over the stemmed index — the ES ``analyzer: english``-
    lite path. df/cf are recomputed over the stemmed tf (a stem's df is
    the number of docs containing ANY surface form), the query is stemmed
    with the identical rules, and scoring reuses the shared OR-union
    scorer. Rounded-then-ranked for cross-engine hashing."""
    spark = tf_table.sparkSession
    tfs = stem_tf(tf_table)
    stats = build_term_stats(tfs)
    qt = stemmed_query_terms(spark, query)
    return (
        score_all_terms(tfs, stats, scalars, qt, mode="bm25")
        .select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def stop_filter(tf_table: DataFrame, stopwords: list[str]) -> DataFrame:
    """Drop stopword rows from the tf relation (the index-side stop
    analyzer). The list is a query-plan literal (pushed-down NOT IN) —
    never a corpus-sized structure; dl intentionally keeps the original
    token count (Lucene semantics: stop tokens leave position/length
    holes, they don't shrink the norm)."""
    return tf_table.filter(~F.col("term").isin(list(stopwords)))
