"""Exhaustive (relational) top-k retrieval — the verification-grade scorer.

This is the reference Engine's query path (Engine/Engine/Engine.cs:125-183:
tokenize -> qf-aggregate -> per-term posting fetch -> additive OR-union
accumulate -> rank -> top-1000) re-expressed as one declarative plan:

    query_terms  ⋈broadcast  tf_table  ⋈  term_stats
      -> per-(term,doc) partial weight (column arithmetic, codegen)
      -> groupBy(doc_id).sum(partial)          (hash agg, map-side combine)
      -> orderBy(score desc, doc_id asc).limit(k)
         (Catalyst TakeOrderedAndProject — bounded heap, no global sort)

The WAND-pruned segment path (operators/wand.py) must agree with this plan
exactly; that agreement is an adversarial test.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from searchengine_spark.functions.scoring import (
    REFERENCE_POSTING_CAP,
    bm25_weight,
    idf_col,
    reference_weight,
)
from searchengine_spark.functions.tokenize import tokenize_py
from searchengine_spark.operators.forward import CorpusScalars


def query_terms_df(spark: SparkSession, query: str) -> DataFrame:
    """query string -> (term, qf) tiny DataFrame (query-side tokenization uses
    the SAME tokenizer as indexing — documented fix of the reference's
    asymmetric query split, Engine.cs:127)."""
    qf = Counter(tokenize_py(query))
    rows = [(t, int(c)) for t, c in sorted(qf.items())]
    return spark.createDataFrame(rows or [("", 0)], "term string, qf int").filter(
        F.col("qf") > 0
    )


def _partial_weight(joined: DataFrame, scalars: CorpusScalars, mode: str) -> DataFrame:
    """Attach the per-(term, doc) partial score column ``partial``."""
    if mode == "bm25":
        idf = idf_col(F.col("df"), scalars.n_docs)
        w = bm25_weight(F.col("tf"), F.col("dl"), idf, scalars.avgdl)
    elif mode == "reference":
        w = reference_weight(F.col("tf"), F.col("cf"), scalars.n_docs)
    else:
        raise ValueError(f"unknown scorer mode {mode!r}")
    return joined.withColumn("partial", w * F.col("qf"))


def _cap_postings(joined: DataFrame, cap: int) -> DataFrame:
    """Reference semantics: per term, keep only the ``cap`` highest-tf
    postings (tie-break doc_id asc) before scoring (Engine.cs:185,193)."""
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def score_all(
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    query: str,
    mode: str = "bm25",
    posting_cap: int | None = None,
) -> DataFrame:
    """Single-query exhaustive scoring, NO limit -> (doc_id, score) for every
    matching doc. Callers choose precision/ordering (full precision for
    oracle rank-identity; rounded-then-ranked for cross-engine hashing)."""
    spark = tf_table.sparkSession
    qt = query_terms_df(spark, query)
    return score_all_terms(tf_table, term_stats, scalars, qt,
                           mode=mode, posting_cap=posting_cap)


def score_all_terms(
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    terms_df: DataFrame,
    mode: str = "bm25",
    posting_cap: int | None = None,
) -> DataFrame:
    """Exhaustive scoring against an explicit (term, qf) weight table
    instead of a raw query string — the shared engine under query-
    rewrite retrieval (prefix/wildcard expansion, fuzzy expansion, PRF):
    the rewriter produces a tiny weighted term set, this broadcasts it
    against the postings and OR-union accumulates exactly like
    ``score_all``. ``qf`` may be fractional (expansion weights)."""
    joined = (
        tf_table.join(F.broadcast(terms_df.select("term", "qf")), "term")
        .join(term_stats, "term")
    )
    if mode == "reference":
        joined = _cap_postings(joined, posting_cap or REFERENCE_POSTING_CAP)
    scored = _partial_weight(joined, scalars, mode)
    return scored.groupBy("doc_id").agg(F.sum("partial").alias("score"))


def score_topk(
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    query: str,
    k: int = 10,
    mode: str = "bm25",
    posting_cap: int | None = None,
) -> DataFrame:
    """Single-query exhaustive top-k -> (doc_id, score), rank order pinned
    (score desc, doc_id asc)."""
    return (
        score_all(tf_table, term_stats, scalars, query, mode, posting_cap)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def batch_topk(
    queries: DataFrame,
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    k: int = 10,
    mode: str = "bm25",
) -> DataFrame:
    """Many queries at once: queries(query_id, query) ->
    (query_id, rank, doc_id, score). One shuffle per stage for ALL queries —
    the throughput path for the bench harness."""
    from searchengine_spark.functions.tokenize import tokenize_udf

    qterms = (
        queries.select("query_id", F.explode(tokenize_udf(F.col("query"))).alias("term"))
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("qf"))
    )
    joined = tf_table.join(F.broadcast(qterms), "term").join(term_stats, "term")
    scored = _partial_weight(joined, scalars, mode)
    per_doc = scored.groupBy("query_id", "doc_id").agg(F.sum("partial").alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def attach_doc_meta(topk: DataFrame, doc_map: DataFrame) -> DataFrame:
    """Join ranked docs back to (conv_id, turn_idx, role, ts) — broadcast of
    the k-row side, re-sorted after the join (join-after-limit ordering)."""
    meta = doc_map.select("doc_id", "conv_id", "turn_idx", "role", "ts")
    return (
        meta.join(F.broadcast(topk), "doc_id")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def score_topk_after(
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    query: str,
    after_score: float,
    after_doc: int,
    k: int = 10,
    mode: str = "bm25",
) -> DataFrame:
    """Cursor pagination (search-after): the next ``k`` results strictly
    after the cursor ``(after_score, after_doc)`` in the engine-wide
    (score desc, doc_id asc) order. The cursor PREDICATE replaces the
    OFFSET scan — at depth d an offset plan materializes d+k rows per
    partition, while the cursor filter prunes before the bounded heap,
    the standard deep-pagination shape (Elasticsearch search_after).
    Scores compare ROUNDED (6dp), matching the rank order every other
    entry pins — a cursor taken from page N reproduces page N+1 exactly.
    """
    allsc = score_all(tf_table, term_stats, scalars, query, mode)
    rounded = allsc.select(
        "doc_id", F.round("score", 6).alias("score"))
    after = rounded.where(
        (F.col("score") < float(after_score))
        | ((F.col("score") == float(after_score))
           & (F.col("doc_id") > int(after_doc)))
    )
    return after.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
