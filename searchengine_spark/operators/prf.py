"""Pseudo-relevance feedback (Rocchio-style query expansion) over BM25.

The reference engine answers exactly the terms typed
(``/root/reference/Engine/Engine/Engine.cs:125-183``); classic IR's
cheapest recall lever is PRF: run the query, mine the top-r results for
their most characteristic terms, and re-run with those terms added at a
damped weight (Rocchio 1971; standard in Lucene/Terrier as "relevance
models").

Everything is two passes of the same exhaustive-scoring plan:

    pass 1: BM25 top-r doc ids                     (k-row result)
    mine  : tf ⋈broadcast top-r ids ⋈ stats
            -> per-term sum(tf · ln(N/df))         (one hash agg over the
               top-r docs' postings only — NOT the corpus)
    pass 2: BM25 with qt = original(qf) ∪ expansion(β)

Scale shape: the mining join touches only the top-r documents' tf rows
(broadcast of r ids); the expansion set is e rows folded into the same
broadcast query-terms frame pass 2 always uses. Wall-cost ≈ 2 queries.
All selection is on ROUNDED weights with term/doc tie-breaks, so the
two-stage pipeline is reproducible cross-engine (the DuckDB oracle runs
the identical two stages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.functions.tokenize import tokenize_py
from searchengine_spark.operators.forward import CorpusScalars
from searchengine_spark.operators.topk import (
    _partial_weight,
    query_terms_df,
    score_all,
)

PRF_BETA = 0.4


def prf_expansion_terms(
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    query: str,
    r: int = 10,
    e: int = 3,
) -> DataFrame:
    """-> (term, w): the e highest-weight non-query terms of the BM25
    top-r documents, weight = sum over those docs of tf · ln(N/df),
    rounded-then-ranked (w desc, term asc)."""
    base = (
        score_all(tf_table, term_stats, scalars, query)
        .select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(r)
        .select("doc_id")
    )
    orig = sorted(set(tokenize_py(query)))
    idf = F.log(F.lit(float(scalars.n_docs)) / F.col("df"))
    return (
        tf_table.join(F.broadcast(base), "doc_id")
        .join(term_stats, "term")
        .where(~F.col("term").isin(orig))
        .groupBy("term")
        .agg(F.round(F.sum(F.col("tf") * idf), 6).alias("w"))
        .orderBy(F.desc("w"), F.asc("term"))
        .limit(e)
    )


def prf_topk(
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    query: str,
    k: int = 10,
    r: int = 10,
    e: int = 3,
    beta: float = PRF_BETA,
) -> DataFrame:
    """Expanded-query BM25 top-k -> (doc_id, score), rounded-then-ranked.
    Expansion terms score with weight ``beta`` in place of qf."""
    spark = tf_table.sparkSession
    qt = query_terms_df(spark, query).select(
        "term", F.col("qf").cast("double").alias("qf"))
    exp = prf_expansion_terms(
        tf_table, term_stats, scalars, query, r=r, e=e
    ).select("term", F.lit(float(beta)).alias("qf"))
    qt2 = qt.unionByName(exp)
    joined = (
        tf_table.join(F.broadcast(qt2), "term").join(term_stats, "term")
    )
    scored = _partial_weight(joined, scalars, "bm25")
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("partial"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
