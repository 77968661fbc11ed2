"""Ranking-quality evaluation: nDCG@k, MRR, precision@k per query.

The Elasticsearch ``_rank_eval`` API analog: given a table of produced
rankings and a table of graded relevance judgments, compute per-query IR
metrics — the harness a retrieval pipeline needs to A/B scorers (BM25 vs
the reference scorer vs BM25F...) over a query set at corpus scale.

Definitions (standard, Järvelin & Kekäläinen burst-gain DCG):

    DCG@k  = Σ_{ranked hits r ≤ k} (2^rel(doc) − 1) / log2(r + 1)
    IDCG@k = DCG of the judgment set itself sorted by rel desc (top k)
    nDCG@k = DCG/IDCG           (0 when the query has no positive judgments)
    MRR    = 1 / first rank with rel > 0   (0 when no ranked hit is judged)
    P@k    = |ranked hits with rel > 0| / k

Scale shape: both inputs are O(|queries| · k) rows — the *searches* that
produce the ranking are the heavy distributed work (batch_topk /
score_all); the metric stage is two tiny per-query aggregations and one
window over the judgments. Nothing here touches the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_eval(
    ranking: DataFrame,
    judgments: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Per-query metrics for ``ranking`` against ``judgments``.

    ``ranking``: (query_id, rank, doc_id) with rank 1-based (extra columns
    ignored; rows with rank > k are dropped). ``judgments``: (query_id,
    doc_id, rel) with integer grades, rel > 0 meaning relevant, unique
    per (query_id, doc_id) — the ES ratings contract; a duplicate
    judgment would double-count its ranked hit. Unjudged ranked docs
    count as rel = 0 (the standard convention).

    Output: (query_id, ndcg, mrr, p_at_k), floats rounded to 6dp,
    ordered by query_id. Queries present in ``ranking`` but with no
    judgments get ndcg/mrr/p_at_k = 0.
    """
    j = judgments.select(
        "query_id", "doc_id", F.col("rel").cast("double").alias("rel"))
    r = ranking.filter(F.col("rank") <= k).select(
        "query_id", F.col("rank").cast("double").alias("rank"), "doc_id")

    hit = (
        r.join(j, ["query_id", "doc_id"], "left")
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0.0)))
    )
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1.0) / F.log2(F.col("rank") + 1.0)
    per_q = hit.groupBy("query_id").agg(
        F.sum(gain).alias("dcg"),
        F.coalesce(
            F.max(F.when(F.col("rel") > 0, 1.0 / F.col("rank"))), F.lit(0.0)
        ).alias("mrr"),
        (F.sum((F.col("rel") > 0).cast("int")) / F.lit(float(k))).alias("p_at_k"),
    )

    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    ideal = (
        j.filter(F.col("rel") > 0)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("query_id")
        .agg(F.sum(
            (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
            / F.log2(F.col("rn") + 1.0)
        ).alias("idcg"))
    )

    return (
        per_q.join(ideal, "query_id", "left")
        .select(
            "query_id",
            F.round(
                F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
                .otherwise(F.lit(0.0)), 6).alias("ndcg"),
            F.round("mrr", 6).alias("mrr"),
            F.round("p_at_k", 6).alias("p_at_k"),
        )
        .orderBy("query_id")
    )
