"""Learning-to-rank training-data assembly: candidate generation +
per-(query, doc) feature vectors.

The standard LTR pipeline (Lucene/Solr LTR, ES rank_eval's sibling)
needs, for every (query, candidate-doc) pair, a feature row: the model
is trained offline on these vectors and re-ranks the candidate set at
serving time. At 10^12-turn scale this is a batch job over the SAME
postings the engine serves from — candidate generation IS batch BM25
top-k, and most classic lexical features are by-products of the scoring
join, so the whole feature matrix costs one extra aggregate over the
plan the engine already runs:

    queries ⋈broadcast postings ⋈ stats
      -> ONE hash agg per (query_id, doc_id) computing ALL features
         (bm25 partial-sum, matched term count, Σtf, Σidf of matched
          terms, max per-term partial, dl via max — functionally
          dependent on doc_id)
      -> per-query rank window (WindowGroupLimit), keep top-k candidates

Features beyond the lexical set (recency, field scores, dense cosine)
join onto the k·|queries| candidate rows afterwards — candidate-side
cost, exactly like decay_topk / function_score_topk.

Output columns (one row per candidate):
    query_id, rank, doc_id, bm25, matched_terms, q_terms, tf_sum,
    idf_sum, max_partial, dl
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from searchengine_spark.functions.scoring import bm25_weight, idf_col
from searchengine_spark.operators.forward import CorpusScalars


def ltr_features(
    queries: DataFrame,
    tf_table: DataFrame,
    term_stats: DataFrame,
    scalars: CorpusScalars,
    k: int = 100,
) -> DataFrame:
    """queries(query_id, query) -> per-candidate LTR feature rows.

    Candidate set = top-``k`` docs per query by BM25 (rounded-then-
    ranked, rank pinned (score desc, doc_id asc) — the cross-engine
    discipline). All features ride ONE map-side-combinable hash agg on
    (query_id, doc_id); no second pass over the postings."""
    from searchengine_spark.functions.tokenize import tokenize_udf

    qterms = (
        queries.select(
            "query_id", F.explode(tokenize_udf(F.col("query"))).alias("term")
        )
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("qf"))
    )
    q_len = qterms.groupBy("query_id").agg(
        F.countDistinct("term").cast("long").alias("q_terms")
    )
    idf = idf_col(F.col("df"), scalars.n_docs)
    w = bm25_weight(F.col("tf"), F.col("dl"), idf, scalars.avgdl)
    joined = (
        tf_table.join(F.broadcast(qterms), "term")
        .join(term_stats, "term")
        .withColumn("_partial", w * F.col("qf"))
        .withColumn("_idf", idf)
    )
    feats = joined.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("_partial"), 6).alias("bm25"),
        F.countDistinct("term").cast("long").alias("matched_terms"),
        F.sum("tf").cast("long").alias("tf_sum"),
        F.round(F.sum("_idf"), 6).alias("idf_sum"),
        F.round(F.max("_partial"), 6).alias("max_partial"),
        F.max("dl").cast("long").alias("dl"),
    )
    rank_w = Window.partitionBy("query_id").orderBy(
        F.desc("bm25"), F.asc("doc_id")
    )
    return (
        feats.withColumn("rank", F.row_number().over(rank_w).cast("long"))
        .filter(F.col("rank") <= k)
        .join(F.broadcast(q_len), "query_id")
        .select("query_id", "rank", "doc_id", "bm25", "matched_terms",
                "q_terms", "tf_sum", "idf_sum", "max_partial", "dl")
    )
