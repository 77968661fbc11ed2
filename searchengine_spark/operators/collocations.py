"""Collocation mining: corpus-level bigram association by PMI.

A training-data analysis staple (phrase vocabulary induction, tokenizer
merge candidates, boilerplate detection). The reference engine stores
only per-term postings — it has no n-gram surface; this derives one from
the same tokenizer semantics.

    pmi(a b) = ln( (c_ab / T2) / ((c_a / T1) * (c_b / T1)) )

with c_ab = corpus count of the ADJACENT admitted-token pair (duplicates
kept, unlike the shingle-SET dedup path), T2 = total bigrams, c_a/c_b =
unigram counts, T1 = total tokens.

Scale shape: bigrams are formed inside the row (``zip_with`` over two
array slices — JVM, no Python), so the only shuffles are the two hash
aggregations (bigram counts, unigram counts) and the final top-k; the
unigram-count join onto bigrams is a broadcast at vocabulary scale or a
plain hash join beyond it. No window functions, no self-join on
positions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.functions.tokenize import tokenize_udf


def doc_bigrams(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, bigram) — one row per adjacent admitted-token pair,
    duplicates preserved (counts, not sets)."""
    toks = F.col("toks")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        docs.select("doc_id", tokenize_udf(F.col(text_col)).alias("toks"))
        .select("doc_id", F.explode(bigrams).alias("bigram"))
    )


def bigram_pmi(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-k bigrams by PMI among those with count >= min_count.
    -> (bigram, n, pmi), ordering pinned (pmi desc, bigram asc)."""
    toked = docs.select(
        "doc_id", tokenize_udf(F.col(text_col)).alias("toks")
    ).persist()

    uni = (
        toked.select(F.explode("toks").alias("term"))
        .groupBy("term").agg(F.count("*").alias("c1"))
    )
    totals = toked.select(
        F.sum(F.size("toks")).alias("t1"),
        F.sum(F.greatest(F.size("toks") - 1, F.lit(0))).alias("t2"),
    ).collect()[0]
    t1, t2 = float(totals["t1"]), float(totals["t2"])

    big = (
        toked.select(F.explode(F.zip_with(
            F.slice(F.col("toks"), 1,
                    F.greatest(F.size("toks") - 1, F.lit(0))),
            F.slice(F.col("toks"), 2,
                    F.greatest(F.size("toks") - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )).alias("bigram"))
        .groupBy("bigram").agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
    )
    parts = F.split(F.col("bigram"), " ")
    scored = (
        big.withColumn("w1", parts.getItem(0))
        .withColumn("w2", parts.getItem(1))
        .join(F.broadcast(uni.withColumnRenamed("term", "w1")
                          .withColumnRenamed("c1", "ca")), "w1")
        .join(F.broadcast(uni.withColumnRenamed("term", "w2")
                          .withColumnRenamed("c1", "cb")), "w2")
        .withColumn(
            "pmi",
            F.log((F.col("n") / F.lit(t2))
                  / ((F.col("ca") / F.lit(t1)) * (F.col("cb") / F.lit(t1)))),
        )
    )
    out = (
        scored.select("bigram", F.col("n").cast("long").alias("n"),
                      F.round("pmi", 6).alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("bigram"))
        .limit(k)
    )
    toked.unpersist()
    return out
