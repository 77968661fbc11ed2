"""Forward index (doc -> term-frequency vector) + corpus statistics.

Reference: forward_index.bin — per doc, term-sorted [wordCRC, tf] pairs built
with a per-doc BST (SearchEngine Indexer/Program.cs:264-331); corpus stats
df/cf accumulated with lock-striped arrays (Indexer/Program.cs:417-558).

Spark-first mapping: the per-doc tf vector is computed inside ONE
Arrow-batched pandas UDF (no shuffle at all — a doc is a row); df/cf/N/avgdl
are a single hash aggregation (map-side partial + final, no locks).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.functions.tokenize import term_counts_udf


def build_forward(doc_map: DataFrame) -> DataFrame:
    """doc_map(doc_id, ..., text) ->
    forward(doc_id, postings:array<struct<term,tf>>, dl:int).

    dl (doc length in admitted tokens) is computed JVM-side from the
    posting array — no second Python pass.
    """
    return doc_map.select(
        "doc_id",
        term_counts_udf(F.col("text")).alias("postings"),
    ).withColumn(
        "dl",
        F.expr("aggregate(postings, 0, (acc, p) -> acc + p.tf)"),
    )


def explode_forward(forward: DataFrame) -> DataFrame:
    """forward -> tf table (term, doc_id, tf, dl) — the relational view of
    the inverted index, input to stats, segments, and the exhaustive scorer."""
    return forward.select(
        "doc_id", "dl", F.explode("postings").alias("p")
    ).select(F.col("p.term").alias("term"), "doc_id", F.col("p.tf").alias("tf"), "dl")


def build_term_stats(tf_table: DataFrame) -> DataFrame:
    """(term, doc_id, tf) -> term_stats(term, df, cf).

    Replaces the reference's WordsCount stage (Indexer/Program.cs:417-558):
    df = doc frequency, cf = collection frequency (sum of tf).
    """
    return tf_table.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("cf"),
    )


def term_stats_from_segments(segments: DataFrame) -> DataFrame:
    """Segment table -> term_stats(term, df, cf) WITHOUT re-reading the
    postings: each segment row already carries (n = postings = df
    contribution, cf = sum of tfs), so df/cf is a hash agg over
    ~|vocab| x |shards or salts| small rows. Identical output to
    ``build_term_stats`` on the decoded tf table (asserted by tests); at
    scale this replaces a full pass over the corpus with an agg over the
    (orders-of-magnitude smaller) index itself."""
    return segments.groupBy("term").agg(
        F.sum("n").cast("long").alias("df"),
        F.sum("cf").alias("cf"),
    )


@dataclass(frozen=True)
class CorpusScalars:
    n_docs: int          # N: total documents (turns), incl. empty ones
    avgdl: float         # mean doc length over all docs
    sum_dl: int

    @staticmethod
    def compute(forward: DataFrame) -> "CorpusScalars":
        row = forward.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_dl"),
        ).collect()[0]
        n = row["n"]
        sum_dl = int(row["sum_dl"])
        return CorpusScalars(n_docs=n, avgdl=(sum_dl / n) if n else 0.0, sum_dl=sum_dl)
