"""Per-document term vectors — the ES ``_termvectors`` / Lucene
TermVectors analog: for one doc, every admitted term with its in-doc
frequency, first position, and the corpus-level df/cf. The relevance-
debugging sibling of ``explain_score`` (which breaks down one (query,
doc) score; this dumps the doc's whole indexed view).

Plan shape: the doc_id filter lands on the doc-store scan (parquet
predicate pushdown — one row read at serving time), ONE Arrow tokenize of
that row, an in-partition agg over its O(dl) tokens, then the tiny
term set broadcast into the corpus stats join — the corpus-sized side
never shuffles for a term-vectors call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.functions.tokenize import tokenize_udf


def term_vectors(
    docs: DataFrame,
    term_stats: DataFrame,
    doc_id: int,
    text_col: str = "text",
) -> DataFrame:
    """(term, tf, first_pos, df, cf) for ``doc_id``, term-sorted.

    ``first_pos`` is the 0-based admitted-token ordinal of the term's
    first occurrence (the same position space the phrase/NEAR operators
    use, so dropped tokens close gaps consistently).
    """
    one = (
        docs.filter(F.col("doc_id") == doc_id)
        .select("doc_id", tokenize_udf(F.col(text_col)).alias("toks"))
    )
    tv = (
        one.select(F.posexplode("toks").alias("pos", "term"))
        .groupBy("term")
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.min("pos").cast("long").alias("first_pos"),
        )
    )
    return (
        term_stats.join(F.broadcast(tv), "term")
        .select(
            "term",
            "tf",
            "first_pos",
            F.col("df").cast("long").alias("df"),
            F.col("cf").cast("long").alias("cf"),
        )
        .orderBy("term")
    )
