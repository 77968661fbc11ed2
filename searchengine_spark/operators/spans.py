"""Exact substring-span deduplication (ExactSubstr-style).

Document-level dedup (exact md5 / MinHash / SimHash in ``operators/dedup``)
misses the dominant contamination mode in web-scale training corpora:
long verbatim passages shared between otherwise-distinct documents
(boilerplate, quotations, mirrored sections). The remedy popularized by
"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
ACL 2022) is substring-granular: find every token span of length >= L that
occurs more than once in the corpus.

Suffix arrays don't distribute naturally; the standard scalable reduction
is fixed-length span fingerprinting: every length-L token window of every
document is hashed, and a hash held by >1 document marks a duplicated span
(a shared substring of length >= L exists iff some length-L window is
shared — sliding windows are the pigeonhole cover of longer matches).

Scale shape: window formation is IN-ROW array algebra over the already-
tokenized document (``dedup.shingles_expr`` — zero shuffle, no row blow-up
until the explode), and the explode feeds a single hash aggregation keyed
by span hash — map-side partial aggs absorb per-doc repetition. Nothing is
ever pairwise: a span shared by 10^4 documents costs one group, not 10^8
pairs. Output is bounded by the number of *distinct duplicated spans*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.operators.dedup import shingles_expr, with_tokens

SPAN_LEN = 8  # tokens per fingerprint window (Lee et al. use ~50 BPE)


def doc_spans(docs: DataFrame, span_len: int = SPAN_LEN,
              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pos, span_md5): one row per length-``span_len`` token
    window, pos = 0-based admitted-token ordinal of the window start.
    Window extraction is in-row; the only data movement is the explode
    feeding the consumer."""
    t = with_tokens(docs).select(
        F.col(id_col).alias("doc_id"),
        shingles_expr("tokens", k=span_len).alias("_spans"),
    )
    # posexplode_OUTER on purpose: the plain Generate makes Catalyst infer
    # a `size(e) > 0` pre-filter that re-evaluates the whole span transform
    # (and re-runs the Arrow tokenizer) a second time; the outer variant
    # skips that rule — one tokenizer pass, one span evaluation.
    return (
        t.select("doc_id", F.posexplode_outer("_spans").alias("pos", "_span"))
        .where(F.col("_span").isNotNull())
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.md5("_span").alias("span_md5"),
        )
    )


def duplicated_spans(docs: DataFrame, span_len: int = SPAN_LEN) -> DataFrame:
    """Spans occurring in more than one document:
    (span_md5, n_docs, n_occurrences) — the ExactSubstr candidate set.
    One explode + one hash agg; no pairwise join anywhere."""
    spans = doc_spans(docs, span_len=span_len)
    return (
        spans.groupBy("span_md5")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_occurrences"),
        )
        .where(F.col("n_docs") > 1)
    )


def span_dup_flags(docs: DataFrame, span_len: int = SPAN_LEN) -> DataFrame:
    """Per-document duplicated-span coverage: (doc_id, n_spans,
    n_dup_spans). ``n_dup_spans`` counts this doc's windows whose hash is
    shared with ANOTHER doc — the per-doc removal signal. Spans ⋈ distinct
    duplicated hashes (left-semi; the dup set is typically orders of
    magnitude smaller than the span stream, so Catalyst broadcasts it when
    it fits, shuffle-hash otherwise)."""
    spans = doc_spans(docs, span_len=span_len)
    dups = duplicated_spans(docs, span_len=span_len).select(
        "span_md5", F.lit(1).alias("_dup"))
    return (
        spans.join(dups, "span_md5", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.sum(F.coalesce("_dup", F.lit(0))).cast("long")
            .alias("n_dup_spans"),
        )
    )
