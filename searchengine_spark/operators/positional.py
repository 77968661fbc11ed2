"""Positional retrieval: exact-phrase and proximity (NEAR) queries.

The reference index stores (doc_id, tf) postings only — no positions —
so its Engine cannot answer "terms adjacent / within k tokens"
(SearchEngine Indexer/Program.cs:266-313 aggregates counts per doc and
drops order). A transcript search engine needs both; this module adds
them WITHOUT changing the binary segment codec, as a query-time
positional plan over the forward index:

    tokens (one Arrow pass, already computed for the build)
      -> candidate gate: docs containing ALL phrase terms
         (``array_contains`` conjunction — evaluated in the scan,
         corpus-sized but embarrassingly parallel, no shuffle)
      -> posexplode to (doc_id, term, pos), filtered to the m phrase
         terms only (candidate-sized, NOT corpus-sized)
      -> m-way equi-join on (doc_id, pos + i) = phrase start positions

Positions are *admitted-token* ordinals, not byte offsets: a dropped
token (non-ASCII or >20 chars, tokenize.py:35-43) closes the gap, so
"spark café join" matches the phrase "spark join" — the exact semantics
a positional posting list built at index time would give.

Scale shape: every join leg is the positions of ONE term inside
candidate docs; the joins hash-partition on doc_id so all m legs
co-shuffle once. At 10^12 turns the gate keeps the exploded relation
proportional to the phrase's rarest term, same as a real positional
index. For repeated index-time use the (doc_id, term, pos) relation
can be persisted next to the tf segments; the query plan is identical.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.functions.scoring import B as BM25_B
from searchengine_spark.functions.scoring import K1 as BM25_K1
from searchengine_spark.functions.tokenize import tokenize_py, tokenize_udf


def positional_postings(docs: DataFrame, terms: list[str] | None = None,
                        text_col: str = "text") -> DataFrame:
    """(doc_id, term, pos) with pos = 0-based admitted-token ordinal.

    ``terms`` (when given) gates docs to those containing ALL of them
    (phrase candidates) and keeps only those terms' rows after the
    explode, so the exploded relation is candidate-sized.
    """
    toked = docs.select("doc_id", tokenize_udf(F.col(text_col)).alias("toks"))
    if terms:
        for t in sorted(set(terms)):
            toked = toked.filter(F.array_contains("toks", t))
    out = toked.select(
        "doc_id", F.posexplode("toks").alias("pos", "term")
    ).select("doc_id", "term", "pos")
    if terms:
        out = out.filter(F.col("term").isin(sorted(set(terms))))
    return out


def phrase_match(docs: DataFrame, phrase: str,
                 text_col: str = "text") -> DataFrame:
    """(doc_id, ptf): number of occurrences of ``phrase`` as CONSECUTIVE
    admitted tokens. Empty phrase -> empty result."""
    terms = tokenize_py(phrase)
    spark = docs.sparkSession
    if not terms:
        return spark.createDataFrame([], "doc_id long, ptf long")
    pos = positional_postings(docs, terms, text_col=text_col)
    hits = (
        pos.filter(F.col("term") == terms[0])
        .select("doc_id", F.col("pos").alias("p0"))
    )
    for i, t in enumerate(terms[1:], start=1):
        leg = (
            pos.filter(F.col("term") == t)
            .select("doc_id", (F.col("pos") - i).alias("p0"))
        )
        hits = hits.join(leg, ["doc_id", "p0"])
    return hits.groupBy("doc_id").agg(F.count("*").cast("long").alias("ptf"))


def near_match(docs: DataFrame, term_a: str, term_b: str, window: int = 5,
               text_col: str = "text") -> DataFrame:
    """(doc_id, pairs): count of (pos_a, pos_b) occurrence pairs with the
    two DISTINCT terms within ``window`` tokens of each other, any order.
    The classic unordered NEAR operator; pair count is the proximity tf."""
    if term_a == term_b:
        raise ValueError("near_match needs two distinct terms")
    pos = positional_postings(docs, [term_a, term_b], text_col=text_col)
    a = pos.filter(F.col("term") == term_a).select("doc_id",
                                                   F.col("pos").alias("pa"))
    b = pos.filter(F.col("term") == term_b).select("doc_id",
                                                   F.col("pos").alias("pb"))
    pairs = a.join(b, "doc_id").filter(
        F.abs(F.col("pa") - F.col("pb")) <= window
    )
    return pairs.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("pairs")
    )


def _synthetic_bm25(matched: DataFrame, count_col: str, forward: DataFrame,
                    n_docs: int, avgdl: float, k: int) -> DataFrame:
    """BM25 over a synthetic term whose per-doc tf is ``count_col`` and
    whose df is the number of matched docs: the standard way to rank
    phrase / proximity hits with the engine's scoring discipline
    (doc-length normalization from the SAME corpus stats as term BM25)."""
    pdf = matched.count()  # candidate-set size: one cheap job, k-free
    if pdf == 0:
        return matched.sparkSession.createDataFrame(
            [], "doc_id long, score double")
    idf = math.log((n_docs - pdf + 0.5) / (pdf + 0.5) + 1.0)
    c = F.col(count_col).cast("double")
    dl = F.col("dl").cast("double")
    score = F.lit(idf) * (c * (BM25_K1 + 1.0)) / (
        c + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
    )
    return (
        matched.join(forward.select("doc_id", "dl"), "doc_id")
        .select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def phrase_topk(docs: DataFrame, forward: DataFrame, phrase: str,
                n_docs: int, avgdl: float, k: int = 10) -> DataFrame:
    """Top-k docs for an exact-phrase query, BM25-scored on phrase tf
    (phrase treated as one synthetic term). -> (doc_id, score)."""
    return _synthetic_bm25(phrase_match(docs, phrase), "ptf",
                           forward, n_docs, avgdl, k)


def near_topk(docs: DataFrame, forward: DataFrame, term_a: str, term_b: str,
              n_docs: int, avgdl: float, window: int = 5,
              k: int = 10) -> DataFrame:
    """Top-k docs for ``term_a NEAR/window term_b``, BM25-scored on the
    within-window pair count. -> (doc_id, score)."""
    return _synthetic_bm25(near_match(docs, term_a, term_b, window), "pairs",
                           forward, n_docs, avgdl, k)
