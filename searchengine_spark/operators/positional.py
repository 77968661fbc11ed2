"""Positional retrieval: exact-phrase and proximity (NEAR) queries.

The reference index stores (doc_id, tf) postings only — no positions —
so its Engine cannot answer "terms adjacent / within k tokens"
(SearchEngine Indexer/Program.cs:266-313 aggregates counts per doc and
drops order). A transcript search engine needs both. Two plans:

1. **Corpus-pass (default)**: tokens via ONE Arrow pass, candidate gate
   (``array_contains`` conjunction, evaluated in the scan), then the
   occurrence count computed IN-ROW with JVM higher-order functions
   (``filter``/``aggregate`` over the token array) — no posexplode, no
   self-joins, ZERO shuffles before the final top-k. Positions are
   *admitted-token* ordinals: a dropped token (non-ASCII or >20 chars,
   tokenize.py:35-43) closes the gap, exactly what an index-time
   positional posting list would store.

2. **Indexed (scale path)**: ``build_positional`` persists
   (term, doc_id, positions) lists once; ``phrase_match_indexed`` then
   touches ONLY the phrase terms' lists (query cost ∝ posting-list
   sizes, not corpus size — the Lucene phrase plan). Adjacency is again
   in-row: join the m terms' position arrays per doc (each leg is
   term-filtered, so candidate-sized), count starts whose i+j th
   position appears in term j's array.

At 10^12 turns the corpus-pass plan is a full scan per query (right for
ad-hoc/batch); the indexed plan is the serving path.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from searchengine_spark.functions.scoring import B as BM25_B
from searchengine_spark.functions.scoring import K1 as BM25_K1
from searchengine_spark.functions.tokenize import tokenize_py, tokenize_udf


def positional_postings(docs: DataFrame, terms: list[str] | None = None,
                        text_col: str = "text") -> DataFrame:
    """(doc_id, term, pos) with pos = 0-based admitted-token ordinal.

    ``terms`` (when given) gates docs to those containing ALL of them
    and keeps only those terms' rows after the explode."""
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


def _gated_tokens(docs: DataFrame, terms: list[str],
                  text_col: str) -> DataFrame:
    """(doc_id, toks) for docs containing every distinct term — the
    candidate gate; one Arrow tokenize pass, no shuffle."""
    toked = docs.select("doc_id", tokenize_udf(F.col(text_col)).alias("toks"))
    for t in sorted(set(terms)):
        toked = toked.filter(F.array_contains("toks", t))
    return toked


def _positions_of(toks: Column, term: str) -> Column:
    """array<int> of 0-based ordinals where ``toks[i] == term``."""
    return F.filter(
        F.sequence(F.lit(0), F.size(toks) - 1),
        lambda i: F.element_at(toks, i + 1) == term,
    )


def _phrase_count(toks: Column, terms: list[str]) -> Column:
    """In-row count of start ordinals i with toks[i+j] == terms[j] ∀j."""
    m = len(terms)
    starts = F.sequence(F.lit(0), F.size(toks) - m)
    hit = lambda i: reduce(  # noqa: E731
        Column.__and__,
        [F.element_at(toks, i + j + 1) == terms[j] for j in range(m)],
    )
    return F.when(
        F.size(toks) >= m, F.size(F.filter(starts, hit))
    ).otherwise(F.lit(0))


def phrase_match(docs: DataFrame, phrase: str,
                 text_col: str = "text") -> DataFrame:
    """(doc_id, ptf): occurrences of ``phrase`` as CONSECUTIVE admitted
    tokens. Pure column algebra after the gate — zero shuffles."""
    terms = tokenize_py(phrase)
    spark = docs.sparkSession
    if not terms:
        return spark.createDataFrame([], "doc_id long, ptf long")
    gated = _gated_tokens(docs, terms, text_col)
    return (
        gated.select(
            "doc_id",
            _phrase_count(F.col("toks"), terms).cast("long").alias("ptf"),
        )
        .filter(F.col("ptf") > 0)
    )


def near_match(docs: DataFrame, term_a: str, term_b: str, window: int = 5,
               text_col: str = "text") -> DataFrame:
    """(doc_id, pairs): count of (pos_a, pos_b) occurrence pairs of the
    two DISTINCT terms within ``window`` tokens, any order. In-row
    O(|pa|·|pb|) — occurrence lists per doc are tiny."""
    if term_a == term_b:
        raise ValueError("near_match needs two distinct terms")
    gated = _gated_tokens(docs, [term_a, term_b], text_col)
    pa = _positions_of(F.col("toks"), term_a)
    pb = _positions_of(F.col("toks"), term_b)
    pairs = F.aggregate(
        pa,
        F.lit(0),
        lambda acc, p: acc + F.size(
            F.filter(pb, lambda q: F.abs(q - p) <= window)
        ),
    )
    return (
        gated.select("doc_id", pairs.cast("long").alias("pairs"))
        .filter(F.col("pairs") > 0)
    )


# -- indexed path (persisted positional postings) ----------------------------

def build_positional(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, doc_id, positions sorted array<int>): the positional
    posting lists. Persist once (partition/bucket by term at scale);
    phrase queries then read only the query terms' rows."""
    return (
        positional_postings(docs, text_col=text_col)
        .groupBy("term", "doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
    )


def phrase_match_indexed(postings: DataFrame, phrase: str) -> DataFrame:
    """(doc_id, ptf) from a ``build_positional`` table: filter to the m
    phrase terms (pushed to the scan), join the m position arrays per
    doc, count starts in-row via array_contains lookups."""
    terms = tokenize_py(phrase)
    spark = postings.sparkSession
    if not terms:
        return spark.createDataFrame([], "doc_id long, ptf long")
    legs = None
    for j, t in enumerate(dict.fromkeys(terms)):  # distinct, order kept
        leg = (
            postings.filter(F.col("term") == t)
            .select("doc_id", F.col("positions").alias(f"_p_{t}"))
        )
        legs = leg if legs is None else legs.join(leg, "doc_id")
    first = F.col(f"_p_{terms[0]}")
    hit = lambda i: reduce(  # noqa: E731
        Column.__and__,
        [F.array_contains(F.col(f"_p_{t}"), i + j)
         for j, t in enumerate(terms) if j > 0],
        F.lit(True),
    )
    ptf = F.size(F.filter(first, hit)) if len(terms) > 1 else F.size(first)
    return (
        legs.select("doc_id", ptf.cast("long").alias("ptf"))
        .filter(F.col("ptf") > 0)
    )


def near_match_indexed(postings: DataFrame, term_a: str, term_b: str,
                       window: int = 5) -> DataFrame:
    """(doc_id, pairs) from a ``build_positional`` table: two term-row
    point filters (pushed to the scan — only the two terms' position
    lists are ever read), one doc_id join, in-row O(|pa|·|pb|) window
    counting — the serving-path NEAR, symmetric to
    ``phrase_match_indexed``."""
    if term_a == term_b:
        raise ValueError("near_match needs two distinct terms")
    pa = (postings.filter(F.col("term") == term_a)
          .select("doc_id", F.col("positions").alias("_pa")))
    pb = (postings.filter(F.col("term") == term_b)
          .select("doc_id", F.col("positions").alias("_pb")))
    pairs = F.aggregate(
        F.col("_pa"),
        F.lit(0),
        lambda acc, p: acc + F.size(
            F.filter(F.col("_pb"), lambda q: F.abs(q - p) <= window)
        ),
    )
    return (
        pa.join(pb, "doc_id")
        .select("doc_id", pairs.cast("long").alias("pairs"))
        .filter(F.col("pairs") > 0)
    )


# -- scoring ------------------------------------------------------------------

def _synthetic_bm25(matched: DataFrame, count_col: str, forward: DataFrame,
                    n_docs: int, avgdl: float, k: int) -> DataFrame:
    """BM25 over a synthetic term whose per-doc tf is ``count_col`` and
    whose df is the number of matched docs: phrase/proximity hits ranked
    with the engine's scoring discipline (doc-length normalization from
    the SAME corpus stats as term BM25)."""
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


def _mask(matched: DataFrame, exclude) -> DataFrame:
    """Tombstone mask: drop deleted docs BEFORE the synthetic-df count
    (the phrase df is a query-time quantity, not a pinned build stat,
    so live-docs-only is the consistent reading)."""
    if exclude:
        return matched.filter(~F.col("doc_id").isin(sorted(exclude)))
    return matched


def phrase_topk(docs: DataFrame, forward: DataFrame, phrase: str,
                n_docs: int, avgdl: float, k: int = 10,
                exclude=None) -> DataFrame:
    """Top-k docs for an exact-phrase query, BM25-scored on phrase tf
    (phrase treated as one synthetic term). -> (doc_id, score)."""
    return _synthetic_bm25(_mask(phrase_match(docs, phrase), exclude),
                           "ptf", forward, n_docs, avgdl, k)


def phrase_topk_indexed(postings: DataFrame, forward: DataFrame, phrase: str,
                        n_docs: int, avgdl: float, k: int = 10,
                        exclude=None) -> DataFrame:
    """phrase_topk over a persisted ``build_positional`` table."""
    return _synthetic_bm25(
        _mask(phrase_match_indexed(postings, phrase), exclude),
        "ptf", forward, n_docs, avgdl, k)


def near_topk(docs: DataFrame, forward: DataFrame, term_a: str, term_b: str,
              n_docs: int, avgdl: float, window: int = 5,
              k: int = 10, exclude=None) -> DataFrame:
    """Top-k docs for ``term_a NEAR/window term_b``, BM25-scored on the
    within-window pair count. -> (doc_id, score)."""
    return _synthetic_bm25(
        _mask(near_match(docs, term_a, term_b, window), exclude),
        "pairs", forward, n_docs, avgdl, k)


def near_topk_indexed(postings: DataFrame, forward: DataFrame, term_a: str,
                      term_b: str, n_docs: int, avgdl: float,
                      window: int = 5, k: int = 10,
                      exclude=None) -> DataFrame:
    """near_topk over a persisted ``build_positional`` table."""
    return _synthetic_bm25(
        _mask(near_match_indexed(postings, term_a, term_b, window), exclude),
        "pairs", forward, n_docs, avgdl, k)


# -- slop phrase (ordered proximity) ------------------------------------------

def slop_match(docs: DataFrame, term_a: str, term_b: str, slop: int = 2,
               text_col: str = "text") -> DataFrame:
    """(doc_id, pairs): ORDERED occurrence pairs — ``term_a`` strictly
    before ``term_b`` with at most ``slop - 1`` tokens between them
    (1 <= pos_b - pos_a <= slop). The middle ground between exact phrase
    (slop 1, ordered) and NEAR (unordered |Δ| <= w) — Lucene's
    PhraseQuery-with-slop reading for two terms. Same zero-shuffle
    in-row plan as near_match."""
    if term_a == term_b:
        raise ValueError("slop_match needs two distinct terms")
    if slop < 1:
        raise ValueError("slop must be >= 1")
    gated = _gated_tokens(docs, [term_a, term_b], text_col)
    pa = _positions_of(F.col("toks"), term_a)
    pb = _positions_of(F.col("toks"), term_b)
    pairs = F.aggregate(
        pa,
        F.lit(0),
        lambda acc, p: acc + F.size(
            F.filter(pb, lambda q: (q - p >= 1) & (q - p <= slop))
        ),
    )
    return (
        gated.select("doc_id", pairs.cast("long").alias("pairs"))
        .filter(F.col("pairs") > 0)
    )


def slop_match_indexed(postings: DataFrame, term_a: str, term_b: str,
                       slop: int = 2) -> DataFrame:
    """slop_match from a ``build_positional`` table: two pushed-down
    term-row filters, one doc_id join, in-row ordered-window count."""
    if term_a == term_b:
        raise ValueError("slop_match needs two distinct terms")
    if slop < 1:
        raise ValueError("slop must be >= 1")
    pa = (postings.filter(F.col("term") == term_a)
          .select("doc_id", F.col("positions").alias("_pa")))
    pb = (postings.filter(F.col("term") == term_b)
          .select("doc_id", F.col("positions").alias("_pb")))
    pairs = F.aggregate(
        F.col("_pa"),
        F.lit(0),
        lambda acc, p: acc + F.size(
            F.filter(F.col("_pb"), lambda q: (q - p >= 1) & (q - p <= slop))
        ),
    )
    return (
        pa.join(pb, "doc_id")
        .select("doc_id", pairs.cast("long").alias("pairs"))
        .filter(F.col("pairs") > 0)
    )


def slop_topk(docs: DataFrame, forward: DataFrame, term_a: str, term_b: str,
              n_docs: int, avgdl: float, slop: int = 2,
              k: int = 10, exclude=None) -> DataFrame:
    """Top-k for ``"term_a term_b"~slop`` (ordered), BM25-scored on the
    ordered pair count. -> (doc_id, score)."""
    return _synthetic_bm25(
        _mask(slop_match(docs, term_a, term_b, slop), exclude),
        "pairs", forward, n_docs, avgdl, k)


def slop_topk_indexed(postings: DataFrame, forward: DataFrame, term_a: str,
                      term_b: str, n_docs: int, avgdl: float,
                      slop: int = 2, k: int = 10,
                      exclude=None) -> DataFrame:
    """slop_topk over a persisted ``build_positional`` table."""
    return _synthetic_bm25(
        _mask(slop_match_indexed(postings, term_a, term_b, slop), exclude),
        "pairs", forward, n_docs, avgdl, k)
