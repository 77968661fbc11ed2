"""PRF query expansion: expansion terms are the top co-occurring terms of
the feedback docs (never the original terms), selection is deterministic,
and the expanded ranking actually surfaces a doc plain BM25 misses."""

from __future__ import annotations

import pytest

from searchengine_spark.operators.forward import (
    CorpusScalars,
    build_forward,
    build_term_stats,
    explode_forward,
)
from searchengine_spark.operators.prf import prf_expansion_terms, prf_topk
from searchengine_spark.operators.topk import score_topk

# Query "alpha". Docs 0-9 contain alpha AND the companion term "zeta"
# (plus filler); doc 50 contains zeta (and companions) but NOT alpha —
# invisible to plain BM25, reachable through expansion.
_DOCS = (
    [(i, "alpha zeta omicron filler%d common words here" % i)
     for i in range(10)]
    + [(20 + i, "common words here and more plain filler text %d" % i)
       for i in range(10)]
    + [(50, "zeta omicron zeta omicron zeta omicron related doc")]
)


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    fwd = build_forward(docs)
    tf = explode_forward(fwd)
    stats = build_term_stats(tf)
    return tf, stats, CorpusScalars.compute(fwd)


def test_expansion_terms_exclude_query_and_are_deterministic(spark, index):
    tf, stats, scal = index
    e1 = [(r.term, r.w) for r in
          prf_expansion_terms(tf, stats, scal, "alpha", r=5, e=3).collect()]
    e2 = [(r.term, r.w) for r in
          prf_expansion_terms(tf, stats, scal, "alpha", r=5, e=3).collect()]
    assert e1 == e2
    terms = [t for t, _ in e1]
    assert "alpha" not in terms
    # zeta/omicron dominate the feedback docs' characteristic mass
    assert "zeta" in terms and "omicron" in terms
    # ranked by weight desc
    ws = [w for _, w in e1]
    assert ws == sorted(ws, reverse=True)


def test_prf_surfaces_doc_without_query_terms(spark, index):
    tf, stats, scal = index
    plain = {r.doc_id for r in
             score_topk(tf, stats, scal, "alpha", k=15).collect()}
    assert 50 not in plain  # no query term -> unreachable for plain BM25
    prf = {r.doc_id for r in
           prf_topk(tf, stats, scal, "alpha", k=15, r=5, e=3).collect()}
    assert 50 in prf
    # original-term docs still rank (expansion is additive, damped)
    assert plain & prf


def test_bigram_logprob_separates_salad_from_fluent(spark):
    """Two docs with the IDENTICAL token multiset — one repeats a fluent
    sentence (its bigrams are corpus-attested many times), one is the
    same words shuffled into salad (singleton bigrams -> backoff).
    Unigram logprob cannot tell them apart (same composition); the
    bigram filter must score fluent strictly higher."""
    from searchengine_spark.operators.forward import (
        CorpusScalars,
        build_forward,
        build_term_stats,
        explode_forward,
    )
    from searchengine_spark.operators.textstats import (
        doc_bigram_logprob,
        doc_unigram_logprob,
    )

    sent = "the cat sat on the mat"
    salad = "mat the on sat cat the"
    docs = spark.createDataFrame(
        [(0, " ".join([sent] * 4)), (1, " ".join([salad] * 4)),
         (2, sent), (3, sent)],
        "doc_id long, text string")
    fwd = build_forward(docs)
    tf = explode_forward(fwd)
    stats = build_term_stats(tf)
    scal = CorpusScalars.compute(fwd)
    uni = {r.doc_id: r.avg_logprob for r in
           doc_unigram_logprob(tf, stats, scal.sum_dl).collect()}
    assert abs(uni[0] - uni[1]) < 1e-9  # unigram model is blind to order
    bi = {r.doc_id: r.avg_logprob for r in
          doc_bigram_logprob(docs, stats, scal.sum_dl).collect()}
    # (the salad doc's 4x self-repetition attests its own inner bigrams,
    # so the gap comes from the sentence-boundary transitions — still a
    # clear strict separation where the unigram model saw none)
    assert bi[0] > bi[1] + 0.2, bi  # bigram model is not
