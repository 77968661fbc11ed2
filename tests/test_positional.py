"""Phrase / proximity retrieval vs a pure-Python positional oracle."""

from __future__ import annotations

import math

import pytest

from searchengine_spark.functions.scoring import B, K1
from searchengine_spark.functions.tokenize import tokenize_py
from searchengine_spark.operators.positional import (
    near_match,
    near_topk,
    phrase_match,
    phrase_topk,
    positional_postings,
)

DOCS = [
    (0, "spark join fast spark join"),          # phrase x2
    (1, "spark slow join"),                     # terms present, not adjacent
    (2, "join spark"),                          # reversed order
    (3, "spark café join"),                     # dropped token closes gap
    (4, "spark Pneumonoultramicroscopicsilicovolcanoconiosisx join"),  # >20
    (5, "nothing relevant here"),
    (6, "spark join"),                          # single hit, short doc
    (7, "a spark 123 join b"),                  # digits split but drop nothing
]


def _py_phrase(text: str, terms: list[str]) -> int:
    toks = tokenize_py(text)
    m = len(terms)
    return sum(1 for i in range(len(toks) - m + 1) if toks[i:i + m] == terms)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_positional_postings_ordinals(spark, docs):
    rows = positional_postings(docs, ["spark", "join"]).collect()
    got = {(r.doc_id, r.term, r.pos) for r in rows}
    # doc 3: café is dropped, so join is ordinal 1 (gap closed)
    assert (3, "spark", 0) in got and (3, "join", 1) in got
    # doc 7: "a spark 123 join b" -> [a, spark, join, b]
    assert (7, "spark", 1) in got and (7, "join", 2) in got
    # doc 5 lacks both terms -> gated out entirely
    assert not any(d == 5 for d, _, _ in got)


@pytest.mark.parametrize("phrase", ["spark join", "join spark", "spark"])
def test_phrase_match_vs_python(spark, docs, phrase):
    terms = tokenize_py(phrase)
    got = {r.doc_id: r.ptf for r in phrase_match(docs, phrase).collect()}
    want = {
        d: _py_phrase(t, terms) for d, t in DOCS if _py_phrase(t, terms) > 0
    }
    assert got == want


def test_phrase_dropped_token_adjacency(spark, docs):
    got = {r.doc_id: r.ptf for r in phrase_match(docs, "spark join").collect()}
    assert got[3] == 1 and got[4] == 1  # café / >20-char runs close the gap
    assert 1 not in got and 2 not in got  # non-adjacent / reversed excluded
    assert got[0] == 2


def test_phrase_empty_and_missing(spark, docs):
    assert phrase_match(docs, "").count() == 0
    assert phrase_match(docs, "zzz qqq").count() == 0


def test_near_match_window(spark, docs):
    got = {r.doc_id: r.pairs for r in
           near_match(docs, "spark", "join", window=1).collect()}
    # window=1 = adjacency either order: doc0 has pairs (0,1),(3,4),(3,1)?
    # positions doc0: spark@0,3 join@1,4 -> |0-1|=1, |3-4|=1, |3-1|=2 no,
    # |0-4|=4 no -> 2 pairs
    assert got[0] == 2 and got[2] == 1 and got[6] == 1
    assert 1 not in got  # spark slow join: distance 2 > 1
    wide = {r.doc_id: r.pairs for r in
            near_match(docs, "spark", "join", window=2).collect()}
    assert wide[1] == 1 and wide[0] == 3


def test_near_same_term_rejected(spark, docs):
    with pytest.raises(ValueError):
        near_match(docs, "spark", "spark")


def _bm25(ptf: int, pdf: int, n: int, dl: int, avgdl: float) -> float:
    idf = math.log((n - pdf + 0.5) / (pdf + 0.5) + 1.0)
    return idf * ptf * (K1 + 1.0) / (ptf + K1 * (1 - B + B * dl / avgdl))


def test_phrase_topk_scores(spark, docs):
    from searchengine_spark.operators.forward import build_forward

    fwd = build_forward(docs.withColumnRenamed("text", "text")).cache()
    n = len(DOCS)
    dls = {r.doc_id: r.dl for r in fwd.select("doc_id", "dl").collect()}
    avgdl = sum(dls.values()) / n
    terms = ["spark", "join"]
    matches = {d: _py_phrase(t, terms) for d, t in DOCS
               if _py_phrase(t, terms) > 0}
    pdf = len(matches)
    want = sorted(
        ((d, _bm25(ptf, pdf, n, dls[d], avgdl)) for d, ptf in matches.items()),
        key=lambda x: (-x[1], x[0]),
    )[:3]
    got = [(r.doc_id, r.score) for r in
           phrase_topk(docs, fwd, "spark join", n, avgdl, k=3).collect()]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9


def test_near_topk_runs(spark, docs):
    from searchengine_spark.operators.forward import build_forward

    fwd = build_forward(docs)
    n = len(DOCS)
    avgdl = (sum(len(tokenize_py(t)) for _, t in DOCS)) / n
    out = near_topk(docs, fwd, "spark", "join", n, avgdl, window=2,
                    k=10).collect()
    assert out and out[0].doc_id == 0  # 3 pairs beats every 1-pair doc
    assert all(r.score > 0 for r in out)


def test_indexed_phrase_matches_corpus_pass(spark, docs):
    from searchengine_spark.operators.positional import (
        build_positional,
        phrase_match_indexed,
    )

    postings = build_positional(docs).cache()
    for phrase in ["spark join", "join spark", "spark", "spark join fast"]:
        direct = {(r.doc_id, r.ptf) for r in
                  phrase_match(docs, phrase).collect()}
        indexed = {(r.doc_id, r.ptf) for r in
                   phrase_match_indexed(postings, phrase).collect()}
        assert direct == indexed, phrase
    postings.unpersist()


def test_indexed_phrase_repeated_term(spark):
    docs2 = spark.createDataFrame(
        [(0, "a b a b a"), (1, "a b c a"), (2, "b a b")],
        "doc_id long, text string",
    )
    from searchengine_spark.operators.positional import (
        build_positional,
        phrase_match_indexed,
    )

    postings = build_positional(docs2)
    got = {r.doc_id: r.ptf
           for r in phrase_match_indexed(postings, "a b a").collect()}
    assert got == {0: 2}
    direct = {r.doc_id: r.ptf for r in phrase_match(docs2, "a b a").collect()}
    assert direct == got


def _py_slop(text: str, a: str, b: str, slop: int) -> int:
    toks = tokenize_py(text)
    pa = [i for i, t in enumerate(toks) if t == a]
    pb = [i for i, t in enumerate(toks) if t == b]
    return sum(1 for p in pa for q in pb if 1 <= q - p <= slop)


@pytest.mark.parametrize("slop", [1, 2, 4])
def test_slop_match_vs_python(spark, docs, slop):
    from searchengine_spark.operators.positional import slop_match

    got = {r.doc_id: r.pairs for r in
           slop_match(docs, "spark", "join", slop=slop).collect()}
    want = {d: _py_slop(t, "spark", "join", slop) for d, t in DOCS
            if _py_slop(t, "spark", "join", slop) > 0}
    assert got == want


def test_slop_is_ordered(spark, docs):
    from searchengine_spark.operators.positional import slop_match

    # doc 2 "join spark" matches NEAR(1) but not slop (wrong order)
    near = {r.doc_id for r in
            near_match(docs, "spark", "join", window=1).collect()}
    slop = {r.doc_id for r in
            slop_match(docs, "spark", "join", slop=1).collect()}
    assert 2 in near and 2 not in slop
    # and reversed query direction finds it
    rev = {r.doc_id for r in
           slop_match(docs, "join", "spark", slop=1).collect()}
    assert 2 in rev


def test_slop_validation(spark, docs):
    from searchengine_spark.operators.positional import slop_match

    with pytest.raises(ValueError):
        slop_match(docs, "spark", "spark")
    with pytest.raises(ValueError):
        slop_match(docs, "spark", "join", slop=0)


def test_indexed_slop_matches_corpus_pass(spark, docs):
    from searchengine_spark.operators.positional import (
        build_positional,
        slop_match,
        slop_match_indexed,
    )

    postings = build_positional(docs).cache()
    for a, b, s in [("spark", "join", 1), ("spark", "join", 2),
                    ("join", "spark", 2), ("spark", "fast", 4)]:
        direct = {(r.doc_id, r.pairs) for r in
                  slop_match(docs, a, b, slop=s).collect()}
        indexed = {(r.doc_id, r.pairs) for r in
                   slop_match_indexed(postings, a, b, slop=s).collect()}
        assert direct == indexed, (a, b, s)
    postings.unpersist()


def test_slop_topk_runs(spark, docs):
    from searchengine_spark.operators.forward import build_forward
    from searchengine_spark.operators.positional import slop_topk

    fwd = build_forward(docs)
    n = len(DOCS)
    avgdl = (sum(len(tokenize_py(t)) for _, t in DOCS)) / n
    out = slop_topk(docs, fwd, "spark", "join", n, avgdl, slop=2,
                    k=10).collect()
    assert out and all(r.score > 0 for r in out)
    dls = {r.doc_id: r.dl for r in fwd.select("doc_id", "dl").collect()}
    matches = {d: _py_slop(t, "spark", "join", 2) for d, t in DOCS
               if _py_slop(t, "spark", "join", 2) > 0}
    want = sorted(
        ((d, _bm25(ptf, len(matches), n, dls[d], avgdl))
         for d, ptf in matches.items()),
        key=lambda x: (-x[1], x[0]),
    )
    assert [r.doc_id for r in out] == [d for d, _ in want]
    for r, (_, ws) in zip(out, want):
        assert abs(r.score - ws) < 1e-9


def test_indexed_near_matches_corpus_pass(spark, docs):
    from searchengine_spark.operators.positional import (
        build_positional,
        near_match,
        near_match_indexed,
    )

    postings = build_positional(docs).cache()
    for a, b, w in [("spark", "join", 2), ("spark", "join", 5),
                    ("join", "spark", 2), ("spark", "fast", 1)]:
        direct = {(r.doc_id, r.pairs) for r in
                  near_match(docs, a, b, window=w).collect()}
        indexed = {(r.doc_id, r.pairs) for r in
                   near_match_indexed(postings, a, b, window=w).collect()}
        assert direct == indexed, (a, b, w)
    postings.unpersist()
