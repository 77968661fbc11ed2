"""M0 end-to-end: doc ids -> forward -> stats -> exhaustive top-k, asserted
rank-identical (and score-equal to 1e-9 rel) vs the pure-Python oracle, in
BOTH scorer modes. Also the FIXTURES.md invariants: dense unique doc ids,
per-turn text equality under stable order, exact N/avgdl/Σdf/Σcf."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.docids import assign_doc_ids
from searchengine_spark.operators.forward import (
    CorpusScalars,
    build_forward,
    build_term_stats,
    explode_forward,
)
from searchengine_spark.operators.topk import attach_doc_meta, query_terms_df, score_topk
from searchengine_spark.oracle import OracleIndex

QUERIES = [
    "bacebace",            # single term
    "bace dice",           # absent-ish / short
    "babababa bace bace",  # duplicate term qf=2
    "zzzabsent",           # all-absent
    "don t stop",
]


@pytest.fixture(scope="module")
def built(spark, small):
    doc_map = assign_doc_ids(small, num_partitions=4).cache()
    forward = build_forward(doc_map).cache()
    tf_table = explode_forward(forward)
    stats = build_term_stats(tf_table).cache()
    scalars = CorpusScalars.compute(forward)
    return doc_map, forward, tf_table, stats, scalars


@pytest.fixture(scope="module")
def oracle(small):
    rows = [(r["conv_id"], r["turn_idx"], r["text"]) for r in small.collect()]
    return OracleIndex.build(rows)


def test_doc_ids_dense_unique(built, small):
    doc_map, *_ = built
    n = small.count()
    got = doc_map.agg(
        F.count("*").alias("n"),
        F.countDistinct("doc_id").alias("d"),
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
    ).collect()[0]
    assert got["n"] == got["d"] == n
    assert got["lo"] == 0 and got["hi"] == n - 1


def test_doc_ids_are_global_rank(built):
    doc_map, *_ = built
    rows = doc_map.select("doc_id", "conv_id", "turn_idx").collect()
    by_key = sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"]))
    assert [r["doc_id"] for r in by_key] == list(range(len(rows)))


def test_doc_ids_deterministic_across_parallelism(spark, small):
    a = assign_doc_ids(small.repartition(3), num_partitions=2)
    b = assign_doc_ids(small.repartition(11), num_partitions=7)
    rows_a = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in a.collect()}
    rows_b = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in b.collect()}
    assert rows_a == rows_b


def test_per_turn_text_equality(built, small):
    """BASELINE.json invariant: rebuild (conv_id, turn_idx, text) from the
    doc map; must equal the source under stable ordering."""
    doc_map, *_ = built
    src = small.select("conv_id", "turn_idx", "text").orderBy("conv_id", "turn_idx")
    rebuilt = doc_map.select("conv_id", "turn_idx", "text").orderBy("conv_id", "turn_idx")
    assert src.collect() == rebuilt.collect()


def test_corpus_scalars_exact(built, oracle):
    *_, scalars = built
    assert scalars.n_docs == oracle.n_docs
    assert scalars.avgdl == pytest.approx(oracle.avgdl, rel=1e-12)


def test_term_stats_exact(built, oracle):
    _, _, _, stats, _ = built
    got = {r["term"]: (r["df"], r["cf"]) for r in stats.collect()}
    want = {t: (oracle.df[t], oracle.cf[t]) for t in oracle.df}
    assert got == want


@pytest.mark.parametrize("mode", ["bm25", "reference"])
@pytest.mark.parametrize("query", QUERIES)
def test_topk_rank_identity(built, oracle, query, mode):
    _, _, tf_table, stats, scalars = built
    k = 10
    got = score_topk(tf_table, stats, scalars, query, k=k, mode=mode).collect()
    want = oracle.topk(query, k=k, mode=mode)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_reference_posting_cap(built, oracle):
    """Cap=3 changes scores the same way in engine and oracle."""
    _, _, tf_table, stats, scalars = built
    q = "bacebace"
    got = score_topk(
        tf_table, stats, scalars, q, k=5, mode="reference", posting_cap=3
    ).collect()
    want = oracle.topk(q, k=5, mode="reference", posting_cap=3)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]


def test_attach_doc_meta(built):
    doc_map, _, tf_table, stats, scalars = built
    topk = score_topk(tf_table, stats, scalars, "bacebace", k=5)
    out = attach_doc_meta(topk, doc_map).collect()
    assert len(out) <= 5
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_query_terms_qf(spark):
    got = {
        (r["term"], r["qf"]) for r in query_terms_df(spark, "a b a don't").collect()
    }
    assert got == {("a", 2), ("b", 1), ("don", 1), ("t", 1)}


def test_lexicon_suggestions(spark, small):
    """Prefix autocomplete + did-you-mean over the term dictionary
    (operators/lexicon.py): ranking rules and the length pre-filter."""
    from searchengine_spark.build import build_index
    from searchengine_spark.operators.lexicon import did_you_mean, suggest_prefix

    idx = build_index(small, layouts=())
    sugg = suggest_prefix(idx.term_stats, "ba", k=5).collect()
    assert sugg and all(r.term.startswith("ba") for r in sugg)
    dfs = [r.df for r in sugg]
    assert dfs == sorted(dfs, reverse=True)

    # typo one edit from a real high-df term
    target = sugg[0].term                     # e.g. "bababa"
    typo = target[:-1] + ("x" if target[-1] != "x" else "y")
    dym = did_you_mean(idx.term_stats, typo, k=5).collect()
    assert dym and dym[0].term == target and dym[0].dist == 1
    assert typo not in {r.term for r in dym}
    assert all(r.dist <= 2 for r in dym)
    order = [(r.dist, -r.df, r.term) for r in dym]
    assert order == sorted(order)


def test_boolean_query_semantics(spark, small):
    """MUST/NOT gating (operators/boolquery.py): every result contains
    all '+' terms and no '-' term; scores equal plain BM25 over the
    scored terms; parse edge cases pinned."""
    from collections import Counter

    from searchengine_spark.build import build_index
    from searchengine_spark.functions.tokenize import tokenize_py
    from searchengine_spark.operators.boolquery import boolean_topk, parse_query
    from searchengine_spark.operators.topk import score_all

    should, must, must_not = parse_query("bababa +zumuqi -dibaba +zumuqi")
    assert should == Counter({"bababa": 1, "zumuqi": 2})
    assert must == {"zumuqi"} and must_not == {"dibaba"}
    # excluded wins over required/scored
    s2, m2, n2 = parse_query("+foo -foo bar")
    assert s2 == Counter({"bar": 1}) and m2 == set() and n2 == {"foo"}

    idx = build_index(small, layouts=())
    got = boolean_topk(idx.tf_table, idx.term_stats, idx.scalars,
                       "bababa +zumuqi -dibaba", k=20).collect()
    assert got
    doc_terms = {}
    for r in idx.tf_table.select("doc_id", "term").collect():
        doc_terms.setdefault(r.doc_id, set()).add(r.term)
    for r in got:
        assert "zumuqi" in doc_terms[r.doc_id]
        assert "dibaba" not in doc_terms[r.doc_id]
    # scores match plain BM25 over the scored terms for the same docs
    plain = {r.doc_id: r.score for r in score_all(
        idx.tf_table, idx.term_stats, idx.scalars, "bababa zumuqi").collect()}
    for r in got:
        assert abs(plain[r.doc_id] - r.score) < 1e-9


def test_first_snippet(spark):
    """Snippet window math: earliest hit across terms, clamped window,
    no-hit fallback, case-insensitive locate."""
    from searchengine_spark.operators.snippets import first_snippet

    docs = spark.createDataFrame(
        [(0, "x" * 100 + "NEEDLE" + "y" * 100),
         (1, "Needle at the very start of it all " + "z" * 80),
         (2, "no match here at all " * 5),
         (3, "aa haystack bb needle cc")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           first_snippet(docs, "needle haystack", width=10).collect()}
    assert out[0].snip_pos == 101
    assert out[0].snippet == "x" * 10 + "NEEDLE" + "y" * 4
    assert out[1].snip_pos == 1
    assert out[1].snippet == "Needle at the very s"   # clamped to start
    assert out[2].snip_pos == 0
    assert out[2].snippet == "no match h"             # leading fallback
    assert out[3].snip_pos == 4                       # haystack before needle
