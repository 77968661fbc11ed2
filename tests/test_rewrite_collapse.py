"""Round-3 operators: query rewrite (prefix/fuzzy expansion), field
collapsing, token-budget selection, MMR diversification.

Each is checked against a brute-force Python oracle on a planted corpus
(the cross-engine DuckDB oracles live in entry_queries; these pin the
operator semantics on adversarial fixtures the synthetic corpus lacks).
"""

from __future__ import annotations

import pytest

from searchengine_spark.operators.collapse import collapse_topk
from searchengine_spark.operators.forward import (
    CorpusScalars,
    build_forward,
    build_term_stats,
    explode_forward,
)
from searchengine_spark.operators.lexicon import (
    expand_fuzzy_terms,
    expand_prefix_terms,
    fuzzy_search_topk,
    prefix_search_topk,
)
from searchengine_spark.operators.topk import score_all

_DOCS = (
    # "sort"-family docs across three groups
    [(i, "sorting sorted sort merge run %d" % i, "g0") for i in range(4)]
    + [(10 + i, "sort filter scan plain row %d" % i, "g1") for i in range(4)]
    + [(20 + i, "unrelated filler text words %d" % i, "g2") for i in range(4)]
    # one doc only reachable through the "sor*" expansion's rarer term
    + [(30, "sorcery sorcery sorcery arcane tome", "g2")]
)


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(
        [(d, t) for d, t, _ in _DOCS], "doc_id long, text string")
    fwd = build_forward(docs)
    tf = explode_forward(fwd)
    stats = build_term_stats(tf)
    return tf, stats, CorpusScalars.compute(fwd)


@pytest.fixture(scope="module")
def groups(spark):
    return spark.createDataFrame(
        [(d, g) for d, _, g in _DOCS], "doc_id long, group string")


# -- prefix rewrite ---------------------------------------------------------

def test_prefix_expansion_ranked_and_capped(index):
    _, stats, _ = index
    exp = [(r.term, r.qf) for r in
           expand_prefix_terms(stats, "sor", n_expand=2).collect()]
    # df ranking: sort (df 8) > sorted/sorting (df 4, term asc) > sorcery
    assert exp[0] == ("sort", 1.0)
    assert len(exp) == 2 and exp[1][0] == "sorted"


def test_prefix_search_reaches_expansion_only_doc(index):
    tf, stats, scal = index
    hits = {r.doc_id for r in
            prefix_search_topk(tf, stats, scal, "sor", k=13,
                               n_expand=10).collect()}
    assert 30 in hits            # only matches via the sorcery expansion
    assert 0 in hits and 10 in hits
    assert not hits & {20, 21, 22, 23}  # no 's'-term in filler docs


def test_prefix_search_matches_bruteforce(index):
    tf, stats, scal = index
    terms = [r.term for r in
             expand_prefix_terms(stats, "sor", n_expand=10).collect()]
    # unit-weight OR-union == BM25 of the space-joined expansion with qf 1
    expect = {
        r.doc_id: round(r.score, 6)
        for r in score_all(tf, stats, scal, " ".join(terms)).collect()
    }
    got = {r.doc_id: r.score for r in
           prefix_search_topk(tf, stats, scal, "sor", k=100,
                              n_expand=10).collect()}
    assert got == pytest.approx(expect)


# -- fuzzy rewrite ----------------------------------------------------------

def test_fuzzy_expansion_weights(index):
    _, stats, _ = index
    exp = {r.term: r.qf for r in
           expand_fuzzy_terms(stats, "sort", max_dist=2,
                              n_expand=10).collect()}
    assert exp["sort"] == 1.0          # exact term included at full weight
    assert exp["sorted"] == pytest.approx(1 / 3)   # dist 2
    assert "sorcery" not in exp        # dist 4 > max_dist
    assert "run" not in exp


def test_fuzzy_typo_recovers_true_term_docs(index):
    tf, stats, scal = index
    # "sori" is in no document; dist-1 neighbor "sort" carries the results
    hits = [r.doc_id for r in
            fuzzy_search_topk(tf, stats, scal, "sori", k=5,
                              max_dist=1, n_expand=3).collect()]
    assert hits and set(hits) <= {0, 1, 2, 3, 10, 11, 12, 13}


# -- field collapsing -------------------------------------------------------

def _brute_collapse(tf, stats, scal, groups_rows, query, agg):
    scores = {r.doc_id: round(r.score, 6)
              for r in score_all(tf, stats, scal, query).collect()}
    by_group: dict[str, list[tuple[int, float]]] = {}
    gmap = dict(groups_rows)
    for d, s in scores.items():
        by_group.setdefault(gmap[d], []).append((d, s))
    out = {}
    for g, ds in by_group.items():
        best = max(ds, key=lambda x: (x[1], -x[0]))
        gs = (max(s for _, s in ds) if agg == "max"
              else round(sum(s for _, s in ds), 6))
        out[g] = (gs, best[0], len(ds))
    return out


@pytest.mark.parametrize("agg", ["max", "sum"])
def test_collapse_matches_bruteforce(index, groups, agg):
    tf, stats, scal = index
    rows = collapse_topk(tf, stats, scal, groups, "sort merge", k=10,
                         agg=agg).collect()
    expect = _brute_collapse(
        tf, stats, scal,
        [(d, g) for d, _, g in _DOCS], "sort merge", agg)
    assert {r.group: (r.group_score, r.best_doc_id, r.n_matching)
            for r in rows} == pytest.approx(expect)
    # output ordered (group_score desc, group asc)
    keys = [(-r.group_score, r.group) for r in rows]
    assert keys == sorted(keys)


def test_collapse_best_doc_tiebreak(spark):
    # two docs in one group with IDENTICAL text -> identical score;
    # best_doc_id must be the lower id
    docs = spark.createDataFrame(
        [(5, "twin text"), (3, "twin text"), (9, "other words")],
        "doc_id long, text string")
    fwd = build_forward(docs)
    tf = explode_forward(fwd)
    stats = build_term_stats(tf)
    groups = spark.createDataFrame(
        [(5, "a"), (3, "a"), (9, "b")], "doc_id long, group string")
    rows = collapse_topk(tf, stats, CorpusScalars.compute(fwd), groups,
                         "twin", k=5)
    got = {r.group: r.best_doc_id for r in rows.collect()}
    assert got == {"a": 3}


def test_collapse_rejects_unknown_agg(index, groups):
    tf, stats, scal = index
    with pytest.raises(ValueError):
        collapse_topk(tf, stats, scal, groups, "sort", agg="median")


# -- token-budget selection --------------------------------------------------

def test_budget_select_prefix_semantics(spark):
    from searchengine_spark.operators.packing import budget_select

    rows = [(i, round(1.0 - i * 0.01, 6), 10 + i) for i in range(20)]
    df = spark.createDataFrame(
        rows, "doc_id long, quality double, n_tokens long")
    got = budget_select(df, 100, len_col="n_tokens").collect()
    # greedy by quality desc: docs 0 (10), 1 (11), ... cum 10,21,33,46,60,75,91
    assert [r.doc_id for r in got] == [0, 1, 2, 3, 4, 5, 6]
    assert [r.cum_tokens for r in got] == [10, 21, 33, 46, 60, 75, 91]


def test_budget_select_ties_break_doc_id(spark):
    from searchengine_spark.operators.packing import budget_select

    df = spark.createDataFrame(
        [(7, 0.5, 40), (2, 0.5, 40), (5, 0.5, 40)],
        "doc_id long, quality double, n_tokens long")
    got = [r.doc_id for r in
           budget_select(df, 80, len_col="n_tokens").collect()]
    assert got == [2, 5]


def test_budget_select_edges(spark):
    from searchengine_spark.operators.packing import budget_select

    df = spark.createDataFrame(
        [(1, 0.9, 50), (2, 0.8, 10)], "doc_id long, quality double, n_tokens long")
    assert budget_select(df, 49, len_col="n_tokens").count() == 0
    assert budget_select(df, 60, len_col="n_tokens").count() == 2
    with pytest.raises(ValueError):
        budget_select(df, 0, len_col="n_tokens")


# -- MMR diversification -----------------------------------------------------

def test_mmr_skips_near_duplicate(spark):
    from searchengine_spark.operators.similarity import mmr_topk

    q = [1.0, 0.0, 0.0, 0.0]
    vecs = [
        (1, [0.9, 0.1, 0.0, 0.0]),   # closest
        (2, [0.9, 0.1, 0.0, 0.0]),   # exact duplicate of 1
        (3, [0.6, 0.6, 0.0, 0.0]),   # relevant but different direction
        (4, [0.0, 0.0, 1.0, 0.0]),   # orthogonal
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<float>")
    picks = [r.vec_id for r in
             mmr_topk(emb, q, k=3, pool=4, lam=0.5).collect()]
    # plain cosine order would be [1, 2, 3]; MMR must demote the exact
    # duplicate (sim 1.0 to the first pick) — at lam .5 the orthogonal
    # vector wins the second slot
    assert picks[0] == 1
    assert picks[1] == 4
    assert 2 not in picks[:2]


def test_mmr_lam_one_is_plain_cosine(spark):
    from searchengine_spark.operators.similarity import (
        cosine_topk,
        mmr_topk,
    )

    import random

    rng = random.Random(7)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)],
        "vec_id long, embedding array<float>")
    q = [rng.uniform(-1, 1) for _ in range(8)]
    mmr = [r.vec_id for r in mmr_topk(emb, q, k=10, pool=20, lam=1.0).collect()]
    cos = [r.vec_id for r in cosine_topk(emb, q, k=10).collect()]
    assert mmr == cos


# -- regex rewrite ------------------------------------------------------------

def test_regex_search_matches_prefix_when_equivalent(index):
    from searchengine_spark.operators.lexicon import regex_search_topk

    tf, stats, scal = index
    # ^sor anchored regex == "sor" prefix rewrite, row for row
    via_regex = [(r.doc_id, r.score) for r in
                 regex_search_topk(tf, stats, scal, "^sor", k=100,
                                   n_expand=10).collect()]
    via_prefix = [(r.doc_id, r.score) for r in
                  prefix_search_topk(tf, stats, scal, "sor", k=100,
                                     n_expand=10).collect()]
    assert via_regex == via_prefix


def test_regex_expansion_partial_match_and_cap(index):
    from searchengine_spark.operators.lexicon import expand_regex_terms

    _, stats, _ = index
    # unanchored: partial-match semantics (Lucene/DuckDB agree)
    terms = [r.term for r in
             expand_regex_terms(stats, "cer", n_expand=5).collect()]
    assert terms == ["sorcery"]
    assert expand_regex_terms(stats, "zzz", n_expand=5).count() == 0
