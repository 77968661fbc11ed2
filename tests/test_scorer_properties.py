"""Property tests: the round-3 scorer/filter family vs brute-force
oracles on hypothesis-generated corpora — random tiny vocabularies force
tf ties, empty matches, all-docs-match and single-doc corpora far better
than hand fixtures. Few examples, one Spark job each."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from searchengine_spark.functions.tokenize import tokenize_py
from searchengine_spark.operators.forward import (
    CorpusScalars,
    build_forward,
    build_term_stats,
    explode_forward,
)

_VOCAB = ["alpha", "beta", "gamma", "delta", "zz"]

_DOC = st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=8)
_CORPUS = st.lists(_DOC, min_size=1, max_size=6)

_SETTINGS = dict(max_examples=10, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


def _index(spark, docs_tokens):
    rows = [(i, " ".join(ts)) for i, ts in enumerate(docs_tokens)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fwd = build_forward(docs)
    tf = explode_forward(fwd)
    return docs, tf, build_term_stats(tf), CorpusScalars.compute(fwd)


@settings(**_SETTINGS)
@given(_CORPUS)
def test_match_count_properties(spark, corpus):
    from searchengine_spark.operators.topk import match_count

    _, tf, _, _ = _index(spark, corpus)
    query = "alpha beta"
    or_n = match_count(tf, query).collect()[0]["n_hits"]
    and_n = match_count(tf, query, require_all=True).collect()[0]["n_hits"]
    qt = set(tokenize_py(query))
    sets = [set(ts) for ts in corpus]
    assert or_n == sum(1 for s in sets if s & qt)
    assert and_n == sum(1 for s in sets if qt <= s)
    assert and_n <= or_n


@settings(**_SETTINGS)
@given(_CORPUS, st.sets(st.integers(0, 5), max_size=6))
def test_filtered_topk_is_restriction_of_full(spark, corpus, allowed_ids):
    from searchengine_spark.operators.topk import filtered_topk, score_all

    docs, tf, stats, scal = _index(spark, corpus)
    allowed = spark.createDataFrame(
        [(int(i),) for i in sorted(allowed_ids)] or [(-1,)], "doc_id long")
    got = {r.doc_id: r.score for r in
           filtered_topk(tf, stats, scal, allowed, "alpha beta",
                         k=100).collect()}
    full = {r.doc_id: round(r.score, 6)
            for r in score_all(tf, stats, scal, "alpha beta").collect()}
    want = {d: s for d, s in full.items() if d in allowed_ids}
    assert got == want


@settings(**_SETTINGS)
@given(_CORPUS)
def test_lm_dirichlet_matches_sparse_twin(spark, corpus):
    """Spark scores == the pure-Python sparse-form twin exactly (6dp),
    including the in-vocab-|q| rule when a query term is OOV for the
    generated corpus."""
    from searchengine_spark.operators.topk import lm_dirichlet_topk

    _, tf, stats, scal = _index(spark, corpus)
    query = "alpha beta"
    mu = 50.0
    got = {r.doc_id: r.score for r in
           lm_dirichlet_topk(tf, stats, scal, query, k=100,
                             mu=mu).collect()}

    tfs = [Counter(ts) for ts in corpus]
    total = sum(sum(c.values()) for c in tfs)
    cf = Counter()
    for c in tfs:
        cf.update(c)
    qt = Counter(tokenize_py(query))
    q_len = sum(qf for t, qf in qt.items() if cf[t] > 0)
    want = {}
    for d, c in enumerate(tfs):
        matched = {t: qf for t, qf in qt.items() if c.get(t, 0) > 0}
        if not matched:
            continue
        dl = sum(c.values())
        s = sum(qf * math.log(1.0 + c[t] / (mu * (cf[t] / total)))
                for t, qf in matched.items())
        want[d] = round(s + q_len * math.log(mu / (dl + mu)), 6)
    assert got.keys() == want.keys()
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=2e-6)


@settings(**_SETTINGS)
@given(_CORPUS)
def test_synonym_equals_manual_expansion(spark, corpus):
    from searchengine_spark.operators.lexicon import synonym_search_topk
    from searchengine_spark.operators.topk import score_all_terms

    _, tf, stats, scal = _index(spark, corpus)
    syn = spark.createDataFrame([("alpha", "gamma", 0.5)],
                                "term string, syn string, weight double")
    got = {r.doc_id: r.score for r in
           synonym_search_topk(tf, stats, scal, "alpha", syn,
                               k=100).collect()}
    exp = spark.createDataFrame([("alpha", 1.0), ("gamma", 0.5)],
                                "term string, qf double")
    want = {r.doc_id: round(r.score, 6) for r in
            score_all_terms(tf, stats, scal, exp).collect()}
    assert got == want


_RANKS = st.integers(min_value=1, max_value=6)
_JUDG = st.lists(
    st.tuples(st.integers(min_value=0, max_value=1),   # query_id
              st.integers(min_value=0, max_value=9),   # doc_id
              st.integers(min_value=0, max_value=3)),  # rel
    min_size=0, max_size=8)


@settings(**_SETTINGS)
@given(st.permutations(list(range(5))), _JUDG)
def test_rank_eval_properties(spark, perm, judg):
    """nDCG/MRR/P@k live in [0,1] for any ranking/judgment pair, nDCG
    hits 1.0 when the ranking lists the judged docs in ideal order, and
    duplicate judgments are tolerated via last-write-agnostic bounds."""
    from searchengine_spark.operators.rankeval import rank_eval

    ranking = spark.createDataFrame(
        [(0, r + 1, d) for r, d in enumerate(perm)],
        "query_id int, rank int, doc_id long")
    # dedupe judgments per (query, doc) keeping max rel (well-formed input)
    jmap = {}
    for qid, d, rel in judg:
        jmap[(qid, d)] = max(jmap.get((qid, d), 0), rel)
    jrows = [(q, d, r) for (q, d), r in jmap.items() if r > 0]
    if not jrows:
        jrows = [(0, perm[0], 1)]
    judgments = spark.createDataFrame(
        jrows, "query_id int, doc_id long, rel int")

    out = {r.query_id: r for r in rank_eval(ranking, judgments, k=5).collect()}
    assert set(out) == {0}
    r0 = out[0]
    assert 0.0 <= r0.ndcg <= 1.0 + 1e-9
    assert 0.0 <= r0.mrr <= 1.0
    assert 0.0 <= r0.p_at_k <= 1.0

    # ideal ranking of ALL of query 0's judged docs (rel desc, doc asc —
    # the same order the IDCG window uses) -> ndcg exactly 1
    q0 = sorted(((d, r) for (q, d), r in jmap.items() if q == 0 and r > 0),
                key=lambda x: (-x[1], x[0]))[:5]
    if q0:
        ideal = spark.createDataFrame(
            [(0, i + 1, d) for i, (d, _) in enumerate(q0)],
            "query_id int, rank int, doc_id long")
        best = rank_eval(ideal, judgments, k=5).collect()
        b0 = [r for r in best if r.query_id == 0][0]
        assert b0.ndcg == pytest.approx(1.0, abs=1e-6)
