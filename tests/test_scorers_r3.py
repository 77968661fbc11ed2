"""Round-3 scorer family: LM-Dirichlet query likelihood, true BM25F,
recency decay, synonym expansion.

Each operator is pinned against a brute-force Python oracle on a planted
corpus (the cross-engine DuckDB oracles live in entry_queries; these pin
semantics the synthetic corpus can't isolate — rank equivalence to the
FULL Dirichlet likelihood, title-vs-body boosting, exact decay ratios,
synonym weight arithmetic).
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from searchengine_spark.functions.tokenize import tokenize_py
from searchengine_spark.operators.forward import (
    CorpusScalars,
    build_forward,
    build_term_stats,
    explode_forward,
)
from searchengine_spark.operators.topk import decay_topk, lm_dirichlet_topk

_DOCS = [
    (0, "spark join fast spark window"),
    (1, "join join join filter scan"),
    (2, "fast fast row column column column row scan"),
    (3, "unrelated filler words entirely"),
    (4, "spark"),
    (5, "join fast join fast spark merge merge"),
]


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    fwd = build_forward(docs)
    tf = explode_forward(fwd)
    stats = build_term_stats(tf)
    return docs, tf, stats, CorpusScalars.compute(fwd)


# -- LM Dirichlet -------------------------------------------------------------

def _full_dirichlet_loglik(query: str, mu: float = 2000.0):
    """Brute-force FULL log p(q|d) = sum_t qf * ln((tf + mu*p(t|C)) / (dl + mu))
    over every doc — the textbook form the sparse operator must be
    rank-equivalent to (equal up to a per-query constant)."""
    tfs = {d: Counter(tokenize_py(t)) for d, t in _DOCS}
    dls = {d: sum(c.values()) for d, c in tfs.items()}
    total = sum(dls.values())
    cf = Counter()
    for c in tfs.values():
        cf.update(c)
    out = {}
    for d in tfs:
        s = 0.0
        for t, qf in Counter(tokenize_py(query)).items():
            p = cf[t] / total
            s += qf * math.log((tfs[d].get(t, 0) + mu * p) / (dls[d] + mu))
        out[d] = s
    return out


def test_lm_dirichlet_rank_equivalent_to_full_likelihood(index):
    _, tf, stats, scal = index
    query = "spark join fast"
    got = lm_dirichlet_topk(tf, stats, scal, query, k=10).collect()
    full = _full_dirichlet_loglik(query)
    # candidate set: docs matching >= 1 term (3 matches nothing)
    assert {r.doc_id for r in got} == {0, 1, 2, 4, 5}
    # rank order == full-likelihood order over the candidates
    want = sorted((d for d in full if d != 3),
                  key=lambda d: (-full[d], d))
    assert [r.doc_id for r in got] == want
    # sparse score - full score is the SAME constant for every doc
    diffs = {round(r.score - full[r.doc_id], 4) for r in got}
    assert len(diffs) == 1


def test_lm_dirichlet_prefers_shorter_doc_at_equal_tf(index):
    _, tf, stats, scal = index
    got = [r.doc_id for r in
           lm_dirichlet_topk(tf, stats, scal, "spark", k=3).collect()]
    # docs 4 (dl 1) and 5 (dl 7) both have tf=1: identical numerator
    # (tf + mu*p), smaller denominator (dl + mu) -> 4 above 5 at ANY mu
    assert got.index(4) < got.index(5)


# -- true BM25F ---------------------------------------------------------------

def _brute_bm25f(query, docs, title_len=8, w=(2.0, 1.0), b=(0.5, 0.75), k1=1.2):
    toks = {d: tokenize_py(t) for d, t in docs}
    fields = {d: {"title": ts[:title_len], "body": ts[title_len:]}
              for d, ts in toks.items()}
    avg = {}
    for f in ("title", "body"):
        lens = [len(fields[d][f]) for d in fields if len(fields[d][f]) > 0]
        avg[f] = sum(lens) / len(lens)
    n = len(docs)
    df = Counter()
    for d in toks:
        df.update(set(toks[d]))
    wmap = {"title": w[0], "body": w[1]}
    bmap = {"title": b[0], "body": b[1]}
    out = {}
    for d in fields:
        s = 0.0
        for t, qf in Counter(tokenize_py(query)).items():
            wtf = 0.0
            for f in ("title", "body"):
                tf = Counter(fields[d][f]).get(t, 0)
                if tf:
                    fdl = len(fields[d][f])
                    wtf += wmap[f] * tf / (1 - bmap[f] + bmap[f] * fdl / avg[f])
            if wtf:
                idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                s += qf * idf * wtf / (k1 + wtf)
        if s:
            out[d] = round(s, 6)
    return out


def test_bm25f_matches_bruteforce(spark):
    from searchengine_spark.operators.fielded import bm25f_topk

    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta target target"),
        (1, "target beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "target target other words here now then when iota kappa"),
        (3, "nothing relevant at all in this turn text here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stats = build_term_stats(explode_forward(build_forward(docs)))
    got = {r.doc_id: r.score for r in
           bm25f_topk(docs, stats, len(rows), "target", k=10).collect()}
    assert got == pytest.approx(_brute_bm25f("target", rows))


def test_bm25f_title_hit_outranks_body_hit(spark):
    from searchengine_spark.operators.fielded import bm25f_topk

    # same length, same tf=1 for the query term; doc 0 has it in the
    # TITLE window (first 8 tokens), doc 1 in the body — the 2x title
    # weight must rank doc 0 first
    rows = [
        (0, "target a b c d e f g h i j k"),
        (1, "a b c d e f g h target i j k"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stats = build_term_stats(explode_forward(build_forward(docs)))
    got = [r.doc_id for r in
           bm25f_topk(docs, stats, 2, "target", k=2).collect()]
    assert got == [0, 1]


# -- recency decay ------------------------------------------------------------

def test_decay_halves_per_half_life(index, spark):
    docs, tf, stats, scal = index
    # docs 0 and 5 both match; give 0 age=0 and 5 age=2 half-lives
    ts = spark.createDataFrame(
        [(d, 1000.0 if d != 5 else 1000.0 - 2 * 60.0) for d, _ in _DOCS],
        "doc_id long, ts_s double")
    plain = {r.doc_id: r.score for r in
             decay_topk(tf, stats, scal, ts, "spark join fast",
                        now_s=1000.0, half_life_s=1e15, k=10).collect()}
    decayed = {r.doc_id: r.score for r in
               decay_topk(tf, stats, scal, ts, "spark join fast",
                          now_s=1000.0, half_life_s=60.0, k=10).collect()}
    # age-0 docs unchanged, the 2-half-life doc is quartered
    assert decayed[0] == pytest.approx(plain[0], abs=1e-5)
    assert decayed[5] == pytest.approx(plain[5] / 4.0, abs=1e-5)


def test_decay_missing_ts_is_kept_at_zero(index, spark):
    _, tf, stats, scal = index
    ts = spark.createDataFrame([(0, 1000.0)], "doc_id long, ts_s double")
    got = {r.doc_id: r.score for r in
           decay_topk(tf, stats, scal, ts, "spark join fast",
                      now_s=1000.0, half_life_s=60.0, k=10).collect()}
    assert got[0] > 0
    # all other candidates present with decay 0, not dropped
    assert {d for d in got if got[d] == 0.0} == {1, 2, 4, 5}


# -- synonym expansion --------------------------------------------------------

def test_synonym_reaches_synonym_only_doc(index, spark):
    _, tf, stats, scal = index
    from searchengine_spark.operators.lexicon import synonym_search_topk

    syn = spark.createDataFrame(
        [("join", "merge", 0.5)], "term string, syn string, weight double")
    hits = {r.doc_id for r in
            synonym_search_topk(tf, stats, scal, "join", syn, k=10).collect()}
    # doc 5 contains merge AND join; every join doc matched; no merge-only
    # doc exists here, so instead verify weighting: with a merge-only query
    # the expansion-only contribution is 0.5x the direct score
    assert hits == {0, 1, 5}

    from searchengine_spark.operators.topk import score_all

    direct_merge = {r.doc_id: r.score
                    for r in score_all(tf, stats, scal, "merge").collect()}
    via_syn = {r.doc_id: r.score for r in
               synonym_search_topk(tf, stats, scal, "zzzmissing", spark.createDataFrame(
                   [("zzzmissing", "merge", 0.5)],
                   "term string, syn string, weight double"), k=10).collect()}
    assert via_syn.keys() == direct_merge.keys()
    for d in via_syn:
        assert via_syn[d] == pytest.approx(0.5 * direct_merge[d], abs=1e-5)


def test_synonym_expansion_accumulates_weights(spark, index):
    from searchengine_spark.operators.lexicon import expand_synonym_terms
    from searchengine_spark.operators.topk import query_terms_df

    qt = query_terms_df(spark, "join merge")
    syn = spark.createDataFrame(
        [("join", "merge", 0.5)], "term string, syn string, weight double")
    exp = {r.term: r.qf for r in expand_synonym_terms(qt, syn).collect()}
    # merge reachable directly (1.0) AND via join's synonym (0.5) -> 1.5
    assert exp == {"join": pytest.approx(1.0), "merge": pytest.approx(1.5)}


# -- filtered retrieval + hit counting ----------------------------------------

def test_filtered_topk_restricts_but_keeps_global_stats(index, spark):
    from searchengine_spark.operators.topk import filtered_topk, score_all

    _, tf, stats, scal = index
    allowed = spark.createDataFrame([(0,), (5,)], "doc_id long")
    got = {r.doc_id: r.score for r in
           filtered_topk(tf, stats, scal, allowed,
                         "spark join fast", k=10).collect()}
    assert set(got) == {0, 5}
    # scores equal the UNfiltered scores of the same docs (global stats)
    full = {r.doc_id: round(r.score, 6)
            for r in score_all(tf, stats, scal, "spark join fast").collect()}
    for d in got:
        assert got[d] == pytest.approx(full[d], abs=1e-6)


def test_match_count_or_and_semantics(index):
    from searchengine_spark.operators.topk import match_count

    _, tf, _, _ = index
    # corpus: spark in {0,4,5}, join in {0,1,5}, fast in {0,2,5}
    or_n = match_count(tf, "spark join fast").collect()[0]["n_hits"]
    and_n = match_count(tf, "spark join fast",
                        require_all=True).collect()[0]["n_hits"]
    assert or_n == 5   # docs 0,1,2,4,5
    assert and_n == 2  # docs 0,5 have all three
    # duplicate query terms collapse (distinct-term AND)
    and_dup = match_count(tf, "spark spark join fast",
                          require_all=True).collect()[0]["n_hits"]
    assert and_dup == and_n


def test_bm25f_indexed_matches_corpus_pass(spark, tmp_path):
    """The persisted field-split layout answers identically to the
    corpus-pass plan after a parquet roundtrip, and the query-term
    filter reaches the scan."""
    from searchengine_spark.operators.fielded import (
        bm25f_topk,
        bm25f_topk_indexed,
        build_split_field_tf,
    )

    rows = [(i, f"target alpha beta w{i} gamma delta eps zeta eta theta "
                f"target iota") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stats = build_term_stats(explode_forward(build_forward(docs)))

    path = str(tmp_path / "ftf")
    build_split_field_tf(docs).write.mode("overwrite").parquet(path)
    ftf = spark.read.parquet(path)

    direct = [(r.doc_id, r.score) for r in
              bm25f_topk(docs, stats, 20, "target gamma", k=20).collect()]
    indexed = [(r.doc_id, r.score) for r in
               bm25f_topk_indexed(ftf, stats, 20, "target gamma",
                                  k=20).collect()]
    assert indexed == direct and direct


def test_msm_topk_count_gate(index):
    """msm=2 on 'spark join fast' keeps only docs with >=2 distinct query
    terms; msm=1 == plain OR ranking; msm clamps to the AND set."""
    from searchengine_spark.operators.topk import msm_topk, score_topk

    _, tf, stats, scalars = index
    q = "spark join fast"

    out2 = msm_topk(tf, stats, scalars, q, min_should_match=2, k=10).collect()
    got2 = {r.doc_id: r.n_matched for r in out2}
    # doc 0: spark+join+fast (3); doc 5: join+fast+spark (3); docs 1/2/4
    # match exactly one term each
    assert got2 == {0: 3, 5: 3}

    or_rank = [r.doc_id for r in
               score_topk(tf, stats, scalars, q, k=10).collect()]
    msm1 = [r.doc_id for r in
            msm_topk(tf, stats, scalars, q, min_should_match=1,
                     k=10).collect()]
    assert msm1 == or_rank

    # msm > n_terms clamps to AND semantics (never "matches nothing")
    clamped = {r.doc_id for r in
               msm_topk(tf, stats, scalars, q, min_should_match=99,
                        k=10).collect()}
    assert clamped == {0, 5}

    # scores agree with the OR-union scores of the same docs (the gate
    # restricts, it does not rescale)
    or_scores = {r.doc_id: round(r.score, 6) for r in
                 score_topk(tf, stats, scalars, q, k=10).collect()}
    for r in out2:
        assert r.score == pytest.approx(or_scores[r.doc_id], abs=2e-6)
