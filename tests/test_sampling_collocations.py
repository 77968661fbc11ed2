"""Deterministic sampling/splits and PMI collocations vs Python oracles."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest

from searchengine_spark.functions.tokenize import tokenize_py
from searchengine_spark.operators.collocations import bigram_pmi, doc_bigrams
from searchengine_spark.operators.sampling import (
    BUCKETS,
    sample_deterministic,
    split_assign,
    stratified_sample,
)


def _py_bucket(key, salt: str) -> int:
    h = hashlib.md5(f"{key}|{salt}".encode()).hexdigest()
    return int(h[:8], 16) % BUCKETS


@pytest.fixture(scope="module")
def ids(spark):
    return spark.createDataFrame(
        [(i, "en" if i % 4 else "fr") for i in range(400)],
        "doc_id long, lang string",
    )


def test_split_assign_matches_python_and_is_total(spark, ids):
    got = {r.doc_id: r.split for r in split_assign(ids).collect()}
    assert len(got) == 400
    for i, s in got.items():
        b = _py_bucket(i, "split-v1")
        want = "train" if b < 9000 else ("val" if b < 9500 else "test")
        assert s == want, (i, b, s, want)


def test_split_stable_under_repartition(spark, ids):
    a = {r.doc_id: r.split for r in split_assign(ids).collect()}
    b = {r.doc_id: r.split
         for r in split_assign(ids.repartition(7, "lang")).collect()}
    assert a == b


def test_sample_subset_monotone(spark, ids):
    s2 = {r.doc_id for r in sample_deterministic(ids, 0.2).collect()}
    s5 = {r.doc_id for r in sample_deterministic(ids, 0.5).collect()}
    assert s2 <= s5
    assert 0.1 < len(s2) / 400 < 0.3 and 0.4 < len(s5) / 400 < 0.6


def test_stratified_keeps_rare_full(spark, ids):
    out = stratified_sample(ids, rates={"en": 0.25}, strata_col="lang",
                            default_rate=1.0).collect()
    langs = Counter(r.lang for r in out)
    assert langs["fr"] == 100              # default_rate=1.0 keeps all
    assert 40 < langs["en"] < 110          # ~25% of 300


CORPUS = [
    (0, "new york is big new york is old"),
    (1, "new york and san francisco"),
    (2, "san francisco fog; new york rain"),
    (3, "the cat sat on the mat"),
    (4, "new york new york"),
]


def _py_pmi(min_count: int):
    uni: Counter = Counter()
    big: Counter = Counter()
    for _, text in CORPUS:
        t = tokenize_py(text)
        uni.update(t)
        big.update(" ".join(p) for p in zip(t, t[1:]))
    t1, t2 = sum(uni.values()), sum(big.values())
    out = {}
    for bg, n in big.items():
        if n < min_count:
            continue
        a, b = bg.split(" ")
        out[bg] = (n, math.log((n / t2) / ((uni[a] / t1) * (uni[b] / t1))))
    return out


def test_doc_bigrams_shape(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    rows = doc_bigrams(docs).collect()
    got = Counter((r.doc_id, r.bigram) for r in rows)
    assert got[(4, "new york")] == 2 and got[(4, "york new")] == 1
    assert got[(3, "the cat")] == 1


def test_bigram_pmi_vs_python(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    want = _py_pmi(min_count=2)
    got = {r.bigram: (r.n, r.pmi) for r in
           bigram_pmi(docs, min_count=2, k=100).collect()}
    assert set(got) == set(want)
    for bg, (n, pmi) in want.items():
        assert got[bg][0] == n
        assert abs(got[bg][1] - pmi) < 1e-6
    # "new york" is the dominant collocation by count
    assert got["new york"][0] == max(n for n, _ in got.values())


def test_doc_logprob_vs_python(spark):
    import math as _m
    from searchengine_spark.operators.forward import (
        build_forward, build_term_stats, explode_forward)
    from searchengine_spark.operators.textstats import doc_unigram_logprob

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    fwd = build_forward(docs)
    tf_table = explode_forward(fwd)
    stats = build_term_stats(tf_table)
    from searchengine_spark.functions.tokenize import tokenize_py as tok
    toks = {d: tok(t) for d, t in CORPUS}
    T = sum(len(v) for v in toks.values())
    cf = Counter(t for v in toks.values() for t in v)
    want = {}
    for d, v in toks.items():
        if not v:
            continue
        want[d] = sum(_m.log(cf[t] / T) for t in v) / len(v)
    got = {r.doc_id: r.avg_logprob
           for r in doc_unigram_logprob(tf_table, stats, T).collect()}
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9


def test_source_divergence_vs_python(spark):
    import math as _m
    from searchengine_spark.operators.forward import (
        build_forward, explode_forward)
    from searchengine_spark.operators.textstats import source_divergence
    from searchengine_spark.functions.tokenize import tokenize_py as tok

    rows = [(d, t, "a" if d % 2 == 0 else "b") for d, t in CORPUS]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    tf_table = explode_forward(build_forward(docs))
    toks = {d: tok(t) for d, t, _ in rows}
    T = sum(len(v) for v in toks.values())
    cf = Counter(t for v in toks.values() for t in v)
    want = {}
    for src in ("a", "b"):
        cfs = Counter(t for d, v in toks.items()
                      for t in v if (("a" if d % 2 == 0 else "b") == src))
        ts = sum(cfs.values())
        want[src] = sum((c / ts) * _m.log((c / ts) / (cf[t] / T))
                        for t, c in cfs.items())
    got = {r.source: r.kl for r in source_divergence(
        tf_table, docs.select("doc_id", "source"), T).collect()}
    assert set(got) == set(want)
    for s in want:
        assert abs(got[s] - want[s]) < 1e-9
    assert all(v >= -1e-12 for v in got.values())  # KL non-negative


def test_repetition_stats_vs_python(spark):
    from searchengine_spark.functions.tokenize import tokenize_py as tok
    from searchengine_spark.operators.textstats import repetition_stats

    rows = [
        (0, "spam spam spam spam spam spam"),        # one 3-gram repeated
        (1, "the quick brown fox jumps over dogs"),  # all distinct
        (2, "ab cd"),                                 # < 3 tokens
        (3, ""),                                      # empty
        (4, "x y x y x y x y"),                       # alternating loop
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_ngrams, r.top_ngram_frac)
           for r in repetition_stats(docs, n=3).collect()}
    for d, text in rows:
        t = tok(text)
        grams = [" ".join(t[i:i + 3]) for i in range(len(t) - 2)]
        if grams:
            from collections import Counter as _C
            want = (len(grams),
                    round(max(_C(grams).values()) / len(grams), 6))
        else:
            want = (0, 0.0)
        assert got[d] == want, (d, got[d], want)
    assert got[0][1] == 1.0 and got[1][1] < 0.3


def test_pii_scan(spark):
    from searchengine_spark.operators.textstats import pii_scan

    docs = spark.createDataFrame(
        [
            (0, "mail me at a.b+c@example.org or visit https://x.io/p?q=1"),
            (1, "call +1 (555) 123-4567; server at 10.0.0.1 and 8.8.8.8"),
            (2, "clean text, no identifiers"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.emails, r.urls, r.phones, r.ipv4s)
           for r in pii_scan(docs).collect()}
    assert got[0][0] == 1 and got[0][1] == 1
    assert got[1][2] >= 1 and got[1][3] == 2
    assert got[2] == (0, 0, 0, 0)
