"""Mixture-weighted sampling and cardinality profiling: driver-side math
checked exactly, Spark membership checked against the pure-Python md5
bucket oracle, HLL sketch error pinned against exact."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.mixing import mix_sources, mixture_fractions
from searchengine_spark.operators.profiling import group_cardinality


def _py_bucket(key: str, salt: str) -> int:
    h = hashlib.md5(f"{key}|{salt}".encode()).hexdigest()
    return int(h[:8], 16) % 10_000


def test_mixture_fractions_math():
    counts = {"a": 100, "b": 100, "c": 100}
    target = {"a": 0.5, "b": 0.25, "c": 0.25}
    fr = mixture_fractions(counts, target)
    # 'a' binds: T = 100/0.5 = 200 -> a keeps all, b/c keep half
    assert fr == {"a": 1.0, "b": 0.5, "c": 0.5}


def test_mixture_fractions_skewed_counts():
    counts = {"big": 900, "small": 100}
    fr = mixture_fractions(counts, {"big": 0.5, "small": 0.5})
    # small binds (needs 50% of output but has only 100 rows): T = 200
    assert fr["small"] == 1.0
    assert fr["big"] == pytest.approx(100 / 900)


@pytest.fixture(scope="module")
def mix_docs(spark):
    rows = [(i, "srcA" if i < 800 else "srcB") for i in range(1000)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mix_sources_membership_is_hash_pure(spark, mix_docs):
    target = {"srcA": 0.5, "srcB": 0.5}
    kept = {r.doc_id for r in mix_sources(mix_docs, target).collect()}
    # reproduce: srcB binds (200 rows for 50%) -> T=400, srcA frac=0.25
    thr = {"srcA": int(0.25 * 10_000), "srcB": 10_000}
    want = {
        i for i in range(1000)
        if _py_bucket(str(i), "mix-v1") < thr["srcA" if i < 800 else "srcB"]
    }
    assert kept == want
    # and it is a real downsample in the right proportions
    n_a = sum(1 for i in kept if i < 800)
    n_b = sum(1 for i in kept if i >= 800)
    assert n_b == 200 and abs(n_a - 200) < 40


def test_mix_sources_deterministic(spark, mix_docs):
    target = {"srcA": 0.5, "srcB": 0.5}
    a = sorted(r.doc_id for r in
               mix_sources(mix_docs.repartition(7), target).collect())
    b = sorted(r.doc_id for r in
               mix_sources(mix_docs.coalesce(1), target).collect())
    assert a == b  # partitioning-independent membership


def test_group_cardinality_exact_and_sketch(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [("g%d" % (i % 3), "v%d" % int(v))
            for i, v in enumerate(rng.zipf(1.5, 30000) % 5000)]
    df = spark.createDataFrame(rows, "g string, v string").repartition(8)
    exact = {r.g: r.n_distinct
             for r in group_cardinality(df, "g", "v").collect()}
    want: dict[str, set] = {}
    for g, v in rows:
        want.setdefault(g, set()).add(v)
    assert exact == {g: len(s) for g, s in want.items()}
    approx = {r.g: r.n_distinct
              for r in group_cardinality(df, "g", "v", approx=True,
                                         rsd=0.05).collect()}
    for g, ex in exact.items():
        assert abs(approx[g] - ex) <= 3 * 0.05 * ex, (g, ex, approx[g])


def test_weighted_sample_membership_is_hash_pure(spark):
    from searchengine_spark.operators.sampling import weighted_sample

    rows = [(i, [0.0, 0.25, 0.5, 0.75, 1.0][i % 5]) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    kept = {r.doc_id for r in weighted_sample(df, "w").collect()}
    want = {i for i, w in rows
            if _py_bucket(str(i), "wsample-v1") < int(w * 10_000)}
    assert kept == want
    assert not any(i % 5 == 0 for i in kept)   # weight 0 never kept
    assert sum(1 for i in range(500) if i % 5 == 4) == \
        sum(1 for i in kept if i % 5 == 4)      # weight 1 always kept


def test_keep_best_picks_highest_score_with_tiebreak(spark):
    from searchengine_spark.operators.dedup import keep_best

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, component long")
    scores = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (10, 0.1), (11, 0.1)],
        "doc_id long, quality double")
    got = {r.doc_id: r.keep for r in keep_best(comp, scores).collect()}
    # component 1: docs 2 and 3 tie at 0.9 -> min doc_id (2) wins
    assert got == {1: False, 2: True, 3: False, 10: True, 11: False}


def test_mixture_fractions_tolerates_absent_sources(spark, mix_docs):
    from searchengine_spark.operators.mixing import (
        mix_sources,
        mixture_fractions,
    )

    # a target source with zero corpus rows is excluded, not a KeyError
    fr = mixture_fractions({"a": 100}, {"a": 0.5, "ghost": 0.5})
    assert fr == {"a": 1.0}
    assert mixture_fractions({}, {"ghost": 1.0}) == {}
    kept = mix_sources(
        mix_docs, {"srcA": 0.4, "srcB": 0.4, "ghost": 0.2}).count()
    assert kept > 0  # present sources still sampled
