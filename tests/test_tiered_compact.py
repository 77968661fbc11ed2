"""Tiered merge policy for the incremental index: same-tier generations
merge when max_per_tier accumulate, cascading up tiers — and the tiered
index is bit-identical (as a tf multiset) to the never-tiered one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.segments import segments_to_tf
from searchengine_spark.sources.synth import transcripts_df
from searchengine_spark.streaming.incremental import (
    _tier,
    compact,
    process_batch,
    read_state,
    tiered_compact,
)


def _tf_set(df):
    return set(map(tuple, df.select("term", "doc_id", "tf", "dl").collect()))


def _feed_batches(spark, index_dir: str, n_batches: int, n_convs: int = 42):
    """Split a deterministic corpus into n_batches conv ranges and run
    them through process_batch in arrival order."""
    corpus = transcripts_df(spark, n_convs=n_convs, seed=11)
    convs = sorted(r["conv_id"] for r in
                   corpus.select("conv_id").distinct().collect())
    step = len(convs) // n_batches
    bounds = [convs[i * step] for i in range(1, n_batches)] + [None]
    lo = None
    for i, hi in enumerate(bounds):
        b = corpus
        if lo is not None:
            b = b.filter(F.col("conv_id") >= lo)
        if hi is not None:
            b = b.filter(F.col("conv_id") < hi)
        process_batch(b, i, index_dir, df_target=64)
        lo = hi
    return corpus


def test_tier_function():
    assert _tier(1, 8) == 0 and _tier(7, 8) == 0
    assert _tier(8, 8) == 1 and _tier(63, 8) == 1
    assert _tier(64, 8) == 2
    assert _tier(0, 8) == 0  # degenerate, clamped


def test_tiered_compact_merges_and_preserves_index(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("tiered") / "idx")
    twin = str(tmp_path_factory.mktemp("tiered") / "twin")
    _feed_batches(spark, idx, n_batches=7)
    _feed_batches(spark, twin, n_batches=7)

    st0 = read_state(idx)
    assert len(st0["generations"]) == 7
    merges = tiered_compact(spark, idx, tier_factor=8, max_per_tier=3,
                            df_target=64)
    st1 = read_state(idx)
    # equal-size gens share a tier: 7 -> merge 3 oldest -> merge 3 more
    # -> [3n, 3n, n]; the 3n pair doesn't overflow max_per_tier=3
    assert len(merges) >= 2
    assert len(st1["generations"]) < 7
    # corpus totals unchanged by merging
    assert st1["n_docs"] == st0["n_docs"]
    assert st1["sum_dl"] == st0["sum_dl"]
    # merged members are gone from disk and state, new gens present
    import os

    for m in merges:
        for name in m["members"]:
            assert not os.path.exists(os.path.join(idx, name))
        assert os.path.exists(os.path.join(idx, m["new"], "segments.parquet"))
        assert os.path.exists(os.path.join(idx, m["new"], "doc_map.parquet"))

    # the invariant that matters: full compaction over the tiered index
    # == full compaction over the never-tiered twin
    tiered_full = compact(spark, idx, df_target=64)
    plain_full = compact(spark, twin, df_target=64)
    assert _tf_set(segments_to_tf(tiered_full)) == \
        _tf_set(segments_to_tf(plain_full))


def test_tiered_compact_cascades_until_no_overflow(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("cascade") / "idx")
    _feed_batches(spark, idx, n_batches=4, n_convs=24)
    # factor 2 pairs cascade: each merge doubles the survivor's tier, so
    # merged generations keep merging upward until every tier holds < 2
    merges = tiered_compact(spark, idx, tier_factor=2, max_per_tier=2,
                            df_target=64)
    st = read_state(idx)
    assert len(merges) >= 2  # at least one cascade step happened
    # policy invariant: no tier overflows after the run
    tiers: dict[int, int] = {}
    for g in st["generations"]:
        t = _tier(g["n_docs"], 2)
        tiers[t] = tiers.get(t, 0) + 1
    assert all(n < 2 for n in tiers.values())
    # corpus totals preserved through every cascade
    assert sum(g["n_docs"] for g in st["generations"]) == st["n_docs"]


def test_tiered_compact_noop_below_threshold(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("noop") / "idx")
    _feed_batches(spark, idx, n_batches=2, n_convs=12)
    assert tiered_compact(spark, idx, tier_factor=8, max_per_tier=3) == []
    assert len(read_state(idx)["generations"]) == 2
