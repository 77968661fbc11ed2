"""Deterministic sampling and dataset splits for training-data pipelines.

`df.sample()` is seed-dependent per partition layout — a repartition or a
retry changes WHICH rows are sampled, which is unacceptable for a dataset
card ("train split = these documents, forever"). These operators key every
decision on a content-stable hash of the row's ID plus a salt string:

    bucket(id) = int64(first 8 hex chars of md5(id || '|' || salt)) % 10000

so membership is a pure function of (id, salt) — stable across runs,
cluster sizes, partitionings, and engines (md5 is the same everywhere,
which also makes every decision DuckDB-oracle-checkable; the reference
engine has no sampling surface at all, SearchEngine indexes everything).

Scale shape: each operator is a stateless JVM row-filter / projection
(md5 + conv + pmod inside whole-stage codegen) — no shuffle, no UDF, no
driver state; the stratified variant broadcasts only the tiny rate map.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(key: Column, salt: str) -> Column:
    """Deterministic bucket in [0, 10000) from md5(key || '|' || salt)."""
    h = F.md5(F.concat(key.cast("string"), F.lit("|" + salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % BUCKETS


def sample_deterministic(
    df: DataFrame, rate: float, key_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Keep rows whose bucket < rate * 10000. Exact-rate in expectation,
    exactly reproducible always."""
    return df.filter(hash_bucket(F.col(key_col), salt) < int(rate * BUCKETS))


def split_assign(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    key_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Add a ``split`` column assigning each row to one named split with
    the given weights (summing to ~1.0). Assignment is by cumulative
    bucket thresholds, so a row's split never changes when OTHER splits'
    weights are refined proportionally."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    b = hash_bucket(F.col(key_col), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = b < int(round(acc * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    default_rate: float = 0.0,
    key_col: str = "doc_id",
    salt: str = "strata-v1",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. keep 100% of rare
    languages, 10% of the dominant one). The rate map is a when-chain —
    tiny, compiled into the row filter; no join, no shuffle."""
    rate = None
    for k, v in sorted(rates.items()):
        cond = F.col(strata_col) == k
        rate = F.when(cond, v) if rate is None else rate.when(cond, v)
    rate = (F.lit(default_rate) if rate is None
            else rate.otherwise(default_rate))
    return df.filter(
        hash_bucket(F.col(key_col), salt)
        < (rate * BUCKETS).cast("long")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "wsample-v1",
) -> DataFrame:
    """Per-row weighted deterministic sampling: keep a row with
    probability equal to its ``weight_col`` value in [0, 1] (e.g. a
    quality score — the "data diet" move: keep good docs surely, bad
    docs rarely), decided by the same content-stable hash bucket as the
    other samplers. Membership is a pure function of (key, salt, weight)
    — reproducible across runs and engines; still a stateless row filter,
    no shuffle."""
    thr = F.floor(F.col(weight_col) * BUCKETS).cast("long")
    return df.filter(hash_bucket(F.col(key_col), salt) < thr)
