"""Distribution profiling: per-group score quantiles, exact and sketched.

Corpus cleaning needs thresholds ("drop the bottom decile of quality per
source"); picking them requires the score distribution. Two paths:

* ``score_quantiles`` — EXACT percentiles via Spark's ``percentile``
  aggregate (linear interpolation, same definition as DuckDB's
  ``quantile_cont``). Exact percentile buffers every value of a group in
  the agg state, so it is the *validation* path: run it at test scale to
  certify the sketch, never on 100 TB.
* ``score_quantiles_approx`` — ``percentile_approx`` (Greenwald-Khanna
  sketch, bounded state ~O(accuracy), mergeable across partitions). This
  is the production path at scale: one map-side-combined aggregation,
  state independent of group size. ``tests/test_profiling`` pins the
  sketch's error against the exact path.

Output is exploded to (group, pct, value) rows — flat, hashable, driver-
canonicalizer-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PROBS = (0.1, 0.25, 0.5, 0.75, 0.9)


def _explode_probs(agg: DataFrame, probs: tuple[float, ...],
                   group_col: str) -> DataFrame:
    pcts = F.array(*[F.lit(float(p)) for p in probs])
    return (
        agg.select(group_col, F.arrays_zip(pcts.alias("pct"),
                                           F.col("_qs").alias("value")).alias("_z"))
        .select(group_col, F.explode("_z").alias("_e"))
        .select(
            group_col,
            F.round(F.col("_e.pct"), 6).alias("pct"),
            # 5 decimals: interpolation arithmetic can flip the 6th decimal
            # between engines (same discipline as embedding cosine).
            F.round(F.col("_e.value"), 5).alias("value"),
        )
    )


def score_quantiles(
    scored: DataFrame,
    score_col: str,
    group_col: str = "source",
    probs: tuple[float, ...] = DEFAULT_PROBS,
) -> DataFrame:
    """Exact per-group percentiles -> (group, pct, value)."""
    pcts = F.array(*[F.lit(float(p)) for p in probs])
    agg = scored.groupBy(group_col).agg(
        F.percentile(F.col(score_col), pcts).alias("_qs")
    )
    return _explode_probs(agg, probs, group_col)


def group_cardinality(
    df: DataFrame,
    group_col: str,
    value_col: str,
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group distinct-value counts -> (group, n_distinct).

    exact (default): ``count(DISTINCT ...)`` — Spark expands it to a
    (group, value) pre-dedup shuffle plus a re-agg; exact but state grows
    with the true cardinality. The validation path.

    approx=True: HyperLogLog++ (``approx_count_distinct``) — ONE
    map-side-combined aggregation, O(1/rsd²) state per group, mergeable —
    the profile you actually run on 100 TB. tests/ pin its error vs exact.
    """
    agg = (
        F.approx_count_distinct(value_col, rsd)
        if approx
        else F.countDistinct(value_col)
    )
    return df.groupBy(group_col).agg(agg.cast("long").alias("n_distinct"))


def score_quantiles_approx(
    scored: DataFrame,
    score_col: str,
    group_col: str = "source",
    probs: tuple[float, ...] = DEFAULT_PROBS,
    accuracy: int = 10000,
) -> DataFrame:
    """Sketched per-group percentiles (GK, mergeable, bounded state) ->
    (group, pct, value). The 100 TB path."""
    pcts = F.array(*[F.lit(float(p)) for p in probs])
    agg = scored.groupBy(group_col).agg(
        F.percentile_approx(F.col(score_col), pcts, F.lit(accuracy)).alias("_qs")
    )
    return _explode_probs(agg, probs, group_col)
