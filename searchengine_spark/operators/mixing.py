"""Source mixing: hit a target corpus mixture by deterministic downsampling.

Training-data recipes are specified as mixture weights ("20% source A, the
rest uniform"); the corpus on disk almost never has those proportions. This
operator computes, per source, the largest keep-fraction such that the
*kept* corpus matches the target weights exactly (the binding source keeps
100%; every other source is downsampled proportionally), then applies the
same content-hash bucket filter as ``operators/sampling`` — membership is a
pure function of (doc_id, salt), stable across runs, partitionings, and
engines.

Scale shape: one count-per-source aggregation (output bounded by the number
of sources — driver-tiny), then a stateless JVM row filter; no shuffle of
the data itself, no UDF, no join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.operators.sampling import stratified_sample


def mixture_fractions(
    counts: dict[str, int], target: dict[str, float]
) -> dict[str, float]:
    """Per-source keep-fractions realizing ``target`` proportions.

    The feasible output size is T = min_s counts[s] / target[s] (any larger
    and some source would need more rows than it has); the fraction for s
    is then target[s] * T / counts[s], clamped to 1.0 for the binding
    source. Pure driver-side arithmetic over the tiny per-source counts.

    A target source with NO rows in the corpus cannot contribute and is
    excluded from both the feasibility min and the output (the realized
    mixture renormalizes over the present sources) — strictly honoring
    it would force T = 0, i.e. an empty corpus.
    """
    present = [s for s in target if target[s] > 0 and counts.get(s, 0) > 0]
    if not present:
        return {}
    t = min(counts[s] / target[s] for s in present)
    return {s: min(target[s] * t / counts[s], 1.0) for s in present}


def mix_sources(
    docs: DataFrame,
    target: dict[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """Downsample ``docs`` so the kept rows follow the ``target`` mixture.
    Sources absent from ``target`` are dropped (default_rate=0)."""
    counts = {
        r[strata_col]: r["c"]
        for r in docs.groupBy(strata_col)
        .agg(F.count("*").alias("c"))
        .collect()
    }
    fractions = mixture_fractions(counts, target)
    return stratified_sample(
        docs, rates=fractions, strata_col=strata_col,
        default_rate=0.0, key_col=key_col, salt=salt,
    )
