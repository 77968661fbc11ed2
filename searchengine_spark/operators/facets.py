"""Histogram facets over a search hit set.

The Elasticsearch ``date_histogram`` / ``histogram`` aggregation analog:
bucket the hit set by a fixed-width interval of a numeric/timestamp doc
attribute and count per bucket — "when were the matching turns said".
Companion to the categorical facet counts in ``engine.search_facets``.

Scale shape: the hit set is k rows — broadcast it onto the doc store, so
the attribute lookup is a broadcast hash join pruned to k rows, then one
tiny agg. Empty buckets are not emitted (ES ``min_doc_count: 1``
semantics); a serving layer can densify the k-row result driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def facet_ranges(
    hits: DataFrame,
    doc_attr: DataFrame,
    ranges: list[tuple[str, float | None, float | None]],
    attr: str = "n_chars",
) -> DataFrame:
    """Explicit range buckets over the hit set — the ES ``range``
    aggregation analog: each (key, from, to) is a half-open [from, to)
    bucket (None = unbounded); a doc counts in EVERY range it falls in
    (ES overlap semantics), and every requested range is emitted even at
    count 0 (unlike the histogram's min_doc_count=1).

    Plan shape: broadcast the k-row hit set onto the attribute slice,
    ONE agg computing all ranges as conditional counts (no explode, no
    per-range job), then a JVM ``stack`` unpivot of the single agg row.

    Output: (key, range_from, range_to, n), one row per requested range.
    """
    joined = doc_attr.join(F.broadcast(hits.select("doc_id")), "doc_id")
    a = F.col(attr).cast("double")
    aggs = []
    for i, (_, lo, hi) in enumerate(ranges):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (a >= float(lo))
        if hi is not None:
            cond = cond & (a < float(hi))
        aggs.append(
            F.coalesce(F.sum(F.when(cond, 1)), F.lit(0))
            .cast("long").alias(f"_r{i}")
        )
    one = joined.agg(*aggs)
    # Unpivot via inline(array(struct(...))) with TYPED literals — caller
    # range keys never enter a SQL string, so a key containing quotes or
    # backslashes is just data, not expression syntax.
    def _dlit(v):
        return F.lit(None).cast("double") if v is None else F.lit(float(v))

    rows = F.array(*[
        F.struct(
            F.lit(str(key)).alias("key"),
            _dlit(lo).alias("range_from"),
            _dlit(hi).alias("range_to"),
            F.col(f"_r{i}").alias("n"),
        )
        for i, (key, lo, hi) in enumerate(ranges)
    ])
    return one.select(F.inline(rows))


def facet_histogram(
    hits: DataFrame,
    doc_attr: DataFrame,
    interval: float,
    attr: str = "ts_s",
    origin: float = 0.0,
) -> DataFrame:
    """Counts of ``hits`` per ``interval``-wide bucket of ``doc_attr.attr``.

    ``hits``: small (doc_id) result set. ``doc_attr``: (doc_id, <attr>)
    slice of the doc store (seconds-since-epoch for a date histogram).
    Buckets are left-closed: bucket b covers [origin + b·interval,
    origin + (b+1)·interval). Docs with a NULL attribute are counted
    under a NULL bucket (ES ``missing``-less default drops them; keeping
    them visible is the safer engine default — filter if unwanted).

    Output: (bucket, bucket_start, n) ordered by bucket.
    """
    bucket = F.floor(
        (F.col(attr).cast("double") - F.lit(float(origin)))
        / F.lit(float(interval))
    ).cast("long")
    return (
        doc_attr.join(F.broadcast(hits.select("doc_id")), "doc_id")
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            "bucket",
            (F.lit(float(origin))
             + F.col("bucket").cast("double") * F.lit(float(interval))
             ).alias("bucket_start"),
            "n",
        )
        .orderBy(F.asc_nulls_last("bucket"))
    )


def facet_stats(
    hits: DataFrame,
    doc_attrs: DataFrame,
    by: str,
    attr: str,
) -> DataFrame:
    """Terms facet with a numeric sub-aggregation — the ES
    ``terms`` + ``stats`` nested-aggregation analog: bucket the hit set
    by a categorical doc attribute and report count plus min/max/avg/sum
    of a numeric attribute per bucket ("matching turns per source, with
    their length profile").

    Plan shape: broadcast the k-row hit set onto the doc-store slice
    (two columns only — Catalyst prunes the scan), ONE hash agg
    computing all five statistics. NULL numeric values are ignored by
    the stats but still counted in ``n`` (ES semantics: doc_count vs
    the sub-agg's own count).

    Output: (value, n, min_v, max_v, avg_v, sum_v) ordered by n desc.
    """
    joined = doc_attrs.join(F.broadcast(hits.select("doc_id")), "doc_id")
    a = F.col(attr).cast("double")
    return (
        joined.groupBy(F.col(by).alias("value"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min(a).alias("min_v"),
            F.max(a).alias("max_v"),
            F.round(F.avg(a), 6).alias("avg_v"),
            F.round(F.sum(a), 6).alias("sum_v"),
        )
        .orderBy(F.desc("n"), F.asc_nulls_last("value"))
    )


def facet_top_hits(
    scored_hits: DataFrame,
    doc_attrs: DataFrame,
    by: str,
    per_bucket: int = 3,
) -> DataFrame:
    """Terms facet with a ``top_hits`` sub-aggregation — per bucket of a
    categorical doc attribute, the best ``per_bucket`` hits by score
    (ES ``terms`` + ``top_hits``): "the top 3 matching turns from every
    source".

    ``scored_hits``: small (doc_id, score) result set — the search did
    the heavy lifting. Plan shape: broadcast the k-row hit set onto the
    doc store, then a per-bucket rank over those k rows only. Spark
    rewrites the rank filter to WindowGroupLimit (a bounded per-group
    heap, no full sort) — the same plan family as per-key top-N in
    events.py, asserted there.

    Output: (value, rank, doc_id, score) ordered by bucket then rank.
    """
    from pyspark.sql import Window

    joined = doc_attrs.join(F.broadcast(scored_hits), "doc_id")
    w = Window.partitionBy(by).orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_bucket)
        .select(F.col(by).alias("value"), "rank", "doc_id", "score")
        .orderBy(F.asc_nulls_last("value"), F.asc("rank"))
    )


def facet_percentiles(
    hits: DataFrame,
    doc_attrs: DataFrame,
    by: str,
    attr: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    approx: bool = False,
) -> DataFrame:
    """Terms facet + percentiles sub-aggregation — the ES
    ``terms`` + ``percentiles`` nested aggregation: per-bucket quantiles
    of a numeric doc attribute over the hit set ("the length
    distribution of matching turns, per source").

    Composes the facet family's broadcast-the-k-row-hits join with the
    profiling module's quantile aggregates: exact ``percentile``
    (linear interpolation, == DuckDB quantile_cont — the validation
    path; state is the k-row hit set at most, so exact is fine even at
    scale HERE, unlike corpus-wide profiling) and the mergeable GK
    sketch twin (``approx=True``) for consistency with the corpus
    profiler. Output: (value, pct, v) — one row per bucket x prob.
    """
    from searchengine_spark.operators.profiling import (
        score_quantiles,
        score_quantiles_approx,
    )

    joined = (
        doc_attrs.join(F.broadcast(hits.select("doc_id")), "doc_id")
        .select(F.col(by).alias("_g"), F.col(attr).cast("double").alias("_a"))
    )
    fn = score_quantiles_approx if approx else score_quantiles
    return (
        fn(joined, "_a", group_col="_g", probs=probs)
        .select(F.col("_g").alias("value"), "pct",
                F.col("value").alias("v"))
        .orderBy(F.asc_nulls_last("value"), F.asc("pct"))
    )
