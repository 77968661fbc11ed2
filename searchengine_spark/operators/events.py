"""Event-stream session operators: gap-based sessionization, per-session
rollups, per-key top-N, and JSON property extraction.

These extend the engine beyond the reference's search surface into the
log/event side of a training-data pipeline (activity sessionization is
the standard precursor to building per-user interaction transcripts).
Everything is expressed as Catalyst window/agg/JSON expressions — zero
Python in the data path.

Scale shape (the part that matters at 10^12 events):

- ``sessionize`` costs exactly ONE shuffle: ``Window.partitionBy(user_id)``
  hash-partitions by user once; the running-sum Window node sits directly
  on the lag Window node with identical (partitionBy, orderBy), so the
  exchange and the in-partition sort are reused (EnsureRequirements sees
  the child already satisfies both), and the downstream per-session
  groupBy reuses the same user_id hash partitioning — no second shuffle.
- ``sessionize`` is right while per-user data fits one task. A
  mega-user (bot with 10^8 events) breaks it — window partitioning is
  NOT rescued by AQE skew handling (that applies to joins) — so
  ``sessionize_bucketed`` is the skew-safe twin: phase 1 sessionizes
  within (user, time-bucket) partitions (skew bounded by the bucket
  width, tunable), phase 2 stitches sessions across bucket boundaries
  on a per-(user, bucket) SUMMARY table (one row per user-bucket —
  thousands of rows per mega-user, not millions), then a co-partitioned
  join carries the global numbering back. Bit-identical output to
  ``sessionize`` (asserted, incl. sessions spanning 3+ buckets).
- ``top_events_per_user`` uses row_number + filter, which Spark executes
  as a per-partition sort with rank-pushdown (WindowGroupLimit since
  Spark 3.5): only the running top-N per user is kept per task, not the
  full sorted partition.
- ``props_stats`` uses ``get_json_object`` (JVM, codegen) — the JSON
  never reaches Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _event_order():
    """Deterministic total order within a user: ts then event_id
    tie-break. Built lazily — classic (non-Connect) pyspark Columns
    need an active SparkContext, so module import must not create them."""
    return [F.col("ts").asc(), F.col("event_id").asc()]


def _us(c) -> "F.Column":
    """Epoch microseconds; parquet event timestamps read as TIMESTAMP_NTZ,
    which unix_micros rejects — cast first (session TZ pinned to UTC, so
    the NTZ->LTZ cast is a stable identity on the stored instant)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(col.cast("timestamp"))


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Assign a per-user ``session_seq`` (1-based) to every event: a new
    session starts when the gap since the user's previous event exceeds
    ``gap_minutes``. One shuffle (hash by user_id); the boundary-flag and
    running-sum Window nodes share that exchange and its in-partition
    sort (asserted by test_session_rollup_single_shuffle)."""
    w = Window.partitionBy("user_id").orderBy(*_event_order())
    gap_us = F.lit(int(gap_minutes) * 60 * 1_000_000)
    prev_us = F.lag(_us("ts")).over(w)
    boundary = F.when(
        prev_us.isNull() | (_us("ts") - prev_us > gap_us), 1
    ).otherwise(0)
    running = Window.partitionBy("user_id").orderBy(*_event_order()) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        events.withColumn("_new_session", boundary)
        .withColumn("session_seq",
                    F.sum("_new_session").over(running).cast("long"))
        .drop("_new_session")
    )


def sessionize_bucketed(events: DataFrame, gap_minutes: int = 30,
                        bucket_hours: int = 24) -> DataFrame:
    """Skew-safe ``sessionize``: same output, but no single-user
    partition ever exists.

    Phase 1 — local: window over (user_id, bucket) assigns each event a
    LOCAL session index within its time bucket (bucket width >> gap).
    Phase 2 — stitch: per (user_id, bucket) summary rows (n local
    sessions, first/last event time) are windowed per user over bucket
    order; bucket b's sessions merge into b's predecessor iff the real
    event gap across the boundary <= gap. With adj_b = n_local_b -
    merge_b (sessions NEWLY started in b), the global index of local
    session i in bucket b is prefix(adj)_{<b} + i - merge_b — one
    formula covers chains of merges across 3+ buckets.
    Phase 3 — a co-partitioned join on (user_id, bucket) carries
    (offset, merge) back to the events.

    Cost: one shuffle of the events by (user_id, bucket), one window
    over the tiny summary, one co-partitioned join. The heaviest task
    holds one user-bucket, not one user."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    bucket_us = int(bucket_hours) * 3600 * 1_000_000
    ev = events.withColumn("_us", _us("ts")) \
        .withColumn("_bkt", (F.col("_us") / F.lit(bucket_us)).cast("long"))

    wloc = Window.partitionBy("user_id", "_bkt").orderBy(*_event_order())
    prev_us = F.lag("_us").over(wloc)
    local_flag = F.when(
        prev_us.isNull() | (F.col("_us") - prev_us > gap_us), 1
    ).otherwise(0)
    wloc_run = Window.partitionBy("user_id", "_bkt") \
        .orderBy(*_event_order()) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = ev.withColumn("_flag", local_flag) \
        .withColumn("_local_seq", F.sum("_flag").over(wloc_run))

    summary = ev.groupBy("user_id", "_bkt").agg(
        F.max("_local_seq").alias("_n_local"),
        F.min("_us").alias("_first_us"),
        F.max("_us").alias("_last_us"),
    )
    wuser = Window.partitionBy("user_id").orderBy("_bkt")
    merge = F.when(
        F.col("_first_us") - F.lag("_last_us").over(wuser) <= gap_us, 1
    ).otherwise(0)
    summary = summary.withColumn("_merge", merge)
    wprefix = Window.partitionBy("user_id").orderBy("_bkt") \
        .rowsBetween(Window.unboundedPreceding, -1)
    summary = summary.withColumn(
        "_offset",
        F.coalesce(F.sum(F.col("_n_local") - F.col("_merge")).over(wprefix),
                   F.lit(0)),
    ).select("user_id", "_bkt", "_offset", "_merge")

    out = ev.join(summary, ["user_id", "_bkt"]).withColumn(
        "session_seq",
        (F.col("_offset") + F.col("_local_seq") - F.col("_merge"))
        .cast("long"),
    )
    return out.drop("_us", "_bkt", "_flag", "_local_seq", "_offset",
                    "_merge")


def session_rollup(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_seq, n_events, duration_us, sum_value) per
    session. duration is integer microseconds (exact — no float
    accumulation), sum_value is rounded downstream by callers."""
    return (
        sessionize(events, gap_minutes)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            (_us(F.max("ts")) - _us(F.min("ts")))
            .alias("duration_us"),
            F.sum("value").alias("sum_value"),
        )
    )


def top_events_per_user(events: DataFrame, n: int = 2) -> DataFrame:
    """Top-``n`` events per user by value (event_id tie-break) — the
    per-key top-N pattern (rank-pushdown keeps only the running top-N
    per task; no full per-user sort materializes)."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        events.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(n))
        .select("user_id", F.col("rank").cast("long").alias("rank"),
                "event_id", "value")
    )


def props_stats(events: DataFrame, key: str = "k") -> DataFrame:
    """Per-event_type stats of an integer JSON property extracted with
    ``get_json_object`` (JVM path expression; whole-stage codegen)."""
    k = F.get_json_object("props", f"$.{key}").cast("long")
    return (
        events.groupBy("event_type")
        .agg(
            F.count(k).alias("n_with_key"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
    )
