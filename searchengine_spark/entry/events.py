"""Event analytics: windowed counts, sessionization, as-of, bigrams.

Split out of entry_queries.py (round 5); the ordered registry lives there.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from searchengine_spark.entry._shared import (_load)


def q_windowed_counts(spark, sf_dir):
    """Tumbling event-time window x event_type rollup over the events
    table — the batch twin of the watermarked Structured Streaming
    aggregation (streaming/windowed.py stream_windowed_counts; late-data
    semantics asserted by test_stream_windowed_counts_watermark_semantics).
    Window boundaries are epoch-aligned hours, so DuckDB date_trunc is an
    exact oracle."""
    from searchengine_spark.streaming.windowed import windowed_event_agg

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return windowed_event_agg(events, window="1 hour")


SQL_WINDOWED_COUNTS = """SELECT
  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type, count(*)::BIGINT AS n, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2"""


def q_sessionized_counts(spark, sf_dir, gap_minutes: int = 30):
    """Gap-based sessionization rollup (operators/events.py sessionize):
    one shuffle on user_id, lag + running-sum windows sharing the
    exchange+sort, per-session agg reusing the partitioning. Duration is
    integer microseconds so the oracle match is exact (no float drift)."""
    from searchengine_spark.operators.events import session_rollup

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = session_rollup(events, gap_minutes=gap_minutes)
    return out.select(
        "user_id", "session_seq", "n_events", "duration_us",
        F.round("sum_value", 6).alias("sum_value"),
    )


SQL_SESSIONIZED_COUNTS = """WITH flagged AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR date_diff('microsecond', lag(ts) OVER w, ts) > 30*60*1000000
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, value,
    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq::BIGINT AS session_seq,
  count(*)::BIGINT AS n_events,
  date_diff('microsecond', min(ts), max(ts))::BIGINT AS duration_us,
  round(sum(value), 6) AS sum_value
FROM sess GROUP BY 1, 2"""


def q_sessionized_counts_bucketed(spark, sf_dir, gap_minutes: int = 30):
    """Same rollup as sessionized_counts but through the SKEW-SAFE
    two-phase sessionizer (operators/events.py sessionize_bucketed:
    (user, time-bucket) windows + summary-table stitching — no
    single-user partition ever exists). Same oracle: the two must be
    bit-identical."""
    from searchengine_spark.operators.events import _us, sessionize_bucketed

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = (
        sessionize_bucketed(events, gap_minutes=gap_minutes,
                            bucket_hours=24)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            (_us(F.max("ts")) - _us(F.min("ts"))).alias("duration_us"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
    return out.select("user_id", "session_seq", "n_events", "duration_us",
                      "sum_value")


def q_user_top_events(spark, sf_dir, n: int = 2):
    """Per-key top-N (row_number + filter; rank-pushdown keeps only the
    running top-N per task — no full per-user sort materializes)."""
    from searchengine_spark.operators.events import top_events_per_user

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = top_events_per_user(events, n=n)
    return out.select("user_id", "rank", "event_id",
                      F.round("value", 6).alias("value"))


SQL_USER_TOP_EVENTS = """SELECT user_id, rank, event_id,
  round(value, 6) AS value
FROM (
  SELECT user_id, event_id, value,
    row_number() OVER (PARTITION BY user_id
                       ORDER BY value DESC, event_id) AS rank
  FROM events
) WHERE rank <= 2"""


def q_event_props_stats(spark, sf_dir):
    """Typed JSON property extraction + agg, fully JVM-side
    (get_json_object path expression inside whole-stage codegen; the
    props string never reaches Python)."""
    from searchengine_spark.operators.events import props_stats

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return props_stats(events, key="k")


SQL_EVENT_PROPS_STATS = """SELECT event_type,
  count(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS n_with_key,
  sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
  min(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS min_k,
  max(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS max_k
FROM events GROUP BY 1"""


def q_asof_enrich(spark, sf_dir):
    """As-of join (operators/temporal.py): each purchase event gets the
    most recent prior-or-equal view event of the same user — union +
    one running-window pass, no range-join pair explosion."""
    from searchengine_spark.operators.temporal import asof_join

    ev = _load(spark, sf_dir, "events")
    out = asof_join(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "view"),
        key="user_id", ts="ts", tiebreak="event_id",
        payload=["event_id", "value"],
    )
    return out.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ref_event_id").cast("long").alias("ref_event_id"),
        F.round("ref_value", 6).alias("ref_value"),
    )


SQL_ASOF_ENRICH = """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
v AS (SELECT * FROM events WHERE event_type = 'view')
SELECT p.event_id, p.user_id, v.event_id AS ref_event_id,
  round(v.value, 6) AS ref_value
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts"""


def q_event_bigrams(spark, sf_dir):
    """Adjacent event-type transition counts per user (sequence mining);
    output bounded by |types|^2 regardless of row count."""
    from searchengine_spark.operators.temporal import event_type_bigrams

    return event_type_bigrams(_load(spark, sf_dir, "events"))


SQL_EVENT_BIGRAMS = """WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type
  FROM events)
SELECT prev_type, event_type, count(*)::BIGINT AS n_pairs
FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2"""
