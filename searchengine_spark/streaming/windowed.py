"""Watermarked event-time windowed aggregation (Structured Streaming).

The reference has no notion of event time at all (its Zds.Flow queues are
intra-process pipelining only). This is the Spark-native surface the
north star's streaming requirement implies for analytic rollups over the
transcript/event firehose:

    readStream --withWatermark(ts, late-bound)
               --groupBy(window(ts, W), key)  [tumbling event-time window]
               --append-mode parquet sink     [a window is emitted exactly
                                               once, when the watermark
                                               passes its end]

Late-data semantics (asserted by tests): rows later than the watermark
bound are DROPPED, rows within the bound are aggregated into their
(still-open) window even though earlier rows of later windows already
arrived. State is bounded: closed windows leave the state store.

The logical aggregation is shared with a batch twin
(``windowed_event_agg``) so the driver oracle (DuckDB ``date_trunc``)
checks the same plan the stream runs. Scale: the windowed agg is a
standard hash agg keyed by (window, key) — partial map-side combine, one
shuffle; state per open window x key only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string")


def windowed_event_agg(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling event-time window x event_type -> (n, sum_value).

    Identical logical plan in batch and streaming (pass a watermarked
    streaming DF for the append-mode stream). window_start is formatted
    as a string so cross-engine comparisons are timezone-unambiguous.
    """
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
):
    """File-source stream -> watermarked tumbling-window agg -> append
    parquet sink. ``maxFilesPerTrigger=1`` so each input file is one
    micro-batch (the watermark advances between batches — required for
    append-mode emission and for the late-drop semantics to be exercised
    deterministically). Returns the started StreamingQuery; callers
    ``awaitTermination()`` (trigger=availableNow drains then stops)."""
    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(input_dir)
    )
    agg = windowed_event_agg(src.withWatermark("ts", watermark), window)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
