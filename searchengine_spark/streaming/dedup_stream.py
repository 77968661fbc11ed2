"""Streaming exact deduplication — the in-stream twin of
``operators/dedup.dedup_exact``.

A training-data firehose dedups BEFORE landing (a duplicate written is a
duplicate paid for downstream: storage, tokenization, training). Spark's
native operator for this is ``dropDuplicatesWithinWatermark``: exactly-
once emission of the FIRST arrival of each content hash, with state
bounded by the watermark horizon (a duplicate arriving later than the
watermark bound may re-emit — the standard streaming trade: unbounded
exactness requires unbounded state; pick the horizon to cover the real
duplication window).

Plan: md5(text) content key computed in the scan (JVM), state store
keyed by (text_md5) — one shuffle on the key, state rows carry only the
key + timestamp. At 10^12 turns the state is (duplication-window
cardinality), not corpus cardinality.

The batch twin for oracle checks is ``dedup_keep_first`` (same keep-
first-by-timestamp semantics, expressible in DuckDB as a window rank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def with_content_key(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("text_md5", F.md5(F.col(text_col)))


def dedup_keep_first(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Batch twin: keep the earliest (ts, conv_id, turn_idx) row per
    distinct text. Deterministic tie-break so batch == stream on
    deterministic input arrival order."""
    from pyspark.sql import Window

    w = Window.partitionBy("text_md5").orderBy(
        F.col("ts").asc(), F.col("conv_id").asc(), F.col("turn_idx").asc()
    )
    return (
        with_content_key(df, text_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def stream_dedup_exact(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
):
    """File-source transcript stream -> first-arrival-per-content-hash
    append sink. maxFilesPerTrigger=1 so arrival order is deterministic
    per input file; state expires past the watermark horizon."""
    src = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(input_dir)
    )
    deduped = (
        with_content_key(src)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["text_md5"])
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
