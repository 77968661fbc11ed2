"""Temporal operators over event streams: as-of join and sequence bigrams.

Neither exists in the reference (its Engine is a point-query HTTP server);
both are table-stakes for the analytics side of a transcript/event pipeline
(e.g. attributing a purchase/tool-result to the latest preceding view/tool
-call, mining action-transition frequencies).

Scale notes:

* ``asof_join`` deliberately avoids the naive range join (``l.ts >= r.ts``
  theta-join explodes to |L|x|R| per key before pruning). Instead it unions
  probe and reference rows and takes one ``last(..., ignorenulls)`` running
  window per key — a single shuffle on the key, O(n log n) per partition,
  no pair blow-up. This is the standard distributed as-of shape (same trick
  Flink/KDB users apply on Spark). Hot keys: the window is per-key
  sequential, so a mega-user dominates its task — the same two-phase
  bucketing used by ``operators/events.sessionize_bucketed`` applies when a
  key exceeds a partition budget.
* ``event_type_bigrams`` is one ``lag`` window + one hash agg; the agg
  output is bounded by |event_type|^2, independent of row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    reference: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    payload: list[str],
) -> DataFrame:
    """For every probe row, attach the payload of the reference row with
    the greatest ``(ts, tiebreak)`` such that ``reference.ts <= probe.ts``
    (inclusive as-of, ties broken by ``tiebreak`` — deterministic even
    with duplicate timestamps).

    Probe rows keep ALL their columns; payload columns arrive as
    ``ref_<name>`` (null when no reference row precedes).

    The probe row rides the union INSIDE a struct column (null on
    reference rows) — no row id, no rejoin. (A first cut tagged probe
    rows with ``monotonically_increasing_id`` and joined the window
    output back: that id is only stable per physical partitioning, so
    two subplans recomputing it — or a task retry — can disagree. The
    struct carry is deterministic by construction and one join cheaper.)
    """
    pay_struct = F.struct(*[F.col(c) for c in payload])
    probe_struct = F.struct(*[F.col(c) for c in probe.columns])
    r = reference.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.col(tiebreak).alias("_tb"),
        F.lit(0).alias("_side"),
        pay_struct.alias("_pay"),
        F.lit(None).cast(
            probe.select(probe_struct.alias("_row")).schema["_row"].dataType
        ).alias("_row"),
    )
    p = probe.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.col(tiebreak).alias("_tb"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
        probe_struct.alias("_row"),
    )
    # Reference rows sort BEFORE probe rows at equal ts (=> inclusive
    # as-of); among equal-ts reference rows the running last() keeps the
    # max tiebreak. One shuffle on the key, no row multiplication.
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_ts"), F.asc("_side"), F.asc("_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        r.unionByName(p)
        .withColumn("_asof", F.last("_pay", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
        .select(
            *[F.col("_row")[c].alias(c) for c in probe.columns],
            *[F.col("_asof")[c].alias(f"ref_{c}") for c in payload],
        )
    )
    return out


def event_type_bigrams(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Adjacent-transition counts: per key, order events by (ts, tiebreak)
    and count (previous type -> type) pairs over the whole table. Output
    (prev_type, event_type, n_pairs) — bounded by |types|^2 rows."""
    w = Window.partitionBy(key).orderBy(F.asc(ts), F.asc(tiebreak))
    pairs = events.select(
        F.lag(type_col).over(w).alias("prev_type"),
        F.col(type_col).alias("event_type"),
    ).where(F.col("prev_type").isNotNull())
    return pairs.groupBy("prev_type", "event_type").agg(
        F.count("*").cast("long").alias("n_pairs")
    )


def tool_usage(transcripts: DataFrame) -> DataFrame:
    """Per-tool usage profile over a transcript corpus -> (tool, n_calls,
    n_convs, mean_turn_frac): how often each tool fires, how many
    conversations touch it, and where in the conversation it tends to
    appear (0 = opening turn, 1 = final turn). Two hash aggs; output
    bounded by |tools|."""
    conv_len = transcripts.groupBy("conv_id").agg(
        F.max("turn_idx").alias("_max_idx"))
    calls = (
        transcripts.where(F.col("tool").isNotNull())
        .join(conv_len, "conv_id")
    )
    frac = F.when(
        F.col("_max_idx") > 0,
        F.col("turn_idx").cast("double") / F.col("_max_idx"),
    ).otherwise(F.lit(0.0))
    return calls.groupBy("tool").agg(
        F.count("*").cast("long").alias("n_calls"),
        F.countDistinct("conv_id").cast("long").alias("n_convs"),
        F.round(F.avg(frac), 6).alias("mean_turn_frac"),
    )


def tool_transitions(transcripts: DataFrame) -> DataFrame:
    """Adjacent tool-call transition counts within conversations —
    ``event_type_bigrams`` over the tool turns, ordered by turn_idx.
    The workflow-mining view of an agent-transcript corpus (which tool
    tends to follow which); output bounded by |tools|^2."""
    t = transcripts.where(F.col("tool").isNotNull())
    return event_type_bigrams(
        t, key="conv_id", ts="turn_idx", tiebreak="turn_idx",
        type_col="tool",
    ).withColumnRenamed("prev_type", "prev_tool") \
     .withColumnRenamed("event_type", "tool")
