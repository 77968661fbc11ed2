"""Stateful streaming sessionization (``applyInPandasWithState``).

The custom-stateful-operator surface of the engine: gap-based session
assignment over an unbounded event stream, per user, with event-time
timeouts. This is the streaming twin of ``operators/events.sessionize``
(same gap rule; the batch twin is the oracle in tests):

    readStream --withWatermark(ts, D)
               --groupBy(user_id)
               --applyInPandasWithState(EventTimeTimeout)
               --append parquet sink

Semantics:
- A session CLOSES in-stream the moment a same-user event arrives more
  than ``gap`` after the previous one (data-driven close), or when the
  watermark passes last_event + gap with no new data (timeout close).
- Closed sessions are emitted exactly once; the open session per user
  lives in the state store as four scalars (start, last, n, sum) —
  state is O(active users), not O(events).
- Arbitrary stateful processing is exactly what windowed aggs can't
  express here: the window length is data-dependent (each event extends
  its session), so this must be applyInPandasWithState, with Arrow
  batching keeping the per-group Python hop vectorized.

Scale shape: one shuffle (hash by user_id); per-group state is constant
size; timeouts ride the engine's watermark machinery, so no scan over
idle users ever happens.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming import StreamingQuery

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])
# open session per user: (start_us, last_us, n_events, sum_value)
STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", LongType()),
    StructField("sv", DoubleType()),
])


def _make_session_fn(gap_minutes: int):
    gap_us = int(gap_minutes) * 60 * 1_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        def emit(rows):
            return pd.DataFrame({
                "user_id": pd.Series([user_id] * len(rows), dtype="int64"),
                "session_start": pd.to_datetime([r[0] for r in rows],
                                                unit="us"),
                "session_end": pd.to_datetime([r[1] for r in rows],
                                              unit="us"),
                "n_events": pd.Series([r[2] for r in rows], dtype="int64"),
                "sum_value": pd.Series([r[3] for r in rows],
                                       dtype="float64"),
            })

        if state.hasTimedOut:
            # watermark passed last_event + gap with no new data
            start, last, n, sv = state.get
            state.remove()
            yield emit([(start, last, n, sv)])
            return

        ev = pd.concat(list(pdfs), ignore_index=True)
        ev = ev.sort_values(["ts", "event_id"], kind="mergesort")
        us = ev["ts"].astype("int64").to_numpy() // 1000
        vals = ev["value"].to_numpy()

        open_s = list(state.get) if state.exists else None
        closed = []
        for t, v in zip(us.tolist(), vals.tolist()):
            if open_s is None:
                open_s = [t, t, 0, 0.0]
            elif t - open_s[1] > gap_us:  # data-driven close
                closed.append(tuple(open_s))
                open_s = [t, t, 0, 0.0]
            open_s[1] = t
            open_s[2] += 1
            open_s[3] += v
        state.update(tuple(open_s))
        # close when the watermark passes last event + gap
        state.setTimeoutTimestamp((open_s[1] + gap_us) // 1000)
        if closed:
            yield emit(closed)

    return fn


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      watermark: str = "10 minutes") -> DataFrame:
    """Watermarked stream -> closed-session rows (append mode)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_minutes),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_sessions(
    spark, input_dir: str, output_dir: str, checkpoint_dir: str,
    gap_minutes: int = 30, watermark: str = "10 minutes",
) -> "StreamingQuery":
    """File-source stream -> stateful sessionization -> append parquet
    sink; ``maxFilesPerTrigger=1`` so each file is one micro-batch (the
    watermark advances between batches, driving the timeout path)."""
    from searchengine_spark.streaming.windowed import EVENT_SCHEMA

    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(input_dir)
    )
    out = sessionize_stream(src, gap_minutes, watermark)
    return (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
