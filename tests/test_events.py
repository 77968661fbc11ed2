"""Event sessionization / per-key top-N / JSON props operators
(operators/events.py) — semantics on a hand-computable fixture plus the
plan-shape guarantees the 100-TB story rests on."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.events import (
    props_stats,
    session_rollup,
    sessionize,
    top_events_per_user,
)


def _ts(minute: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minute)


@pytest.fixture(scope="module")
def events(spark):
    # user 1: events at 0, 10, 29.9 min (one session: every gap < 30),
    #         then 65 min (gap 35.1 -> new session)
    # user 2: events at 0, 31 min (gap 31 -> two sessions)
    # user 3: single event
    rows = [
        (0, _ts(0.0), 1, "view", 1.0, '{"k": 5}'),
        (1, _ts(10.0), 1, "click", 2.0, '{"k": 7}'),
        (2, _ts(29.9), 1, "view", 4.0, '{"k": 1}'),
        (3, _ts(65.0), 1, "error", 8.0, "{}"),
        (4, _ts(0.0), 2, "view", 16.0, '{"k": 2}'),
        (5, _ts(31.0), 2, "view", 32.0, '{"k": 3}'),
        (6, _ts(12.0), 3, "click", 64.0, '{"k": 9}'),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def test_sessionize_gap_semantics(events):
    got = {(r.event_id, r.session_seq)
           for r in sessionize(events, gap_minutes=30).collect()}
    assert got == {(0, 1), (1, 1), (2, 1), (3, 2),
                   (4, 1), (5, 2), (6, 1)}


def test_session_rollup_values(events):
    rows = {(r.user_id, r.session_seq): r
            for r in session_rollup(events, gap_minutes=30).collect()}
    s11 = rows[(1, 1)]
    assert s11.n_events == 3 and s11.sum_value == 7.0
    assert s11.duration_us == int(29.9 * 60 * 1_000_000)
    assert rows[(1, 2)].n_events == 1 and rows[(1, 2)].duration_us == 0
    assert rows[(2, 1)].n_events == 1 and rows[(2, 2)].n_events == 1
    assert rows[(3, 1)].n_events == 1


def test_session_rollup_single_shuffle(events):
    """The whole sessionize+rollup pipeline hash-partitions by user once:
    both Window nodes and the final agg reuse one exchange."""
    plan = session_rollup(events)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert plan.count("Window") == 2


def test_top_events_per_user(events):
    got = {(r.user_id, r.rank): r.event_id
           for r in top_events_per_user(events, n=2).collect()}
    assert got == {(1, 1): 3, (1, 2): 2, (2, 1): 5, (2, 2): 4, (3, 1): 6}


def test_top_events_rank_pushdown(events):
    """row_number + filter must compile to WindowGroupLimit (only the
    running top-N is kept per task — the property that makes per-key
    top-N safe on mega-key partitions)."""
    plan = top_events_per_user(events, n=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_props_stats(events):
    rows = {r.event_type: r for r in props_stats(events, key="k").collect()}
    v = rows["view"]
    assert (v.n_with_key, v.sum_k, v.min_k, v.max_k) == (4, 11, 1, 5)
    e = rows["error"]  # '{}' has no $.k -> NULLs counted as 0 rows
    assert (e.n_with_key, e.sum_k) == (0, None)


def test_import_without_spark_context():
    """operators.events must be importable before any SparkSession exists
    (regression: module-level Column construction needs an active
    SparkContext and breaks driver imports)."""
    import importlib

    import searchengine_spark.operators.events as m

    importlib.reload(m)
