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


def _mk_events(spark, rows):
    """rows = [(event_id, minutes_offset, user_id)]"""
    data = [(int(i), _ts(float(m)), int(u), "view", float(i), "{}")
            for i, m, u in rows]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def _assign(df):
    return {r.event_id: r.session_seq for r in df.collect()}


def test_sessionize_bucketed_equals_plain(spark):
    """Skew-safe two-phase sessionization is bit-identical to the plain
    single-window version on adversarial layouts: a session spanning 3+
    buckets, boundary-exact gaps, single-event buckets, empty buckets
    between sessions (bucket width 1 h, gap 30 min)."""
    from searchengine_spark.operators.events import (
        sessionize,
        sessionize_bucketed,
    )

    rows = [
        # u1: one session crossing THREE hourly buckets (events every
        # 25 min from 0:40 to 3:10), then a gap, then a new session
        *[(i, 40 + 25 * i, 1) for i in range(7)],        # 0:40..3:10
        (7, 60 * 6, 1),                                   # 6:00 new
        # u2: boundary-exact gap (exactly 30 min stays SAME session)
        (10, 50, 2), (11, 80, 2),                         # same
        (12, 80 + 31, 2),                                 # 31 min -> new
        # u3: single events in far-apart buckets
        (20, 10, 3), (21, 60 * 48 + 10, 3),
        # u4: dense run inside one bucket
        *[(30 + i, 5 * 60 + i, 4) for i in range(10)],
    ]
    ev = _mk_events(spark, rows)
    plain = _assign(sessionize(ev, gap_minutes=30))
    bucketed = _assign(sessionize_bucketed(ev, gap_minutes=30,
                                           bucket_hours=1))
    assert bucketed == plain
    # sanity on the interesting case: u1's 7 events are ONE session
    assert len({plain[i] for i in range(7)}) == 1
    assert plain[7] == plain[0] + 1
    assert plain[10] == plain[11] and plain[12] == plain[11] + 1


def test_sessionize_bucketed_random_equivalence(spark):
    """Seeded random fuzz: 400 events, 6 users, random minute offsets —
    bucketed == plain at two bucket widths."""
    import random

    from searchengine_spark.operators.events import (
        sessionize,
        sessionize_bucketed,
    )

    rng = random.Random(7)
    rows = [(i, rng.uniform(0, 60 * 72), rng.randint(1, 6))
            for i in range(400)]
    ev = _mk_events(spark, rows)
    plain = _assign(sessionize(ev, gap_minutes=45))
    for bh in (1, 24):
        got = _assign(sessionize_bucketed(ev, gap_minutes=45,
                                          bucket_hours=bh))
        assert got == plain, f"bucket_hours={bh}"


def test_sessionize_bucketed_no_user_only_window(spark):
    """The heavy phase must window by (user_id, bucket) — the per-user-
    only window may touch only the summary table (one row per
    user-bucket). Assert the events-sized Window node includes the
    bucket column."""
    from searchengine_spark.operators.events import sessionize_bucketed

    ev = _mk_events(spark, [(0, 1.0, 1), (1, 2.0, 1)])
    plan = sessionize_bucketed(ev)._jdf.queryExecution().optimizedPlan() \
        .toString()
    first_window = plan[plan.index("Window"):plan.index("Window") + 400]
    assert "_bkt" in first_window
