"""Property test: asof_join == the brute-force per-row oracle on random
event sets (duplicate keys, duplicate timestamps, empty sides included).
Few examples, one Spark job each — hypothesis explores the tie/boundary
space far better than hand fixtures."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from searchengine_spark.operators.temporal import asof_join

_BASE = dt.datetime(2026, 1, 1)


def _rows(ids_types):
    return [
        (i, _BASE + dt.timedelta(seconds=ts), key, typ, float(i))
        for i, (key, ts, typ) in enumerate(ids_types)
    ]


_EVENT = st.tuples(
    st.integers(0, 2),            # key (few keys -> collisions)
    st.integers(0, 5),            # ts seconds (few values -> duplicate ts)
    st.sampled_from(["p", "r"]),  # probe or reference
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_EVENT, min_size=0, max_size=14))
def test_asof_join_matches_bruteforce(spark, events):
    rows = _rows(events)
    df = spark.createDataFrame(
        rows or [(0, _BASE, 0, "x", 0.0)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double")
    if not rows:
        df = df.where("event_id < 0")
    probe = df.where("event_type = 'p'")
    ref = df.where("event_type = 'r'")
    got = {r.event_id: r.ref_event_id
           for r in asof_join(probe, ref, key="user_id", ts="ts",
                              tiebreak="event_id",
                              payload=["event_id"]).collect()}

    refs = [r for r in rows if r[3] == "r"]
    want = {}
    for (eid, ts, key, typ, _v) in rows:
        if typ != "p":
            continue
        cands = [(r[1], r[0]) for r in refs if r[2] == key and r[1] <= ts]
        want[eid] = max(cands)[1] if cands else None
    assert got == want
