"""Unit oracles for the spans / temporal / hybrid / profiling operators:
pure-Python reimplementations checked row-for-row, plus plan-hygiene
assertions for the scale claims in the docstrings (as-of join must not be
a range join; span extraction must not shuffle before its aggregation)."""

from __future__ import annotations

import contextlib
import datetime as dt
import io

import pytest
from pyspark.sql import functions as F

from searchengine_spark.functions.tokenize import tokenize_py
from searchengine_spark.operators.hybrid import rrf_fuse, with_rank
from searchengine_spark.operators.profiling import (
    score_quantiles,
    score_quantiles_approx,
)
from searchengine_spark.operators.spans import (
    doc_spans,
    duplicated_spans,
    span_dup_flags,
)
from searchengine_spark.operators.temporal import asof_join, event_type_bigrams


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# spans
# ---------------------------------------------------------------------------

_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog today"),
    (1, "the quick brown fox jumps over the lazy dog tomorrow"),  # shares an 8-window prefix with 0
    (2, "completely different words in this eight token document here"),
    (3, "short doc"),          # < span_len tokens -> no windows
    (4, ""),                   # empty
    (5, None),                 # null
]


@pytest.fixture(scope="module")
def span_docs(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


def _py_spans(text, L=8):
    toks = tokenize_py(text)
    return [" ".join(toks[i:i + L]) for i in range(len(toks) - L + 1)]


def test_doc_spans_matches_python(spark, span_docs):
    got = {
        (r.doc_id, r.pos): r.span_md5
        for r in doc_spans(span_docs, 8).collect()
    }
    import hashlib
    want = {}
    for did, text in _DOCS:
        for pos, s in enumerate(_py_spans(text)):
            want[(did, pos)] = hashlib.md5(s.encode()).hexdigest()
    assert got == want
    assert not any(k[0] in (3, 4, 5) for k in got)  # short/empty -> no spans


def test_duplicated_spans_cross_doc_only(spark, span_docs):
    dups = duplicated_spans(span_docs, 8).collect()
    # docs 0 and 1 share exactly the windows of their common 9-token
    # prefix: positions 0 and 1 -> 2 duplicated spans.
    assert len(dups) == 2
    assert all(r.n_docs == 2 and r.n_occurrences == 2 for r in dups)


def test_span_dup_flags_coverage(spark, span_docs):
    flags = {r.doc_id: (r.n_spans, r.n_dup_spans)
             for r in span_dup_flags(span_docs, 8).collect()}
    assert flags[0] == (3, 2)
    assert flags[1] == (3, 2)
    assert flags[2] == (2, 0)
    assert 3 not in flags  # no windows -> absent, by contract


def test_span_extraction_plan_hygiene(spark, span_docs):
    # In-row windowing: no join anywhere, exactly the two Exchanges of the
    # standard distinct-aggregate ((span,doc) dedup shuffle + span re-agg),
    # and the Arrow tokenizer runs ONCE (the inferred-filter-from-Generate
    # trap would run it twice and evaluate the span transform three times).
    plan = _plan(duplicated_spans(span_docs, 8))
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 2, tree
    assert "Join" not in tree, tree
    assert tree.count("ArrowEvalPython") == 1, tree


# ---------------------------------------------------------------------------
# temporal
# ---------------------------------------------------------------------------

def _ts(s):
    return dt.datetime(2026, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # (event_id, ts, user_id, event_type, value)
        (1, _ts(1), 7, "view", 1.0),
        (2, _ts(1), 7, "view", 2.0),        # duplicate ts: tiebreak on id
        (3, _ts(2), 7, "purchase", 10.0),
        (4, _ts(3), 7, "view", 3.0),
        (5, _ts(3), 7, "purchase", 11.0),   # equal-ts view counts (inclusive)
        (6, _ts(0), 8, "purchase", 12.0),   # no prior view -> null
        (7, _ts(5), 9, "view", 4.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double")


def test_asof_join_inclusive_and_tiebreak(spark, events):
    out = asof_join(
        events.where("event_type = 'purchase'"),
        events.where("event_type = 'view'"),
        key="user_id", ts="ts", tiebreak="event_id",
        payload=["event_id", "value"],
    )
    got = {r.event_id: (r.ref_event_id, r.ref_value) for r in out.collect()}
    assert got[3] == (2, 2.0)      # ties at ts=1 -> max event_id wins
    assert got[5] == (4, 3.0)      # equal-ts reference row matches (inclusive)
    assert got[6] == (None, None)  # nothing precedes
    assert len(got) == 3


def test_asof_join_is_not_a_range_join(spark, events):
    out = asof_join(
        events.where("event_type = 'purchase'"),
        events.where("event_type = 'view'"),
        key="user_id", ts="ts", tiebreak="event_id",
        payload=["value"],
    )
    plan = _plan(out)
    # the scalable shape: union + window, never a ts-inequality join
    # (BroadcastNestedLoop / CartesianProduct are the range-join tells).
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "Window" in plan


def test_event_type_bigrams(spark, events):
    got = {(r.prev_type, r.event_type): r.n_pairs
           for r in event_type_bigrams(events).collect()}
    # user 7 ordered: view(1), view(2), purchase(3), view(4), purchase(5)
    assert got == {
        ("view", "view"): 1,
        ("view", "purchase"): 2,
        ("purchase", "view"): 1,
    }


# ---------------------------------------------------------------------------
# hybrid RRF
# ---------------------------------------------------------------------------

def test_rrf_fusion_math(spark):
    lex = spark.createDataFrame(
        [(10, 5.0), (11, 4.0), (12, 3.0)], "doc_id long, score double")
    dense = spark.createDataFrame(
        [(11, 0.9), (13, 0.8)], "vec_id long, cos double")
    out = rrf_fuse(
        [with_rank(lex, "doc_id", "score"), with_rank(dense, "vec_id", "cos")],
        id_col="doc_id", k=10, c=60,
    ).collect()
    got = {r.doc_id: (r.rrf_score, r.n_lists) for r in out}
    assert got[11] == (round(1 / 62 + 1 / 61, 6), 2)   # rank 2 lex + rank 1 dense
    assert got[10] == (round(1 / 61, 6), 1)
    assert got[13] == (round(1 / 62, 6), 1)
    # doc in both lists outranks single-list docs
    assert out[0].doc_id == 11


def test_with_rank_tiebreak(spark):
    df = spark.createDataFrame(
        [(2, 1.0), (1, 1.0), (3, 2.0)], "doc_id long, score double")
    ranks = {r._id: r._rank for r in with_rank(df, "doc_id", "score").collect()}
    assert ranks == {3: 1, 1: 2, 2: 3}  # score desc, id asc


# ---------------------------------------------------------------------------
# profiling quantiles
# ---------------------------------------------------------------------------

def test_exact_quantiles_match_numpy(spark):
    import numpy as np

    vals = [float(v) for v in (1, 3, 5, 7, 9, 11, 13, 200)]
    df = spark.createDataFrame(
        [("s", v) for v in vals], "source string, q double")
    got = {r.pct: r.value
           for r in score_quantiles(df, "q", "source").collect()}
    for p in (0.1, 0.25, 0.5, 0.75, 0.9):
        want = float(np.percentile(vals, p * 100, method="linear"))
        assert got[p] == pytest.approx(want, abs=1e-5)


def test_approx_quantiles_close_to_exact(spark):
    import numpy as np

    rng = np.random.RandomState(42)
    vals = sorted(float(x) for x in rng.gamma(2.0, 3.0, 5000))
    df = spark.createDataFrame(
        [("s", v) for v in vals], "source string, q double").repartition(4)
    exact = {r.pct: r.value
             for r in score_quantiles(df, "q", "source").collect()}
    approx = {r.pct: r.value
              for r in score_quantiles_approx(df, "q", "source").collect()}
    # GK at accuracy=10000 over 5k values: rank error <= n/accuracy = 0.5
    # ranks; allow one inter-value gap of slack around each percentile.
    for p, ex in exact.items():
        idx = int(p * (len(vals) - 1))
        gap = max(vals[min(idx + 2, len(vals) - 1)] - vals[max(idx - 2, 0)], 1e-6)
        assert abs(approx[p] - ex) <= gap, (p, ex, approx[p])


# ---------------------------------------------------------------------------
# tool analytics (the transcript schema's tool column)
# ---------------------------------------------------------------------------

def test_tool_usage_and_transitions(spark):
    from searchengine_spark.operators.temporal import (
        tool_transitions,
        tool_usage,
    )

    rows = [
        # conv, idx, role, text, tool
        ("c0", 0, "user", "q", None),
        ("c0", 1, "tool", "r", "search"),
        ("c0", 2, "tool", "r", "bash"),
        ("c0", 3, "assistant", "a", None),
        ("c0", 4, "tool", "r", "bash"),
        ("c1", 0, "tool", "r", "search"),
        ("c1", 1, "assistant", "a", None),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string")
    usage = {r.tool: (r.n_calls, r.n_convs, r.mean_turn_frac)
             for r in tool_usage(t).collect()}
    assert usage["bash"] == (2, 1, 0.75)        # turns 2/4 and 4/4 of c0
    assert usage["search"][0] == 2 and usage["search"][1] == 2
    assert usage["search"][2] == 0.125          # (1/4 + 0/1... 0) / 2
    trans = {(r.prev_tool, r.tool): r.n_pairs
             for r in tool_transitions(t).collect()}
    # c0 tool sequence: search -> bash -> bash (non-tool turns skipped)
    assert trans == {("search", "bash"): 1, ("bash", "bash"): 1}


def test_tool_usage_over_synth_source(spark, small):
    """The generator's tool column is consistent: tool is set iff
    role == 'tool', and the analytics consume it end-to-end."""
    from searchengine_spark.operators.temporal import tool_usage

    usage = tool_usage(small).collect()
    assert usage  # the synth corpus does emit tool turns
    n_tool_turns = small.where("tool IS NOT NULL").count()
    assert n_tool_turns == sum(r.n_calls for r in usage)
    assert small.where(
        "(tool IS NOT NULL) != (role = 'tool')").count() == 0
