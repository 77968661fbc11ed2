"""Context-window / conversation-assembly operators vs Python oracles."""

from __future__ import annotations

import pytest

from searchengine_spark.operators.context import (
    context_windows,
    conversation_text,
)

ROWS = [
    ("c1", 0, "hello"),
    ("c1", 1, "hi there"),
    ("c1", 2, "how are you"),
    ("c1", 3, "fine"),
    ("c2", 0, "solo turn"),
    ("c3", 5, "starts late"),
    ("c3", 7, "gap in idx"),
]


@pytest.fixture(scope="module")
def tr(spark):
    return spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, text string"
    )


def test_context_windows_oracle(spark, tr):
    got = {(r.conv_id, r.turn_idx): r.context
           for r in context_windows(tr, n_prev=2).collect()}
    by_conv: dict[str, list] = {}
    for c, i, t in sorted(ROWS):
        by_conv.setdefault(c, []).append((i, t))
    want = {}
    for c, turns in by_conv.items():
        for j, (i, _) in enumerate(turns):
            ctx = [t for _, t in turns[max(0, j - 2):j + 1]]
            want[(c, i)] = "\n".join(ctx)
    assert got == want


def test_context_windows_n_zero(spark, tr):
    got = context_windows(tr, n_prev=0).collect()
    assert all(r.context == r.text for r in got)


def test_conversation_text_order_and_counts(spark, tr):
    got = {r.conv_id: (r.n_turns, r.conv_text)
           for r in conversation_text(tr).collect()}
    assert got["c1"] == (4, "hello\nhi there\nhow are you\nfine")
    assert got["c2"] == (1, "solo turn")
    assert got["c3"] == (2, "starts late\ngap in idx")


def test_conversation_text_stable_under_repartition(spark, tr):
    a = sorted((r.conv_id, r.conv_text)
               for r in conversation_text(tr).collect())
    b = sorted((r.conv_id, r.conv_text)
               for r in conversation_text(tr.repartition(5)).collect())
    assert a == b
