"""role_spans: per-turn character offsets into the assembled conversation
text — the SFT loss-mask artifact. The invariant: slicing conv_text with a
turn's (start, end) must reproduce that turn's text exactly."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def transcripts(spark):
    rows = [
        ("c0", 0, "user", "hello there"),
        ("c0", 1, "assistant", "hi how can i help"),
        ("c0", 2, "user", ""),            # empty turn still owns a span
        ("c0", 3, "assistant", "done"),
        ("c1", 0, "user", "solo turn"),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")


def test_spans_slice_back_to_turn_text(spark, transcripts):
    from searchengine_spark.operators.context import (
        conversation_text,
        role_spans,
    )

    conv = {r.conv_id: r.conv_text
            for r in conversation_text(transcripts).collect()}
    spans = role_spans(transcripts).collect()
    assert len(spans) == 5
    orig = {(row.conv_id, row.turn_idx): row.text
            for row in transcripts.collect()}
    for r in spans:
        assert r.end >= r.start
        # slice reproduces the original turn text
        assert conv[r.conv_id][r.start:r.end] == \
            (orig[(r.conv_id, r.turn_idx)] or ""), r


def test_assistant_mask_covers_only_assistant_chars(spark, transcripts):
    from searchengine_spark.operators.context import (
        conversation_text,
        role_spans,
    )

    conv = {r.conv_id: r.conv_text
            for r in conversation_text(transcripts).collect()}
    spans = [r for r in role_spans(transcripts).collect()
             if r.conv_id == "c0" and r.role == "assistant"]
    got = "".join(conv["c0"][r.start:r.end] for r in
                  sorted(spans, key=lambda r: r.start))
    assert got == "hi how can i helpdone"
