"""Training-example assembly from multi-turn transcripts.

LLM pipelines turn a transcript table (conv_id, turn_idx, text) into
training rows two ways; both are pure JVM plans here:

- ``context_windows``: each turn + its previous n turns, concatenated in
  turn order — the sliding-window SFT example. One window spec
  (partitionBy conv, orderBy turn_idx, ROWS n PRECEDING..CURRENT), so
  the only shuffle is the conv-id hash partition, and ``collect_list``
  over the ordered frame preserves frame order.
- ``conversation_text``: the whole conversation as one document — the
  retrieval/packing unit. GroupBy + in-row ``array_sort`` of
  (turn_idx, text) structs, NOT a window: one hash agg with map-side
  combine, no per-conv sort task.

The reference engine's analog is page assembly before indexing
(SearchEngine Indexer scans whole documents); turn-level assembly is
the transcript-corpus counterpart.

Scale: both shapes are bounded per conversation. A mega-conversation
(10^6 turns) makes one fat group — at that point the same bucketing
trick as events.sessionize_bucketed applies (split on turn_idx ranges,
assemble per bucket, concat buckets); transcripts in practice cap at
10^2-10^3 turns, so the plain shape is the right default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TURN_SEP = "\n"


def context_windows(
    transcripts: DataFrame,
    n_prev: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Add ``context``: the current turn's text prefixed by up to
    ``n_prev`` preceding turns of the same conversation, separated by
    newlines, in turn order."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-n_prev, 0)
    )
    return transcripts.withColumn(
        "context", F.concat_ws(TURN_SEP, F.collect_list(text_col).over(w))
    )


def conversation_text(
    transcripts: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """-> (conv_id, n_turns, conv_text): the full conversation assembled
    in turn order. ``array_sort`` on (turn_idx, text) structs orders by
    turn_idx (struct comparison is field-ordinal), so no window/sort
    shuffle — one hash aggregation."""
    return (
        transcripts.groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.array_sort(
                F.collect_list(F.struct("turn_idx", text_col))
            ).alias("_turns"),
        )
        .select(
            "conv_id",
            "n_turns",
            F.concat_ws(
                TURN_SEP,
                F.transform(F.col("_turns"), lambda t: t[text_col]),
            ).alias("conv_text"),
        )
    )


def role_spans(
    transcripts: DataFrame,
    text_col: str = "text",
    role_col: str = "role",
) -> DataFrame:
    """-> (conv_id, turn_idx, role, start, end): each turn's character
    offsets inside ``conversation_text``'s assembly (same TURN_SEP) —
    the loss-mask artifact an SFT pipeline needs (train on assistant
    spans, mask the rest). The invariant (asserted in tests):
    ``conv_text[start:end] == turn text``.

    One running-sum window over the conv partition (same single shuffle
    as context_windows); empty/null turns own a zero-length span so the
    mask stays aligned with the separators conversation_text emits."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tlen = F.length(F.coalesce(F.col(text_col), F.lit("")))
    start = F.coalesce(
        F.sum(tlen + len(TURN_SEP)).over(w), F.lit(0)
    ).cast("long")
    return transcripts.select(
        "conv_id",
        "turn_idx",
        F.col(role_col).alias("role"),
        start.alias("start"),
        (start + tlen).cast("long").alias("end"),
    )
