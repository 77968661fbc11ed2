"""Structured Streaming incremental indexing: micro-batch generations +
sort-merge compaction must equal a fresh batch build over the full corpus
(SURVEY.md §2.10 upgrade)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.build import build_index
from searchengine_spark.operators.segments import segments_to_tf
from searchengine_spark.sources.synth import transcripts_df
from searchengine_spark.streaming.incremental import (
    compact,
    read_state,
    start_incremental,
)


def _tf_set(df):
    return set(map(tuple, df.select("term", "doc_id", "tf", "dl").collect()))


@pytest.fixture(scope="module")
def stream_dirs(spark, tmp_path_factory):
    """Three arrival batches = three conv ranges written as separate files
    in arrival order (file order == batch order via maxFilesPerTrigger=1)."""
    base = tmp_path_factory.mktemp("stream")
    inp, idx, ckpt = base / "in", base / "idx", base / "ckpt"
    inp.mkdir()
    corpus = transcripts_df(spark, n_convs=60, seed=7)
    convs = sorted(r["conv_id"] for r in corpus.select("conv_id").distinct().collect())
    cuts = [convs[20], convs[40]]
    batches = [
        corpus.filter(F.col("conv_id") < cuts[0]),
        corpus.filter((F.col("conv_id") >= cuts[0]) & (F.col("conv_id") < cuts[1])),
        corpus.filter(F.col("conv_id") >= cuts[1]),
    ]
    for i, b in enumerate(batches):
        b.coalesce(1).write.parquet(str(inp / f"batch_{i}.parquet"))
    return str(inp), str(idx), str(ckpt), corpus, batches


def test_incremental_generations(spark, stream_dirs):
    inp, idx, ckpt, corpus, batches = stream_dirs
    q = start_incremental(spark, f"{inp}/*/", idx, ckpt, available_now=True,
                          df_target=64)
    q.awaitTermination(300)
    state = read_state(idx)
    assert len(state["generations"]) == 3
    assert state["n_docs"] == corpus.count()
    # docID spaces are consecutive in arrival order
    starts = [g["start_id"] for g in state["generations"]]
    sizes = [g["n_docs"] for g in state["generations"]]
    assert starts == [0, sizes[0], sizes[0] + sizes[1]]


def test_compaction_equals_fresh_build(spark, stream_dirs):
    inp, idx, ckpt, corpus, batches = stream_dirs
    merged = compact(spark, idx, df_target=64)

    # fresh build over the corpus concatenated in ARRIVAL order: remap
    # conv_id so global (conv_id, turn_idx) order equals arrival order
    arrival = batches[0].withColumn("arr", F.lit(0))
    for i, b in enumerate(batches[1:], 1):
        arrival = arrival.unionByName(b.withColumn("arr", F.lit(i)))
    remapped = arrival.withColumn(
        "conv_id", F.concat(F.col("arr").cast("string"), F.lit("_"), "conv_id")
    ).drop("arr")
    fresh = build_index(remapped, num_doc_partitions=3, layouts=("term",),
                        df_target=64)
    assert _tf_set(segments_to_tf(merged)) == _tf_set(
        segments_to_tf(fresh.term_segments)
    )


def test_incremental_idempotent_replay(spark, stream_dirs):
    """Re-running the drained stream (fresh checkpoint, same index dir)
    must not duplicate generations (exactly-once via state.json guard)."""
    inp, idx, ckpt, corpus, _ = stream_dirs
    before = read_state(idx)
    q = start_incremental(spark, f"{inp}/*/", idx, ckpt + "_2", available_now=True,
                          df_target=64)
    q.awaitTermination(300)
    after = read_state(idx)
    assert after == before
