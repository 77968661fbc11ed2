"""Incremental (streaming) index maintenance via Structured Streaming.

The reference has NO streaming or incremental path: its Zds.Flow queues are
intra-process pipelining, and adding documents means a full 3-hour rebuild
(SearchEngine SURVEY.md §2.10, Indexer/Program.cs:42-65). This module is
the Spark-native upgrade: new transcript batches arrive as files, each
micro-batch becomes a **generation** (its own doc_map + salted term-segment
table, docIDs continuing the global space), and generations are compacted
by the associative sort-merge (operators/merge.py) — the classic
LSM/Lucene segment model expressed as Structured Streaming + foreachBatch.

    readStream.parquet(input_dir)
      --foreachBatch--> gen_{k}/doc_map.parquet + gen_{k}/segments.parquet
                        + state.json (n_docs, sum_dl, generations)
    compact(index_dir) -> merged/segments.parquet  (sort-merge all gens)
    tiered_compact(index_dir) -> Lucene-TieredMergePolicy analog: merge
      only same-size-tier generations as they accumulate, so steady-state
      write amplification is O(corpus * log corpus), not
      O(batches * corpus); compact() stays the pre-serving full merge

Queries can run against merged ∪ uncompacted generations; correctness of
compaction (merged == fresh build over the full corpus) is asserted by
tests and the merge_segments_roundtrip driver oracle.

Batch ordering note: docIDs are assigned in arrival (micro-batch) order,
batch-internally by stable (conv_id, turn_idx) rank — the standard
incremental-index discipline (arrival order IS the document order).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from searchengine_spark.operators.forward import build_term_stats
from searchengine_spark.operators.ingest import tf_from_doc_map, tokenized_doc_map
from searchengine_spark.operators.merge import merge_term_segments
from searchengine_spark.operators.segments import build_term_segments

STATE = "state.json"

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _state_path(index_dir: str) -> str:
    return os.path.join(index_dir, STATE)


def read_state(index_dir: str) -> dict:
    p = _state_path(index_dir)
    if not os.path.exists(p):
        return {"n_docs": 0, "sum_dl": 0, "generations": [],
                "doc_id_base": 0}
    with open(p) as f:
        return json.load(f)


def _write_state(index_dir: str, state: dict) -> None:
    """Atomic commit: write-temp + os.replace, so a crash mid-write can
    never leave truncated JSON that would poison every subsequent
    read_state/process_batch/compact (the exactly-once replay path)."""
    p = _state_path(index_dir)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)


def process_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    df_target: int = 100_000,
) -> None:
    """One micro-batch -> one generation. Idempotent per batch_id (exactly
    -once under Structured Streaming's checkpointed foreachBatch: a
    replayed batch_id finds its generation recorded and skips)."""
    spark = batch_df.sparkSession
    state = read_state(index_dir)
    gen_name = f"gen_{batch_id:06d}"
    if any(g["name"] == gen_name for g in state["generations"]):
        return  # replay after failure: already committed
    if batch_df.isEmpty():
        return

    os.makedirs(os.path.join(index_dir, gen_name), exist_ok=True)
    dm = tokenized_doc_map(
        batch_df,
        start_id=int(state.get("doc_id_base", 0)) + state["n_docs"])
    dm_path = os.path.join(index_dir, gen_name, "doc_map.parquet")
    dm.write.mode("overwrite").parquet(dm_path)
    dm = spark.read.parquet(dm_path)

    from pyspark.sql import functions as F

    row = dm.agg(F.count("*").alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("s")
                 ).collect()[0]
    n_batch, sum_dl_batch = int(row["n"]), int(row["s"])

    tf = tf_from_doc_map(dm)
    stats = build_term_stats(tf)
    # per-generation avgdl for block metadata; compaction re-encodes with
    # the merged avgdl, so generation-local avgdl is only a local bound
    avgdl_gen = (sum_dl_batch / n_batch) if n_batch else 1.0
    segs = build_term_segments(tf, stats, n_batch, avgdl_gen, df_target=df_target)
    segs.write.mode("overwrite").parquet(
        os.path.join(index_dir, gen_name, "segments.parquet")
    )

    state["generations"].append(
        {"name": gen_name, "n_docs": n_batch, "doc_offset": 0,
         "sum_dl": sum_dl_batch, "start_id": state["n_docs"]}
    )
    state["n_docs"] += n_batch
    state["sum_dl"] += sum_dl_batch
    _write_state(index_dir, state)


def start_incremental(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    df_target: int = 100_000,
    doc_id_base: int = 0,
):
    """Start the incremental indexer over a directory of transcript parquet
    files. available_now=True drains existing files and stops (batch-style
    test mode); False runs continuously.

    ``doc_id_base``: first doc_id of this index's id range (federation
    contract — see pipeline.run_build doc_id_base): every generation's
    ids are base + running count, so a STREAMING slice can join a
    FederatedEngine next to batch-built slices without collisions. Only
    honored on a fresh index (the base is pinned in state.json)."""
    os.makedirs(index_dir, exist_ok=True)
    if not os.path.exists(_state_path(index_dir)):
        _write_state(index_dir, {"n_docs": 0, "sum_dl": 0,
                                 "generations": [],
                                 "doc_id_base": int(doc_id_base)})
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    writer = stream.writeStream.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.foreachBatch(
        lambda df, bid: process_batch(df, bid, index_dir, df_target)
    ).start()


def compact(spark: SparkSession, index_dir: str,
            df_target: int = 100_000,
            tombstones: set | frozenset | None = None) -> DataFrame:
    """Sort-merge every generation into merged/segments.parquet; returns
    the merged segment DataFrame. docIDs were assigned globally at ingest
    (start_id), so per-part doc_offset is 0. ``tombstones``: doc_ids
    physically dropped during the merge (the Lucene model — the merge
    decodes and re-encodes every posting anyway, so deletes ride it for
    free; operators/merge.py)."""
    state = read_state(index_dir)
    if not state["generations"]:
        raise ValueError("nothing to compact")
    parts = [
        (spark.read.parquet(os.path.join(index_dir, g["name"], "segments.parquet")), 0)
        for g in state["generations"]
    ]
    avgdl = state["sum_dl"] / state["n_docs"] if state["n_docs"] else 1.0
    merged = merge_term_segments(parts, avgdl_merged=avgdl,
                                 df_target=df_target, tombstones=tombstones)
    out = os.path.join(index_dir, "merged", "segments.parquet")
    merged.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


def _tier(n_docs: int, tier_factor: int) -> int:
    """Size tier of a generation: floor(log_{tier_factor}(n_docs)).
    Generations merge only with same-tier peers, so each posting is
    rewritten O(log_{factor}(corpus)) times over the stream's lifetime
    instead of O(#batches) under always-full compaction."""
    t, n = 0, max(int(n_docs), 1)
    while n >= tier_factor:
        t += 1
        n //= tier_factor
    return t


def tiered_compact(spark: SparkSession, index_dir: str,
                   tier_factor: int = 8, max_per_tier: int = 4,
                   df_target: int = 100_000) -> list[dict]:
    """Lucene-TieredMergePolicy analog: whenever ``max_per_tier``
    generations accumulate in one size tier, sort-merge the oldest
    ``max_per_tier`` of them into a single (next-tier-sized) generation;
    cascade until no tier overflows. ``compact()`` (full merge) stays the
    pre-serving step; this bounds the stream's steady-state write
    amplification — at 10^12 turns a full re-merge per trigger is
    O(batches * corpus) rewrite traffic, tiered merging is
    O(corpus * log(corpus)).

    Crash-safe like process_batch: the merged generation directory is
    written completely BEFORE the state commit (os.replace); member
    directories are removed only after the commit, so a crash at any
    point leaves either the old state (plus a harmless orphan dir the
    deterministic name lets the retry overwrite) or the new one.

    Returns one record per merge performed:
    ``{"tier", "members", "new", "n_docs"}``.
    """
    import shutil

    merges: list[dict] = []
    while True:
        state = read_state(index_dir)
        tiers: dict[int, list[dict]] = {}
        for g in state["generations"]:
            tiers.setdefault(_tier(g["n_docs"], tier_factor), []).append(g)
        overflowing = sorted(t for t, gs in tiers.items()
                             if len(gs) >= max_per_tier)
        if not overflowing:
            return merges
        t = overflowing[0]
        members = sorted(tiers[t], key=lambda g: g["start_id"])[:max_per_tier]
        member_names = [g["name"] for g in members]

        parts = [
            (spark.read.parquet(
                os.path.join(index_dir, g["name"], "segments.parquet")), 0)
            for g in members
        ]
        n_docs = sum(g["n_docs"] for g in members)
        sum_dl = sum(g["sum_dl"] for g in members)
        avgdl_group = (sum_dl / n_docs) if n_docs else 1.0
        start_id = min(g["start_id"] for g in members)
        new_name = f"tier{t}_{start_id:012d}"
        merged = merge_term_segments(parts, avgdl_merged=avgdl_group,
                                     df_target=df_target)
        merged.write.mode("overwrite").parquet(
            os.path.join(index_dir, new_name, "segments.parquet"))
        # carry the doc store forward too (uniform generation layout)
        dm_paths = [os.path.join(index_dir, g["name"], "doc_map.parquet")
                    for g in members]
        if all(os.path.exists(p) for p in dm_paths):
            dm = spark.read.parquet(dm_paths[0])
            for p in dm_paths[1:]:
                dm = dm.unionByName(spark.read.parquet(p))
            dm.write.mode("overwrite").parquet(
                os.path.join(index_dir, new_name, "doc_map.parquet"))

        new_entry = {"name": new_name, "n_docs": n_docs, "doc_offset": 0,
                     "sum_dl": sum_dl, "start_id": start_id}
        first_idx = min(i for i, g in enumerate(state["generations"])
                        if g["name"] in member_names)
        state["generations"] = [g for g in state["generations"]
                                if g["name"] not in member_names]
        state["generations"].insert(first_idx, new_entry)
        _write_state(index_dir, state)
        for name in member_names:  # post-commit cleanup; orphans harmless
            shutil.rmtree(os.path.join(index_dir, name), ignore_errors=True)
        merges.append({"tier": t, "members": member_names,
                       "new": new_name, "n_docs": n_docs})


def export_for_serving(spark: SparkSession, index_dir: str,
                       out_dir: str) -> str:
    """Turn a compacted incremental index into a SearchEngine-loadable
    directory (engine.py): term_segments.parquet (the merged table,
    copied as-is), term_stats.parquet (df/cf recomputed from the LIVE
    merged postings, so tombstoned docs are gone from idf), doc_map
    (doc_id + dl reconstructed from the postings — the incremental path
    stores no per-turn metadata), and scalars.json PINNED to the
    ingest-time state: the merge re-encoded block maxes with the state
    avgdl, so serving must score with that same avgdl for block-max
    admissibility (query-time core grows with avgdl; a larger serving
    avgdl would let true scores exceed the stored upper bounds)."""
    import json as _json

    from searchengine_spark.operators.forward import build_term_stats
    from searchengine_spark.operators.segments import segments_to_tf

    state = read_state(index_dir)
    merged_path = os.path.join(index_dir, "merged", "segments.parquet")
    if not os.path.exists(merged_path):
        raise ValueError("compact() the index before exporting")
    merged = spark.read.parquet(merged_path)
    os.makedirs(out_dir, exist_ok=True)
    merged.write.mode("overwrite").parquet(
        os.path.join(out_dir, "term_segments.parquet"))
    tf = segments_to_tf(merged).persist()
    build_term_stats(tf.select("term", "doc_id", "tf")).write \
        .mode("overwrite") \
        .parquet(os.path.join(out_dir, "term_stats.parquet"))
    tf.select("doc_id", "dl").distinct().write.mode("overwrite") \
        .parquet(os.path.join(out_dir, "doc_map.parquet"))
    tf.unpersist()
    with open(os.path.join(out_dir, "scalars.json"), "w") as f:
        _json.dump({"n_docs": state["n_docs"], "sum_dl": state["sum_dl"],
                    "avgdl": (state["sum_dl"] / state["n_docs"]
                              if state["n_docs"] else 1.0),
                    "doc_id_base": int(state.get("doc_id_base", 0))}, f)
    return out_dir
