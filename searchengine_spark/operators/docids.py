"""Deterministic dense docID assignment under stable (conv_id, turn_idx) order.

The reference keys documents by CRC32(title) (SearchEngine
Indexer/Repository/Program.cs:125) and tolerates collisions silently.
We instead assign a dense monotone ``doc_id:long`` equal to the global rank
of (conv_id, turn_idx) — reproducible across runs and parallelism levels, so
delta-encoded docID gaps are stable (north-star requirement).

Scale design: NO single-partition window. Two-phase:

  1. ``repartitionByRange(conv_id, turn_idx)`` + ``sortWithinPartitions``
     — a range-partitioned sort (Spark's distributed sort primitive).
  2. per-partition row counts -> driver-side exclusive prefix sum ->
     ``mapInPandas`` adds ``offset[partition] + local_row_number``.

Because (conv_id, turn_idx) is unique, the resulting doc_id equals the
global rank regardless of where the sampled range boundaries fall, so the
assignment is deterministic even though range sampling is not guaranteed
to be. The ranged DataFrame is persisted between the two jobs so both
actions observe one physical partitioning.
"""

from __future__ import annotations

from pyspark import StorageLevel, TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ORDER_COLS = ["conv_id", "turn_idx"]


def assign_doc_ids(
    transcripts: DataFrame,
    num_partitions: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """transcripts -> transcripts + doc_id:long (dense global rank).

    Output columns: doc_id + all input columns. Caller should write the
    result to storage (doc_map table) before building on it.
    """
    spark = transcripts.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    ranged = transcripts.repartitionByRange(
        num_partitions, *ORDER_COLS
    ).sortWithinPartitions(*ORDER_COLS)
    if persist:
        ranged = ranged.persist(StorageLevel.DISK_ONLY)

    # Phase 1: rows per physical partition (cheap count job).
    counts = (
        ranged.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    count_by_pid = {r["pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(num_partitions):
        offsets[pid] = acc
        acc += count_by_pid.get(pid, 0)

    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False)] + list(transcripts.schema)
    )
    b_offsets = spark.sparkContext.broadcast(offsets)

    def _assign(batches):
        pid = TaskContext.get().partitionId()
        next_id = b_offsets.value[pid]
        for pdf in batches:
            n = len(pdf)
            pdf = pdf.copy()
            pdf.insert(0, "doc_id", range(next_id, next_id + n))
            next_id += n
            yield pdf

    return ranged.mapInPandas(_assign, schema=out_schema)
