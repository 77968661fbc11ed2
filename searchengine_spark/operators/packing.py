"""Token-budget packing: lay documents head-to-tail in a deterministic
order and cut fixed-size training sequences — the GPT-style packing step
that turns a cleaned corpus into equal-length training rows.

Semantics (relational, so the DuckDB oracle is a plain window cumsum):

    start_offset(d) = sum of lengths of all docs before d (exclusive)
    bin_id(d)       = start_offset // budget
    offset_in_bin   = start_offset %  budget

A doc may straddle a bin boundary (concatenate-then-cut packing); the
assignment is a pure function of the ordered prefix sums.

Scale shape: a naive `sum() OVER (ORDER BY ...)` global window is a
single-task sort at 10^12 rows. This uses the engine's two-phase
prefix-sum pattern (same as dense doc-id assignment,
operators/docids.py:33-82): range-partition by the order key, ONE cheap
per-partition length-sum job, exclusive prefix offsets on the driver
(#partitions numbers, not rows), then one Arrow pass adds the running
offsets partition-locally. No global sort, no shuffle beyond the range
partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel
from pyspark.taskcontext import TaskContext


def pack_bins(
    df: DataFrame,
    budget: int,
    len_col: str,
    order_col: str = "doc_id",
    num_partitions: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """df + (start_offset, bin_id, offset_in_bin), docs packed in
    ``order_col`` order by cumulative ``len_col`` against ``budget``."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    ranged = df.repartitionByRange(
        num_partitions, order_col
    ).sortWithinPartitions(order_col)
    if persist:
        ranged = ranged.persist(StorageLevel.DISK_ONLY)

    sums = (
        ranged.select(F.spark_partition_id().alias("pid"), F.col(len_col))
        .groupBy("pid")
        .agg(F.coalesce(F.sum(len_col), F.lit(0)).alias("s"))
        .collect()
    )
    sum_by_pid = {r["pid"]: int(r["s"]) for r in sums}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(num_partitions):
        offsets[pid] = acc
        acc += sum_by_pid.get(pid, 0)

    out_schema = T.StructType(
        list(df.schema)
        + [
            T.StructField("start_offset", T.LongType(), False),
            T.StructField("bin_id", T.LongType(), False),
            T.StructField("offset_in_bin", T.LongType(), False),
        ]
    )
    b_offsets = spark.sparkContext.broadcast(offsets)
    b = int(budget)

    def _pack(batches):
        pid = TaskContext.get().partitionId()
        start = b_offsets.value[pid]
        for pdf in batches:
            lens = pdf[len_col].astype("int64")
            ends = lens.cumsum() + start
            starts = ends - lens
            pdf = pdf.copy()
            pdf["start_offset"] = starts
            pdf["bin_id"] = starts // b
            pdf["offset_in_bin"] = starts % b
            start = int(ends.iloc[-1]) if len(pdf) else start
            yield pdf

    return ranged.mapInPandas(_pack, schema=out_schema)


def budget_select(
    df: DataFrame,
    budget: int,
    len_col: str,
    quality_col: str = "quality",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Token-budget corpus selection: take whole docs in
    (``quality_col`` desc, ``id_col`` asc) order while the INCLUSIVE
    running token total stays <= ``budget`` — the "best N tokens of the
    corpus" curation step that sits between quality scoring and packing.

    Prefix semantics (the doc that would overflow the budget ends the
    selection; no skip-and-continue knapsack) keep it a pure function of
    the ordered prefix sum, so the oracle is a window cumsum and the
    scale shape is the same two-phase prefix sum as pack_bins: range-
    partition on the order key, per-partition sums, driver exclusive
    offsets (#partitions numbers), one Arrow pass. The budget filter
    then prunes whole partitions (every partition whose driver offset
    already exceeds the budget is never materialized past its scan).

    -> (id, quality, len, cum_tokens) rows of the selected prefix,
    ordered (quality desc, id asc).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    order = [F.col(quality_col).desc(), F.col(id_col).asc()]
    ranged = df.select(id_col, quality_col, len_col).repartitionByRange(
        num_partitions, *order
    ).sortWithinPartitions(*order)
    ranged = ranged.persist(StorageLevel.DISK_ONLY)

    sums = (
        ranged.select(F.spark_partition_id().alias("pid"), F.col(len_col))
        .groupBy("pid")
        .agg(F.coalesce(F.sum(len_col), F.lit(0)).alias("s"))
        .collect()
    )
    sum_by_pid = {r["pid"]: int(r["s"]) for r in sums}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(num_partitions):
        offsets[pid] = acc
        acc += sum_by_pid.get(pid, 0)

    out_schema = T.StructType(
        list(ranged.schema) + [T.StructField("cum_tokens", T.LongType(), False)]
    )
    b_offsets = spark.sparkContext.broadcast(offsets)
    b = int(budget)

    def _cum(batches):
        pid = TaskContext.get().partitionId()
        start = b_offsets.value[pid]
        if start >= b:  # whole partition past the budget — emit nothing
            return
        for pdf in batches:
            lens = pdf[len_col].astype("int64")
            ends = lens.cumsum() + start
            pdf = pdf.copy()
            pdf["cum_tokens"] = ends
            start = int(ends.iloc[-1]) if len(pdf) else start
            yield pdf[pdf["cum_tokens"] <= b]
            if start >= b:  # nothing later can fit — stop reading
                return

    return (
        ranged.mapInPandas(_cum, schema=out_schema)
        .orderBy(F.col(quality_col).desc(), F.col(id_col).asc())
    )
