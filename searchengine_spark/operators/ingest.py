"""Fused ingest: deterministic doc-id assignment + tokenization in ONE
pass over the corpus.

The reference makes two separate passes with files between them (Repository
writes the doc store, Indexer's ForwardIndex stage re-reads and tokenizes —
SearchEngine Indexer/Repository/Program.cs:44-192, Indexer/Program.cs:238-414).
At 100 TB every extra pass over the text is the dominant cost, so the new
engine does both in a single pass. TWO equivalent tokenize engines
(cross-checked bit-identical by tests):

- ``tokenizer="jvm"`` (default): split/filter/lower as Catalyst
  expressions inside whole-stage codegen — ZERO Python in the build hot
  loop, so no JVM<->Python Arrow traffic at all for the text pass (the
  task-level guidance: built-in functions beat UDFs; UDFs are the slow
  path). doc_id = partition offset (driver prefix-sum) + the
  monotonically_increasing_id local counter, all JVM. Emits raw token
  arrays; the per-doc tf aggregation happens in ``tf_from_doc_map`` as a
  hash agg whose partial phase collapses map-side (a doc's tokens are
  contiguous in its range partition).
- ``tokenizer="arrow"``: the vectorized pandas/Arrow UDF pass (regex +
  Counter per batch) emitting pre-aggregated (terms, tfs) — the
  north-star Arrow-UDF formulation, kept as a first-class mode and the
  cross-check oracle for the JVM path.

    transcripts --repartitionByRange(conv_id, turn_idx)
                --sortWithinPartitions
                --[count job -> driver prefix-sum offsets]
                --tokenize + doc_id    (JVM codegen | one Arrow pass)
                --emit (doc_id, meta..., dl, tokens | terms+tfs)

Determinism: (conv_id, turn_idx) is unique, so global rank == doc_id no
matter where range-sampling places partition boundaries (same argument as
operators/docids.py, which remains the standalone id-assigner). The
persisted ranged copy pins partition contents, and within a partition
both the mapInPandas counter and monotonically_increasing_id assign in
the sorted row order.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark import StorageLevel, TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from searchengine_spark.functions.tokenize import MAX_TOKEN_LEN, spark_tokens_sql

ORDER_COLS = ["conv_id", "turn_idx"]

_LETTER_RUN = re.compile(r"[^\W\d_]+", re.UNICODE)


def tokenized_doc_map(
    transcripts: DataFrame,
    num_partitions: int | None = None,
    persist: bool = True,
    keep_text: bool = True,
    start_id: int = 0,
    tokenizer: str = "jvm",
    partition_counts: dict | None = None,
) -> DataFrame:
    """transcripts -> (doc_id, conv_id, turn_idx, role, tool, ts[, text],
    dl, tokens | terms+tfs) in one pass (see module docstring for the two
    tokenize engines; both yield the identical tf table downstream).

    ``keep_text`` keeps the raw text column: the doc map doubles as the
    document store (the reference's wikitext.txt + index,
    Indexer/Repository/Program.cs:140-143), and the BASELINE per-turn
    text-equality invariant is asserted against it."""
    spark = transcripts.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    ranged = transcripts.repartitionByRange(
        num_partitions, *ORDER_COLS
    ).sortWithinPartitions(*ORDER_COLS)
    if persist:
        ranged = ranged.persist(StorageLevel.DISK_ONLY)

    counts = (
        ranged.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    count_by_pid = {r["pid"]: r["count"] for r in counts}
    if partition_counts is not None:
        # expose the count job's per-partition rows: doc_map partitions map
        # 1:1 onto ranged partitions, so callers (pipeline metrics) reuse
        # them instead of paying a second scan of the written table
        partition_counts.update(count_by_pid)
    offsets: dict[int, int] = {}
    acc = int(start_id)  # incremental batches continue the docID space
    for pid in range(num_partitions):
        offsets[pid] = acc
        acc += count_by_pid.get(pid, 0)

    if tokenizer == "jvm":
        # doc_id: partition offset + monotonically_increasing_id's local
        # counter (id = pid << 33 | local position, assigned in the
        # sorted in-partition row order) — no window, no extra shuffle.
        # Offsets ride as ONE array literal indexed by pid (a create_map
        # would put 2 x num_partitions literal nodes in the plan — at
        # cluster scale that's tens of thousands of nodes through every
        # analyzer pass).
        oarr = F.lit([offsets[p] for p in range(num_partitions)])
        mono = F.monotonically_increasing_id()
        pid = F.shiftright(mono, 33).cast("int")
        local = mono - F.shiftleft(pid.cast("long"), 33)
        # per-doc tf vector WITHOUT any aggregation/shuffle: sort the token
        # array, then run-length-encode runs of equal tokens with array
        # expressions (starts = run start positions; tf = next start - start)
        # — the JVM twin of the Arrow pass's Counter, whole-stage codegen.
        toks = F.coalesce(
            F.expr(spark_tokens_sql("text")),
            F.array().cast("array<string>"),
        )
        meta = [f.name for f in transcripts.schema
                if keep_text or f.name != "text"]
        starts = (
            "filter(sequence(1, size(_s)),"
            " i -> i = 1 OR element_at(_s, i) != element_at(_s, i - 1))"
        )
        out = (
            ranged.select(
                (F.element_at(oarr, pid + F.lit(1)) + local).alias("doc_id"),
                *meta,
                F.array_sort(toks).alias("_s"),
            )
            .withColumn(
                "_starts",
                F.expr(
                    "CASE WHEN size(_s) = 0"
                    f" THEN cast(array() as array<int>) ELSE {starts} END"
                ),
            )
            .select(
                "doc_id",
                *meta,
                F.size("_s").alias("dl"),
                F.expr("transform(_starts, i -> element_at(_s, i))")
                .alias("terms"),
                F.expr(
                    "CASE WHEN size(_starts) = 0 THEN cast(array() as array<int>)"
                    " ELSE zip_with(_starts,"
                    " concat(slice(_starts, 2, greatest(size(_starts) - 1, 0)),"
                    "        array(size(_s) + 1)),"
                    " (a, b) -> cast(b - a as int)) END"
                ).alias("tfs"),
            )
        )
        return out
    if tokenizer != "arrow":
        raise ValueError(f"unknown tokenizer engine: {tokenizer!r}")
    b_offsets = spark.sparkContext.broadcast(offsets)

    meta_fields = [
        f for f in transcripts.schema if keep_text or f.name != "text"
    ]
    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False)]
        + meta_fields
        + [
            T.StructField("dl", T.IntegerType(), False),
            T.StructField("terms", T.ArrayType(T.StringType()), False),
            T.StructField("tfs", T.ArrayType(T.IntegerType()), False),
        ]
    )
    meta_cols = [f.name for f in meta_fields]
    findall = _LETTER_RUN.findall
    max_len = MAX_TOKEN_LEN

    def _run(batches):
        pid = TaskContext.get().partitionId()
        next_id = b_offsets.value[pid]
        for pdf in batches:
            n = len(pdf)
            terms_col, tfs_col, dl_col = [], [], []
            for t in pdf["text"]:
                if not t:
                    terms_col.append([])
                    tfs_col.append([])
                    dl_col.append(0)
                    continue
                c = Counter(
                    r.lower()
                    for r in findall(t)
                    if r.isascii() and len(r) <= max_len
                )
                terms_col.append(list(c.keys()))
                tfs_col.append(list(c.values()))
                dl_col.append(sum(c.values()))
            out = pdf[meta_cols].copy()
            out.insert(0, "doc_id", range(next_id, next_id + n))
            out["dl"] = dl_col
            out["terms"] = terms_col
            out["tfs"] = tfs_col
            next_id += n
            yield out

    return ranged.mapInPandas(_run, schema=out_schema)


def tf_from_doc_map(doc_map: DataFrame) -> DataFrame:
    """Fused doc map -> tf table (term, doc_id, tf, dl) — JVM-side explode,
    no Python, no aggregation (both tokenizer engines emit pre-aggregated
    per-doc (terms, tfs) arrays)."""
    return doc_map.select(
        "doc_id",
        "dl",
        F.explode(F.arrays_zip("terms", "tfs")).alias("p"),
    ).select(
        F.col("p.terms").alias("term"),
        "doc_id",
        F.col("p.tfs").cast("long").alias("tf"),
        "dl",
    )
