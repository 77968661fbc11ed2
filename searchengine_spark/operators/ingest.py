"""Fused ingest: deterministic doc-id assignment + tokenization in ONE
Arrow pass over the corpus.

The reference makes two separate passes with files between them (Repository
writes the doc store, Indexer's ForwardIndex stage re-reads and tokenizes —
SearchEngine Indexer/Repository/Program.cs:44-192, Indexer/Program.cs:238-414).
At 100 TB every extra pass over the text is the dominant cost, so the new
engine does both in a single ``mapInPandas``:

    transcripts --repartitionByRange(conv_id, turn_idx)
                --sortWithinPartitions
                --[count job -> driver prefix-sum offsets]
                --mapInPandas: doc_id = offset + local row number,
                               tokenize (vectorized regex + Counter),
                               emit (doc_id, meta..., dl, terms, tfs)

Downstream everything is JVM-side: the tf table is
``explode(arrays_zip(terms, tfs))`` (flat list<string>/list<int> Arrow
columns convert ~2x faster than list<struct>), stats are one hash agg.

Determinism: (conv_id, turn_idx) is unique, so global rank == doc_id no
matter where range-sampling places partition boundaries (same argument as
operators/docids.py, which remains the standalone id-assigner).
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark import StorageLevel, TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from searchengine_spark.functions.tokenize import MAX_TOKEN_LEN

ORDER_COLS = ["conv_id", "turn_idx"]

_LETTER_RUN = re.compile(r"[^\W\d_]+", re.UNICODE)


def tokenized_doc_map(
    transcripts: DataFrame,
    num_partitions: int | None = None,
    persist: bool = True,
    keep_text: bool = True,
    start_id: int = 0,
) -> DataFrame:
    """transcripts -> (doc_id, conv_id, turn_idx, role, tool, ts[, text],
    dl, terms:array<string>, tfs:array<int>) in one Python pass.

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
    offsets: dict[int, int] = {}
    acc = int(start_id)  # incremental batches continue the docID space
    for pid in range(num_partitions):
        offsets[pid] = acc
        acc += count_by_pid.get(pid, 0)
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
    no Python."""
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
