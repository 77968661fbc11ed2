"""Streaming NEAR-duplicate detection — the in-stream twin of batch
MinHash+LSH (``operators/dedup``).

``dropDuplicatesWithinWatermark`` (``dedup_stream``) only catches verbatim
repeats; a firehose also carries near-copies (re-crawls, light edits,
templated spam). The batch answer is MinHash signatures + banded LSH
buckets; this module streams it:

    readStream
      -- minhash_signatures_inrow          (STATELESS: zero-shuffle,
                                            per-row array algebra)
      -- explode band_keys_expr            (n_bands rows per doc)
      -- withWatermark(ts)
      -- groupBy(band, band_key)
      -- applyInPandasWithState            (STATEFUL: bucket membership)
      -- append candidate pairs (earlier_doc, later_doc, band)

Semantics: a doc entering a bucket emits one candidate pair against every
doc already in that bucket (arrival order by (ts, doc_id) — deterministic
replay); the bucket's member list is the state. A pair colliding in
several bands is emitted once per band — downstream (or the consumer)
dedupes, exactly as the batch bucket join does with ``distinct()``.

State bounds, both explicit because unbounded state is how streaming near
-dup dies at 10^12 turns:
- ``max_bucket`` caps the member list. A bucket past the cap stops
  RECORDING new members but still emits pairs against the capped list —
  near-dup detection degrades gracefully (every newcomer is still checked
  against the first ``max_bucket`` residents, which for a spam cluster is
  exactly what matters) instead of OOMing the state store.
- event-time timeout: a bucket idle past the watermark horizon is
  evicted, so state is O(buckets active within the horizon), not corpus
  cardinality — the same trade ``dedup_stream`` documents.

Like the exact-dedup stream, the oracle is the batch twin: restricted to
docs within one horizon, the emitted pair set equals
``lsh_candidate_pairs_wide`` over the same corpus (asserted in tests).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from searchengine_spark.operators.dedup import (
    band_keys_expr,
    minhash_signatures_inrow,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming import StreamingQuery

PAIR_SCHEMA = StructType([
    StructField("doc_id_a", StringType()),   # earlier arrival
    StructField("doc_id_b", StringType()),   # later arrival
    StructField("band", IntegerType()),
])
# bucket state: member doc-ids in arrival order + last event-time (us)
STATE_SCHEMA = StructType([
    StructField("ids", ArrayType(StringType())),
    StructField("last_us", LongType()),
])


def _make_bucket_fn(max_bucket: int, horizon_ms: int):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        ids, last_us = (state.get if state.exists else ([], 0))
        ids = list(ids)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "doc_id"], kind="mergesort")
        out_a, out_b, out_band = [], [], []
        band = int(batch["band"].iloc[0])
        for doc_id, ts in zip(batch["doc_id"], batch["ts"]):
            for earlier in ids:
                out_a.append(earlier)
                out_b.append(doc_id)
                out_band.append(band)
            if len(ids) < max_bucket:
                ids.append(doc_id)
            last_us = max(last_us, int(ts.value // 1_000))
        state.update((ids, last_us))
        state.setTimeoutTimestamp(last_us // 1_000 + horizon_ms)
        if out_a:
            yield pd.DataFrame(
                {"doc_id_a": out_a, "doc_id_b": out_b, "band": out_band})

    return fn


def neardup_candidates(
    docs: DataFrame,
    n_perm: int = 16,
    n_bands: int = 4,
    watermark: str = "1 hour",
    horizon_ms: int = 3_600_000,
    max_bucket: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Watermarked doc stream (id, text, ts) -> append stream of LSH
    candidate pairs. One shuffle (hash by bucket); everything upstream of
    the stateful stage is stateless row algebra."""
    sigs = minhash_signatures_inrow(
        docs, n_perm=n_perm, id_col=id_col, keep_cols=("ts",))
    bands = (
        sigs.select(
            F.col(id_col).cast("string").alias("doc_id"), "ts",
            F.explode(band_keys_expr(n_perm, n_bands)).alias("x"))
        .select("doc_id", "ts", "x.band", "x.band_key")
    )
    return (
        bands.withWatermark("ts", watermark)
        .groupBy("band", "band_key")
        .applyInPandasWithState(
            _make_bucket_fn(max_bucket, horizon_ms),
            outputStructType=PAIR_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_neardup(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id string, text string, ts timestamp",
    **kw,
) -> "StreamingQuery":
    """File-source doc stream -> candidate-pair append sink
    (maxFilesPerTrigger=1 for deterministic arrival order per file)."""
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(input_dir)
    )
    pairs = neardup_candidates(src, **kw)
    return (
        pairs.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
