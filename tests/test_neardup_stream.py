"""Streaming MinHash-LSH near-dup: the emitted candidate-pair set must
equal the batch bucket join over the same corpus, and the stateless
in-row signature path must be row-identical to the batch wide variant."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from searchengine_spark.operators.dedup import (
    lsh_candidate_pairs_wide,
    minhash_signatures_inrow,
    minhash_signatures_wide,
)

N_PERM, N_BANDS = 16, 4


def _mk_docs(i, text):
    return (f"d{i:03d}", text, dt.datetime(2026, 1, 1, 12, 0, 0)
            + dt.timedelta(minutes=i))


_TEXTS = (
    ["the quick brown fox jumps over the lazy dog number %d" % i
     for i in range(6)]                       # near-dups of each other
    + ["completely different document about spark shuffles %d wide" % i
       for i in range(6, 9)]                  # another near-dup cluster
    + ["unique text alpha beta gamma delta epsilon zeta eta theta"]
)


def test_inrow_signatures_equal_wide(spark):
    docs = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(_TEXTS)] + [("short", "a b")],
        "doc_id string, text string")
    wide = {r["doc_id"]: tuple(r[f"mh_{i}"] for i in range(N_PERM))
            for r in minhash_signatures_wide(docs, n_perm=N_PERM).collect()}
    inrow = {r["doc_id"]: tuple(r[f"mh_{i}"] for i in range(N_PERM))
             for r in minhash_signatures_inrow(docs, n_perm=N_PERM).collect()}
    assert inrow == wide
    assert "short" not in inrow  # < k tokens: dropped by both


def test_stream_neardup_matches_batch(spark, tmp_path_factory):
    from searchengine_spark.streaming.neardup_stream import stream_neardup

    base = tmp_path_factory.mktemp("sneardup")
    in_dir, out_dir, ckpt = (str(base / d) for d in ("in", "out", "ckpt"))

    rows = [_mk_docs(i, t) for i, t in enumerate(_TEXTS)]
    schema = "doc_id string, text string, ts timestamp"
    # two arrival files: candidate pairs must span the file boundary
    # (docs in file 1 collide with bucket members recorded from file 0)
    spark.createDataFrame(rows[:5], schema).coalesce(1) \
        .write.mode("append").parquet(in_dir)
    spark.createDataFrame(rows[5:], schema).coalesce(1) \
        .write.mode("append").parquet(in_dir)

    q = stream_neardup(spark, in_dir, out_dir, ckpt,
                       n_perm=N_PERM, n_bands=N_BANDS)
    q.awaitTermination(180)

    got = spark.read.parquet(out_dir).collect()
    stream_pairs = {frozenset((r.doc_id_a, r.doc_id_b)) for r in got}
    # arrival-order invariant: a is always the earlier doc
    assert all(r.doc_id_a < r.doc_id_b for r in got)

    docs = spark.createDataFrame(
        [(d, t) for d, t, _ in rows], "doc_id string, text string")
    batch = lsh_candidate_pairs_wide(
        minhash_signatures_wide(docs, n_perm=N_PERM),
        n_perm=N_PERM, n_bands=N_BANDS).collect()
    batch_pairs = {frozenset((r.id_a, r.id_b)) for r in batch}

    assert stream_pairs == batch_pairs
    assert len(batch_pairs) > 0  # the gate is not vacuous


def test_stream_neardup_bucket_cap(spark, tmp_path_factory):
    """Past max_bucket, newcomers still pair against the capped member
    list but stop being recorded — state stays bounded."""
    from searchengine_spark.streaming.neardup_stream import stream_neardup

    base = tmp_path_factory.mktemp("sneardupcap")
    in_dir, out_dir, ckpt = (str(base / d) for d in ("in", "out", "ckpt"))
    # 5 identical docs -> same buckets in every band
    rows = [_mk_docs(i, "same text repeated for every doc here okay")
            for i in range(5)]
    schema = "doc_id string, text string, ts timestamp"
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("append").parquet(in_dir)

    q = stream_neardup(spark, in_dir, out_dir, ckpt,
                       n_perm=N_PERM, n_bands=N_BANDS, max_bucket=2)
    q.awaitTermination(180)

    got = spark.read.parquet(out_dir).collect()
    pairs = {(r.doc_id_a, r.doc_id_b) for r in got}
    # members recorded: d000, d001; d002..d004 each pair against both
    want = {("d%03d" % a, "d%03d" % b)
            for a in range(2) for b in range(5) if b > a}
    want |= {("d000", "d001")}
    assert pairs == want
