"""Varint + delta codec roundtrips (property-based, SURVEY.md §5.1)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_spark.functions.codec import (
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varint_decode(varint_encode(arr)).tolist() == vals


@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=300))
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.uint64)
    assert delta_decode(delta_encode(arr)).tolist() == sorted(ids)


@given(
    st.sets(st.integers(min_value=0, max_value=10**9), min_size=0, max_size=200),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(ids, data):
    docs = np.array(sorted(ids), dtype=np.uint64)
    tfs = np.array(
        [data.draw(st.integers(min_value=1, max_value=1000)) for _ in docs],
        dtype=np.uint64,
    )
    gaps_b, tfs_b = encode_postings(docs, tfs)
    d2, t2 = decode_postings(gaps_b, tfs_b)
    assert d2.tolist() == docs.tolist()
    assert t2.tolist() == tfs.tolist()


def test_compression_wins():
    # dense doc ids should take far less than 8 bytes/posting
    docs = np.arange(0, 100_000, 3, dtype=np.uint64)
    tfs = np.ones(docs.size, dtype=np.uint64)
    gaps_b, tfs_b = encode_postings(docs, tfs)
    assert (len(gaps_b) + len(tfs_b)) / docs.size < 2.5


def test_crc32_reference_compat(spark):
    """SURVEY §2.3 F4: Spark's F.crc32 is bit-identical to the reference's
    table-driven IEEE CRC-32 (and zlib's), so oracle-compat keying needs
    no UDF."""
    import zlib

    from pyspark.sql import functions as F

    from searchengine_spark.functions.hashing import crc32_col, crc32_reference_py

    words = ["hello", "don", "t", "a", "pneumono", "zzz", "Mixed", ""]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r["w"]: r["c"] for r in df.select("w", crc32_col(F.col("w")).alias("c")).collect()}
    for w in words:
        ref = crc32_reference_py(w.encode("utf-8"))
        assert got[w] == ref == zlib.crc32(w.encode("utf-8"))
    assert got["hello"] == 907060870  # SURVEY §1.2 verified constant


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=400))
@settings(max_examples=200, deadline=None)
def test_pack128_roundtrip(vals):
    from searchengine_spark.functions.codec import pack128_decode, pack128_encode

    arr = np.array(vals, dtype=np.uint64)
    assert pack128_decode(pack128_encode(arr)).tolist() == vals


def test_pack128_beats_varint_on_tight_gaps():
    """On dense range-sharded gap distributions (the doc-segment case) the
    FOR packing is strictly smaller than byte-aligned varint."""
    from searchengine_spark.functions.codec import pack128_encode, varint_encode

    rng = np.random.default_rng(1)
    gaps = rng.integers(1, 64, 10_000).astype(np.uint64)  # <=6-bit gaps
    assert len(pack128_encode(gaps)) < len(varint_encode(gaps))


def test_segment_codec_hybrid_selection(spark, small):
    """Long posting lists (>=128) are pack128, short tails varint, and
    both decode to the identical tf table (segments roundtrip already
    asserts set-equality; this pins the codec CHOICE)."""
    from searchengine_spark.build import build_index
    from searchengine_spark.functions.codec import PACK_BLOCK

    idx = build_index(small, num_doc_partitions=3, n_shards=1, layouts=("doc",))
    rows = idx.doc_segments.select("n", "codec").collect()
    assert any(r["codec"] == "pack128" for r in rows), "no long list packed"
    for r in rows:
        assert r["codec"] == ("pack128" if r["n"] >= PACK_BLOCK else "varint")
