"""Real media decode kernels (PPM/WAV) + the distributed decode operator.

The container parsers are dependency-free (bytes + numpy); roundtrips use
NON-constant content so a byte-order/offset bug cannot cancel out. The
Spark-side decode_features result is checked against closed-form values.
"""

from __future__ import annotations

import numpy as np
import pytest

from searchengine_spark.operators import multimodal as mm


def test_ppm_roundtrip_gradient():
    h, w = 5, 7
    px = (np.arange(h * w * 3, dtype=np.uint64) * 13 % 251).astype(np.uint8)
    px = px.reshape(h, w, 3)
    w2, h2, got = mm.decode_ppm(mm.encode_ppm(px))
    assert (w2, h2) == (w, h)
    assert np.array_equal(got, px)


def test_ppm_header_comments_and_whitespace():
    px = np.full((2, 3, 3), 9, dtype=np.uint8)
    payload = b"P6\n# a comment\n 3\t2 # trailing\n255\n" + px.tobytes()
    w, h, got = mm.decode_ppm(payload)
    assert (w, h) == (3, 2)
    assert np.array_equal(got, px)


@pytest.mark.parametrize(
    "payload",
    [b"", b"P5\n1 1\n255\nX", b"P6\n2 2\n255\n\x00\x00"],  # empty, wrong magic, truncated
)
def test_ppm_malformed_raises(payload):
    with pytest.raises(ValueError):
        mm.decode_ppm(payload)


def test_wav_roundtrip_sine():
    t = np.arange(64)
    s = (np.sin(t / 4.0) * 12000).astype(np.int16)
    rate, got = mm.decode_wav(mm.encode_wav(s, 16000))
    assert rate == 16000
    assert np.array_equal(got, s)


def test_wav_odd_chunk_and_extra_chunk():
    # extra unknown chunk before fmt/data, odd-sized -> word-aligned skip
    import struct

    s = np.array([1, -2, 3], dtype=np.int16)
    base = mm.encode_wav(s, 8000)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"  # 3 bytes + pad
    payload = base[:12] + extra + base[12:]
    payload = payload[:4] + struct.pack("<I", len(payload) - 8) + payload[8:]
    rate, got = mm.decode_wav(payload)
    assert rate == 8000
    assert np.array_equal(got, s)


def test_wav_malformed_raises():
    with pytest.raises(ValueError):
        mm.decode_wav(b"RIFFxxxxWAVE")  # no chunks
    with pytest.raises(ValueError):
        mm.decode_wav(b"OGGS\x00\x00")


def test_decode_features_distributed(spark):
    ids = spark.range(0, 40).selectExpr("id as doc_id")
    out = {
        r["media_id"]: r
        for r in mm.decode_features(mm.synth_media(ids)).collect()
    }
    assert len(out) == 40
    for i in range(40):
        r = out[i]
        if i % 2 == 0:
            assert r["kind"] == "image"
            assert r["dim_a"] == i % 16 + 1
            assert r["dim_b"] == i % 8 + 1
            assert r["mean_value"] == float(i % 256)
        else:
            assert r["kind"] == "audio"
            assert r["dim_a"] == i % 64 + 1
            assert r["dim_b"] == 8000
            assert r["mean_value"] == float(i % 1000 - 500)
