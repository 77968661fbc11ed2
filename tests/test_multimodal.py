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


def test_resize_nearest_identity_and_downsample():
    grad = np.arange(4 * 8 * 3, dtype=np.uint8).reshape(4, 8, 3)
    assert np.array_equal(mm.resize_nearest(grad, 8, 4), grad)  # identity
    down = mm.resize_nearest(grad, 4, 2)
    assert down.shape == (2, 4, 3)
    # NN sampling grid: src index = floor((i+0.5)*in/out)
    ys = [int((i + 0.5) * 4 / 2) for i in range(2)]
    xs = [int((j + 0.5) * 8 / 4) for j in range(4)]
    assert np.array_equal(down, grad[np.ix_(ys, xs)])


def test_resize_constant_mean_exact():
    px = np.full((5, 7, 3), 123, dtype=np.uint8)
    assert float(mm.resize_nearest(px, 8, 4).mean()) == 123.0


def test_framepack_roundtrip_and_skip():
    frames = [np.full((2, 4, 3), v, dtype=np.uint8) for v in (10, 20, 30, 40, 50)]
    pack = mm.encode_framepack(frames)
    got = list(mm.decode_framepack(pack, every=2))
    assert [i for i, _ in got] == [0, 2, 4]
    for i, (w, h, px) in got:
        assert (w, h) == (4, 2)
        assert np.array_equal(px, frames[i])
    # every=1 decodes all
    assert [i for i, _ in mm.decode_framepack(pack, every=1)] == [0, 1, 2, 3, 4]


def test_resize_images_and_sample_frames_distributed(spark):
    ids = spark.range(0, 20).selectExpr("id as doc_id")
    media = mm.synth_media(ids)
    rs = {r["media_id"]: r for r in mm.resize_images(media, 8, 4).collect()}
    assert set(rs) == {i for i in range(20) if i % 2 == 0}
    for i, r in rs.items():
        assert (r["in_w"], r["in_h"]) == (i % 16 + 1, i % 8 + 1)
        assert (r["out_w"], r["out_h"]) == (8, 4)
        assert r["mean_value"] == float(i % 256)
    vids = mm.synth_video(ids)
    fr = {(r["media_id"], r["frame_idx"]): r["mean_value"]
          for r in mm.sample_frames(vids, every=2).collect()}
    want = {(i, f): float((i + f) % 256)
            for i in range(20) for f in range(0, i % 5 + 1, 2)}
    assert fr == want
