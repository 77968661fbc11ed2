"""Multimodal plumbing: payload meta, decode, resize, frame sampling.

Split out of entry_queries.py (round 5); the ordered registry lives there.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.operators import multimodal
from searchengine_spark.entry._shared import (_docs)


def q_payload_meta(spark, sf_dir):
    media = multimodal.wrap_text_as_media(_docs(spark, sf_dir))
    return multimodal.payload_meta(media).select(
        "media_id", "kind", F.col("n_bytes").cast("long").alias("n_bytes"), "payload_md5"
    )


SQL_PAYLOAD_META = (
    "SELECT doc_id::BIGINT AS media_id, 'image' AS kind,"
    " strlen(coalesce(text, ''))::BIGINT AS n_bytes,"
    " md5(coalesce(text, '')) AS payload_md5 FROM documents"
)


_FEATURE_DIM = 8


def q_media_features(spark, sf_dir):
    """Feature-extraction plumbing (Arrow mapInPandas over binary payloads),
    exploded to hashable (media_id, kind, n_bytes, dim_idx, value) rows.

    The deterministic fake decoder (md5(payload)[i]/255) IS expressible in
    SQL, so this has a full value-hash oracle — not just a rows check."""
    media = multimodal.wrap_text_as_media(_docs(spark, sf_dir))
    feats = multimodal.extract_features(media, dim=_FEATURE_DIM)
    return feats.select(
        "media_id",
        "kind",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.posexplode("features").alias("dim_idx", "value"),
    ).select(
        "media_id",
        "kind",
        "n_bytes",
        F.col("dim_idx").cast("long").alias("dim_idx"),
        F.round("value", 6).alias("value"),
    )


def q_media_decode(spark, sf_dir):
    """REAL media decode: deterministic PPM/WAV payloads are generated
    distributed (closed-form in doc_id), then actually parsed back by the
    numpy container decoders; the oracle recomputes the expected decoded
    dimensions/means analytically in SQL (no decode on the oracle side) —
    so any parser bug breaks the value hash."""
    media = multimodal.synth_media(_docs(spark, sf_dir))
    out = multimodal.decode_features(media)
    return out.select(
        "media_id", "kind", "dim_a", "dim_b",
        F.round("mean_value", 6).alias("mean_value"),
    )


SQL_MEDIA_DECODE = """SELECT doc_id::BIGINT AS media_id,
  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
  (CASE WHEN doc_id % 2 = 0 THEN doc_id % 16 + 1 ELSE doc_id % 64 + 1 END)::BIGINT AS dim_a,
  (CASE WHEN doc_id % 2 = 0 THEN doc_id % 8 + 1 ELSE 8000 END)::BIGINT AS dim_b,
  round((CASE WHEN doc_id % 2 = 0 THEN doc_id % 256
              ELSE doc_id % 1000 - 500 END)::DOUBLE, 6) AS mean_value
FROM documents"""


# fake decoder: features[i] = byte i of md5(payload) / 255; payload is the
# UTF-8 text, so DuckDB's md5(text) sees the same bytes. k/255 has no exact
# 6-decimal ties (255 = 3*5*17 never divides k*10^6 unless k/255 is exact
# in tenths), so cross-engine round(,6) is stable.
SQL_MEDIA_FEATURES = f"""WITH dims AS (SELECT unnest(range(0, {_FEATURE_DIM})) AS dim_idx),
m AS (SELECT doc_id::BIGINT AS media_id, 'image' AS kind,
             strlen(coalesce(text, ''))::BIGINT AS n_bytes,
             md5(coalesce(text, '')) AS h
      FROM documents)
SELECT media_id, kind, n_bytes, dim_idx::BIGINT AS dim_idx,
       round((('0x' || substring(h, dim_idx * 2 + 1, 2))::INT) / 255.0, 6) AS value
FROM m CROSS JOIN dims"""




def q_media_resize(spark, sf_dir):
    """REAL decode->resize kernel: PPM payloads parsed and nearest-neighbor
    resized to 8x4; constant-pixel fixtures make the resized mean
    analytically exact (mean of a constant image is the constant at any
    output size), while the decoder+resampler still run for real."""
    media = multimodal.synth_media(_docs(spark, sf_dir))
    out = multimodal.resize_images(media, out_w=8, out_h=4)
    return out.select(
        "media_id", "in_w", "in_h", "out_w", "out_h",
        F.round("mean_value", 6).alias("mean_value"),
    )


SQL_MEDIA_RESIZE = """SELECT doc_id::BIGINT AS media_id,
  (doc_id % 16 + 1)::BIGINT AS in_w, (doc_id % 8 + 1)::BIGINT AS in_h,
  8::BIGINT AS out_w, 4::BIGINT AS out_h,
  round((doc_id % 256)::DOUBLE, 6) AS mean_value
FROM documents WHERE doc_id % 2 = 0"""


def q_video_frame_sample(spark, sf_dir):
    """Video frame sampling with real per-frame decode: each doc_id gets a
    (doc_id % 5 + 1)-frame synthetic video (length-prefixed PPM frames);
    every 2nd frame is decoded (skipped frames are length-seeked, never
    parsed) and its mean emitted. Frame means are closed-form in
    (doc_id, frame_idx), so the oracle is analytic SQL."""
    media = multimodal.synth_video(_docs(spark, sf_dir))
    out = multimodal.sample_frames(media, every=2)
    return out.select(
        "media_id", "frame_idx", F.round("mean_value", 6).alias("mean_value")
    )


SQL_VIDEO_FRAME_SAMPLE = """SELECT doc_id::BIGINT AS media_id,
  f::BIGINT AS frame_idx,
  round(((doc_id + f) % 256)::DOUBLE, 6) AS mean_value
FROM documents, unnest(range(0, doc_id % 5 + 1, 2)) AS t(f)"""
