"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode/resize/frame-sample kernels require image/audio libraries that
are NOT in this container — they are STUBBED behind ``NotImplementedError``
with a deterministic fake used by tests. The Spark-side plumbing (schema,
partition-preserving mapInPandas, batch shapes, metadata extraction) is
real and tested.

Scale notes: payloads stay as parquet binary (never exploded to rows of
bytes); per-batch Arrow transfer; feature extraction yields fixed-width
columns so downstream joins are columnar.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)


def wrap_text_as_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Test helper: wrap a text column as an opaque binary payload with
    typed metadata — exercises the media schema without real media."""
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def payload_meta(media: DataFrame) -> DataFrame:
    """-> (media_id, kind, n_bytes, payload_md5): pure JVM metadata scan
    (no Python; the binary column is never decoded)."""
    return media.select(
        "media_id",
        "kind",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


def decode_image(payload: bytes) -> "object":
    """Real decoder — requires PIL/cv2, not present in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; wire in on a cluster image. "
        "Tests use fake_decode_features()."
    )


def fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'decoder': md5-seeded feature vector. Stands in
    for decode->resize->embed so the distributed plumbing is testable."""
    h = hashlib.md5(payload or b"").digest()
    return [h[i] / 255.0 for i in range(dim)]


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def extract_features(media: DataFrame, dim: int = 8, use_fake: bool = True) -> DataFrame:
    """media -> (media_id, kind, n_bytes, features:array<double>) via
    Arrow-batched mapInPandas. ``use_fake=False`` would call the real
    decoder (stubbed in this container)."""
    decoder = fake_decode_features if use_fake else decode_image

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "features": payloads.map(lambda b: decoder(b, dim)),
                }
            )

    return media.mapInPandas(_extract, schema=_FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: (media_id, frame_ts_ms) rows generated
    JVM-side from duration metadata — the decode of each frame is the
    stubbed kernel. Shows the explode-then-process shape used at scale."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
