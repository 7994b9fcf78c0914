"""Multimodal (image/audio/video) column plumbing (SURVEY §2.8
extension surface).

Media payloads are opaque ``binary`` columns + a typed metadata struct;
all Spark-side plumbing (schemas, batch iteration, partitioning,
output shapes) is real and tested. The actual codec work (image
decode, resampling, frame extraction) REQUIRES libraries not present
in this container (Pillow/ffmpeg/torchvision) — those steps are
STUBBED: ``decode=\"real\"`` raises NotImplementedError at the decode
site, while the default deterministic fake decoder derives features
purely from the bytes (length, simple byte histogram) so every
pipeline stage around the codec is exercised end-to-end.

Why mapInPandas: codecs are per-record Python/C work on big blobs —
exactly the case where Arrow-batched pandas iteration beats both
row-at-a-time UDFs (batch amortization) and JVM expressions (no JVM
codec). Batches stream; no partition is materialized whole.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# canonical multimodal record schema: payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_sec", DoubleType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("sha256", StringType(), True),
        StructField("mean_byte", DoubleType(), True),
        StructField("feature_dim", LongType(), True),
    ]
)


def to_media_table(df: DataFrame, id_col: str, payload_col: str, mime: str) -> DataFrame:
    """Wrap an arbitrary binary column as the canonical media table."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.lit(mime).alias("mime"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.lit(None).cast("double").alias("duration_sec"),
    )


def media_meta(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass over payload bytes (no decode): size +
    content digest. This is the part that must never need Python."""
    return df.select(
        "media_id",
        "mime",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha256"),
    )


def _fake_decode(payload: bytes | None) -> tuple[float, int]:
    """Deterministic stand-in for a codec: mean byte value + a fixed
    'feature dimension'. Replaces Pillow/ffmpeg in this container."""
    if payload is None or len(payload) == 0:
        return (0.0, 0)
    return (sum(payload) / len(payload), 16)


def extract_image_features(df: DataFrame, decode: str = "fake") -> DataFrame:
    """Feature extraction over media payloads via Arrow-batched
    ``mapInPandas``. ``decode='real'`` marks where a genuine image
    library would run — unavailable here by design."""
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if decode == "real":
                raise NotImplementedError(
                    "real image decode requires Pillow/ffmpeg (not in this "
                    "container); use decode='fake' for the plumbing path"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [0 if b is None else len(b) for b in pdf["payload"]],
                    "sha256": [
                        None if b is None else hashlib.sha256(bytes(b)).hexdigest()
                        for b in pdf["payload"]
                    ],
                }
            )
            decoded = [_fake_decode(None if b is None else bytes(b)) for b in pdf["payload"]]
            out["mean_byte"] = [d[0] for d in decoded]
            out["feature_dim"] = [d[1] for d in decoded]
            yield out

    return df.select("media_id", "payload").mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: cut each payload into fixed-size
    chunks JVM-side (the real operator would emit decoded video frames;
    the partitioning/explode shape is identical). Output one row per
    chunk: (media_id, frame_no, frame_bytes)."""
    n = F.ceil(F.octet_length("payload") / F.lit(every_n_bytes)).cast("int")
    frames = F.transform(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0))),
        lambda i: F.substring(F.col("payload"), (i * every_n_bytes + 1).cast("int"), every_n_bytes),
    )
    return (
        df.where(F.octet_length("payload") > 0)
        .select("media_id", F.posexplode(frames).alias("frame_no", "frame_bytes"))
    )
