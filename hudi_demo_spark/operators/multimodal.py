"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested: schema, partition-friendly
batch shapes, Arrow-batched `mapInPandas` UDF signatures, deterministic
fake feature extraction. The actual codec step is STUBBED (image/audio
libraries are not in this container): `decode_image` raises
NotImplementedError unless `fake=True`, in which case a deterministic
pseudo-decode produces stable per-row features so pipelines are testable
end-to-end.

Design for 100 TB: binary payloads stay in parquet binary columns (never
collect, never base64 through the driver); decode/feature-extract runs in
`mapInPandas` so each Arrow batch is processed vectorized per partition;
metadata (width/height/codec/duration) lives in plain columns so filters
prune before any decode happens.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Turn a text table into a media table for plumbing tests: payload =
    utf-8 bytes of the text, metadata derived deterministically."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod(F.crc32(F.encode(F.col(text_col), "utf-8")), F.lit(1920)) + 1)
        .cast("int")
        .alias("width"),
        (F.pmod(F.crc32(F.encode(F.col(text_col), "utf-8")), F.lit(1080)) + 1)
        .cast("int")
        .alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def decode_image(payload: bytes, fake: bool = False):
    """STUB: real decoding needs an image library not present in this
    container. `fake=True` returns a deterministic 4-float pseudo-decode
    derived from the payload digest (stable across runs/partitions)."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library not available here; "
            "pass fake=True for the deterministic test double"
        )
    d = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in d[:4]]


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, per-partition, no
    driver involvement. Output matches FEATURE_SCHEMA."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": payloads.map(lambda b: decode_image(b, fake=fake)),
                }
            )

    from hudi_demo_spark.operators.util import spread

    narrow = media.select("media_id", "payload")
    # fan a single input split out before the Python stage (no-op at scale)
    return spread(narrow).mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    via sequence+explode — the decode of each frame is the stubbed step.
    The expansion happens executor-side (no driver loop)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms)
                )
            ).alias("frame_ts_ms"),
        )
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("orig_w", T.IntegerType()),
        T.StructField("orig_h", T.IntegerType()),
        T.StructField("new_w", T.IntegerType()),
        T.StructField("new_h", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_media(
    media: DataFrame, max_w: int = 256, max_h: int = 256, fake: bool = True
) -> DataFrame:
    """Aspect-preserving resize plan over mapInPandas: the dimension math
    (fit into max_w × max_h, never upscale) is real and oracle-checked;
    the pixel work is the stubbed codec step — with `fake=True` the
    payload passes through unchanged, without it the decode stub raises."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                pdf["payload"].map(lambda b: decode_image(b, fake=False))
            # NULL/non-positive dims (audio rows in a mixed-media table)
            # pass through with NULL output dims instead of NaN crashes
            valid = pdf["width"].notna() & pdf["height"].notna()
            valid &= (pdf["width"].fillna(0) > 0) & (pdf["height"].fillna(0) > 0)
            w = pdf["width"].where(valid, 1)
            h = pdf["height"].where(valid, 1)
            scale = (max_w / w).clip(upper=1.0).combine(
                (max_h / h).clip(upper=1.0), min
            )
            new_w = (w * scale).astype(int).where(valid).astype("Int32")
            new_h = (h * scale).astype(int).where(valid).astype("Int32")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "orig_w": pdf["width"].astype("Int32"),
                    "orig_h": pdf["height"].astype("Int32"),
                    "new_w": new_w,
                    "new_h": new_h,
                    "payload": pdf["payload"],
                }
            )

    return media.select("media_id", "width", "height", "payload").mapInPandas(
        _resize, RESIZE_SCHEMA
    )
