"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with mapInPandas plumbing for decode / feature-extract /
resize / frame-sample.

The reference's multimodal path is: S3 object bytes → PIL RGB decode →
resnet34 features (s3vectors-app/pythonvectordbceph.py:28-42). Here the
same flow is a Spark plan over a `binaryFile` scan:

    spark.read.format("binaryFile").load("s3a://bucket/…")
      → mapInPandas(decode/resize/sample)   # Arrow-batched
      → pandas_udf(image_embed_udf)         # embed/__init__.py

Media codec libraries (PIL/ffmpeg) are not in this container, so the
decode kernels are STUBBED: they raise NotImplementedError unless
``deterministic_fake=True``, in which case they emit hash-derived fake
pixels/frames with the real schema, batch shape and partitioning. The
Spark-side plumbing is real and tested; swapping a stub for a PIL/
ffmpeg body changes no plan shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata carried alongside the opaque payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),   # image|audio|video
        T.StructField("content", T.BinaryType(), True),      # opaque bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def media_table_from_binary_files(spark, path: str, modality: str = "image") -> DataFrame:
    """binaryFile scan → media schema. At scale the scan parallelizes
    by file; maxPartitionBytes controls batch sizing."""
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.col("path").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.col("content"),
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.create_map().cast("map<string,string>").alias("tags"),
    )


def _fake_pixels(seed: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic fake decode: sha256-seeded uint8 image."""
    rng = np.frombuffer(
        b"".join(
            hashlib.sha256(seed + i.to_bytes(4, "little")).digest()
            for i in range((h * w * 3) // 32 + 1)
        ),
        dtype=np.uint8,
    )
    return rng[: h * w * 3].reshape(h, w, 3)


DECODED_SCHEMA = "media_id string, height int, width int, channels int, pixel_sum bigint"


def decode_image_batch(df: DataFrame, deterministic_fake: bool = False,
                       out_h: int = 32, out_w: int = 32) -> DataFrame:
    """Decode images to (h, w, c) + checksum via mapInPandas.

    Real body would be PIL `Image.open(...).convert("RGB")` (the
    reference's decode at pythonvectordbceph.py:34). STUB: raises
    unless deterministic_fake.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "image decode requires PIL, not present in this container; "
                    "pass deterministic_fake=True for the hermetic path"
                )
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                px = _fake_pixels(bytes(content or b"") or mid.encode(), out_h, out_w)
                rows.append((mid, out_h, out_w, 3, int(px.sum())))
            yield pd.DataFrame(rows, columns=["media_id", "height", "width",
                                              "channels", "pixel_sum"])

    return df.select("media_id", "content").mapInPandas(kernel, DECODED_SCHEMA)


def resize_images(df: DataFrame, h: int, w: int, deterministic_fake: bool = False) -> DataFrame:
    """Resize kernel — same plumbing; stub emits fake pixels at the
    target size so downstream batch shapes are exercised."""
    return decode_image_batch(df, deterministic_fake=deterministic_fake,
                              out_h=h, out_w=w)


FRAME_SCHEMA = "media_id string, frame_idx int, frame_ts_ms bigint, frame_checksum string"


def frame_sample(df: DataFrame, every_ms: int = 1000, max_frames: int = 8,
                 deterministic_fake: bool = False) -> DataFrame:
    """Video frame sampling via mapInPandas (1 row in → n frame rows
    out). Real body = ffmpeg/pyav iterate; STUB emits hash frames."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "video decode requires ffmpeg/pyav, not in this container; "
                    "pass deterministic_fake=True for the hermetic path"
                )
            rows = []
            for mid, content, dur in zip(
                pdf["media_id"], pdf["content"], pdf["duration_ms"]
            ):
                n = min(max_frames, max(1, int((dur or every_ms) // every_ms)))
                for i in range(n):
                    digest = hashlib.sha256(
                        bytes(content or b"") + i.to_bytes(4, "little")
                    ).hexdigest()
                    rows.append((mid, i, i * every_ms, digest))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                              "frame_ts_ms", "frame_checksum"])

    return df.select("media_id", "content", "duration_ms").mapInPandas(kernel, FRAME_SCHEMA)


def extract_image_features(df: DataFrame) -> DataFrame:
    """content bytes → 512-dim feature column, via the embed UDF
    (iterator pandas_udf; stubbed model, real Arrow plumbing)."""
    from ..embed import image_embed_udf

    return df.withColumn("features", image_embed_udf(F.col("content")))
