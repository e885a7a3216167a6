"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (BASELINE.json north star).

The decode/feature kernels are STUBS — the image/audio libraries are not in
this container — but everything Spark-side is real and tested: schemas,
Arrow batch shapes, mapInPandas signatures, partition discipline.  Swap the
kernel body for a real decoder (PIL / torchaudio / pyav) and the pipeline is
unchanged.

Design rules for 100 TB of binaries:
- binaries ride in parquet as BINARY columns; metadata (width/height/codec/
  duration) lives in sibling typed columns so planning-time filters (e.g.
  ``width >= 512``) prune row groups WITHOUT touching the blobs;
- decode runs in ``mapInPandas`` over Arrow batches — per-batch vectorized,
  no per-row Python dispatch, and the blob column is projected only in the
  decode stage;
- frame-sampling/resize emit fixed-shape float arrays so downstream ops are
  columnar.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: typed-metadata schema for an image corpus table
IMAGE_TABLE_SCHEMA = StructType(
    [
        StructField("image_id", LongType(), False),
        StructField("data", BinaryType(), True),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

FEATURE_DIM = 16


def synthesize_image_table(spark, docs: DataFrame) -> DataFrame:
    """Deterministic fake image corpus derived from the documents table —
    stands in for a real binary-column table so the plumbing is testable."""
    return docs.select(
        F.col("doc_id").alias("image_id"),
        F.encode(F.col("text"), "UTF-8").cast("binary").alias("data"),
        F.lit("fake/raw").alias("format"),
        (F.col("n_chars") % 64 + 32).cast("int").alias("width"),
        (F.col("n_chars") % 48 + 24).cast("int").alias("height"),
    )


def _fake_decode_features(blob: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for decode→embed: md5-seeded pseudo-features.

    A real deployment replaces this body with e.g. PIL decode + model
    forward; signature and batch shape stay identical.
    """
    if blob is None:
        return [0.0] * dim
    h = hashlib.md5(bytes(blob)).digest()
    return [((h[i % 16] / 255.0) * 2.0 - 1.0) for i in range(dim)]


def extract_image_features(images: DataFrame) -> DataFrame:
    """decode + feature-extract over Arrow batches (mapInPandas).

    Only (image_id, data) are projected into the Python stage — metadata
    columns are re-joined by the caller if needed, keeping Arrow transfer
    minimal.
    """
    out_schema = StructType(
        [
            StructField("image_id", LongType(), False),
            StructField("n_bytes", LongType(), True),
            StructField("features", ArrayType(FloatType()), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "n_bytes": pdf["data"].map(lambda b: len(b) if b is not None else 0),
                    "features": pdf["data"].map(_fake_decode_features),
                }
            )

    return images.select("image_id", "data").mapInPandas(kernel, schema=out_schema)


def resize_stub(images: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize: STUB — no imaging library in this container.

    The Spark plumbing (projection, batch shape, output schema) is real; the
    kernel raises so nobody mistakes the output for pixels.
    """
    out_schema = StructType(
        [
            StructField("image_id", LongType(), False),
            StructField("data", BinaryType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image resize requires an imaging library (e.g. PIL) not present "
            "in this environment; plug the decoder in here"
        )

    return images.select("image_id", "data").mapInPandas(kernel, schema=out_schema)


def sample_video_frames_stub(videos: DataFrame, every_n: int) -> DataFrame:
    """Frame sampling: STUB kernel, real schema/plumbing (see resize_stub)."""
    out_schema = StructType(
        [
            StructField("video_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "video frame sampling requires pyav/ffmpeg, not present here"
        )

    return videos.mapInPandas(kernel, schema=out_schema)
