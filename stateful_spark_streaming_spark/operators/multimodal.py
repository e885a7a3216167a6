"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (BASELINE.json north star).

The container has no imaging/codec libraries (PIL / ffmpeg / torchaudio),
so the REAL kernels here work on codec-less formats that numpy alone can
handle — binary PPM (P6) images and concatenated-PPM "video" streams —
and refuse loudly on anything that would need a codec (JPEG/PNG/H.264).
Everything Spark-side is format-agnostic and identical to a production
deployment: schemas, Arrow batch shapes, mapInPandas signatures, binary
columns with typed sibling metadata.  Swapping PIL/pyav into the kernel
bodies changes no plumbing.

Design rules for 100 TB of binaries:
- binaries ride in parquet as BINARY columns; metadata (width/height/codec/
  duration) lives in sibling typed columns so planning-time filters (e.g.
  ``width >= 512``) prune row groups WITHOUT touching the blobs;
- decode runs in ``mapInPandas`` over Arrow batches — per-batch vectorized,
  no per-row Python dispatch, and the blob column is projected only in the
  decode stage;
- frame-sampling/resize emit fixed-shape arrays / re-encoded blobs so
  downstream ops are columnar.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
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

_PPM_HEADER = re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s")


# ---------------------------------------------------------------- codecs
def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6) bytes."""
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def decode_ppm(blob: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes → (h, w, 3) uint8 pixel array — numpy only."""
    blob = bytes(blob)
    m = _PPM_HEADER.match(blob)
    if m is None:
        raise NotImplementedError(
            "only binary PPM (P6) decodes without an imaging library; "
            "plug PIL/opencv into this kernel for other formats"
        )
    w, h = int(m.group(1)), int(m.group(2))
    px = np.frombuffer(blob, dtype=np.uint8, count=w * h * 3, offset=m.end())
    return px.reshape(h, w, 3)


# ------------------------------------------------------------- synthesis
def synthesize_image_table(spark, docs: DataFrame) -> DataFrame:
    """Deterministic REAL image corpus derived from the documents table:
    each doc becomes a genuine binary-PPM image whose pixels are an
    arithmetic pattern of (image_id, x, y) — decodable by any PPM reader,
    stands in for a real binary-column table at test scale."""
    # spread ahead of the Python stages: the small test table is one parquet
    # row group = one task, which would serialize BOTH the synth and the
    # decode kernels; at production scale the scan already has many splits
    # and this narrow repartition is noise vs the per-image work it precedes
    meta = docs.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("doc_id").alias("image_id"),
        (F.col("n_chars") % 64 + 32).cast("int").alias("width"),
        (F.col("n_chars") % 48 + 24).cast("int").alias("height"),
    )

    out_schema = IMAGE_TABLE_SCHEMA

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for iid, w, h in zip(pdf["image_id"], pdf["width"], pdf["height"]):
                y, x, c = np.ogrid[0:h, 0:w, 0:3]
                px = (int(iid) * 7 + x * 3 + y * 5 + c * 11) % 256
                blobs.append(encode_ppm(px.astype(np.uint8)))
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "data": blobs,
                    "format": "ppm",
                    "width": pdf["width"],
                    "height": pdf["height"],
                }
            )

    return meta.mapInPandas(kernel, schema=out_schema)


# ---------------------------------------------------------------- kernels
def _image_features(blob: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """REAL decode → feature extraction: per-channel mean/std, luma
    mean/std, and an 8-bin luma histogram — 16 deterministic floats from
    actual pixel data."""
    if blob is None:
        return [0.0] * dim
    px = decode_ppm(blob).astype(np.float64) / 255.0
    luma = px @ np.array([0.2126, 0.7152, 0.0722])
    hist, _ = np.histogram(luma, bins=8, range=(0.0, 1.0))
    hist = hist / luma.size
    feats = np.concatenate(
        [px.mean(axis=(0, 1)), px.std(axis=(0, 1)),
         [luma.mean(), luma.std()], hist]
    )
    return [float(v) for v in feats[:dim]]


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
                    "features": pdf["data"].map(_image_features),
                }
            )

    return images.select("image_id", "data").mapInPandas(kernel, schema=out_schema)


def image_stats(images: DataFrame) -> DataFrame:
    """decode → EXACT integer pixel statistics per image: dimensions,
    blob size, and per-channel pixel sums (uint8 summed in int64 — no
    float in sight).  The scalar, integer-exact sibling of
    ``extract_image_features``: because every value is an integer derived
    from the decoded pixels, an independent engine that re-derives the
    synthetic pattern can hash-match it EXACTLY, turning the multimodal
    decode path from a rows-only check into a full-oracle one (float
    feature means can't cross an engine boundary bit-stably; integer sums
    can)."""
    out_schema = StructType(
        [
            StructField("image_id", LongType(), False),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("n_bytes", LongType(), True),
            StructField("r_sum", LongType(), True),
            StructField("g_sum", LongType(), True),
            StructField("b_sum", LongType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("image_id", "width", "height", "n_bytes",
                     "r_sum", "g_sum", "b_sum")}
            for iid, blob in zip(pdf["image_id"], pdf["data"]):
                rows["image_id"].append(iid)
                if blob is None:
                    for k in ("width", "height", "n_bytes",
                              "r_sum", "g_sum", "b_sum"):
                        rows[k].append(0)
                    continue
                px = decode_ppm(blob)
                h, w, _ = px.shape
                sums = px.sum(axis=(0, 1), dtype=np.int64)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_bytes"].append(len(bytes(blob)))
                rows["r_sum"].append(int(sums[0]))
                rows["g_sum"].append(int(sums[1]))
                rows["b_sum"].append(int(sums[2]))
            yield pd.DataFrame(rows)

    return images.select("image_id", "data").mapInPandas(kernel, schema=out_schema)


def resize_nearest(images: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """REAL nearest-neighbor resize for PPM blobs (numpy index sampling),
    re-encoded as PPM.  Non-PPM formats raise NotImplementedError from the
    decoder — the honest boundary where PIL would slot in."""
    out_schema = StructType(
        [
            StructField("image_id", LongType(), False),
            StructField("data", BinaryType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for blob in pdf["data"]:
                px = decode_ppm(blob)
                h, w, _ = px.shape
                rows = (np.arange(target_h) * h) // target_h
                cols = (np.arange(target_w) * w) // target_w
                out.append(encode_ppm(px[rows][:, cols]))
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "data": out,
                    "width": target_w,
                    "height": target_h,
                }
            )

    return images.select("image_id", "data").mapInPandas(kernel, schema=out_schema)


def sample_video_frames(videos: DataFrame, every_n: int) -> DataFrame:
    """REAL frame sampling over a codec-less video: a concatenated-PPM
    stream (frame after frame in one binary column).  Emits every
    ``every_n``-th frame as its own PPM blob.  Container formats (mp4 etc.)
    raise from the parser — pyav/ffmpeg would slot in there."""
    out_schema = StructType(
        [
            StructField("video_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids, idxs, frames = [], [], []
            for vid, blob in zip(pdf["video_id"], pdf["data"]):
                blob = bytes(blob)
                off, k = 0, 0
                while off < len(blob):
                    m = _PPM_HEADER.match(blob[off : off + 64])
                    if m is None:
                        raise NotImplementedError(
                            "only concatenated-PPM streams parse without a "
                            "codec library; plug pyav in here for containers"
                        )
                    w, h = int(m.group(1)), int(m.group(2))
                    end = off + m.end() + w * h * 3
                    if k % every_n == 0:
                        vids.append(vid)
                        idxs.append(k)
                        frames.append(blob[off:end])
                    off, k = end, k + 1
            yield pd.DataFrame(
                {"video_id": vids, "frame_idx": idxs, "frame": frames}
            )

    return videos.select("video_id", "data").mapInPandas(kernel, schema=out_schema)


# Backwards-compatible stub names: the operators are real now for PPM; the
# old *_stub entry points remain for callers that imported them, refusing
# only when the data genuinely needs an absent codec.
def resize_stub(images: DataFrame, target_w: int, target_h: int) -> DataFrame:
    raise NotImplementedError(
        "resize_stub is retired: use resize_nearest (real for PPM blobs; "
        "raises NotImplementedError for codec formats)"
    )


def sample_video_frames_stub(videos: DataFrame, every_n: int) -> DataFrame:
    raise NotImplementedError(
        "sample_video_frames_stub is retired: use sample_video_frames "
        "(real for concatenated-PPM streams)"
    )


def image_ahash(images: DataFrame, grid: int = 8) -> DataFrame:
    """decode → perceptual AVERAGE HASH per image: nearest-neighbor
    downsample to a ``grid``×``grid`` luma patch, threshold each cell
    against the integer mean, emit the bits row-major as a '0'/'1'
    string — the classic near-duplicate image fingerprint (images whose
    hashes match or sit within a small Hamming radius are visual dups
    regardless of re-encoding or minor resizing).

    Everything is INTEGER arithmetic so an independent engine can
    re-derive the hash exactly from the synthetic pixel formula:
    luma = (r+g+b) // 3, sample at (x=(i·w)//g, y=(j·h)//g), mean =
    sum // g², bit = luma > mean (strict).  Emitted as a 64-char bit
    string, not an int64 — bit 63 would wrap the sign.  Map-only plan:
    one Arrow kernel pass over the image scan, no shuffle; downstream
    grouping on ``ahash_bits`` (exact dups) or banded Hamming join
    (near dups) are the standard dedup_exact / LSH compositions."""
    out_schema = StructType(
        [
            StructField("image_id", LongType(), False),
            StructField("ahash_bits", StringType(), True),
            StructField("n_set", LongType(), True),
        ]
    )
    g = int(grid)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes, nset = [], [], []
            for iid, blob in zip(pdf["image_id"], pdf["data"]):
                ids.append(iid)
                if blob is None:
                    hashes.append(None)
                    nset.append(0)
                    continue
                px = decode_ppm(blob).astype(np.int64)
                h, w, _ = px.shape
                luma = px.sum(axis=2) // 3
                ys = (np.arange(g) * h) // g
                xs = (np.arange(g) * w) // g
                patch = luma[np.ix_(ys, xs)]
                mu = int(patch.sum()) // (g * g)
                bits = (patch > mu).flatten()  # row-major: pos = j*g + i
                hashes.append("".join("1" if b else "0" for b in bits))
                nset.append(int(bits.sum()))
            yield pd.DataFrame(
                {"image_id": ids, "ahash_bits": hashes, "n_set": nset}
            )

    return images.select("image_id", "data").mapInPandas(kernel, schema=out_schema)
