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
                px = decode_ppm(blob)
                h, w, _ = px.shape
                ys = (np.arange(g) * h) // g
                xs = (np.arange(g) * w) // g
                # r14 (guide §4.2): sample FIRST, then compute luma on the
                # g×g patch — sampling commutes with the elementwise
                # (r+g+b)//3, so this is bit-identical to the full-image
                # luma pass it replaces while cutting the per-image
                # arithmetic from O(w·h·3) int64 (astype copied the whole
                # image) to O(g²).  Numpy microbench (OPTIMIZATION_r14.md):
                # 3.8× at the test corpus's 96×72, 211× at 512×512, ~9400×
                # at 2000×3000 — at real image sizes the full-image luma
                # pass WAS the hash tier's arithmetic.
                patch = px[np.ix_(ys, xs)].astype(np.int64).sum(axis=2) // 3
                mu = int(patch.sum()) // (g * g)
                bits = (patch > mu).flatten()  # row-major: pos = j*g + i
                hashes.append("".join("1" if b else "0" for b in bits))
                nset.append(int(bits.sum()))
            yield pd.DataFrame(
                {"image_id": ids, "ahash_bits": hashes, "n_set": nset}
            )

    return images.select("image_id", "data").mapInPandas(kernel, schema=out_schema)


# ----------------------------------------------------------------- audio
#: typed-metadata schema for an audio corpus table (BINARY blob + sibling
#: typed columns, same design rules as IMAGE_TABLE_SCHEMA)
AUDIO_TABLE_SCHEMA = StructType(
    [
        StructField("audio_id", LongType(), False),
        StructField("data", BinaryType(), True),
        StructField("format", StringType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", LongType(), True),
    ]
)


def encode_wav_pcm16(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM16 bytes — numpy + struct only,
    the audio analog of ``encode_ppm`` (WAV-PCM is the codec-less audio
    container the way binary PPM is the codec-less image one)."""
    import struct

    data = samples.astype("<i2").tobytes()
    return (
        struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 36 + len(data), b"WAVE",
            b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
            b"data", len(data),
        )
        + data
    )


def decode_wav_pcm16(blob: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 bytes → (int16 sample array, sample_rate).  Mono
    PCM only; compressed codecs (mp3/aac/opus) and non-16-bit PCM raise
    loudly — the honest boundary where ffmpeg/torchaudio would slot in,
    exactly like ``decode_ppm``'s non-P6 refusal."""
    import struct

    blob = bytes(blob)
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise NotImplementedError(
            "only RIFF/WAVE parses without an audio library; plug "
            "ffmpeg/torchaudio into this kernel for other containers"
        )
    off, rate, bits, channels, fmt = 12, None, None, None, None
    while off + 8 <= len(blob):
        cid, sz = blob[off : off + 4], struct.unpack("<I", blob[off + 4 : off + 8])[0]
        body = blob[off + 8 : off + 8 + sz]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
        elif cid == b"data":
            if fmt != 1 or bits != 16 or channels != 1:
                raise NotImplementedError(
                    f"only mono 16-bit PCM decodes here (fmt={fmt}, "
                    f"bits={bits}, ch={channels}); plug an audio codec "
                    "library in for anything else"
                )
            return np.frombuffer(body, dtype="<i2"), int(rate)
        off += 8 + sz + (sz & 1)  # RIFF chunks are word-aligned
    raise NotImplementedError("WAV blob has no data chunk")


def synthesize_audio_table(spark, docs: DataFrame, rate: int = 8000) -> DataFrame:
    """Deterministic REAL audio corpus derived from the documents table:
    each doc becomes a genuine WAV-PCM16 clip whose samples are an
    integer arithmetic pattern of (audio_id, t) — decodable by any WAV
    reader, re-derivable in SQL (the ``audio_stats`` oracle), the audio
    sibling of ``synthesize_image_table``."""
    meta = docs.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("doc_id").alias("audio_id"),
        (F.col("n_chars") % 2000 + 400).cast("long").alias("n_samples"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for aid, n in zip(pdf["audio_id"], pdf["n_samples"]):
                t = np.arange(int(n), dtype=np.int64)
                s = (int(aid) * 7 + t * 13) % 4096 - 2048
                blobs.append(encode_wav_pcm16(s, rate))
            yield pd.DataFrame(
                {
                    "audio_id": pdf["audio_id"],
                    "data": blobs,
                    "format": "wav",
                    "sample_rate": rate,
                    "n_samples": pdf["n_samples"],
                }
            )

    return meta.mapInPandas(kernel, schema=AUDIO_TABLE_SCHEMA)


def audio_stats(audio: DataFrame) -> DataFrame:
    """decode → EXACT integer per-clip statistics: sample count, byte
    size, int64 sample/|sample| sums, peak amplitude, and the
    zero-crossing count (sign flips between consecutive samples — the
    cheap voiced/unvoiced + silence heuristic).  Like ``image_stats``,
    every value is an integer derived from decoded samples, so an
    independent engine re-deriving the synthetic sample formula
    hash-matches EXACTLY — the multimodal decode path at full-oracle
    strength.  Map-only Arrow kernel; blob column projected only into
    this stage."""
    out_schema = StructType(
        [
            StructField("audio_id", LongType(), False),
            StructField("sample_rate", IntegerType(), True),
            StructField("n_samples", LongType(), True),
            StructField("n_bytes", LongType(), True),
            StructField("sum_samples", LongType(), True),
            StructField("sum_abs", LongType(), True),
            StructField("peak_abs", LongType(), True),
            StructField("n_zero_cross", LongType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("audio_id", "sample_rate", "n_samples", "n_bytes",
                     "sum_samples", "sum_abs", "peak_abs", "n_zero_cross")}
            for aid, blob in zip(pdf["audio_id"], pdf["data"]):
                rows["audio_id"].append(aid)
                if blob is None:
                    for k in ("sample_rate", "n_samples", "n_bytes",
                              "sum_samples", "sum_abs", "peak_abs",
                              "n_zero_cross"):
                        rows[k].append(0)
                    continue
                s, rate = decode_wav_pcm16(blob)
                s64 = s.astype(np.int64)
                neg = s64 < 0
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(s64))
                rows["n_bytes"].append(len(bytes(blob)))
                rows["sum_samples"].append(int(s64.sum()))
                rows["sum_abs"].append(int(np.abs(s64).sum()))
                rows["peak_abs"].append(int(np.abs(s64).max()) if len(s64) else 0)
                rows["n_zero_cross"].append(
                    int((neg[1:] != neg[:-1]).sum()) if len(s64) > 1 else 0
                )
            yield pd.DataFrame(rows)

    return audio.select("audio_id", "data").mapInPandas(kernel, schema=out_schema)


def audio_frame_energy(audio: DataFrame, frame_len: int = 256) -> DataFrame:
    """decode → fixed-length NON-OVERLAPPING frames with int64 energy
    (sum of squared samples) and peak per frame — the windowing primitive
    under VAD / silence trimming / loudness normalization, and the audio
    analog of ``sample_video_frames`` (fixed-shape rows out of a variable
    blob).  Trailing partial frames are dropped (every emitted frame has
    exactly ``frame_len`` samples, so energies are comparable).  Integer
    arithmetic throughout: max |sample| is 2^15 so a frame's energy is
    ≤ frame_len·2^30 — int64-safe for any sane frame length."""
    out_schema = StructType(
        [
            StructField("audio_id", LongType(), False),
            StructField("frame_idx", LongType(), False),
            StructField("energy", LongType(), True),
            StructField("peak_abs", LongType(), True),
        ]
    )
    fl = int(frame_len)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, energies, peaks = [], [], [], []
            for aid, blob in zip(pdf["audio_id"], pdf["data"]):
                if blob is None:
                    continue
                s, _ = decode_wav_pcm16(blob)
                nf = len(s) // fl
                if nf == 0:
                    continue
                fr = s[: nf * fl].astype(np.int64).reshape(nf, fl)
                ids.extend([aid] * nf)
                idxs.extend(range(nf))
                energies.extend((fr * fr).sum(axis=1).tolist())
                peaks.extend(np.abs(fr).max(axis=1).tolist())
            yield pd.DataFrame(
                {
                    "audio_id": ids,
                    "frame_idx": idxs,
                    "energy": energies,
                    "peak_abs": peaks,
                }
            )

    return audio.select("audio_id", "data").mapInPandas(kernel, schema=out_schema)


# ----------------------------------------------------------------- video
def synthesize_video_table(
    spark, docs: DataFrame, frame_w: int = 16, frame_h: int = 12
) -> DataFrame:
    """Deterministic REAL video corpus derived from the documents table:
    each doc becomes a concatenated-PPM stream (the codec-less video
    container ``sample_video_frames`` parses) of ``n_chars % 8 + 2``
    frames whose pixels are an arithmetic pattern of (video_id,
    frame_idx, x, y) — re-derivable in SQL, the video sibling of
    ``synthesize_image_table`` / ``synthesize_audio_table``."""
    meta = docs.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("doc_id").alias("video_id"),
        (F.col("n_chars") % 8 + 2).cast("int").alias("n_frames"),
    )
    out_schema = StructType(
        [
            StructField("video_id", LongType(), False),
            StructField("data", BinaryType(), True),
            StructField("format", StringType(), True),
            StructField("n_frames", IntegerType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for vid, nf in zip(pdf["video_id"], pdf["n_frames"]):
                frames = []
                y, x, c = np.ogrid[0:frame_h, 0:frame_w, 0:3]
                for fi in range(int(nf)):
                    px = (int(vid) * 7 + fi * 13 + x * 3 + y * 5 + c * 11) % 256
                    frames.append(encode_ppm(px.astype(np.uint8)))
                blobs.append(b"".join(frames))
            yield pd.DataFrame(
                {
                    "video_id": pdf["video_id"],
                    "data": blobs,
                    "format": "ppm-stream",
                    "n_frames": pdf["n_frames"],
                    "width": frame_w,
                    "height": frame_h,
                }
            )

    return meta.mapInPandas(kernel, schema=out_schema)


def video_frame_stats(videos: DataFrame, every_n: int = 2) -> DataFrame:
    """Parse a concatenated-PPM video stream, SAMPLE every ``every_n``-th
    frame, and emit EXACT integer statistics per sampled frame (dims +
    the int64 sum over all channels) — parse, sampling, and stats in ONE
    Arrow kernel pass, deliberately NOT ``sample_video_frames`` chained
    into ``image_stats``: each chained ``mapInPandas`` tier spawns its
    own Python-worker pool (~15 s cold at 32 cores, the measured lesson
    behind the image fixture's single-stage design) and would also ship
    every sampled frame blob through an Arrow boundary just to sum it.
    Container formats raise from the parser, same boundary as
    ``sample_video_frames``.  Integer outputs make the decode+sample
    path fully oracle-checkable (the image_stats/audio_stats move)."""
    out_schema = StructType(
        [
            StructField("video_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("rgb_sum", LongType(), True),
        ]
    )
    step = int(every_n)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids, idxs, ws, hs, sums = [], [], [], [], []
            for vid, blob in zip(pdf["video_id"], pdf["data"]):
                if blob is None:
                    continue
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
                    if k % step == 0:
                        px = np.frombuffer(
                            blob, dtype=np.uint8, count=w * h * 3,
                            offset=off + m.end(),
                        )
                        vids.append(vid)
                        idxs.append(k)
                        ws.append(w)
                        hs.append(h)
                        sums.append(int(px.sum(dtype=np.int64)))
                    off, k = end, k + 1
            yield pd.DataFrame(
                {
                    "video_id": vids,
                    "frame_idx": idxs,
                    "width": ws,
                    "height": hs,
                    "rgb_sum": sums,
                }
            )

    return videos.select("video_id", "data").mapInPandas(kernel, schema=out_schema)
