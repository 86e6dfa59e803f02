"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A large-scale training-data pipeline carries media as ``binary`` columns
with typed metadata and runs decode / feature-extract / resize /
frame-sample as Arrow-batched Pandas UDFs (``mapInPandas``) so the bytes
never round-trip through row-at-a-time Python. This module implements that
plumbing for real — schemas, batch iteration, partitioning-neutral
signatures — with the *codec* layer split in two:

- **Deterministic built-in codecs** for the engine's own container formats
  (``IMG1``/``AUD1``/``VID1`` headers below). These are real parsers over
  real bytes — used by tests and by synthetic data generation.
- **External codecs (PIL / soundfile / av)** behind import-guards: if the
  library is present, real decode; otherwise a clearly-marked
  ``NotImplementedError`` (this container ships no media libs).

Container formats (big-endian):
- image: ``b"IMG1" | u16 width | u16 height | u8 channels | pixels``
  (``width*height*channels`` bytes, row-major)
- audio: ``b"AUD1" | u32 sample_rate | u32 n_samples | i16 samples``
- video: ``b"VID1" | u16 n_frames | u16 width | u16 height | u8 channels
  | frames`` (each frame one image payload, no header)

Scale notes: every operator is a narrow ``mapInPandas`` — no shuffle; the
only fan-out is ``sample_frames`` (row → ≤n_frames rows), still
shuffle-free. Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``; media blobs being large,
callers should keep that low (the session default 10k rows is fine for
metadata, set ~64 for 4K-frame video work).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# deterministic built-in codecs (engine container formats)
# ---------------------------------------------------------------------------

IMG_MAGIC, AUD_MAGIC, VID_MAGIC = b"IMG1", b"AUD1", b"VID1"


def encode_image(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    assert len(pixels) == width * height * channels
    return IMG_MAGIC + struct.pack(">HHB", width, height, channels) + pixels


def decode_image_bytes(buf: bytes) -> tuple[int, int, int, bytes]:
    if buf[:4] != IMG_MAGIC:
        raise _external_decode_error("image")
    w, h, c = struct.unpack(">HHB", buf[4:9])
    if len(buf) < 9 + w * h * c:
        # fail loudly: a truncated payload must not yield a short pixel
        # buffer and silently-wrong downstream stats
        raise ValueError(
            f"truncated IMG1 payload: header declares {w * h * c} pixel "
            f"bytes, buffer holds {len(buf) - 9}"
        )
    return w, h, c, buf[9 : 9 + w * h * c]


def encode_audio(sample_rate: int, samples: list[int]) -> bytes:
    return (
        AUD_MAGIC
        + struct.pack(">II", sample_rate, len(samples))
        + struct.pack(f">{len(samples)}h", *samples)
    )


def decode_audio_bytes(buf: bytes) -> tuple[int, list[int]]:
    if buf[:4] != AUD_MAGIC:
        raise _external_decode_error("audio")
    rate, n = struct.unpack(">II", buf[4:12])
    return rate, list(struct.unpack(f">{n}h", buf[12 : 12 + 2 * n]))


def encode_video(width: int, height: int, channels: int, frames: list[bytes]) -> bytes:
    assert all(len(f) == width * height * channels for f in frames)
    return (
        VID_MAGIC
        + struct.pack(">HHHB", len(frames), width, height, channels)
        + b"".join(frames)
    )


def decode_video_bytes(buf: bytes) -> tuple[int, int, int, list[bytes]]:
    if buf[:4] != VID_MAGIC:
        raise _external_decode_error("video")
    n, w, h, c = struct.unpack(">HHHB", buf[4:11])
    fsz = w * h * c
    if len(buf) < 11 + n * fsz:
        raise ValueError(
            f"truncated VID1 payload: header declares {n} frames of {fsz} "
            f"bytes, buffer holds {len(buf) - 11}"
        )
    frames = [buf[11 + i * fsz : 11 + (i + 1) * fsz] for i in range(n)]
    return w, h, c, frames


def _external_decode_error(kind: str) -> Exception:
    """External-format decode is STUBBED: media libraries (PIL / soundfile /
    av) are not shipped in this environment. The Spark-side plumbing
    (schemas, Arrow batching, signatures) is real; plugging in a codec means
    replacing this raise with the library call."""
    return NotImplementedError(
        f"external {kind} codec not available in this environment — use the "
        f"engine container formats ({IMG_MAGIC!r}/{AUD_MAGIC!r}/{VID_MAGIC!r}) "
        f"or install PIL/soundfile/av and wire them here"
    )


# ---------------------------------------------------------------------------
# Spark operators (mapInPandas — Arrow-batched, shuffle-free)
# ---------------------------------------------------------------------------

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("byte_length", T.LongType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def decode_images(df: DataFrame, id_col: str = "doc_id",
                  content_col: str = "content") -> DataFrame:
    """binary images → typed metadata + mean pixel intensity."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for did, buf in zip(pdf[id_col], pdf[content_col]):
                w, h, c, px = decode_image_bytes(bytes(buf))
                # vectorized over the pixel buffer: integer sums are exact in
                # float64, so this equals the per-byte Python sum bit-for-bit
                mean = float(np.frombuffer(px, np.uint8).mean()) if px else 0.0
                out.append((did, w, h, c, len(buf), mean))
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_META_SCHEMA.fields])

    return df.select(id_col, content_col).mapInPandas(run, IMAGE_META_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(df: DataFrame, target_w: int, target_h: int,
                  id_col: str = "doc_id", content_col: str = "content") -> DataFrame:
    """Nearest-neighbor resize inside the engine container format."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for did, buf in zip(pdf[id_col], pdf[content_col]):
                w, h, c, px = decode_image_bytes(bytes(buf))
                # nearest-neighbor as one fancy-index gather instead of a
                # per-pixel double loop
                arr = np.frombuffer(px, np.uint8).reshape(h, w, c)
                sy = np.minimum(h - 1, np.arange(target_h) * h // target_h)
                sx = np.minimum(w - 1, np.arange(target_w) * w // target_w)
                resized = arr[sy[:, None], sx[None, :], :].tobytes()
                out.append(
                    (did, encode_image(target_w, target_h, c, resized),
                     target_w, target_h)
                )
            yield pd.DataFrame(out, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.select(id_col, content_col).mapInPandas(run, RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def extract_audio_features(df: DataFrame, id_col: str = "doc_id",
                           content_col: str = "content") -> DataFrame:
    """binary audio → rate/duration/RMS/peak features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        for pdf in batches:
            out = []
            for did, buf in zip(pdf[id_col], pdf[content_col]):
                raw = bytes(buf)
                if raw[:4] != AUD_MAGIC:
                    raise _external_decode_error("audio")
                rate, n = struct.unpack(">II", raw[4:12])
                if len(raw) < 12 + 2 * n:
                    # fail as loudly as struct.unpack would: a truncated
                    # payload must not yield silently-wrong rms/duration
                    raise ValueError(
                        f"truncated AUD1 payload: header declares {n} samples,"
                        f" buffer holds {(len(raw) - 12) // 2}"
                    )
                # big-endian i16 samples straight off the buffer; s*s sums
                # are integer-exact in float64, matching the Python loop
                s = np.frombuffer(raw[12 : 12 + 2 * n], ">i2").astype(np.float64)
                rms = math.sqrt(float((s * s).sum()) / n) if n else 0.0
                peak = int(np.abs(s).max()) if n else 0
                out.append((did, rate, n, n / rate if rate else 0.0, rms, peak))
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return df.select(id_col, content_col).mapInPandas(run, AUDIO_FEATURES_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def sample_frames(df: DataFrame, every_nth: int = 1, id_col: str = "doc_id",
                  content_col: str = "content") -> DataFrame:
    """binary video → one row per sampled frame (as engine-format images)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, buf in zip(pdf[id_col], pdf[content_col]):
                w, h, c, frames = decode_video_bytes(bytes(buf))
                for i in range(0, len(frames), every_nth):
                    out.append((did, i, encode_image(w, h, c, frames[i]), w, h))
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.select(id_col, content_col).mapInPandas(run, FRAME_SCHEMA)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ahash", T.StringType()),
    ]
)


def image_ahash(df: DataFrame, id_col: str = "doc_id",
                content_col: str = "content") -> DataFrame:
    """Perceptual average-hash (aHash) per image: decode IMG1 →
    channel-summed 8×8 nearest-neighbor downsample → 64-bit
    above-average bitmap, rendered as 16 lowercase hex chars so
    `dedup.hamming_hash_pairs` consumes it directly — the image-side
    analogue of text SimHash (same banded Hamming verify downstream).

    INTEGER-ONLY by design: sample grid index (j·h)//8, (i·w)//8
    (nearest-neighbor, works for images smaller or larger than 8×8),
    pixel value = sum of channel bytes (no division), bit set iff
    64·value > Σ sampled values (strict — a flat image hashes to 0).
    Every step is exact integer arithmetic, so the DuckDB oracle
    reproduces the hash bit-for-bit (ORACLE in plans/queries.py
    `multimodal_image_near_dupes`) and cross-run determinism needs no
    float tolerance. The bitmap packs MSB-first as two 32-bit halves
    (each < 2^32 — no int64 sign edge at bit 0).

    Arrow-batched `mapInPandas`, narrow, shuffle-free — scale cost is
    one decode per blob, the same shape as `decode_images`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for did, buf in zip(pdf[id_col], pdf[content_col]):
                w, h, c, px = decode_image_bytes(bytes(buf))
                arr = (
                    np.frombuffer(px, np.uint8)
                    .reshape(h, w, c)
                    .astype(np.int64)
                    .sum(axis=2)
                )
                sy = (np.arange(8) * h) // 8
                sx = (np.arange(8) * w) // 8
                s = arr[sy[:, None], sx[None, :]]  # 8x8 sampled values
                total = int(s.sum())
                bits = (64 * s.reshape(-1) > total).astype(np.int64)
                hi = int((bits[:32] << (31 - np.arange(32))).sum())
                lo = int((bits[32:] << (31 - np.arange(32))).sum())
                out.append((did, f"{hi:08x}{lo:08x}"))
            yield pd.DataFrame(out, columns=["doc_id", "ahash"])

    return df.select(id_col, content_col).mapInPandas(run, AHASH_SCHEMA)


def image_near_dupes(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    max_dist: int = 3,
    bands: int = 4,
    max_bucket: int | None = 65536,
) -> DataFrame:
    """Image near-duplicate pairs: `image_ahash` staged once (lazy
    localCheckpoint — banding + both verify joins read the same
    materialized hashes, one decode pass per blob), then the shared
    banded multi-index Hamming engine. bands=4 with max_dist=3 keeps
    pigeonhole recall 1.0. Output: (id_a, id_b, hamming), id_a < id_b."""
    from beacon_indexer_spark.operators.dedup import hamming_hash_pairs

    hashes = image_ahash(df, id_col, content_col).localCheckpoint(eager=False)
    return hamming_hash_pairs(
        hashes, "doc_id", "ahash", max_dist=max_dist, bands=bands,
        max_bucket=max_bucket,
    )


def media_fingerprint(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Exact-dup identity for media blobs: sha256 + length, pure JVM-side
    expressions (no Python) — joins/groupBys on this column dedup exactly."""
    return df.withColumn("media_sha256", F.sha2(F.col(content_col), 256)).withColumn(
        "media_bytes", F.length(F.col(content_col)).cast("long")
    )


SCENE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_cuts", T.LongType()),
        T.StructField("max_delta", T.LongType()),
    ]
)


def detect_scene_changes(
    df: DataFrame,
    threshold: int,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """Scene-cut detection per video: the sum of absolute pixel deltas
    between consecutive frames, flagged as a cut when it exceeds
    ``threshold`` — the standard shot-boundary pre-pass that decides
    which frames are worth keeping for a training set (sample densely
    around cuts, sparsely inside static shots). Output
    (doc_id, n_frames, n_cuts, max_delta).

    Arrow-batched mapInPandas over the opaque binary column — one decode
    per clip, numpy int32 delta sums (integer-exact, engine-portable),
    nothing but the 4-column verdict leaves the worker."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for did, buf in zip(pdf[id_col], pdf[content_col]):
                w, h, c, frames = decode_video_bytes(bytes(buf))
                arrs = [
                    np.frombuffer(f, dtype=np.uint8).astype(np.int32)
                    for f in frames
                ]
                deltas = [
                    int(np.abs(arrs[i] - arrs[i - 1]).sum())
                    for i in range(1, len(arrs))
                ]
                out.append(
                    (
                        did,
                        len(frames),
                        sum(1 for d in deltas if d > threshold),
                        max(deltas) if deltas else 0,
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in SCENE_SCHEMA.fields]
            )

    return df.select(id_col, content_col).mapInPandas(run, SCENE_SCHEMA)


SILENCE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_silent", T.LongType()),
        T.StructField("silence_ratio", T.DoubleType()),
    ]
)


def audio_silence_ratio(
    df: DataFrame,
    threshold: int,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """Silence profile per clip: fraction of samples with |amplitude| <
    ``threshold`` — the audio-curation gate (drop mostly-silent clips,
    trim leading/trailing silence before feature extraction). Output
    (doc_id, n_samples, n_silent, silence_ratio), ratio = exact integer
    division done once in double, UNROUNDED (Python's round() is
    banker's; callers needing display rounding apply F.round JVM-side so
    the oracle's HALF_UP semantics match)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for did, buf in zip(pdf[id_col], pdf[content_col]):
                raw = bytes(buf)
                rate, samples = decode_audio_bytes(raw)
                s = np.asarray(samples, dtype=np.int32)
                n = int(s.size)
                silent = int((np.abs(s) < threshold).sum()) if n else 0
                out.append(
                    (did, n, silent, silent / n if n else 0.0)
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in SILENCE_SCHEMA.fields]
            )

    return df.select(id_col, content_col).mapInPandas(run, SILENCE_SCHEMA)
