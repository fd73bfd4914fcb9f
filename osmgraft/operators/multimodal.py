"""Multimodal (image/audio/video) operators — brief §multimodal.

Images are opaque ``binary`` columns with typed metadata (w, h, fmt — the
input_hint schema). Real, tested paths: raw/PPM decode, channel statistics,
pHash near-dup banding, area resize. Audio/video feature extraction is
STUBBED (no codec libs in this container): the Spark-side plumbing — schema,
batching, partitioning — is real and tested with a deterministic fake
decoder; the true decoder raises NotImplementedError, clearly marked.

All kernels are Arrow-batched mapInPandas; decode is per-row numpy inside the
batch loop (unavoidable: variable-size binary payloads), everything after
decode is vectorized.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from osmgraft.functions.codec import decode_image, phash64, resize_area, to_gray

STATS_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("sum_r", LongType(), True),
        StructField("sum_g", LongType(), True),
        StructField("sum_b", LongType(), True),
        StructField("phash", LongType(), True),
    ]
)


def image_stats(images: DataFrame) -> DataFrame:
    """Decode → exact per-channel pixel sums + pHash (integer outputs only)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                px = decode_image(bytes(r.bytes), int(r.w), int(r.h), r.fmt)
                s = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out.append((r.image_id, int(s[0]), int(s[1]), int(s[2]), int(phash64(px))))
            yield pd.DataFrame(out, columns=[f.name for f in STATS_SCHEMA.fields])

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        kernel, schema=STATS_SCHEMA
    )


def phash_near_dup_pairs(images: DataFrame, max_hamming: int = 10) -> DataFrame:
    """Near-duplicate image pairs by pHash banding: split the 64-bit hash into
    4×16-bit bands — any pair within hamming ≤ 12 shares at least one exact
    band (pigeonhole: ≤3 bands can absorb ≤12 flipped bits only if one band is
    clean... guaranteed for hamming ≤ 3·? — with 4 bands, hamming ≤ 3 ⇒ some
    band equal; larger radii are best-effort recall, standard practice).
    Verified with exact popcount on candidates. JVM-only (no Python)."""
    bands = [
        F.shiftright(F.col("phash"), 16 * b).bitwiseAND(F.lit(0xFFFF)).alias(f"b{b}")
        for b in range(4)
    ]
    t = images.select(F.col("image_id"), F.col("phash"), *bands)
    pairs = None
    for b in range(4):
        a = t.select(F.col("image_id").alias("id_a"), F.col("phash").alias("ph_a"), F.col(f"b{b}").alias("bv"))
        c = t.select(F.col("image_id").alias("id_b"), F.col("phash").alias("ph_b"), F.col(f"b{b}").alias("bv"))
        p = a.join(c, "bv").filter(F.col("id_a") < F.col("id_b")).drop("bv")
        pairs = p if pairs is None else pairs.unionByName(p)
    cand = pairs.dropDuplicates(["id_a", "id_b"])
    hamming = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("gray32", BinaryType(), True),  # 32×32 luma uint8
    ]
)


def image_resize_gray32(images: DataFrame) -> DataFrame:
    """Feature-extraction step: 32×32 grayscale thumbnail as binary."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                px = decode_image(bytes(r.bytes), int(r.w), int(r.h), r.fmt)
                g = resize_area(to_gray(px), 32, 32)
                out.append((r.image_id, np.clip(g, 0, 255).astype(np.uint8).tobytes()))
            yield pd.DataFrame(out, columns=["image_id", "gray32"])

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        kernel, schema=RESIZE_SCHEMA
    )


# --- audio/video stubs (real plumbing, fake or NotImplemented decode) -----------
FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_phash", LongType(), True),
    ]
)


def _fake_video_frames(data: bytes, n_frames: int) -> list[np.ndarray]:
    """Deterministic fake decoder for plumbing tests: frames are Philox-seeded
    from the payload's first 8 bytes."""
    key = int.from_bytes(data[:8].ljust(8, b"\0"), "little")
    rng = np.random.Generator(np.random.Philox(key=key))
    return [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(n_frames)]


def video_frame_sample(
    media: DataFrame,
    frames_per_clip: int = 3,
    decoder: str = "stub",
    id_col: str = "media_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Sample N frames per clip and pHash them. decoder='stub' raises
    NotImplementedError at execution (no video codec in this container);
    decoder='fake' exercises the full distributed plumbing deterministically."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                data = bytes(getattr(r, bytes_col))
                if decoder == "stub":
                    raise NotImplementedError(
                        "video decode stubbed: no codec library in this environment; "
                        "use decoder='fake' for plumbing tests"
                    )
                frames = _fake_video_frames(data, frames_per_clip)
                for i, fr in enumerate(frames):
                    out.append((getattr(r, id_col), i, int(phash64(fr))))
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.select(F.col(id_col), F.col(bytes_col)).mapInPandas(
        kernel, schema=FRAME_SCHEMA
    )


AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("window_idx", IntegerType(), False),
        StructField("energy", LongType(), True),  # integer RMS proxy — hashable
    ]
)


def _fake_audio_pcm(data: bytes, n_samples: int) -> np.ndarray:
    """Deterministic fake decoder (no audio codec libs in this container):
    int16 PCM Philox-seeded from the payload's first 8 bytes."""
    key = int.from_bytes(data[:8].ljust(8, b"\0"), "little")
    rng = np.random.Generator(np.random.Philox(key=key))
    return rng.integers(-(2**15), 2**15, n_samples, dtype=np.int64)


def audio_window_energy(
    media: DataFrame,
    window: int = 256,
    n_windows: int = 4,
    decoder: str = "stub",
    id_col: str = "media_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Feature extraction over opaque audio bytes: per-window sum of squares
    (an integer RMS proxy so results hash exactly). decoder='stub' raises
    NotImplementedError at execution — the real codec is not in this
    environment; decoder='fake' exercises the full distributed plumbing with
    the deterministic PCM generator. Same batching/partitioning contract as
    the image kernels."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                data = bytes(getattr(r, bytes_col))
                if decoder == "stub":
                    raise NotImplementedError(
                        "audio decode stubbed: no codec library in this environment; "
                        "use decoder='fake' for plumbing tests"
                    )
                pcm = _fake_audio_pcm(data, window * n_windows)
                for i in range(n_windows):
                    seg = pcm[i * window : (i + 1) * window]
                    out.append((getattr(r, id_col), i, int((seg * seg).sum())))
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_SCHEMA.fields])

    return media.select(F.col(id_col), F.col(bytes_col)).mapInPandas(
        kernel, schema=AUDIO_SCHEMA
    )
