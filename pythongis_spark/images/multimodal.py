"""Multimodal payload columns: audio / video as opaque binary + typed
metadata.

No audio/video codecs exist in this image (same constraint as PIL), so
the *decode* steps are clearly-marked deterministic stand-ins behind the
same `NotImplementedError`-documenting pattern as ``images.codec`` —
while the Spark-side contract is real and tested: schemas, Arrow batch
shapes, ``mapInPandas`` signatures, partitioning behavior.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AUDIO_SCHEMA_DDL = (
    "clip_id string, bytes binary, sample_rate int, n_samples int, "
    "channels int, fmt string"
)
VIDEO_SCHEMA_DDL = (
    "video_id string, bytes binary, w int, h int, n_frames int, fps double, fmt string"
)


def make_audio_clip(i: int, sample_rate: int = 8000, seconds: float = 0.5) -> dict:
    """Deterministic PCM16 sine+noise clip in a FAUD container."""
    n = int(sample_rate * seconds)
    rng = np.random.Generator(np.random.PCG64(i))
    t = np.arange(n) / sample_rate
    freq = 220.0 + (i % 16) * 55.0
    wave = 0.6 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(n)
    pcm = np.clip(wave * 32767, -32768, 32767).astype("<i2")
    blob = b"FAUD" + struct.pack("<IHB", n, sample_rate, 1) + zlib.compress(pcm.tobytes(), 1)
    return dict(
        clip_id=f"clip{i:09d}", bytes=blob, sample_rate=sample_rate,
        n_samples=n, channels=1, fmt="faud",
    )


def decode_audio(blob: bytes) -> np.ndarray:
    if bytes(blob[:4]) != b"FAUD":
        raise ValueError("unknown audio container")
    n, sr, ch = struct.unpack_from("<IHB", blob, 4)
    return np.frombuffer(zlib.decompress(bytes(blob[11:])), dtype="<i2")[: n * ch]


def decode_audio_external(fmt: str):
    raise NotImplementedError(
        f"real {fmt} decode needs an audio library (soundfile/ffmpeg) not "
        "present in this environment; FAUD is the deterministic stand-in"
    )


def audio_features(df: DataFrame) -> DataFrame:
    """Per-clip features (rms, peak, zero-crossing rate) via mapInPandas —
    the feature-extraction stage shape for audio payloads."""

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pcm = decode_audio(r.bytes).astype(np.float64) / 32768.0
                zc = float(np.mean(np.abs(np.diff(np.signbit(pcm).astype(np.int8)))))
                rows.append(
                    dict(
                        clip_id=r.clip_id,
                        rms=float(np.sqrt(np.mean(pcm**2))),
                        peak=float(np.abs(pcm).max()),
                        zcr=zc,
                        duration_s=float(r.n_samples) / r.sample_rate,
                    )
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        run, schema="clip_id string, rms double, peak double, zcr double, duration_s double"
    )


def make_video(i: int, w: int = 32, h: int = 24, n_frames: int = 8) -> dict:
    """Deterministic moving-gradient video in a FVID container (frames
    stored as raw uint8 planes, zlib level 1)."""
    frames = []
    for f in range(n_frames):
        gx = (np.linspace(0, 255, w)[None, :] + f * 16) % 256
        gy = np.linspace(0, 255, h)[:, None]
        frames.append(((gx + gy) / 2).astype(np.uint8))
    raw = np.stack(frames)
    blob = b"FVID" + struct.pack("<HHH", w, h, n_frames) + zlib.compress(raw.tobytes(), 1)
    return dict(
        video_id=f"vid{i:09d}", bytes=blob, w=w, h=h,
        n_frames=n_frames, fps=8.0, fmt="fvid",
    )


def decode_video(blob: bytes) -> np.ndarray:
    if bytes(blob[:4]) != b"FVID":
        raise ValueError("unknown video container")
    w, h, n = struct.unpack_from("<HHH", blob, 4)
    return np.frombuffer(zlib.decompress(bytes(blob[10:])), dtype=np.uint8).reshape(n, h, w)


def sample_frames(df: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling: one output row per kept frame with per-frame stats
    — the 1→N expansion shape of a video pipeline (mapInPandas, rows
    explode inside the batch)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                vid = decode_video(r.bytes)
                for fi in range(0, r.n_frames, every):
                    fr = vid[fi]
                    rows.append(
                        dict(
                            video_id=r.video_id,
                            frame=fi,
                            mean=float(fr.mean()),
                            std=float(fr.std()),
                        )
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        run, schema="video_id string, frame int, mean double, std double"
    )


def audio_df(spark, n: int, partitions: int | None = None) -> DataFrame:
    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame([make_audio_clip(int(i)) for i in pdf["id"]])

    rng = spark.range(n)
    if partitions:
        rng = rng.repartition(partitions)
    return rng.mapInPandas(gen, schema=AUDIO_SCHEMA_DDL)


def video_df(spark, n: int, partitions: int | None = None) -> DataFrame:
    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame([make_video(int(i)) for i in pdf["id"]])

    rng = spark.range(n)
    if partitions:
        rng = rng.repartition(partitions)
    return rng.mapInPandas(gen, schema=VIDEO_SCHEMA_DDL)
