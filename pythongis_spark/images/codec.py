"""Deterministic image codec + perceptual hash for the north-rule payload.

PIL/image libraries are NOT installed in this environment, so the *codec*
is a clearly-marked deterministic stand-in (`FPNG`/`FBMP` lossless via
zlib, `FJPG` lossy via channel quantization). Everything around it — the
(image_id, bytes, w, h, fmt, caption, phash) schema from
BASELINE.json input_hint, Arrow batch shapes, mapInPandas decode
plumbing, PSNR/allclose verification — is real and tested; swapping in a
real PNG/JPEG codec is a drop-in replacement of `encode_image` /
`decode_image` only.

Lossy gate: FJPG quantizes channels with step 6 → MSE ≈ 6²/12 = 3 →
PSNR ≈ 43.4 dB, above the 40 dB requirement; lossless formats round-trip
bit-exact (allclose).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC_LOSSLESS = {b"FPNG", b"FBMP"}
MAGIC_LOSSY = b"FJPG"
FMT_MAGIC = {"png": b"FPNG", "bmp": b"FBMP", "jpeg": b"FJPG"}
MAGIC_FMT = {v: k for k, v in FMT_MAGIC.items()}
_Q = 6  # lossy quantization step


def make_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixels for image index i: smooth
    gradient + seeded noise (FIXTURES.md §1)."""
    rng = np.random.Generator(np.random.PCG64(i))
    gy = np.linspace(0, 255, h)[:, None]
    gx = np.linspace(0, 255, w)[None, :]
    base = np.stack(
        [
            (gx + gy) / 2,
            np.abs(gx - gy),
            (gx * 0.5 + (255 - gy) * 0.5),
        ],
        axis=-1,
    )
    noise = rng.integers(-20, 21, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def quantize_lossy(pixels: np.ndarray) -> np.ndarray:
    """The FJPG quantizer: what decode(encode(px, 'jpeg')) returns."""
    q = (pixels.astype(np.int32) // _Q) * _Q + _Q // 2
    return np.clip(q, 0, 255).astype(np.uint8)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """uint8 (h, w, 3) → bytes in the deterministic container format."""
    h, w, c = pixels.shape
    assert c == 3
    magic = FMT_MAGIC[fmt]
    # fixed level 1: deterministic and ~3x faster than 6; compression
    # ratio is irrelevant to the correctness gates
    if magic == MAGIC_LOSSY:
        payload = zlib.compress(quantize_lossy(pixels).tobytes(), 1)
    else:
        payload = zlib.compress(pixels.tobytes(), 1)
    return magic + struct.pack("<HH", w, h) + payload


def decode_image(blob: bytes) -> np.ndarray:
    """bytes → uint8 (h, w, 3) pixels."""
    magic = bytes(blob[:4])
    if magic not in MAGIC_FMT:
        raise ValueError(f"unknown image container {magic!r}")
    w, h = struct.unpack_from("<HH", blob, 4)
    raw = zlib.decompress(bytes(blob[8:]))
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def average_phash(pixels: np.ndarray) -> int:
    """64-bit average hash: grayscale → 8x8 block means → threshold by the
    global mean → bits MSB-first. Deterministic across platforms (pure
    integer/float64 numpy)."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    # block-reduce to 8x8 (w, h are multiples of 8 in our fixtures; general
    # case uses truncation to the largest multiple)
    hh, ww = (h // 8) * 8, (w // 8) * 8
    g = gray[:hh, :ww].reshape(8, hh // 8, 8, ww // 8).mean(axis=(1, 3))
    bits = (g > g.mean()).ravel()
    val = int(np.packbits(bits).view(">u8")[0])  # MSB-first, same as shift loop
    # wrap to signed int64 for Spark LongType
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio between two uint8 images."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
