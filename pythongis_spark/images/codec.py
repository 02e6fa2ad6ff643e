"""Image codecs + perceptual hash for the north-rule payload.

PNG, BMP, baseline JPEG and GIF are REAL, implemented from their
public specs in pure stdlib + numpy: PNG (RFC 2083 / W3C PNG spec:
IHDR/IDAT/IEND chunks, zlib stream, all five scanline filters incl.
Paeth, palette/grayscale/truecolor ± alpha decode, Adam7 interlacing),
Windows BMP (BITMAPINFOHEADER, 24-bit BI_RGB, bottom-up padded rows),
baseline JPEG (ITU-T T.81, `images.jpeg`, dispatched by SOI signature)
and GIF87a/89a (`images.gif`). `fmt='jpeg'` keeps the clearly-marked
deterministic `FJPG` quantizer stand-in for synthetic-table INGEST
throughput (PSNR ≈ 43.4 dB keeps the 40 dB gate meaningful);
`fmt='jpeg-real'` and real .jpg blobs use the T.81 codec. The legacy
`FPNG`/`FBMP` stand-in containers remain readable for blobs written by
earlier rounds.

Everything around the codecs — the (image_id, bytes, w, h, fmt,
caption, phash) schema from BASELINE.json input_hint, Arrow batch
shapes, mapInPandas decode plumbing, PSNR/allclose verification — is
shared across formats; `decode_image` dispatches on the container
signature.
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

PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ------------------------------------------------------------------
# real PNG (public W3C spec) — 8-bit truecolor encode; truecolor,
# truecolor+alpha and grayscale decode; all five filters
# ------------------------------------------------------------------

def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth_pred(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §6.6), vectorized over int16+ arrays."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(pixels: np.ndarray, filter_type: int = 0, level: int = 1) -> bytes:
    """(h, w, 3) uint8 → real PNG bytes (8-bit truecolor). One filter
    for all scanlines; all five filter types supported (the filters act
    on RAW bytes so every one vectorizes on encode)."""
    h, w, c = pixels.shape
    assert c == 3
    raw = pixels.reshape(h, w * 3).astype(np.uint8)
    if filter_type == 0:
        # fast path (the encoder default): no predictor arrays needed —
        # building prev/left/upleft for nothing was ~30% of encode cost
        stream = np.empty((h, w * 3 + 1), dtype=np.uint8)
        stream[:, 0] = 0
        stream[:, 1:] = raw
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(stream.tobytes(), level))
            + _png_chunk(b"IEND", b"")
        )
    prev = np.zeros((h, w * 3), dtype=np.uint8)
    prev[1:] = raw[:-1]
    left = np.zeros_like(raw)
    left[:, 3:] = raw[:, :-3]
    upleft = np.zeros_like(raw)
    upleft[1:, 3:] = raw[:-1, :-3]
    if filter_type == 1:  # Sub
        filt = raw - left
    elif filter_type == 2:  # Up
        filt = raw - prev
    elif filter_type == 3:  # Average
        filt = raw - ((left.astype(np.int16) + prev.astype(np.int16)) // 2).astype(np.uint8)
    elif filter_type == 4:  # Paeth
        filt = raw - _paeth_pred(left, prev, upleft).astype(np.uint8)
    else:
        raise ValueError(f"bad PNG filter {filter_type}")
    stream = np.empty((h, w * 3 + 1), dtype=np.uint8)
    stream[:, 0] = filter_type
    stream[:, 1:] = filt
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(stream.tobytes(), level))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(blob: bytes) -> np.ndarray:
    """Real PNG bytes → (h, w, 3) uint8. Supports color types 0
    (grayscale, depths 1/2/4/8), 2 (truecolor 8-bit), 3 (palette,
    depths 1/2/4/8), 4 (gray+alpha) and 6 (truecolor+alpha), both
    sequential and Adam7-interlaced; alpha dropped, grayscale
    replicated, palette expanded via PLTE."""
    if bytes(blob[:8]) != PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    n = len(blob)
    while pos + 8 <= n:
        (clen,) = struct.unpack_from(">I", blob, pos)
        ctype = bytes(blob[pos + 4 : pos + 8])
        data = bytes(blob[pos + 8 : pos + 8 + clen])
        pos += 12 + clen  # len + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype_v, comp, filt_m, interlace = ihdr
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype_v)
    if nch is None:
        raise NotImplementedError(f"PNG color type {ctype_v} not supported")
    if comp != 0 or filt_m != 0 or interlace not in (0, 1):
        raise NotImplementedError("nonstandard PNG compression/filter/interlace")
    if depth != 8 and (ctype_v not in (0, 3) or depth not in (1, 2, 4)):
        raise NotImplementedError(f"PNG bit depth {depth} for color type {ctype_v}")
    raw = zlib.decompress(bytes(idat))
    bpp = max(1, (nch * depth) // 8)     # filter lane width in BYTES
    if interlace == 1:
        # Adam7 (PNG spec §8.2): seven sub-images, each independently
        # filtered and row-padded, scattered onto the (y0::dy, x0::dx)
        # lattices of the output
        out = np.zeros((h, w, 3), dtype=np.uint8)
        data = np.frombuffer(raw, dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # pass empty at this image size
            pstride = (pw * nch * depth + 7) // 8
            need = ph * (pstride + 1)
            rows = data[pos : pos + need].reshape(ph, pstride + 1)
            pos += need
            recon = _defilter_png(rows, ph, pstride, bpp)
            out[y0::dy, x0::dx] = _expand_png_pixels(
                recon, pw, ph, depth, ctype_v, nch, plte
            )
        return out
    stride = (w * nch * depth + 7) // 8  # filtered bytes per scanline
    rows = np.frombuffer(raw, dtype=np.uint8)[: h * (stride + 1)].reshape(
        h, stride + 1
    )
    recon = _defilter_png(rows, h, stride, bpp)
    return _expand_png_pixels(recon, w, h, depth, ctype_v, nch, plte)


# pass origin and step (x0, y0, dx, dy), PNG spec §8.2:
#   1 6 4 6 2 6 4 6
#   7 7 7 7 7 7 7 7
#   5 6 5 6 5 6 5 6   (repeating 8x8 starting pattern)
_ADAM7_PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _defilter_png(rows: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo scanline filters for one (sub-)image: (h, stride+1) filter-
    byte-prefixed rows → (h, stride) reconstructed bytes."""
    ftypes = rows[:, 0]
    if not ftypes.any():
        # every scanline unfiltered (our own encoder's default): one
        # vectorized slice instead of the per-row reconstruction loop
        return np.ascontiguousarray(rows[:, 1:])
    recon = np.zeros((h, stride), dtype=np.uint8)
    nlanes = stride // bpp
    for y in range(h):
        ft = int(ftypes[y])
        line = rows[y, 1:].copy()
        up = recon[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ft == 0:
            recon[y] = line
        elif ft == 1:  # Sub: per-lane cumsum mod 256
            lanes = line[: nlanes * bpp].reshape(nlanes, bpp)
            recon[y, : nlanes * bpp] = (
                np.cumsum(lanes, axis=0, dtype=np.uint32) % 256
            ).astype(np.uint8).reshape(nlanes * bpp)
        elif ft == 2:  # Up
            recon[y] = line + up
        elif ft == 3:  # Average (left-sequential per lane)
            out = np.zeros(stride, dtype=np.uint8)
            left = np.zeros(bpp, dtype=np.uint8)
            for x in range(nlanes):
                s = slice(x * bpp, (x + 1) * bpp)
                left = (
                    line[s]
                    + ((left.astype(np.int16) + up[s].astype(np.int16)) // 2).astype(np.uint8)
                )
                out[s] = left
            recon[y] = out
        elif ft == 4:  # Paeth (left-sequential per lane)
            out = np.zeros(stride, dtype=np.uint8)
            left = np.zeros(bpp, dtype=np.uint8)
            ul = np.zeros(bpp, dtype=np.uint8)
            for x in range(nlanes):
                s = slice(x * bpp, (x + 1) * bpp)
                u = up[s]
                left = line[s] + _paeth_pred(left, u, ul).astype(np.uint8)
                out[s] = left
                ul = u
            recon[y] = out
        else:
            raise ValueError(f"bad PNG filter byte {ft}")
    return recon


def _expand_png_pixels(recon, w, h, depth, ctype_v, nch, plte):
    """Reconstructed scanline bytes → (h, w, 3) uint8 (sub-byte
    unpacking, palette expansion, grayscale/alpha normalization)."""
    if depth < 8:
        # unpack sub-byte samples MSB-first, then trim row padding
        bits = np.unpackbits(recon, axis=1)
        nsamp = bits.shape[1] // depth
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
        samples = (bits[:, : nsamp * depth].reshape(h, nsamp, depth) * weights).sum(
            axis=2
        )[:, :w].astype(np.uint8)
        if ctype_v == 3:
            if plte is None:
                raise ValueError("palette PNG missing PLTE")
            return np.ascontiguousarray(plte[samples])
        # grayscale: scale to full 8-bit range
        samples = (samples.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
        return np.repeat(samples[:, :, None], 3, axis=2)
    img = recon.reshape(h, w, nch)
    if ctype_v == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return np.ascontiguousarray(plte[img[:, :, 0]])
    if ctype_v == 0:
        return np.repeat(img, 3, axis=2)
    if ctype_v == 4:  # gray + alpha
        return np.repeat(img[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(img[:, :, :3])


# ------------------------------------------------------------------
# real BMP (Windows BITMAPINFOHEADER, 24-bit BI_RGB)
# ------------------------------------------------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → real 24-bit BMP (bottom-up BGR, 4-byte-padded
    rows)."""
    h, w, c = pixels.shape
    assert c == 3
    row_len = (w * 3 + 3) & ~3
    body = np.zeros((h, row_len), dtype=np.uint8)
    body[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(blob: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 (top-down or bottom-up)."""
    if bytes(blob[:2]) != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", blob, 10)
    hdr_size, w, h_signed = struct.unpack_from("<Iii", blob, 14)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    (compression,) = struct.unpack_from("<I", blob, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP bpp={bpp}/compression={compression} not supported")
    h = abs(h_signed)
    row_len = (w * 3 + 3) & ~3
    body = np.frombuffer(bytes(blob[data_off : data_off + h * row_len]),
                         dtype=np.uint8).reshape(h, row_len)
    img = body[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if h_signed > 0:
        img = img[::-1]  # bottom-up
    return np.ascontiguousarray(img)


_BASE_CACHE: dict[tuple[int, int], np.ndarray] = {}


def make_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixels for image index i: smooth
    gradient + seeded noise (FIXTURES.md §1). The gradient depends only
    on (w, h) — cached read-only, noise stays per-i (the synth path is
    the ingest throughput bottleneck: gradient was ~45% of row cost)."""
    rng = np.random.Generator(np.random.PCG64(i))
    base = _BASE_CACHE.get((w, h))
    if base is None:
        gy = np.linspace(0, 255, h)[:, None]
        gx = np.linspace(0, 255, w)[None, :]
        basef = np.stack(
            [
                (gx + gy) / 2,
                np.abs(gx - gy),
                (gx * 0.5 + (255 - gy) * 0.5),
            ],
            axis=-1,
        )
        # floor once at cache time: clip(floor(b)+n,0,255) is bit-equal
        # to clip(b+n,0,255).astype(uint8) for integer n (floor commutes
        # with integer shifts and with clipping at integer bounds; the
        # single fl(b+n) rounding cannot flip a floor because every base
        # frac is ≥2e-4 from the next integer, measured across all three
        # grids, vs ≤2⁻⁴⁵ rounding error) — and the integer add/clip is
        # ~2× cheaper than the float64 chain (ingest hot path)
        base = np.floor(basef).astype(np.int16)
        base.setflags(write=False)
        _BASE_CACHE[(w, h)] = base
    noise = rng.integers(-20, 21, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def make_noise_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic HIGH-ENTROPY (h, w, 3) uint8 pixels for image
    index i — blake2b counter stream, platform-independent. Unlike
    :func:`make_pixels` (smooth gradients whose 8x8 average hashes
    collide heavily by construction), these produce effectively random
    perceptual hashes: 300 noise images measure ≥16 bits minimum
    pairwise phash Hamming distance, which is what makes a closed-form
    near-duplicate oracle possible (the only pairs within radius 3 are
    the ones a fixture deliberately plants)."""
    import hashlib

    n = w * h * 3
    out = bytearray()
    ctr = 0
    while len(out) < n:
        out += hashlib.blake2b(
            f"{i}:{ctr}".encode(), digest_size=64
        ).digest()
        ctr += 1
    return np.frombuffer(bytes(out[:n]), dtype=np.uint8).reshape(h, w, 3)


# the FJPG quantizer as a 256-entry uint8 lookup table: one vectorized
# take replaces the int32 widen/divide/multiply/clip chain (bit-identical
# by construction — the table IS that chain evaluated per byte value)
_Q_LUT = np.clip(
    (np.arange(256, dtype=np.int32) // _Q) * _Q + _Q // 2, 0, 255
).astype(np.uint8)


def quantize_lossy(pixels: np.ndarray) -> np.ndarray:
    """The FJPG quantizer: what decode(encode(px, 'jpeg')) returns."""
    return _Q_LUT[pixels]


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """uint8 (h, w, 3) → bytes: REAL PNG/BMP; ``fmt='jpeg'`` is the
    deterministic FJPG quantizer used by the synthetic 10^12-row table
    generator (throughput: the fixture path must not pay per-block
    entropy coding); real JPEG files are produced with
    ``fmt='jpeg-real'`` (``images.jpeg.encode_jpeg``, baseline T.81)
    and any real .jpg decodes via :func:`decode_image`.

    PNG uses filter 0 + zlib level 1: deterministic, and compression
    ratio is irrelevant to the correctness gates."""
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "bmp":
        return encode_bmp(pixels)
    if fmt == "jpeg-real":
        from pythongis_spark.images.jpeg import encode_jpeg

        return encode_jpeg(pixels, quality=98)
    if fmt == "gif":
        from pythongis_spark.images.gif import encode_gif

        return encode_gif(pixels)
    h, w, c = pixels.shape
    assert c == 3
    magic = FMT_MAGIC.get(fmt)
    if magic is None:
        raise NotImplementedError(
            f"encode_image fmt {fmt!r}: known formats are "
            f"{sorted(FMT_MAGIC)} + ['jpeg-real', 'gif']")
    if magic == MAGIC_LOSSY:
        payload = zlib.compress(quantize_lossy(pixels).tobytes(), 1)
    else:
        payload = zlib.compress(pixels.tobytes(), 1)
    return magic + struct.pack("<HH", w, h) + payload


def decode_image(blob: bytes) -> np.ndarray:
    """bytes → uint8 (h, w, 3) pixels; container detected by signature
    (real PNG / real BMP / real JPEG / legacy FPNG-FBMP-FJPG
    stand-ins)."""
    sig = bytes(blob[:8])
    if sig == PNG_SIG:
        return decode_png(blob)
    if sig[:2] == b"BM":
        return decode_bmp(blob)
    if sig[:2] == b"\xff\xd8":
        from pythongis_spark.images.jpeg import decode_jpeg

        return decode_jpeg(blob)
    if sig[:4] == b"GIF8":
        from pythongis_spark.images.gif import decode_gif

        return decode_gif(blob)
    magic = sig[:4]
    if magic not in MAGIC_FMT:
        raise ValueError(f"unknown image container {magic!r}")
    w, h = struct.unpack_from("<HH", blob, 4)
    raw = zlib.decompress(bytes(blob[8:]))
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def average_phash(pixels: np.ndarray) -> int:
    """64-bit average hash: grayscale → 8x8 block means → threshold by the
    global mean → bits MSB-first. Deterministic across platforms (pure
    integer/float64 numpy)."""
    # integer channel sum is exact in float64, so sum/3.0 is bit-identical
    # to astype(float64).mean(axis=2) at a third of the float traffic.
    # r6: three uint16 plane adds (max 765, no overflow) produce the same
    # exact integers as the int64 ufunc reduce at ~3× less cost — the
    # reduce was 38% of the whole ingest row budget under profile
    s = pixels[:, :, 0].astype(np.uint16)
    s += pixels[:, :, 1]
    s += pixels[:, :, 2]
    gray = s.astype(np.float64) / 3.0
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


def make_lcg_pixels(i: int, w: int, h: int) -> np.ndarray:
    """(h, w, 3) uint8 pixels from a closed-form integer recurrence an
    ANSI-SQL oracle can replay exactly (flat sub-pixel index p):

        v[p] = (i * 48271 + p * 104729) % 256

    The SQL-replayable counterpart of :func:`make_noise_pixels` (whose
    blake2b stream no SQL engine reproduces): pushing these through the
    REAL lossless PNG encode→decode makes the whole codec round trip
    oracle-checkable end-to-end."""
    p = np.arange(w * h * 3, dtype=np.int64)
    v = (np.int64(i) * 48271 + p * 104729) % 256
    return v.astype(np.uint8).reshape(h, w, 3)
