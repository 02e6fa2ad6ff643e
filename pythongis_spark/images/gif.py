"""Pure-stdlib GIF codec (GIF87a/89a, public W3C/CompuServe spec).

The reference loads GIF rasters through PIL (``pythongis/raster/
loader.py:349``); here the format is implemented directly: logical
screen + global/local color tables, extension-block skipping, the
GIF-variant LZW (LSB-first bit packing, dynamic initial code size,
Clear/EOI, width growth at table-full without TIFF's early-change
convention) and Appendix-E four-pass interlacing. Decode returns the
first image frame as (h, w, 3) uint8 RGB — PIL's default frame — and
encode writes a single-frame GIF89a (images with more than 256 distinct
colors raise; rich imagery belongs in PNG/BMP/JPEG).
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode_gif(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: LSB-first packing, codes start at
    ``min_code_size + 1`` bits, Clear = 2^N, EOI = 2^N + 1, width grows
    when the table fills 2^w (max 12 bits)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8

    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    code_w = min_code_size + 1
    prev: bytes | None = None
    while bitpos + code_w <= nbits:
        i0 = bitpos >> 3
        chunk = int.from_bytes(data[i0 : i0 + 4].ljust(4, b"\x00"), "little")
        code = (chunk >> (bitpos & 7)) & ((1 << code_w) - 1)
        bitpos += code_w
        if code == clear:
            table = fresh()
            code_w = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream (code beyond table)")
        out += entry
        prev = entry
        if len(table) >= (1 << code_w) and code_w < 12:
            code_w += 1
    return bytes(out)


def _lzw_encode_gif(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW encode, symmetric with :func:`_lzw_decode_gif`."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    acc_bits = 0

    def emit(code: int, width: int):
        nonlocal acc, acc_bits
        acc |= code << acc_bits
        acc_bits += width
        while acc_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_w = min_code_size + 1
    emit(clear, code_w)
    prev = b""
    for b in data:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], code_w)
        table[cur] = next_code
        # decoder widens when ITS table reaches 2^w; its table trails the
        # encoder's by one entry, so widen after assigning code 2^w - 1
        if next_code == (1 << code_w) and code_w < 12:
            code_w += 1
        next_code += 1
        if next_code > 4095:
            emit(clear, code_w)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_w = min_code_size + 1
        prev = bytes([b])
    if prev:
        emit(table[prev], code_w)
    emit(eoi, code_w)
    if acc_bits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    rows: list[int] = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return rows


def decode_gif(blob: bytes) -> np.ndarray:
    """GIF bytes → first frame as (h, w, 3) uint8 RGB."""
    blob = bytes(blob)
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(blob, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(blob):
        block = blob[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + data sub-blocks, skip
            pos += 1
            while blob[pos]:
                pos += 1 + blob[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", blob, pos)
        pos += 9
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(blob, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image without a color table")
        min_code_size = blob[pos]
        pos += 1
        sub = bytearray()
        while blob[pos]:
            ln = blob[pos]
            sub += blob[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _lzw_decode_gif(bytes(sub), min_code_size), dtype=np.uint8
        )[: w * h]
        if idx.size < w * h:
            raise ValueError("truncated GIF image data")
        grid = idx.reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in 4-pass order
            out = np.empty_like(grid)
            out[_interlace_order(h)] = grid
            grid = out
        return ct[grid].astype(np.uint8)
    raise ValueError("no image data in GIF stream")


def encode_gif(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB → single-frame GIF89a (≤ 256 distinct
    colors; more raises — use PNG/BMP/JPEG for rich imagery)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    assert c == 3
    flat = px.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF supports ≤256 colors, image has {len(palette)}")
    # color table size must be a power of two ≥ 2
    bits = max(1, int(len(palette) - 1).bit_length())
    ct = np.zeros((1 << bits, 3), dtype=np.uint8)
    ct[: len(palette)] = palette
    grid = idx.reshape(h, w).astype(np.uint8)
    if interlace:
        grid = grid[_interlace_order(h)]
    min_code_size = max(2, bits)
    stream = _lzw_encode_gif(grid.tobytes(), min_code_size)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07), 0, 0)
    out += ct.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    out.append(min_code_size)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
