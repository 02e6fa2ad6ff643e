"""Minimal GeoTIFF reader/writer in pure stdlib struct + numpy.

Scope (documented): single-image TIFF 6.0 in STRIPPED or TILED (§15)
layout — uncompressed, Deflate (8 / legacy 32946, stdlib zlib),
PackBits (§9) or LZW (§13, MSB-first variable-width codes with the
early-change convention) blocks, horizontal differencing predictor —
with the GeoTIFF georeferencing tags ModelPixelScale (33550) +
ModelTiepoint (33922) — i.e. the files GDAL writes with
COMPRESS=NONE/DEFLATE/LZW/PACKBITS, which the reference reads through
PIL (``pythongis/raster/loader.py:235``). Other compressions raise a
clear error instead of mis-decoding.

Sample types: uint8/16/32, int16/32, float32/64, 1..N bands
(contiguous planar config). Nodata from the GDAL_NODATA ASCII tag
(42113) when present.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from pythongis_spark.raster.model import RasterDef

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d", 16: "Q", 17: "q"}


def _read_ifd_values(buf, bo, ftype, count, val_off_raw):
    size = _TYPE_SIZE.get(ftype, 1) * count
    if size <= 4:
        data = val_off_raw[:size]
    else:
        (off,) = struct.unpack(bo + "I", val_off_raw)
        data = buf[off : off + size]
    if ftype == 2:  # ASCII
        return data.split(b"\x00")[0].decode("ascii", "replace")
    fmt = _TYPE_FMT.get(ftype)
    if fmt is None:
        if ftype == 5:  # RATIONAL
            vals = struct.unpack(bo + "II" * count, data)
            return [vals[i] / vals[i + 1] for i in range(0, 2 * count, 2)]
        return data
    return list(struct.unpack(bo + fmt * count, data))


def _unpackbits(data: bytes) -> bytes:
    """PackBits RLE decode (TIFF 6.0 §9)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        i += 1
        if b < 128:
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # 128: no-op
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW decode (TIFF 6.0 §13): MSB-first bit packing,
    9→12-bit variable-width codes, ClearCode=256 / EOI=257, and the
    early-change convention (width grows when the NEXT table index
    reaches 2^w − 1, matching libtiff/PIL output)."""
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8
    code_w = 9

    def fresh():
        return [bytes([i]) for i in range(256)] + [b"", b""]

    table = fresh()
    prev: bytes | None = None
    while bitpos + code_w <= nbits:
        i0 = bitpos >> 3
        chunk = int.from_bytes(data[i0 : i0 + 3].ljust(3, b"\x00"), "big")
        code = (chunk >> (24 - (bitpos & 7) - code_w)) & ((1 << code_w) - 1)
        bitpos += code_w
        if code == 256:  # Clear
            table = fresh()
            code_w = 9
            prev = None
            continue
        if code == 257:  # EOI
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
            raise ValueError("corrupt LZW stream (code beyond table)")
        out += entry
        prev = entry
        if len(table) >= (1 << code_w) - 1 and code_w < 12:
            code_w += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encode (§13, early change) — driver-side export
    helper, dict-based; mirrors :func:`_lzw_decode` exactly."""
    out = bytearray()
    acc = 0
    acc_bits = 0

    def write(code: int, width: int):
        nonlocal acc, acc_bits
        acc = (acc << width) | code
        acc_bits += width
        while acc_bits >= 8:
            acc_bits -= 8
            out.append((acc >> acc_bits) & 0xFF)

    def fresh():
        return {bytes([i]): i for i in range(256)}

    code_w = 9
    write(256, code_w)
    table = fresh()
    next_code = 258
    prev = b""
    for byte in data:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        write(table[prev], code_w)
        table[cur] = next_code
        next_code += 1
        # §13 early change: "increase the code length as soon as table
        # entry 511 (1023, 2047) is added" — entry index next_code-1
        if next_code >= (1 << code_w) and code_w < 12:
            code_w += 1
        if next_code > 4093:  # table nearly full: restart
            write(256, code_w)
            table = fresh()
            next_code = 258
            code_w = 9
        prev = bytes([byte])
    if prev:
        write(table[prev], code_w)
    write(257, code_w)
    if acc_bits:
        out.append((acc << (8 - acc_bits)) & 0xFF)
    return bytes(out)


def _decode_block(data: bytes, compression: int) -> bytes:
    if compression in (8, 32946):  # Deflate / legacy Deflate
        import zlib

        return zlib.decompress(data)
    if compression == 32773:
        return _unpackbits(data)
    if compression == 5:
        return _lzw_decode(data)
    return data


def _undo_predictor(native: np.ndarray, predictor: int, dt) -> np.ndarray:
    """Undo horizontal differencing (§14) on an (h, w, spp) block. Rows
    are differenced within each strip/tile independently, but since
    differencing is per ROW the same undo applies to any block shape."""
    if predictor == 1:
        return native
    if predictor == 2:
        if np.issubdtype(dt, np.floating):
            raise NotImplementedError(
                "predictor=2 with floating-point samples is nonconformant "
                "(TIFF 6.0 §14; use predictor=3)"
            )
        return np.cumsum(native, axis=1, dtype=np.int64).astype(dt)
    raise NotImplementedError(f"predictor={predictor} not supported")


def parse_geotiff(buf: bytes):
    """GeoTIFF bytes → ((h, w, bands) float array with NaN nodata,
    RasterDef)."""
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    (magic,) = struct.unpack_from(bo + "H", buf, 2)
    if magic != 42:
        raise ValueError("not a TIFF (bad magic)")
    (ifd_off,) = struct.unpack_from(bo + "I", buf, 4)
    (n_entries,) = struct.unpack_from(bo + "H", buf, ifd_off)
    tags: dict[int, object] = {}
    for i in range(n_entries):
        e = ifd_off + 2 + 12 * i
        tag, ftype, count = struct.unpack_from(bo + "HHI", buf, e)
        tags[tag] = _read_ifd_values(buf, bo, ftype, count, buf[e + 8 : e + 12])

    def one(t, default=None):
        v = tags.get(t, default)
        return v[0] if isinstance(v, list) else v

    w, h = int(one(256)), int(one(257))
    compression = int(one(259, 1))
    if compression not in (1, 5, 8, 32946, 32773):
        raise NotImplementedError(
            f"compression={compression} not supported "
            "(uncompressed, LZW, Deflate, PackBits)"
        )
    spp = int(one(277, 1))
    if int(one(284, 1)) == 2 and spp > 1:
        # band-sequential (planar) layout interleaves differently — the
        # chunky reshape below would silently scramble bands
        raise NotImplementedError(
            "PlanarConfiguration=2 (band-sequential) TIFF not supported; "
            "re-save pixel-interleaved (GDAL INTERLEAVE=PIXEL)")
    bps = tags.get(258, [8])
    bps0 = int(bps[0] if isinstance(bps, list) else bps)
    sfmt = int(one(339, 1))  # 1 uint, 2 int, 3 float
    dt = {(1, 8): np.uint8, (1, 16): np.uint16, (1, 32): np.uint32,
          (2, 16): np.int16, (2, 32): np.int32,
          (3, 32): np.float32, (3, 64): np.float64}.get((sfmt, bps0))
    if dt is None:
        raise NotImplementedError(f"sample format {sfmt}/{bps0} not supported")
    predictor = int(one(317, 1))
    ndt = np.dtype(dt).newbyteorder(bo)
    if 322 in tags or 323 in tags:
        # tiled layout (TIFF 6.0 §15): fixed-size tiles, row-major tile
        # grid, edge tiles padded in the file to full tile size; the
        # predictor is undone PER TILE (rows are differenced within a
        # tile) before placement
        tw, tl = int(one(322)), int(one(323))
        offs = tags.get(324)
        cnts = tags.get(325)
        if offs is None or cnts is None:
            raise ValueError("missing tile offsets/counts")
        tiles_across = (w + tw - 1) // tw
        native = np.zeros((h, w, spp), dtype=dt)
        for idx, (o, c) in enumerate(zip(offs, cnts)):
            data = _decode_block(bytes(buf[o : o + c]), compression)
            tile = np.frombuffer(data, dtype=ndt).reshape(tl, tw, spp)
            tile = _undo_predictor(tile, predictor, dt)
            ty, tx = divmod(idx, tiles_across)
            y0, x0 = ty * tl, tx * tw
            hh, ww = min(tl, h - y0), min(tw, w - x0)
            native[y0 : y0 + hh, x0 : x0 + ww] = tile[:hh, :ww]
    else:
        offs = tags.get(273)
        cnts = tags.get(279)
        if offs is None or cnts is None:
            raise ValueError("missing strip offsets/counts")
        raw = b"".join(
            _decode_block(bytes(buf[o : o + c]), compression)
            for o, c in zip(offs, cnts)
        )
        native = np.frombuffer(raw, dtype=ndt).reshape(h, w, spp)
        # strip rows are full image rows, so the per-row predictor undo
        # is valid on the assembled array
        native = _undo_predictor(native, predictor, dt)
    arr = native.astype(np.float64)

    scale = tags.get(33550)  # [sx, sy, sz]
    tie = tags.get(33922)    # [i, j, k, x, y, z]
    if scale and tie:
        sx, sy = float(scale[0]), float(scale[1])
        i0, j0, gx, gy = float(tie[0]), float(tie[1]), float(tie[3]), float(tie[4])
        xoff = gx - i0 * sx
        yoff = gy + j0 * sy
        affine = (sx, 0.0, xoff, 0.0, -sy, yoff)
    else:
        affine = (1.0, 0.0, 0.0, 0.0, -1.0, float(h))
    nodata = tags.get(42113)
    nd = None
    if nodata is not None:
        try:
            nd = float(str(nodata).strip())
        except ValueError:
            nd = None
    if nd is not None:
        arr = np.where(arr == nd, np.nan, arr)
    rd = RasterDef(width=w, height=h, affine=affine,
                   nodata=nd if nd is not None else -9999.0)
    return arr, rd


def read_geotiff(spark: SparkSession, path: str) -> tuple[DataFrame, RasterDef]:
    """.tif → (cell table (x, y, band, val), RasterDef); nodata omitted."""
    with open(path, "rb") as fh:
        arr, rd = parse_geotiff(fh.read())
    h, w, bands = arr.shape
    frames = []
    for b in range(bands):
        ys, xs = np.nonzero(~np.isnan(arr[:, :, b]))
        frames.append(
            pd.DataFrame(
                {"x": xs.astype(np.int32), "y": ys.astype(np.int32),
                 "band": np.full(len(xs), b, dtype=np.int32),
                 "val": arr[ys, xs, b]}
            )
        )
    pdf = pd.concat(frames, ignore_index=True)
    return spark.createDataFrame(pdf, "x int, y int, band int, val double"), rd


def _packbits_encode(data: bytes) -> bytes:
    """PackBits RLE encode (TIFF 6.0 §9): repeat packets for runs ≥ 2,
    literal packets otherwise (run scan breaks literals at a 3-repeat)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j < n - 1 and data[j] == data[j + 1] and j - i < 127:
            j += 1
        if j > i:
            out.append(257 - (j - i + 1))
            out.append(data[i])
            i = j + 1
            continue
        while j < n and j - i < 128:
            if j < n - 2 and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


_COMPRESSORS = {
    None: (1, lambda d: d),
    "deflate": (8, None),  # filled below (lazy zlib import)
    "packbits": (32773, _packbits_encode),
    "lzw": (5, _lzw_encode),
}


def _compress_block(data: bytes, compress: str | None) -> tuple[int, bytes]:
    if compress == "deflate":
        import zlib

        return 8, zlib.compress(data, 6)
    if compress not in _COMPRESSORS:
        raise NotImplementedError(f"compress={compress!r}")
    tag, fn = _COMPRESSORS[compress]
    return tag, fn(data)


def write_geotiff(
    cells: DataFrame, rd: RasterDef, path: str, dtype: str = "float64",
    compress: str | None = None, tile: tuple[int, int] | None = None,
) -> None:
    """Cell table → GeoTIFF (float samples; missing cells → nodata).

    ``compress``: None | 'deflate' | 'packbits' | 'lzw'.
    ``tile=(tw, th)``: tiled layout (§15; tw/th multiples of 16) instead
    of a single strip. Driver-side collect — tile large grids into
    per-tile files instead."""
    from pyspark.sql import functions as F

    if rd.yscale >= 0:
        raise ValueError("geotiff export expects north-up (yscale < 0)")
    pdf = cells.select("x", "y", "band", "val").toPandas()
    nbands = int(pdf["band"].max()) + 1 if len(pdf) else 1
    arr = np.full((rd.height, rd.width, nbands), float(rd.nodata), dtype=np.float64)
    ok = pdf["val"].notna()
    arr[pdf["y"][ok].to_numpy(int), pdf["x"][ok].to_numpy(int),
        pdf["band"][ok].to_numpy(int)] = pdf["val"][ok]
    dt = np.dtype(dtype)
    sfmt = 3 if dt.kind == "f" else (2 if dt.kind == "i" else 1)
    native = arr.astype("<" + dt.str[1:])

    blocks: list[bytes] = []
    if tile is not None:
        tw, tl = tile
        if tw % 16 or tl % 16:
            raise ValueError("tile dims must be multiples of 16 (TIFF 6.0 §15)")
        for y0 in range(0, rd.height, tl):
            for x0 in range(0, rd.width, tw):
                t = np.full((tl, tw, nbands), float(rd.nodata), dtype=native.dtype)
                hh = min(tl, rd.height - y0)
                ww = min(tw, rd.width - x0)
                t[:hh, :ww] = native[y0 : y0 + hh, x0 : x0 + ww]
                comp_tag, blk = _compress_block(t.tobytes(), compress)
                blocks.append(blk)
    else:
        comp_tag, blk = _compress_block(native.tobytes(), compress)
        blocks.append(blk)

    entries = []  # (tag, type, count, packed-value-or-data)

    def ent(tag, ftype, values, fmt):
        payload = struct.pack("<" + fmt * len(values), *values)
        entries.append((tag, ftype, len(values), payload))

    nd_ascii = (repr(float(rd.nodata)) + "\x00").encode()
    # width/height/rows-per-strip are SHORT-or-LONG tags — write LONG so
    # dimensions past 65535 don't overflow the pack (readers accept both)
    ent(256, 4, [rd.width], "I")
    ent(257, 4, [rd.height], "I")
    ent(258, 3, [dt.itemsize * 8] * nbands, "H")
    ent(259, 3, [comp_tag], "H")
    ent(262, 3, [1], "H")          # BlackIsZero
    ent(277, 3, [nbands], "H")
    ent(284, 3, [1], "H")          # contiguous
    ent(339, 3, [sfmt] * nbands, "H")
    if tile is not None:
        ent(322, 3, [tile[0]], "H")
        ent(323, 3, [tile[1]], "H")
        ent(325, 4, [len(b) for b in blocks], "I")
        entries.append((324, 4, len(blocks), b"\x00" * 4 * len(blocks)))
        offsets_tag = 324
    else:
        ent(278, 4, [rd.height], "I")  # one strip
        ent(279, 4, [len(blocks[0])], "I")
        entries.append((273, 4, 1, b"\x00\x00\x00\x00"))
        offsets_tag = 273
    entries.append((33550, 12, 3, struct.pack("<3d", rd.xscale, -rd.yscale, 0.0)))
    entries.append((33922, 12, 6, struct.pack("<6d", 0, 0, 0, rd.xoffset, rd.yoffset, 0)))
    entries.append((42113, 2, len(nd_ascii), nd_ascii))
    entries.sort(key=lambda t: t[0])

    n = len(entries)
    ifd_off = 8
    ifd_size = 2 + 12 * n + 4
    ext_off = ifd_off + ifd_size
    # first pass: lay out ext payloads (offsets array included, zeroed)
    ext = bytearray()
    packed = []
    ext_pos = {}  # tag -> position of its payload in ext (for patching)
    for tag, ftype, count, payload in entries:
        if len(payload) <= 4:
            val = payload.ljust(4, b"\x00")
            ext_pos[tag] = None
        else:
            ext_pos[tag] = len(ext)
            val = struct.pack("<I", ext_off + len(ext))
            ext += payload
        packed.append((tag, ftype, count, val))
    data_off = ext_off + len(ext)
    # second pass: patch block offsets now that the data start is known
    offs = []
    pos = data_off
    for b in blocks:
        offs.append(pos)
        pos += len(b)
    offs_payload = struct.pack("<" + "I" * len(offs), *offs)
    if ext_pos.get(offsets_tag) is not None:
        p = ext_pos[offsets_tag]
        ext[p : p + len(offs_payload)] = offs_payload
    else:
        packed = [
            (tag, ftype, count, offs_payload.ljust(4, b"\x00") if tag == offsets_tag else val)
            for tag, ftype, count, val in packed
        ]
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += struct.pack("<H", n)
    for tag, ftype, count, val in packed:
        out += struct.pack("<HHI", tag, ftype, count) + val
    out += struct.pack("<I", 0)  # no next IFD
    out += ext
    for b in blocks:
        out += b
    with open(path, "wb") as fh:
        fh.write(bytes(out))
