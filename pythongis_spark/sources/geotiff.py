"""Minimal GeoTIFF reader/writer in pure stdlib struct + numpy.

Scope (documented): single-image, stripped TIFF 6.0 — uncompressed,
Deflate (8 / legacy 32946, stdlib zlib) or PackBits strips, horizontal
differencing predictor — with
the GeoTIFF georeferencing tags ModelPixelScale (33550) +
ModelTiepoint (33922) — the files GDAL writes with COMPRESS=NONE or
COMPRESS=DEFLATE, which the reference reads through PIL
(``pythongis/raster/loader.py``). Tiled or otherwise-compressed TIFFs
raise a clear error instead of mis-decoding.

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
    if compression not in (1, 8, 32946, 32773):
        raise NotImplementedError(
            f"compression={compression} not supported "
            "(uncompressed, Deflate, PackBits)"
        )
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF not supported (stripped only)")
    spp = int(one(277, 1))
    bps = tags.get(258, [8])
    bps0 = int(bps[0] if isinstance(bps, list) else bps)
    sfmt = int(one(339, 1))  # 1 uint, 2 int, 3 float
    dt = {(1, 8): np.uint8, (1, 16): np.uint16, (1, 32): np.uint32,
          (2, 16): np.int16, (2, 32): np.int32,
          (3, 32): np.float32, (3, 64): np.float64}.get((sfmt, bps0))
    if dt is None:
        raise NotImplementedError(f"sample format {sfmt}/{bps0} not supported")
    offs = tags.get(273)
    cnts = tags.get(279)
    if offs is None or cnts is None:
        raise ValueError("missing strip offsets/counts")
    strips = []
    for o, c in zip(offs, cnts):
        data = bytes(buf[o : o + c])
        if compression in (8, 32946):  # Deflate / legacy Deflate: stdlib zlib
            import zlib

            data = zlib.decompress(data)
        elif compression == 32773:
            data = _unpackbits(data)
        strips.append(data)
    raw = b"".join(strips)
    native = np.frombuffer(raw, dtype=np.dtype(dt).newbyteorder(bo)).reshape(
        h, w, spp
    )
    predictor = int(one(317, 1))
    if predictor == 2:
        # horizontal differencing: undo with a per-row cumulative sum,
        # wrapping modulo the sample width (TIFF 6.0 §14). Defined for
        # integer samples only — predictor 3 is the float form; a
        # (nonconformant) predictor=2 + float file would be silently
        # truncated by the int64 cumsum, so reject it.
        if np.issubdtype(dt, np.floating):
            raise NotImplementedError(
                "predictor=2 with floating-point samples is nonconformant "
                "(TIFF 6.0 §14; use predictor=3)"
            )
        native = np.cumsum(native, axis=1, dtype=np.int64).astype(dt)
    elif predictor != 1:
        raise NotImplementedError(f"predictor={predictor} not supported")
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


def write_geotiff(
    cells: DataFrame, rd: RasterDef, path: str, dtype: str = "float64",
    compress: str | None = None,
) -> None:
    """Cell table → single-strip GeoTIFF (float samples; missing cells →
    nodata). ``compress='deflate'`` zlib-compresses the strip
    (compression=8). Driver-side collect — tile large grids into
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
    data = arr.astype("<" + dt.str[1:]).tobytes()
    comp_tag = 1
    if compress == "deflate":
        import zlib

        data = zlib.compress(data, 6)
        comp_tag = 8
    elif compress is not None:
        raise NotImplementedError(f"compress={compress!r}")

    entries = []  # (tag, type, count, packed-value-or-data)

    def ent(tag, ftype, values, fmt):
        payload = struct.pack("<" + fmt * len(values), *values)
        entries.append((tag, ftype, len(values), payload))

    nd_ascii = (repr(float(rd.nodata)) + "\x00").encode()
    ent(256, 3, [rd.width], "H")
    ent(257, 3, [rd.height], "H")
    ent(258, 3, [dt.itemsize * 8] * nbands, "H")
    ent(259, 3, [comp_tag], "H")   # 1 = none, 8 = Deflate
    ent(262, 3, [1], "H")          # BlackIsZero
    ent(277, 3, [nbands], "H")
    ent(278, 3, [rd.height], "H")  # one strip
    ent(279, 4, [len(data)], "I")
    ent(284, 3, [1], "H")          # contiguous
    ent(339, 3, [sfmt] * nbands, "H")
    entries.append((33550, 12, 3, struct.pack("<3d", rd.xscale, -rd.yscale, 0.0)))
    entries.append((33922, 12, 6, struct.pack("<6d", 0, 0, 0, rd.xoffset, rd.yoffset, 0)))
    entries.append((42113, 2, len(nd_ascii), nd_ascii))
    # StripOffsets placeholder added after layout
    entries.append((273, 4, 1, b"\x00\x00\x00\x00"))
    entries.sort(key=lambda t: t[0])

    n = len(entries)
    ifd_off = 8
    ifd_size = 2 + 12 * n + 4
    ext_off = ifd_off + ifd_size
    ext = bytearray()
    packed = []
    for tag, ftype, count, payload in entries:
        if len(payload) <= 4:
            val = payload.ljust(4, b"\x00")
        else:
            val = struct.pack("<I", ext_off + len(ext))
            ext += payload
        packed.append((tag, ftype, count, val))
    data_off = ext_off + len(ext)
    # patch StripOffsets
    packed = [
        (tag, ftype, count, struct.pack("<I", data_off) if tag == 273 else val)
        for tag, ftype, count, val in packed
    ]
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += struct.pack("<H", n)
    for tag, ftype, count, val in packed:
        out += struct.pack("<HHI", tag, ftype, count) + val
    out += struct.pack("<I", 0)  # no next IFD
    out += ext
    out += data
    with open(path, "wb") as fh:
        fh.write(bytes(out))
