"""Shapefile (.shp/.dbf) reader/writer in pure stdlib struct + numpy.

The reference loads shapefiles through the PyShp library
(``pythongis/vector/loader.py:42-115``); that library is absent here,
so this module implements the public ESRI shapefile spec (July 1998
whitepaper) directly:

* .shp — 100-byte header (file code 9994 BE, shape type LE),
  records of (recno BE, content-words BE, shape type LE, payload);
  shape types: 0 null, 1 point, 3 polyline, 5 polygon, 8 multipoint
  (Z/M variants parsed by ignoring the extra coordinate blocks).
* polygon ring grouping: clockwise rings are exteriors, counter-
  clockwise rings are holes assigned to the exterior containing their
  first vertex (the spec's orientation rule).
* .dbf — dBase III header + fixed-width records; C→str, N/F→int/float,
  L→bool, D→str; deleted rows (0x2A flag) skipped.

Scale design: ONE shapefile is an unsplittable binary blob, so a
single file is parsed driver-side (shapefiles are dimension tables in
every reference workflow). A directory of shapefiles parses in
parallel, one file per task, via ``read_shapefiles``.
"""

from __future__ import annotations

import glob as _glob
import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from pythongis_spark.geometry import core as G
from pythongis_spark.geometry import wkb as W

SHAPE_NULL, SHAPE_POINT, SHAPE_POLYLINE, SHAPE_POLYGON, SHAPE_MULTIPOINT = 0, 1, 3, 5, 8
_BASE_TYPE = {
    0: 0, 1: 1, 3: 3, 5: 5, 8: 8,
    11: 1, 13: 3, 15: 5, 18: 8,      # Z variants
    21: 1, 23: 3, 25: 5, 28: 8,      # M variants
}


# ---------------------------------------------------------------- .shp

def _ring_is_cw(ring: np.ndarray) -> bool:
    return G.ring_signed_area(ring) < 0


def _group_rings(rings: list[np.ndarray]):
    """Spec rule: CW = exterior, CCW = hole inside some exterior."""
    exts = [r for r in rings if _ring_is_cw(r)]
    holes = [r for r in rings if not _ring_is_cw(r)]
    if not exts:  # degenerate: treat everything as exteriors
        exts, holes = rings, []
    polys = [[e] for e in exts]
    for h in holes:
        px, py = h[0]
        placed = False
        for i, e in enumerate(exts):
            if G.points_in_polygon(np.array([px]), np.array([py]), ("Polygon", [e]))[0]:
                polys[i].append(h)
                placed = True
                break
        if not placed:
            polys[0].append(h)
    if len(polys) == 1:
        return ("Polygon", polys[0])
    return ("MultiPolygon", polys)


def parse_shp(buf: bytes) -> list[bytes | None]:
    """.shp bytes → list of WKB blobs (None for null shapes)."""
    (code,) = struct.unpack_from(">i", buf, 0)
    if code != 9994:
        raise ValueError("not a shapefile (bad file code)")
    (flen_words,) = struct.unpack_from(">i", buf, 24)
    end = flen_words * 2
    out: list[bytes | None] = []
    off = 100
    while off < end:
        _recno, clen = struct.unpack_from(">ii", buf, off)
        off += 8
        rec_end = off + clen * 2
        (stype,) = struct.unpack_from("<i", buf, off)
        base = _BASE_TYPE.get(stype)
        if base is None:
            raise ValueError(f"unsupported shape type {stype}")
        if base == SHAPE_NULL:
            out.append(None)
        elif base == SHAPE_POINT:
            x, y = struct.unpack_from("<dd", buf, off + 4)
            out.append(W.wkb_point(x, y))
        elif base == SHAPE_MULTIPOINT:
            (npts,) = struct.unpack_from("<i", buf, off + 36)
            pts = np.frombuffer(buf, "<f8", 2 * npts, off + 40).reshape(npts, 2)
            out.append(W.wkb_multipoint([(p[0], p[1]) for p in pts]))
        else:  # polyline / polygon
            nparts, npts = struct.unpack_from("<ii", buf, off + 36)
            parts = np.frombuffer(buf, "<i4", nparts, off + 44)
            pts_off = off + 44 + 4 * nparts
            pts = np.frombuffer(buf, "<f8", 2 * npts, pts_off).reshape(npts, 2)
            bounds = list(parts) + [npts]
            pieces = [
                np.array(pts[bounds[i] : bounds[i + 1]], dtype=np.float64)
                for i in range(nparts)
            ]
            pieces = [p for p in pieces if len(p) >= 2]
            if base == SHAPE_POLYLINE:
                if len(pieces) == 1:
                    out.append(W.wkb_linestring(pieces[0]))
                else:
                    out.append(W.wkb_multilinestring(pieces))
            else:
                rings = [p for p in pieces if len(p) >= 4]
                if not rings:
                    out.append(None)
                else:
                    out.append(W.encode_wkb(_group_rings(rings)))
        off = rec_end
    return out


# ---------------------------------------------------------------- .dbf

def parse_dbf(buf: bytes, return_deleted: bool = False):
    """.dbf bytes → DataFrame (typed columns, deleted rows skipped).
    With ``return_deleted`` also returns the positional record ordinals
    of soft-deleted (0x2A) rows so callers can drop the PAIRED .shp
    geometries instead of mis-aligning the attribute/geometry zip."""
    nrec, hsize, rsize = struct.unpack_from("<iHH", buf, 4)
    fields = []
    off = 32
    while buf[off] != 0x0D:
        raw = buf[off : off + 32]
        name = raw[:11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(raw[11])
        flen = raw[16]
        fdec = raw[17]
        fields.append((name, ftype, flen, fdec))
        off += 32
    rows = []
    deleted: list[int] = []
    roff = hsize
    for ri in range(nrec):
        rec = buf[roff : roff + rsize]
        roff += rsize
        if not rec or rec[0:1] == b"\x2a":  # deleted
            deleted.append(ri)
            continue
        vals = {}
        p = 1
        for name, ftype, flen, fdec in fields:
            raw_v = rec[p : p + flen]
            p += flen
            s = raw_v.decode("ascii", "replace").strip()
            if ftype in ("N", "F"):
                if s == "":
                    vals[name] = None
                elif ftype == "N" and fdec == 0 and "." not in s:
                    vals[name] = int(s)
                else:
                    vals[name] = float(s)
            elif ftype == "L":
                vals[name] = s.upper() in ("T", "Y") if s else None
            else:  # C, D, others as text
                vals[name] = s
        rows.append(vals)
    df = pd.DataFrame(rows, columns=[f[0] for f in fields])
    return (df, deleted) if return_deleted else df


# ---------------------------------------------------------------- read

def _read_one(shp_path: str) -> pd.DataFrame:
    with open(shp_path, "rb") as fh:
        geoms = parse_shp(fh.read())
    dbf_path = os.path.splitext(shp_path)[0] + ".dbf"
    if os.path.exists(dbf_path):
        with open(dbf_path, "rb") as fh:
            attrs, deleted = parse_dbf(fh.read(), return_deleted=True)
        if deleted and len(geoms) == len(attrs) + len(deleted):
            # drop the geometries paired with soft-deleted dbf rows —
            # the .shp keeps a record per ORIGINAL dbf slot
            drop = set(deleted)
            geoms = [g for i, g in enumerate(geoms) if i not in drop]
        if len(attrs) != len(geoms):
            raise ValueError(
                f"shp/dbf record mismatch: {len(geoms)} vs {len(attrs)}"
            )
    else:
        attrs = pd.DataFrame(index=range(len(geoms)))
    attrs = attrs.copy()
    attrs["geom"] = geoms
    return attrs


def read_shapefile(spark: SparkSession, path: str) -> DataFrame:
    """One shapefile → DataFrame (attribute columns + geom WKB).
    Driver-side parse: a single .shp is unsplittable and in every
    reference workflow a dimension table."""
    return spark.createDataFrame(_read_one(path))


def read_shapefiles(spark: SparkSession, pattern: str) -> DataFrame:
    """A glob of shapefiles parsed in parallel, one file per task, with
    a ``source_file`` column — the scale path for many-file layers."""
    paths = sorted(_glob.glob(pattern))
    if not paths:
        raise FileNotFoundError(pattern)
    pdf0 = _read_one(paths[0])
    schema_cols = list(pdf0.columns)

    def gen(batches):
        for pdf in batches:
            for p in pdf["path"]:
                d = _read_one(p)
                d = d[schema_cols]
                d["source_file"] = os.path.basename(p)
                yield d

    files = spark.createDataFrame(pd.DataFrame({"path": paths}))
    from pyspark.sql import types as T

    spark_schema = spark.createDataFrame(pdf0).schema.add(
        T.StructField("source_file", T.StringType())
    )
    return files.repartition(min(len(paths), 64)).mapInPandas(
        gen, schema=spark_schema
    )


# ---------------------------------------------------------------- write

def _shp_ring_order(geom):
    """WKB tuple → shapefile part list with spec orientation (exterior
    CW, holes CCW)."""
    parts = []
    for rings in W.iter_polygons(geom):
        for k, r in enumerate(rings):
            cw = _ring_is_cw(r)
            want_cw = k == 0
            parts.append(r if cw == want_cw else r[::-1])
    return parts


def write_shapefile(df_or_pdf, path: str, geom_col: str = "geom") -> None:
    """Write a (small, collected) table as .shp + .dbf. All geometries
    must share one base type. Intended for dimension-table egress and
    round-trip tests, mirroring the reference saver
    (``pythongis/vector/saver.py:24``)."""
    pdf = df_or_pdf.toPandas() if isinstance(df_or_pdf, DataFrame) else df_or_pdf
    geoms = [W.decode_wkb(bytes(b)) if b is not None else None for b in pdf[geom_col]]
    base = None
    for g in geoms:
        if g is None:
            continue
        t = {"Point": 1, "MultiPoint": 8, "LineString": 3, "MultiLineString": 3,
             "Polygon": 5, "MultiPolygon": 5}[g[0]]
        if base is None:
            base = t
        elif base != t:
            raise ValueError("mixed geometry types in one shapefile")
    base = base or 1

    recs = []
    for g in geoms:
        if g is None:
            recs.append(struct.pack("<i", 0))
            continue
        if base == 1:
            recs.append(struct.pack("<i", 1) + struct.pack("<dd", g[1][0, 0], g[1][0, 1]))
            continue
        if base == 8:
            pts = W.all_coords(g)
            body = struct.pack("<4d", pts[:, 0].min(), pts[:, 1].min(),
                               pts[:, 0].max(), pts[:, 1].max())
            body += struct.pack("<i", len(pts)) + pts.astype("<f8").tobytes()
            recs.append(struct.pack("<i", 8) + body)
            continue
        if base == 3:
            pieces = [g[1]] if g[0] == "LineString" else list(g[1])
        else:
            pieces = _shp_ring_order(g)
        pts = np.vstack(pieces)
        starts, acc = [], 0
        for p in pieces:
            starts.append(acc)
            acc += len(p)
        body = struct.pack("<4d", pts[:, 0].min(), pts[:, 1].min(),
                           pts[:, 0].max(), pts[:, 1].max())
        body += struct.pack("<ii", len(pieces), len(pts))
        body += np.array(starts, dtype="<i4").tobytes()
        body += pts.astype("<f8").tobytes()
        recs.append(struct.pack("<i", base) + body)

    all_pts = np.vstack([W.all_coords(g) for g in geoms if g is not None]) if any(
        g is not None for g in geoms
    ) else np.zeros((1, 2))
    content = b""
    shx_entries = b""
    for i, r in enumerate(recs):
        # .shx index entry: (record offset in 16-bit words, content length
        # in 16-bit words) — both big-endian, per the ESRI whitepaper §"Index
        # File"; mandatory for PyShp/GDAL/QGIS interop.
        shx_entries += struct.pack(">ii", (100 + len(content)) // 2, len(r) // 2)
        content += struct.pack(">ii", i + 1, len(r) // 2) + r
    flen = (100 + len(content)) // 2
    hdr = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", flen)
    hdr += struct.pack("<ii", 1000, base)
    hdr += struct.pack("<4d", all_pts[:, 0].min(), all_pts[:, 1].min(),
                       all_pts[:, 0].max(), all_pts[:, 1].max())
    hdr += struct.pack("<4d", 0, 0, 0, 0)
    with open(path, "wb") as fh:
        fh.write(hdr + content)
    # .shx shares the .shp header layout except its own file length.
    shx_hdr = struct.pack(">i", 9994) + b"\x00" * 20
    shx_hdr += struct.pack(">i", (100 + len(shx_entries)) // 2)
    shx_hdr += hdr[28:]
    with open(os.path.splitext(path)[0] + ".shx", "wb") as fh:
        fh.write(shx_hdr + shx_entries)

    # .dbf with the non-geom columns
    cols = [c for c in pdf.columns if c != geom_col]
    fields = []
    for c in cols:
        ser = pdf[c]
        if pd.api.types.is_integer_dtype(ser):
            fields.append((c[:10], "N", 18, 0))
        elif pd.api.types.is_float_dtype(ser):
            fields.append((c[:10], "N", 24, 10))
        else:
            ln = max([len(str(v)) for v in ser] + [1])
            fields.append((c[:10], "C", min(ln, 254), 0))
    rsize = 1 + sum(f[2] for f in fields)
    hsize = 32 + 32 * len(fields) + 1
    dbf = bytearray()
    dbf += struct.pack("<B3BiHH20x", 3, 0, 0, 0, len(pdf), hsize, rsize)
    for name, ftype, flen_, fdec in fields:
        fd = bytearray(32)
        fd[:11] = name.encode("ascii", "replace")[:11].ljust(11, b"\x00")
        fd[11] = ord(ftype)
        fd[16] = flen_
        fd[17] = fdec
        dbf += fd
    dbf += b"\x0d"
    for _, row in pdf.iterrows():
        dbf += b"\x20"
        for (name, ftype, flen_, fdec), c in zip(fields, cols):
            v = row[c]
            if ftype == "N":
                s = ("" if v is None or (isinstance(v, float) and np.isnan(v))
                     else (f"{v:.{fdec}f}" if fdec else str(int(v))))
                dbf += s.rjust(flen_)[:flen_].encode("ascii", "replace")
            else:
                dbf += str(v if v is not None else "").ljust(flen_)[:flen_].encode(
                    "ascii", "replace"
                )
    dbf += b"\x1a"
    with open(os.path.splitext(path)[0] + ".dbf", "wb") as fh:
        fh.write(bytes(dbf))
