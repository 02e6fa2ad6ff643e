"""NetCDF-3 classic rasters (CDF-1/CDF-2, pure stdlib).

The reference lists NetCDF among its unimplemented loader stubs; the
classic format itself is a public spec (Unidata "NetCDF Classic Format
Specification"): big-endian header — magic ``CDF\\x01``/``\\x02``,
numrecs, dimension list, global attributes, variable list (each with
dim ids, attributes, external type, vsize, begin offset) — followed by
fixed-size variable data (record variables interleave per record at
the end). Types: byte/char/short/int/float/double. CDF-2 only widens
the ``begin`` offsets to 64-bit.

Read: any fixed-size OR record variable, returned as the engine's
sparse cell table; 1-D coordinate variables matching the dimension
names (the CF convention) build the affine, else unit grid. Write:
CDF-1 with fixed-size variables (the raster case).

Single-file driver-side parse, same contract as the ASCII-grid and BIL
sources.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from pythongis_spark.raster.model import RasterDef

_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C
_TYPES = {1: ("i1", 1), 2: ("S1", 1), 3: (">i2", 2), 4: (">i4", 4),
          5: (">f4", 4), 6: (">f8", 8)}


class _R:
    def __init__(self, buf: bytes):
        self.b, self.p = buf, 0

    def i4(self) -> int:
        v = struct.unpack_from(">i", self.b, self.p)[0]
        self.p += 4
        return v

    def i8(self) -> int:
        v = struct.unpack_from(">q", self.b, self.p)[0]
        self.p += 8
        return v

    def name(self) -> str:
        n = self.i4()
        s = self.b[self.p : self.p + n].decode("ascii")
        self.p += n + ((-n) % 4)
        return s

    def values(self, nc_type: int, n: int):
        dt, sz = _TYPES[nc_type]
        raw = self.b[self.p : self.p + n * sz]
        self.p += n * sz + ((-(n * sz)) % 4)
        if nc_type == 2:
            return raw.decode("latin-1")
        return np.frombuffer(raw, dtype=dt, count=n)


def _attr_list(r: _R) -> dict:
    tag, n = r.i4(), r.i4()
    attrs = {}
    if tag == 0:
        return attrs
    assert tag == _NC_ATTRIBUTE, f"bad attribute list tag {tag}"
    for _ in range(n):
        nm = r.name()
        t = r.i4()
        cnt = r.i4()
        attrs[nm] = r.values(t, cnt)
    return attrs


def parse_netcdf(buf: bytes) -> dict:
    """Header + data parse → {dims, gatts, vars: {name: {dims, attrs,
    dtype, data}}, numrecs}."""
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError("not a NetCDF classic (CDF-1/CDF-2) file")
    v2 = buf[3] == 2
    r = _R(buf)
    r.p = 4
    numrecs = r.i4()
    dims: list[tuple[str, int]] = []
    tag, n = r.i4(), r.i4()
    if tag != 0:
        assert tag == _NC_DIMENSION, f"bad dim list tag {tag}"
        for _ in range(n):
            dims.append((r.name(), r.i4()))
    gatts = _attr_list(r)
    out = {"dims": dims, "gatts": gatts, "vars": {}, "numrecs": numrecs}
    tag, n = r.i4(), r.i4()
    if tag == 0:
        return out
    assert tag == _NC_VARIABLE, f"bad var list tag {tag}"
    headers = []
    for _ in range(n):
        nm = r.name()
        nd = r.i4()
        dimids = [r.i4() for _ in range(nd)]
        attrs = _attr_list(r)
        t = r.i4()
        _vsize = r.i4()
        begin = r.i8() if v2 else r.i4()
        headers.append((nm, dimids, attrs, t, begin))
    rec_vars = [h for h in headers if h[1] and dims[h[1][0]][1] == 0]
    # Unidata classic-format note on padding: with MORE than one record
    # variable each per-record slab is padded to a 4-byte boundary and
    # records interleave; with exactly ONE record variable of type
    # byte/char/short the padding is dropped — records are packed at the
    # variable's natural (possibly odd) stride.
    recsize = sum(
        _rounded_size(h, dims) for h in rec_vars
    ) if len(rec_vars) > 1 else None
    for nm, dimids, attrs, t, begin in headers:
        dt, sz = _TYPES[t]
        shape = [dims[d][1] for d in dimids]
        is_rec = bool(dimids) and dims[dimids[0]][1] == 0
        if is_rec:
            per_rec = int(np.prod(shape[1:], dtype=np.int64)) if shape[1:] else 1
            step = recsize if recsize is not None else per_rec * sz
            chunks = [
                np.frombuffer(buf, dtype=dt, count=per_rec,
                              offset=begin + rec * step)
                for rec in range(numrecs)
            ]
            data = (np.stack(chunks).reshape([numrecs] + shape[1:])
                    if chunks else np.zeros([0] + shape[1:], dtype=dt))
        else:
            cnt = int(np.prod(shape, dtype=np.int64)) if shape else 1
            data = np.frombuffer(buf, dtype=dt, count=cnt, offset=begin)
            data = data.reshape(shape) if shape else data[0]
        out["vars"][nm] = {
            "dims": [dims[d][0] for d in dimids], "attrs": attrs,
            "nc_type": t, "data": data,
        }
    return out


def _rounded_size(header, dims) -> int:
    nm, dimids, _attrs, t, _begin = header
    _dt, sz = _TYPES[t]
    shape = [dims[d][1] for d in dimids]
    per_rec = int(np.prod(shape[1:], dtype=np.int64)) if shape[1:] else 1
    n = per_rec * sz
    return n + ((-n) % 4)


def read_netcdf(spark: SparkSession, path: str,
                var: str | None = None) -> tuple[DataFrame, RasterDef]:
    """NetCDF classic → (cell table, RasterDef). Picks ``var`` (or the
    first 2-D/3-D numeric variable); 1-D coordinate variables named
    after its dims give the affine (regular spacing required, CF
    convention); ``_FillValue``/``missing_value`` → omitted cells."""
    with open(path, "rb") as fh:
        nc = parse_netcdf(fh.read())
    cand = [
        (nm, v) for nm, v in nc["vars"].items()
        if v["nc_type"] != 2 and 2 <= len(v["dims"]) <= 3
        and nm not in [d for d, _ in nc["dims"]]
    ]
    if var is not None:
        pick = [(nm, v) for nm, v in cand if nm == var]
        if not pick:
            raise KeyError(f"variable {var!r} not found (have "
                           f"{[nm for nm, _ in cand]})")
        nm, v = pick[0]
    elif cand:
        nm, v = cand[0]
    else:
        raise ValueError("no 2-D/3-D numeric variable found")
    arr = np.asarray(v["data"], dtype=np.float64)
    if arr.ndim == 2:
        arr = arr[None, ...]
    fill = v["attrs"].get("_FillValue", v["attrs"].get("missing_value"))
    mask = np.ones(arr.shape, dtype=bool)
    if fill is not None:
        mask = arr != float(np.asarray(fill).ravel()[0])

    ydim, xdim = v["dims"][-2], v["dims"][-1]

    def axis(dname, default_n):
        cv = nc["vars"].get(dname)
        if cv is None or len(cv["dims"]) != 1 or cv["nc_type"] == 2:
            return 1.0, 0.0
        a = np.asarray(cv["data"], dtype=np.float64)
        if len(a) < 2:
            return 1.0, float(a[0]) - 0.5 if len(a) else 0.0
        step = a[1] - a[0]
        if not np.allclose(np.diff(a), step):
            raise ValueError(f"irregular coordinate spacing on {dname}")
        return float(step), float(a[0]) - step / 2.0

    xscale, xoff = axis(xdim, arr.shape[-1])
    yscale, yoff = axis(ydim, arr.shape[-2])
    bs, ys, xs = np.nonzero(mask)
    pdf = pd.DataFrame({
        "x": xs.astype(np.int32), "y": ys.astype(np.int32),
        "band": bs.astype(np.int32), "val": arr[bs, ys, xs],
    })
    rd = RasterDef(arr.shape[-1], arr.shape[-2],
                   (xscale, 0.0, xoff, 0.0, yscale, yoff))
    return (
        spark.createDataFrame(pdf, "x int, y int, band int, val double"),
        rd,
    )


def write_netcdf(cells: DataFrame, rd: RasterDef, path: str,
                 var: str = "z", bands: int = 1,
                 fill_value: float = -9999.0) -> None:
    """Cell table → CDF-1 with float64 variable ``var`` over
    (band?, y, x) fixed dims + 1-D double coordinate variables holding
    the cell-center positions (CF convention). Driver-side collect —
    single-file contract as the other grid writers."""
    from pyspark.sql import functions as F

    pdf = cells.filter(F.col("band") < bands).select(
        "x", "y", "band", "val").toPandas()
    arr = np.full((bands, rd.height, rd.width), float(fill_value))
    ok = pdf["val"].notna()
    arr[pdf["band"][ok].to_numpy(int), pdf["y"][ok].to_numpy(int),
        pdf["x"][ok].to_numpy(int)] = pdf["val"][ok]

    def name(s: str) -> bytes:
        b = s.encode("ascii")
        return struct.pack(">i", len(b)) + b + b"\x00" * ((-len(b)) % 4)

    dims = [("y", rd.height), ("x", rd.width)]
    if bands > 1:
        dims = [("band", bands)] + dims
    xs = (np.arange(rd.width) + 0.5) * rd.xscale + rd.xoffset
    ys = (np.arange(rd.height) + 0.5) * rd.yscale + rd.yoffset
    coord = {"x": xs, "y": ys}
    if bands > 1:
        coord["band"] = np.arange(bands, dtype=np.float64)

    dim_ids = {d: i for i, (d, _) in enumerate(dims)}
    var_list = []  # (name, dimids, attrs(bytes), data)
    for d, _n in dims:
        var_list.append((d, [dim_ids[d]], b"\x00" * 8, coord[d]))
    fill_attr = (
        struct.pack(">ii", _NC_ATTRIBUTE, 1)
        + name("_FillValue") + struct.pack(">ii", 6, 1)
        + struct.pack(">d", fill_value)
    )
    vdata = arr if bands > 1 else arr[0]
    var_list.append((var, [dim_ids[d] for d, _ in dims], fill_attr, vdata))

    header = b"CDF\x01" + struct.pack(">i", 0)
    header += struct.pack(">ii", _NC_DIMENSION, len(dims))
    for d, n in dims:
        header += name(d) + struct.pack(">i", n)
    header += b"\x00" * 8  # no global attributes
    header += struct.pack(">ii", _NC_VARIABLE, len(var_list))

    bodies = []
    fixed = b""
    for vn, dids, attrs, data in var_list:
        data = np.ascontiguousarray(np.asarray(data, dtype=">f8"))
        raw = data.tobytes()
        raw += b"\x00" * ((-len(raw)) % 4)
        bodies.append((vn, dids, attrs, raw))
        fixed += name(vn) + struct.pack(">i", len(dids))
        fixed += b"".join(struct.pack(">i", d) for d in dids)
        fixed += attrs
        fixed += struct.pack(">ii", 6, len(raw))
        fixed += struct.pack(">i", 0)  # begin placeholder (patched below)
    header += fixed

    # patch begin offsets now that the header length is known
    out = bytearray(header)
    pos = len(header)
    # walk back through the var entries to patch each 'begin'
    patch_at = []
    p = len(header)
    for vn, dids, attrs, raw in reversed(bodies):
        p -= 4
        patch_at.append(p)
        p -= 8  # nc_type + vsize
        p -= len(attrs)
        p -= 4 * len(dids) + 4
        p -= 4 + len(vn.encode()) + ((-len(vn.encode())) % 4)
    patch_at.reverse()
    offset = len(header)
    for (vn, dids, attrs, raw), at in zip(bodies, patch_at):
        struct.pack_into(">i", out, at, offset)
        offset += len(raw)
    for _vn, _dids, _attrs, raw in bodies:
        out += raw
    with open(path, "wb") as fh:
        fh.write(bytes(out))
