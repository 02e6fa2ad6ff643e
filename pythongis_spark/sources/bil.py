"""ESRI BIL/BIP/BSQ raw binary rasters (.bil/.bip/.bsq + .hdr sidecar).

The reference's raster loader handles only PIL formats + ASCII grid and
leaves raw binary grids unimplemented; the format itself is a public
ESRI spec (also GDAL's EHdr driver): a text ``.hdr`` with NROWS/NCOLS/
NBANDS/NBITS/BYTEORDER/LAYOUT/ULXMAP/ULYMAP/XDIM/YDIM/NODATA keywords
next to a headerless binary file whose samples are interleaved by line
(BIL), by pixel (BIP) or band-sequential (BSQ). PIXELTYPE
(SIGNEDINT/UNSIGNEDINT/FLOAT) picks the dtype; ULX/ULYMAP are CELL
CENTERS per the spec.

Single-file rasters parse driver-side into the engine's sparse cell
table, like the ASCII-grid source; partition huge grids into per-tile
files instead.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from pythongis_spark.raster.model import RasterDef

_DTYPES = {
    ("SIGNEDINT", 8): "i1", ("SIGNEDINT", 16): "i2", ("SIGNEDINT", 32): "i4",
    ("UNSIGNEDINT", 8): "u1", ("UNSIGNEDINT", 16): "u2",
    ("UNSIGNEDINT", 32): "u4",
    ("FLOAT", 32): "f4", ("FLOAT", 64): "f8",
}


def _hdr_path(path: str) -> str:
    base, _ = os.path.splitext(path)
    for cand in (base + ".hdr", path + ".hdr"):
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(f"no .hdr sidecar for {path}")


def parse_bil_header(text: str) -> dict:
    hdr = {"nbands": 1, "nbits": 8, "byteorder": "I", "layout": "BIL",
           "pixeltype": "UNSIGNEDINT", "ulxmap": 0.0, "ulymap": 0.0,
           "xdim": 1.0, "ydim": 1.0, "nodata": None}
    for ln in text.splitlines():
        parts = ln.split()
        if len(parts) < 2:
            continue
        k, v = parts[0].lower(), parts[1]
        if k in ("nrows", "ncols", "nbands", "nbits", "bandrowbytes",
                 "totalrowbytes", "skipbytes"):
            hdr[k] = int(v)
        elif k in ("ulxmap", "ulymap", "xdim", "ydim", "nodata",
                   "nodata_value"):
            hdr["nodata" if k.startswith("nodata") else k] = float(v)
        elif k in ("layout", "byteorder", "pixeltype"):
            hdr[k] = v.upper()
    if "nrows" not in hdr or "ncols" not in hdr:
        raise ValueError("BIL header missing NROWS/NCOLS")
    return hdr


def read_bil(spark: SparkSession, path: str) -> tuple[DataFrame, RasterDef]:
    """.bil/.bip/.bsq → (cell table (x, y, band, val), RasterDef).
    Nodata cells are omitted (sparse convention)."""
    with open(_hdr_path(path)) as fh:
        hdr = parse_bil_header(fh.read())
    rows, cols, bands = hdr["nrows"], hdr["ncols"], hdr["nbands"]
    key = (hdr["pixeltype"], hdr["nbits"])
    if key not in _DTYPES:
        raise NotImplementedError(f"BIL pixeltype/nbits {key}")
    dt = np.dtype(_DTYPES[key]).newbyteorder(
        "<" if hdr["byteorder"] in ("I", "LSBFIRST") else ">"
    )
    # EHdr allows row padding via BANDROWBYTES/TOTALROWBYTES; the dense
    # np.fromfile below assumes packed rows, so a padded file would be
    # silently misdecoded — raise loudly instead (matching the explicit
    # NotImplementedError style of the other unsupported layouts).
    samp = hdr["nbits"] // 8
    packed_brb = cols * samp
    packed_trb = (cols * bands * samp if hdr["layout"] == "BIP"
                  else bands * packed_brb)
    if hdr.get("bandrowbytes", packed_brb) != packed_brb or \
            hdr.get("totalrowbytes", packed_trb) != packed_trb:
        raise NotImplementedError(
            "BIL row padding (BANDROWBYTES/TOTALROWBYTES exceed the packed "
            f"row size {packed_brb}/{packed_trb}) is not supported")
    raw = np.fromfile(path, dtype=dt, count=rows * cols * bands,
                      offset=hdr.get("skipbytes", 0))
    if raw.size != rows * cols * bands:
        raise ValueError("BIL payload shorter than NROWS*NCOLS*NBANDS")
    layout = hdr["layout"]
    if layout == "BIL":          # (row, band, col)
        arr = raw.reshape(rows, bands, cols).transpose(1, 0, 2)
    elif layout == "BIP":        # (row, col, band)
        arr = raw.reshape(rows, cols, bands).transpose(2, 0, 1)
    elif layout == "BSQ":        # (band, row, col)
        arr = raw.reshape(bands, rows, cols)
    else:
        raise NotImplementedError(f"BIL layout {layout}")
    vals = arr.astype(np.float64)
    mask = np.ones(vals.shape, dtype=bool)
    if hdr["nodata"] is not None:
        mask = vals != hdr["nodata"]
    bs, ys, xs = np.nonzero(mask)
    pdf = pd.DataFrame({
        "x": xs.astype(np.int32), "y": ys.astype(np.int32),
        "band": bs.astype(np.int32), "val": vals[bs, ys, xs],
    })
    rd = RasterDef(
        cols, rows,
        # ULX/ULYMAP are cell centers; RasterDef offsets are corners
        (hdr["xdim"], 0.0, hdr["ulxmap"] - hdr["xdim"] / 2.0,
         0.0, -hdr["ydim"], hdr["ulymap"] + hdr["ydim"] / 2.0),
        nodata=hdr["nodata"] if hdr["nodata"] is not None else -9999.0,
    )
    return spark.createDataFrame(pdf, "x int, y int, band int, val double"), rd


def write_bil(cells: DataFrame, rd: RasterDef, path: str, bands: int = 1,
              layout: str = "BIL", nbits: int = 32,
              pixeltype: str = "FLOAT") -> None:
    """Cell table → raw binary + .hdr sidecar (dense; missing cells →
    nodata). Driver-side collect, same single-file contract as the
    ASCII-grid writer."""
    from pyspark.sql import functions as F

    key = (pixeltype.upper(), nbits)
    if key not in _DTYPES:
        raise NotImplementedError(f"BIL pixeltype/nbits {key}")
    if rd.yscale >= 0:
        raise ValueError("BIL export expects north-up (yscale < 0)")
    pdf = cells.filter(F.col("band") < bands).select(
        "x", "y", "band", "val").toPandas()
    arr = np.full((bands, rd.height, rd.width), float(rd.nodata))
    ok = pdf["val"].notna()
    arr[pdf["band"][ok].to_numpy(int), pdf["y"][ok].to_numpy(int),
        pdf["x"][ok].to_numpy(int)] = pdf["val"][ok]
    layout = layout.upper()
    if layout == "BIL":
        out = arr.transpose(1, 0, 2)
    elif layout == "BIP":
        out = arr.transpose(1, 2, 0)
    elif layout == "BSQ":
        out = arr
    else:
        raise NotImplementedError(f"BIL layout {layout}")
    dt = np.dtype(_DTYPES[key]).newbyteorder("<")
    if dt.kind in "iu":
        # float→int astype of out-of-range values (e.g. a -9999 nodata
        # fill into uint8) wraps to garbage bytes that read back as
        # real data — refuse instead of silently corrupting
        info = np.iinfo(dt)
        bad = out[(out < info.min) | (out > info.max)]
        if bad.size:
            raise ValueError(
                f"value {bad.flat[0]!r} (incl. the nodata fill "
                f"{rd.nodata!r}?) does not fit {pixeltype.upper()}/{nbits}"
                f" [{info.min}, {info.max}]; choose a representable "
                f"nodata or a wider pixel type")
    out.astype(dt).tofile(path)
    with open(os.path.splitext(path)[0] + ".hdr", "w") as fh:
        fh.write(f"NROWS {rd.height}\nNCOLS {rd.width}\nNBANDS {bands}\n")
        fh.write(f"NBITS {nbits}\nBYTEORDER I\nLAYOUT {layout}\n")
        fh.write(f"PIXELTYPE {pixeltype.upper()}\n")
        fh.write(f"ULXMAP {rd.xoffset + rd.xscale / 2.0!r}\n")
        fh.write(f"ULYMAP {rd.yoffset + rd.yscale / 2.0!r}\n")
        fh.write(f"XDIM {rd.xscale!r}\nYDIM {abs(rd.yscale)!r}\n")
        fh.write(f"NODATA {rd.nodata!r}\n")
