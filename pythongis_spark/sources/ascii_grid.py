"""ESRI ASCII grid (.asc) raster load/save.

Reference loads ASCII grids through its raster loader
(``pythongis/raster/loader.py``, via PIL/format sniffing); the format
itself is a public text spec: a 5/6-line header (ncols, nrows,
xllcorner|xllcenter, yllcorner|yllcenter, cellsize, optional
NODATA_value) followed by nrows rows of ncols values, first row =
northernmost. Parsed with numpy ``fromstring`` — no raster lib needed.

A single .asc is an unsplittable text blob → driver-side parse into the
engine's cell table (x, y, band, val). Nodata → NULL rows are simply
absent (sparse cell-table convention).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from pythongis_spark.raster.model import RasterDef


def parse_ascii_grid(text: str) -> tuple[np.ndarray, RasterDef]:
    """.asc text → (2-D float array with NaN nodata (row 0 = north),
    RasterDef)."""
    lines = text.strip().splitlines()
    hdr: dict[str, float] = {}
    data_start = 0
    for i, ln in enumerate(lines):
        parts = ln.split()
        if len(parts) == 2 and parts[0].lower() in (
            "ncols", "nrows", "xllcorner", "yllcorner", "xllcenter",
            "yllcenter", "cellsize", "nodata_value",
        ):
            hdr[parts[0].lower()] = float(parts[1])
            data_start = i + 1
        else:
            break
    ncols, nrows = int(hdr["ncols"]), int(hdr["nrows"])
    cs = hdr["cellsize"]
    if "xllcorner" in hdr:
        x0 = hdr["xllcorner"]
    else:
        x0 = hdr["xllcenter"] - cs / 2
    if "yllcorner" in hdr:
        y0 = hdr["yllcorner"]
    else:
        y0 = hdr["yllcenter"] - cs / 2
    nodata = hdr.get("nodata_value")
    vals = np.array(" ".join(lines[data_start:]).split(), dtype=np.float64)
    if vals.size != ncols * nrows:
        raise ValueError(
            f"expected {ncols * nrows} values, got {vals.size}"
        )
    grid = vals.reshape(nrows, ncols)
    if nodata is not None:
        grid = np.where(grid == nodata, np.nan, grid)
    rd = RasterDef(
        width=ncols,
        height=nrows,
        affine=(cs, 0.0, x0, 0.0, -cs, y0 + nrows * cs),
        nodata=nodata if nodata is not None else -9999.0,
    )
    return grid, rd


def read_ascii_grid(spark: SparkSession, path: str) -> tuple[DataFrame, RasterDef]:
    """.asc file → (cell table (x, y, band=0, val), RasterDef). Nodata
    cells are omitted (sparse convention, like every raster operator
    here)."""
    with open(path) as fh:
        grid, rd = parse_ascii_grid(fh.read())
    ys, xs = np.nonzero(~np.isnan(grid))
    pdf = pd.DataFrame(
        {
            "x": xs.astype(np.int32),
            "y": ys.astype(np.int32),
            "band": np.zeros(len(xs), dtype=np.int32),
            "val": grid[ys, xs],
        }
    )
    return spark.createDataFrame(pdf, "x int, y int, band int, val double"), rd


def write_ascii_grid(
    cells: DataFrame, rd: RasterDef, path: str, band: int = 0, fmt: str | None = None
) -> None:
    """Cell table → .asc (dense; missing cells → NODATA_value).
    Driver-side collect — single-file text rasters are small by
    definition; partition large grids into per-tile files instead."""
    from pyspark.sql import functions as F

    pdf = cells.filter(F.col("band") == band).select("x", "y", "val").toPandas()
    grid = np.full((rd.height, rd.width), float(rd.nodata))
    ok = pdf["val"].notna()
    grid[pdf["y"][ok].to_numpy(int), pdf["x"][ok].to_numpy(int)] = pdf["val"][ok]
    if rd.yscale >= 0:
        raise ValueError("ascii grid export expects north-up (yscale < 0)")
    with open(path, "w") as fh:
        fh.write(f"ncols {rd.width}\n")
        fh.write(f"nrows {rd.height}\n")
        fh.write(f"xllcorner {rd.xoffset!r}\n")
        fh.write(f"yllcorner {(rd.yoffset + rd.height * rd.yscale)!r}\n")
        fh.write(f"cellsize {rd.xscale!r}\n")
        fh.write(f"NODATA_value {rd.nodata!r}\n")
        for row in grid:
            fh.write(
                " ".join((fmt % v) if fmt else repr(v) for v in row) + "\n"
            )
