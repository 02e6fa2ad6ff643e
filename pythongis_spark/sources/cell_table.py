"""Cell-table .txt rasters — one delimited row per cell.

The reference's "Cell-Table" loader/saver (``pythongis/raster/
loader.py:421-520`` and ``saver.py:146-180``): a header line of field
names, then one row per cell, identified either by grid indices
(``column``/``row``) or by geographic coordinates (``x``/``y``,
corner-anchored per the saver's ``col*xscale + row*xskew + xoffset``),
with a ``value`` field; georeference via a world-file sidecar.

Unlike the binary single-file formats (BIL/NetCDF), this is a plain
delimited text file — so the READ side is a genuinely distributed
``spark.read.csv`` scan (splittable at any scale), not a driver-side
parse. The write side keeps the dense single-file contract of the
ASCII-grid writer (the reference writes every cell, nodata included).

Divergence note: the reference casts values int-vs-float by sniffing
the first row and maps xy rows through ``geo_to_cell``; the engine's
cell tables are uniformly double and xy rows map by the exact affine
inverse + floor (identical on the saver's corner-anchored output).
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pythongis_spark.raster.model import RasterDef
from pythongis_spark.sources.image_raster import (
    _world_file_path,
    read_world_file,
    write_world_file,
)


def read_cell_table(
    spark: SparkSession,
    path: str,
    delimiter: str = "\t",
    valuefield: str = "value",
    rd: RasterDef | None = None,
    nodata: float | None = None,
) -> tuple[DataFrame, RasterDef]:
    """.txt cell table → ((x, y, band, val) cell table, RasterDef).

    Header fields decide the mode: ``column``/``row`` (grid indices,
    used as-is) or ``x``/``y`` (geo coordinates, mapped through the
    affine inverse — skew-free affines only; the affine comes from
    ``rd`` or the world-file sidecar). ``nodata`` rows are omitted
    (sparse convention)."""
    df = (
        spark.read.option("header", True).option("sep", delimiter)
        .option("inferSchema", False).csv(path)
    )
    cols = [c.lower() for c in df.columns]
    df = df.toDF(*cols)
    if valuefield not in cols:
        raise ValueError(f"cell table has no {valuefield!r} field ({cols})")
    val = F.col(valuefield).cast("double")
    if "column" in cols and "row" in cols:
        out = df.select(
            F.col("column").cast("int").alias("x"),
            F.col("row").cast("int").alias("y"),
            F.lit(0).alias("band"),
            val.alias("val"),
        )
        if rd is None:
            wf = _world_file_path(path)
            affine = read_world_file(wf) if wf else (1.0, 0.0, 0.0, 0.0, 1.0, 0.0)
            mx = out.agg(F.max("x").alias("w"), F.max("y").alias("h")).first()
            rd = RasterDef(int(mx["w"]) + 1, int(mx["h"]) + 1, affine)
    elif "x" in cols and "y" in cols:
        if rd is None:
            wf = _world_file_path(path)
            if wf is None:
                raise ValueError(
                    "xy-mode cell table needs a RasterDef or world file "
                    "for the affine")
            affine = read_world_file(wf)
            # extent from the corner-anchored coordinates (one agg job)
            gx = F.col("x").cast("double")
            gy = F.col("y").cast("double")
            ext = df.agg(
                F.max((gx - affine[2]) / affine[0]).alias("w"),
                F.max((gy - affine[5]) / affine[4]).alias("h"),
            ).first()
            rd = RasterDef(int(ext["w"]) + 1, int(ext["h"]) + 1, affine)
        if rd.xskew != 0 or rd.yskew != 0:
            raise NotImplementedError("xy-mode cell table with skewed affine")
        out = df.select(
            F.floor((F.col("x").cast("double") - rd.xoffset) / rd.xscale)
            .cast("int").alias("x"),
            F.floor((F.col("y").cast("double") - rd.yoffset) / rd.yscale)
            .cast("int").alias("y"),
            F.lit(0).alias("band"),
            val.alias("val"),
        )
    else:
        raise ValueError(
            f"cell table needs column/row or x/y fields, got {cols} "
            f"(reference loader.py:519 raises the same)")
    nd = nodata if nodata is not None else (rd.nodata if rd else None)
    if nd is not None:
        out = out.filter(F.col("val") != float(nd))
    return out, rd


def write_cell_table(
    cells: DataFrame,
    rd: RasterDef,
    path: str,
    cellid: str = "colrow",
    delimiter: str = "\t",
    band: int = 0,
) -> None:
    """(x, y, band, val) cell table → dense .txt + world-file sidecar
    (every cell written, missing → nodata — the reference's dense PIL
    dump; ``cellid`` = 'colrow' or 'xy', saver.py:154-176). Driver-side
    single-file write, same contract as the ASCII-grid writer."""
    if cellid not in ("colrow", "xy"):
        raise ValueError("cellid must be 'colrow' or 'xy' (saver.py:177)")
    pdf = cells.filter(F.col("band") == band).select("x", "y", "val").toPandas()
    arr = np.full((rd.height, rd.width), float(rd.nodata))
    ok = pdf["val"].notna()
    arr[pdf["y"][ok].to_numpy(int), pdf["x"][ok].to_numpy(int)] = pdf["val"][ok]
    xsc, xsk, xof, ysk, ysc, yof = rd.affine
    with open(path, "w") as fh:
        if cellid == "xy":
            fh.write(delimiter.join(["x", "y", "value"]) + "\n")
            for row in range(rd.height):
                for col in range(rd.width):
                    x = col * xsc + row * xsk + xof
                    y = col * ysk + row * ysc + yof
                    fh.write(delimiter.join(
                        [repr(x), repr(y), repr(float(arr[row, col]))]) + "\n")
        else:
            fh.write(delimiter.join(["column", "row", "value"]) + "\n")
            for row in range(rd.height):
                for col in range(rd.width):
                    fh.write(delimiter.join(
                        [str(col), str(row), repr(float(arr[row, col]))]) + "\n")
    write_world_file(os.path.splitext(path)[0] + ".wld", rd.affine)
