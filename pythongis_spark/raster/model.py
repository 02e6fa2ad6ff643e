"""Raster data model: cell tables and tile windows.

The reference's ``RasterData`` is a list of PIL-image bands + an affine
geotransform (``pythongis/raster/data.py:945-1299``). Our primary
representation is the **cell table** ``(x int, y int, band int,
val double)`` with nodata → NULL, plus tile-window metadata for chunked
processing — the Spark-native analog of the reference's ``tiled()``
fallback (``pythongis/raster/manager.py:1347-1415``).

The affine transform ``[xscale, xskew, xoffset, yskew, yscale, yoffset]``
becomes plain column expressions (mirroring ``cell_to_geo``/
``geo_to_cell``, ``raster/data.py:1261-1278``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RasterDef:
    """Grid definition: width/height in cells + affine geotransform."""

    width: int
    height: int
    affine: tuple = (1.0, 0.0, -180.0, 0.0, -1.0, 90.0)
    nodata: float = -9999.0

    @property
    def xscale(self):
        return self.affine[0]

    @property
    def xskew(self):
        return self.affine[1]

    @property
    def xoffset(self):
        return self.affine[2]

    @property
    def yskew(self):
        return self.affine[3]

    @property
    def yscale(self):
        return self.affine[4]

    @property
    def yoffset(self):
        return self.affine[5]

    def bbox(self) -> tuple[float, float, float, float]:
        xs = [self.xoffset, self.xoffset + self.width * self.xscale]
        ys = [self.yoffset, self.yoffset + self.height * self.yscale]
        return (min(xs), min(ys), max(xs), max(ys))


def cell_center_exprs(rd: RasterDef, x: Column | str = "x", y: Column | str = "y") -> tuple[Column, Column]:
    """Geo coordinates of a cell center (``raster/data.py:1261-1267`` with
    the +0.5 center offset)."""
    xc = (F.col(x) if isinstance(x, str) else x) + 0.5
    yc = (F.col(y) if isinstance(y, str) else y) + 0.5
    gx = xc * rd.xscale + yc * rd.xskew + rd.xoffset
    gy = xc * rd.yscale + yc * rd.yskew + rd.yoffset
    return gx, gy


def geo_to_cell_exprs(rd: RasterDef, lon: Column, lat: Column) -> tuple[Column, Column]:
    """Inverse affine (no skew support — like the reference's practical
    rasters) → integer cell coords (``raster/data.py:1269-1278`` floor)."""
    if rd.xskew != 0 or rd.yskew != 0:
        raise NotImplementedError("skewed affine not supported")
    cx = F.floor((lon - rd.xoffset) / rd.xscale).cast("int")
    cy = F.floor((lat - rd.yoffset) / rd.yscale).cast("int")
    return cx, cy


def in_grid(rd: RasterDef, cx: Column, cy: Column) -> Column:
    return (cx >= 0) & (cx < rd.width) & (cy >= 0) & (cy < rd.height)


def with_tile_ids(df: DataFrame, tw: int, th: int, x: str = "x", y: str = "y") -> DataFrame:
    """Assign tile coordinates/ids to a cell table — the golden
    tile-assignment semantics of ``raster/manager.py:1386-1399``
    (``tx = floor(col/tw)``, row-major tile_id)."""
    tx = F.floor(F.col(x) / tw).cast("int")
    ty = F.floor(F.col(y) / th).cast("int")
    return (
        df.withColumn("tx", tx)
        .withColumn("ty", ty)
        .withColumn("tile_id", (F.col("ty").cast("long") * F.lit(1 << 20) + F.col("tx")))
    )


def tile_windows(width: int, height: int, tw: int, th: int) -> list[dict]:
    """Tile window metadata, mirroring the reference's loop
    (``raster/manager.py:1386-1408``): windows start at multiples of
    (tw, th); the last row/column is capped at the grid edge. Returns
    [{tx, ty, x0, y0, w, h}], row-major."""
    out = []
    ty = 0
    for y0 in range(0, height, th):
        tx = 0
        h = min(th, height - y0)
        for x0 in range(0, width, tw):
            w = min(tw, width - x0)
            out.append(dict(tx=tx, ty=ty, x0=x0, y0=y0, w=w, h=h))
            tx += 1
        ty += 1
    return out


def crop(df: DataFrame, rd: RasterDef, bbox: tuple, worldcoords: bool = True) -> DataFrame:
    """Filter a cell table to a bbox (``raster/manager.py:1169-1345``) —
    with tile/partition columns this is pure partition pruning."""
    if worldcoords:
        xmin, ymin, xmax, ymax = bbox
        x0 = int((min(xmin, xmax) - rd.xoffset) / rd.xscale)
        x1 = int((max(xmin, xmax) - rd.xoffset) / rd.xscale)
        y0 = int((max(ymin, ymax) - rd.yoffset) / rd.yscale)  # yscale < 0
        y1 = int((min(ymin, ymax) - rd.yoffset) / rd.yscale)
        if rd.yscale > 0:
            y0, y1 = y1, y0
    else:
        x0, y0, x1, y1 = (int(v) for v in bbox)
    lo_x, hi_x = sorted((x0, x1))
    lo_y, hi_y = sorted((y0, y1))
    return df.filter(
        (F.col("x") >= lo_x) & (F.col("x") <= hi_x)
        & (F.col("y") >= lo_y) & (F.col("y") <= hi_y)
    )


def roll(df: DataFrame, rd: RasterDef, dx: int, dy: int) -> DataFrame:
    """Wrap-around offset (``raster/manager.py:652-676``)."""
    return df.withColumn("x", F.pmod(F.col("x") + dx, F.lit(rd.width)).cast("int")).withColumn(
        "y", F.pmod(F.col("y") + dy, F.lit(rd.height)).cast("int")
    )
