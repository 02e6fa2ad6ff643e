"""Tiling operators: vector feature → tile assignment with clipping.

Reference: vector ``tiled`` (``pythongis/vector/manager.py:47-79``) crops
the layer to each tile of a bbox grid, intersecting geometries with the
tile rectangle and skipping empty tiles; raster ``tiled`` is
``raster/manager.py:1347-1415`` (see ``raster.model.tile_windows``).

Spark form: tile ids from feature bboxes (explode when a feature spans
tiles), geometry clipped to the tile rectangle with pure-numpy
Sutherland–Hodgman / Cohen–Sutherland (``geometry.core``), empty
intersections dropped — one distributed pass, no per-tile scans.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pythongis_spark.geometry import core as G
from pythongis_spark.geometry import wkb as W


def _tile_grid(bbox: tuple, tiles: tuple[int, int]):
    xmin, ymin, xmax, ymax = bbox
    ntx, nty = tiles
    tw = (xmax - xmin) / ntx
    th = (ymax - ymin) / nty
    return xmin, ymin, tw, th, ntx, nty


def tiled_vector(
    df: DataFrame,
    bbox: tuple = (-180.0, -90.0, 180.0, 90.0),
    tiles: tuple[int, int] = (5, 5),
    geom: str = "geom",
    clip: bool = True,
) -> DataFrame:
    """Assign every feature to each overlapping tile (exploding
    spanning features), clipping geometry to the tile rectangle.

    Output adds (tile_tx, tile_ty, tile_id); geometry replaced by its
    clipped version when ``clip``. Features whose intersection with a tile
    is empty produce no row for it (empty tiles skipped,
    ``vector/manager.py:77-79``).
    """
    x0, y0, tw, th, ntx, nty = _tile_grid(bbox, tiles)

    @F.pandas_udf("array<struct<tx:int,ty:int,g:binary>>")
    def assign(geoms: pd.Series) -> pd.Series:
        out = []
        for blob in geoms.to_numpy(object):
            if blob is None:
                out.append(None)
                continue
            g = W.decode_wkb(bytes(blob))
            coords = W.all_coords(g)
            gxmin, gymin = coords[:, 0].min(), coords[:, 1].min()
            gxmax, gymax = coords[:, 0].max(), coords[:, 1].max()
            tx0 = max(0, int(np.floor((gxmin - x0) / tw)))
            tx1 = min(ntx - 1, int(np.floor((gxmax - x0) / tw)))
            ty0 = max(0, int(np.floor((gymin - y0) / th)))
            ty1 = min(nty - 1, int(np.floor((gymax - y0) / th)))
            items = []
            for ty in range(ty0, ty1 + 1):
                for tx in range(tx0, tx1 + 1):
                    rect = (
                        x0 + tx * tw,
                        y0 + ty * th,
                        x0 + (tx + 1) * tw,
                        y0 + (ty + 1) * th,
                    )
                    cg = _clip_geom(g, rect) if clip else blob
                    if cg is not None:
                        items.append({"tx": tx, "ty": ty, "g": cg})
            out.append(items)
        return pd.Series(out, index=geoms.index)

    out = df.withColumn("_t", F.explode(assign(F.col(geom))))
    return (
        out.withColumn("tile_tx", F.col("_t.tx"))
        .withColumn("tile_ty", F.col("_t.ty"))
        .withColumn("tile_id", F.col("_t.ty").cast("long") * ntx + F.col("_t.tx"))
        .withColumn(geom, F.col("_t.g"))
        .drop("_t")
    )


def _clip_geom(g, rect) -> bytes | None:
    """Intersect a geometry with a rectangle (tile crop,
    ``vector/manager.py:26-45``). Returns WKB or None when empty."""
    xmin, ymin, xmax, ymax = rect
    t, payload = g
    if t in ("Point", "MultiPoint"):
        coords = W.all_coords(g)
        keep = (
            (coords[:, 0] >= xmin)
            & (coords[:, 0] <= xmax)
            & (coords[:, 1] >= ymin)
            & (coords[:, 1] <= ymax)
        )
        kept = coords[keep]
        if len(kept) == 0:
            return None
        if len(kept) == 1:
            return W.wkb_point(kept[0, 0], kept[0, 1])
        return W.wkb_multipoint(kept)
    if t in ("LineString", "MultiLineString"):
        lines = [payload] if t == "LineString" else payload
        segs = []
        for coords in lines:
            segs.extend(G.clip_line_to_rect(coords, xmin, ymin, xmax, ymax))
        if not segs:
            return None
        if len(segs) == 1:
            return W.wkb_linestring(segs[0])
        return W.wkb_multilinestring(segs)
    # polygonal: Sutherland–Hodgman per ring (holes clipped independently)
    polys = []
    for rings in W.iter_polygons(g):
        ext = G.clip_ring_to_rect(rings[0], xmin, ymin, xmax, ymax)
        if ext is None:
            continue
        holes = []
        for hole in rings[1:]:
            ch = G.clip_ring_to_rect(hole, xmin, ymin, xmax, ymax)
            if ch is not None:
                holes.append(ch)
        polys.append((ext, holes))
    if not polys:
        return None
    if len(polys) == 1:
        return W.wkb_polygon(polys[0][0], polys[0][1])
    return W.wkb_multipolygon(polys)


def point_tile_expr(lon, lat, bbox: tuple, tiles: tuple[int, int]):
    """Pure-Catalyst tile id for point layers (row-major, matching
    ``tiled_vector``) — the hot path for the 10^12-image table."""
    x0, y0, tw, th, ntx, nty = _tile_grid(bbox, tiles)
    tx = F.greatest(
        F.lit(0), F.least(F.lit(ntx - 1), F.floor((lon - x0) / F.lit(tw)))
    )
    ty = F.greatest(
        F.lit(0), F.least(F.lit(nty - 1), F.floor((lat - y0) / F.lit(th)))
    )
    return (ty.cast("long") * ntx + tx).alias("tile_id")
