"""Analysis operators: spatial overlay stats, nearest point, connect.

Reference: ``pythongis/vector/analyzer.py`` (spatial_stats ``:16-153``,
closest_point ``:289-311``) and ``pythongis/vector/manager.py:660-713``
(connect).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pythongis_spark.geometry import geodesy
from pythongis_spark.geometry import wkb as W
from pythongis_spark.operators.relational import aggregate
from pythongis_spark.operators.spatial_join import point_in_polygon_join


def spatial_stats(
    points: DataFrame,
    zones: DataFrame,
    fieldmapping: list[tuple[str, str, str]],
    zone_id: str = "zone_id",
    keepall: bool = True,
    order_col: str | None = None,
    **join_kw,
) -> DataFrame:
    """Per zone, aggregate the attributes of all contained points —
    the reference's ``spatial_stats`` (``pythongis/vector/analyzer.py:16``)
    as spatial join → one groupBy (vs its per-feature index probes)."""
    tagged = point_in_polygon_join(points, zones, **join_kw)
    stats = aggregate(tagged, [zone_id], fieldmapping, order_col)
    if keepall:
        return zones.select(zone_id).join(stats, zone_id, "left")
    return stats


from pyspark.sql import types as T

_CP_SCHEMA = T.StructType(
    [
        T.StructField("cx", T.DoubleType()),
        T.StructField("cy", T.DoubleType()),
        T.StructField("dist", T.DoubleType()),
    ]
)


@F.pandas_udf(_CP_SCHEMA)
def _closest_point_on_geom(px: pd.Series, py: pd.Series, geom: pd.Series) -> pd.DataFrame:
    """Nearest point *on* a geometry from each (px, py): vectorized
    point-to-segment projections (``shapely.ops.nearest_points`` analog,
    reference use at ``pythongis/vector/analyzer.py:289-311``)."""
    n = len(px)
    out = np.full((n, 3), np.nan)
    pxv = px.to_numpy(np.float64)
    pyv = py.to_numpy(np.float64)
    cache: dict[bytes, object] = {}
    for i in range(n):
        blob = geom.iloc[i]
        if blob is None or not np.isfinite(pxv[i]):
            continue
        b = bytes(blob)
        g = cache.get(b)
        if g is None:
            g = W.decode_wkb(b)
            cache[b] = g
        t, payload = g
        if t == "Point":
            out[i, :2] = payload[0]
        else:
            segs = (
                [payload]
                if t == "LineString"
                else payload
                if t == "MultiLineString"
                else W.iter_rings(g)
            )
            best_d2 = np.inf
            best = None
            p = np.array([pxv[i], pyv[i]])
            for coords in segs:
                a, bb = coords[:-1], coords[1:]
                ab = bb - a
                ab2 = (ab**2).sum(axis=1)
                ab2 = np.where(ab2 == 0, 1.0, ab2)
                tproj = np.clip(((p - a) * ab).sum(axis=1) / ab2, 0.0, 1.0)
                proj = a + tproj[:, None] * ab
                d2 = ((p - proj) ** 2).sum(axis=1)
                j = d2.argmin()
                if d2[j] < best_d2:
                    best_d2 = d2[j]
                    best = proj[j]
            out[i, :2] = best
        out[i, 2] = np.sqrt(((out[i, :2] - [pxv[i], pyv[i]]) ** 2).sum())
    return pd.DataFrame({"cx": out[:, 0], "cy": out[:, 1], "dist": out[:, 2]}, index=px.index)


def closest_point(
    points: DataFrame,
    targets: DataFrame,
    point_id: str,
    target_id: str,
    lon: str = "lon",
    lat: str = "lat",
    target_geom: str = "geom",
) -> DataFrame:
    """For each point, the nearest target feature's closest point —
    reference ``closest_point`` (``analyzer.py:289``): kNN by centroid
    first, then exact nearest-point on the winner's geometry.

    For polygon targets the candidate set is the 3 nearest centroids to
    absorb centroid-vs-boundary ranking error."""
    from pythongis_spark.geometry.udfs import st_centroid
    from pythongis_spark.operators.knn import knn_join

    tgt = targets.withColumn("_c", st_centroid(F.col(target_geom))).select(
        F.col(target_id),
        F.col(target_geom).alias("_tg"),
        F.col("_c.cx").alias("lon"),
        F.col("_c.cy").alias("lat"),
    )
    cand = knn_join(
        points, tgt.select(target_id, "lon", "lat"), 3,
        point_id=point_id, target_id=target_id, lon=lon, lat=lat,
    ).join(tgt.select(target_id, "_tg"), target_id)
    cp = cand.withColumn(
        "_cp", _closest_point_on_geom(F.col(lon), F.col(lat), F.col("_tg"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(point_id).orderBy(F.col("_cp.dist").asc(), F.col(target_id).asc())
    return (
        cp.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            point_id,
            target_id,
            F.col("_cp.cx").alias("closest_x"),
            F.col("_cp.cy").alias("closest_y"),
            F.col("_cp.dist").alias("dist"),
        )
    )


def snap_points(
    points: DataFrame,
    targets: DataFrame,
    tolerance: float,
    *,
    point_id: str,
    lon: str = "lon",
    lat: str = "lat",
    target_geom: str = "geom",
) -> DataFrame:
    """Snap point coordinates to the nearest *vertex* of the target layer
    within ``tolerance`` — the point case of the reference's snap
    (``pythongis/vector/manager.py:622-648``; its farthest-first repeat
    order only matters for mutating shared vertices, which our immutable
    columns don't have).

    Output: point columns with lon/lat replaced where snapped, plus
    ``snapped`` boolean. Scales as a distance join on target vertices.
    """
    from pythongis_spark.geometry.udfs import st_dump_points
    from pythongis_spark.operators.knn import knn_join

    # explode target vertices -> (vlon, vlat) point table
    verts = (
        targets.select(F.explode(st_dump_points(F.col(target_geom))).alias("_vp"))
        .select("_vp")
        .distinct()
    )

    @F.pandas_udf("struct<vlon:double,vlat:double>")
    def unpack(blobs: pd.Series) -> pd.DataFrame:
        xs = np.full(len(blobs), np.nan)
        ys = np.full(len(blobs), np.nan)
        for i, b in enumerate(blobs.to_numpy(object)):
            t, coords = W.decode_wkb(bytes(b))
            xs[i], ys[i] = coords[0]
        return pd.DataFrame({"vlon": xs, "vlat": ys}, index=blobs.index)

    vert_pts = (
        verts.withColumn("_c", unpack(F.col("_vp")))
        .select(F.col("_c.vlon").alias("vlon"), F.col("_c.vlat").alias("vlat"))
        .distinct()
        .withColumn("vid", F.monotonically_increasing_id())
    )
    nearest = knn_join(
        points, vert_pts, 1,
        point_id=point_id, target_id="vid", t_lon="vlon", t_lat="vlat",
        lon=lon, lat=lat,
    ).join(vert_pts, "vid")
    snapped = nearest.withColumn("snapped", F.col("dist") <= tolerance)
    out_cols = [c for c in points.columns if c not in (lon, lat)]
    return snapped.select(
        *out_cols,
        F.when(F.col("snapped"), F.col("vlon")).otherwise(F.col(lon)).alias(lon),
        F.when(F.col("snapped"), F.col("vlat")).otherwise(F.col(lat)).alias(lat),
        "snapped",
    )


def connect(
    frompoints: DataFrame,
    topoints: DataFrame,
    key: str | None,
    greatcircle: bool = True,
    segments: int = 100,
    f_lon: str = "lon",
    f_lat: str = "lat",
    t_lon: str = "lon",
    t_lat: str = "lat",
) -> DataFrame:
    """Key-matched (or full cross) connection lines between two point
    layers — reference ``connect`` (``pythongis/vector/manager.py:660``):
    great-circle LineStrings segmentized on the sphere, or straight
    2-point lines."""
    a = frompoints.select(
        *(frompoints.columns),
    ).withColumnRenamed(f_lon, "_flon").withColumnRenamed(f_lat, "_flat")
    b = topoints.select(
        F.col(t_lon).alias("_tlon"), F.col(t_lat).alias("_tlat"),
        *( [F.col(key)] if key else [] ),
    )
    pairs = a.join(b, on=key) if key else a.crossJoin(b)

    @F.pandas_udf("binary")
    def mkline(flon: pd.Series, flat: pd.Series, tlon: pd.Series, tlat: pd.Series) -> pd.Series:
        out = []
        for x1, y1, x2, y2 in zip(flon, flat, tlon, tlat):
            if greatcircle:
                coords = geodesy.great_circle_path(x1, y1, x2, y2, segments)
            else:
                coords = np.array([[x1, y1], [x2, y2]])
            out.append(W.wkb_linestring(coords))
        return pd.Series(out, index=flon.index)

    return pairs.withColumn(
        "geom",
        mkline(F.col("_flon"), F.col("_flat"), F.col("_tlon"), F.col("_tlat")),
    )
