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
    from pythongis_spark.operators.knn import knn_join

    vert_pts = _target_vertex_table(targets, target_geom)
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


def _target_vertex_table(targets: DataFrame, target_geom: str) -> DataFrame:
    """Distinct (vlon, vlat, vid) vertex table of a layer.

    The frame is frozen with ``localCheckpoint`` before the
    ``monotonically_increasing_id`` vids leave this function: callers
    evaluate it in TWO independent plans (the kNN probe and the final
    vid→coordinate join), and distinct() output order is not stable
    across computations — unfrozen, the same vid could resolve to a
    different vertex in each plan (the r3 spark_partition_id bug class,
    CLAUDE.md)."""
    from pythongis_spark.geometry.udfs import st_dump_points

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

    return (
        verts.withColumn("_c", unpack(F.col("_vp")))
        .select(F.col("_c.vlon").alias("vlon"), F.col("_c.vlat").alias("vlat"))
        .distinct()
        .withColumn("vid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )


def snap_geoms(
    data: DataFrame,
    targets: DataFrame,
    tolerance: float,
    *,
    feature_id: str,
    geom: str = "geom",
    target_geom: str = "geom",
) -> DataFrame:
    """General vertex snap — EVERY vertex of any line/polygon/point
    geometry snaps to the nearest target-layer vertex within
    ``tolerance`` (reference ``snap``,
    ``pythongis/vector/manager.py:622-648``). The reference repeatedly
    applies shapely ``snap`` farthest-target-first so the nearest target
    "has the final say"; with immutable columns that end state — each
    vertex moved to its nearest in-tolerance target vertex — is computed
    directly (documented simplification: shapely's snap can also slide a
    vertex onto a target *segment* interior; vertex→vertex only here).

    Distributed plan: indexed vertex explode → kNN (k=1) against the
    distinct target vertex table → per-feature reassembly
    (applyInPandas), coordinates rewritten in place. Returns
    (feature_id, geom, n_snapped)."""
    from pythongis_spark.operators.knn import knn_join

    @F.pandas_udf("array<struct<ring:int,seq:int,x:double,y:double>>")
    def dumpv(blobs: pd.Series) -> pd.Series:
        out = []
        for b in blobs.to_numpy(object):
            if b is None:
                out.append(None)
                continue
            g = W.decode_wkb(bytes(b))
            rows = []
            for ri, arr in enumerate(_coord_arrays(g)):
                body = arr[:-1] if _ring_closed(arr) else arr
                for si, (x, y) in enumerate(body):
                    rows.append({"ring": ri, "seq": si,
                                 "x": float(x), "y": float(y)})
            out.append(rows)
        return pd.Series(out, index=blobs.index)

    vert_pts = _target_vertex_table(targets, target_geom)
    feats = data.select(F.col(feature_id).alias("_fid"), F.col(geom).alias("_g"))
    verts = (
        feats.withColumn("_v", F.explode(dumpv(F.col("_g"))))
        .select(
            "_fid",
            F.col("_v.ring").alias("_ring"), F.col("_v.seq").alias("_seq"),
            F.col("_v.x").alias("_x"), F.col("_v.y").alias("_y"),
            F.concat_ws("_", "_fid", "_v.ring", "_v.seq").alias("_vk"),
        )
    )
    nearest = knn_join(
        verts, vert_pts, 1, point_id="_vk", target_id="vid",
        lon="_x", lat="_y", t_lon="vlon", t_lat="vlat",
    ).join(vert_pts, "vid")
    moved = nearest.select(
        "_fid", "_ring", "_seq",
        F.when(F.col("dist") <= tolerance, F.col("vlon")).otherwise(F.col("_x")).alias("_nx"),
        F.when(F.col("dist") <= tolerance, F.col("vlat")).otherwise(F.col("_y")).alias("_ny"),
        (F.col("dist") <= tolerance).cast("int").alias("_snapped"),
    )

    def _rebuild(pdf: pd.DataFrame) -> pd.DataFrame:
        blob = pdf["_g"].iloc[0]
        g = _copy_geom(W.decode_wkb(bytes(blob)))  # decoded views are read-only
        arrays = _coord_arrays(g)
        closed = [_ring_closed(a) for a in arrays]  # before any mutation
        for _, r in pdf.iterrows():
            ri, si = int(r["_ring"]), int(r["_seq"])
            arr = arrays[ri]
            arr[si, 0] = r["_nx"]
            arr[si, 1] = r["_ny"]
            if si == 0 and closed[ri]:
                arr[-1] = arr[0]
        return pd.DataFrame(
            [{
                "_fid": pdf["_fid"].iloc[0],
                "geom": W.encode_wkb(g),
                "n_snapped": int(pdf["_snapped"].sum()),
            }]
        )

    fid_field = data.select(F.col(feature_id).alias("_fid")).schema.fields[0]
    joined = moved.join(feats, "_fid")
    out = joined.groupBy("_fid").applyInPandas(
        _rebuild, f"_fid {fid_field.dataType.simpleString()}, geom binary, n_snapped int"
    )
    return out.withColumnRenamed("_fid", feature_id)


def _coord_arrays(g) -> list[np.ndarray]:
    """Mutable views of every coordinate array of a geometry, in stable
    (part, ring) order."""
    t, payload = g
    if t in ("Point", "MultiPoint", "LineString"):
        return [payload]
    if t == "MultiLineString":
        return list(payload)
    if t == "Polygon":
        return list(payload)
    if t == "MultiPolygon":
        return [r for rings in payload for r in rings]
    raise ValueError(t)


def _copy_geom(g):
    """Deep-copy a geometry tuple (WKB-decoded arrays are read-only
    buffer views)."""
    t, payload = g
    if isinstance(payload, np.ndarray):
        return (t, payload.copy())
    if t == "MultiPolygon":
        return (t, [[a.copy() for a in rings] for rings in payload])
    return (t, [a.copy() for a in payload])


def _ring_closed(arr: np.ndarray) -> bool:
    return len(arr) > 1 and arr[0, 0] == arr[-1, 0] and arr[0, 1] == arr[-1, 1]


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
