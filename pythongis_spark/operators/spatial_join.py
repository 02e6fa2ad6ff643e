"""The flagship operator: distributed spatial join.

Reference semantics: ``pythongis/vector/manager.py:160-486`` — an
index-nested-loop join (per left feature, r-tree bbox probe → exact
shapely predicate). Our physical plan is Spark-native:

    1. index     build side (polygons) exploded to covering quadkey cells
                 (pandas UDF); probe side (points) gets its single cell via
                 a pure-Catalyst Morton expression (stays in codegen).
    2. candidates equi-join on cell — broadcast when the build side is
                 small, else shuffled hash join with *explicit hot-cell
                 salting* (north rule: skew handled explicitly, not left to
                 chance; AQE skew-join remains on as a backstop).
    3. refine    exact predicate in an Arrow-vectorized pandas UDF
                 (decode each distinct polygon once per batch — the
                 Spark analog of the reference's prepared-geometry cache,
                 ``pythongis/vector/geometry.py:30-35``).
    4. keepall   left-outer null-pad (``manager.py:425-429``).

At 100 TB the probe side never shuffles more than once (on cell), the
build side is a dimension table exploded ~4x, and refinement runs
data-parallel over Arrow batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pythongis_spark.geometry import core as G
from pythongis_spark.geometry import wkb as W
from pythongis_spark.index import udfs as IU

DEFAULT_BROADCAST_ROWS = 1_000_000  # exploded build rows still broadcastable
DEFAULT_SALT_THRESHOLD = 100_000  # probe rows per cell before salting
DEFAULT_MAX_SALT = 32


# ------------------------------------------------------------------
# refine UDFs
# ------------------------------------------------------------------

@F.pandas_udf(T.BooleanType())
def _refine_pip(lon: pd.Series, lat: pd.Series, geom: pd.Series) -> pd.Series:
    """Exact point-in-polygon for candidate pairs; vectorized per distinct
    polygon within the Arrow batch."""
    out = np.zeros(len(lon), dtype=bool)
    lon_v = lon.to_numpy(np.float64)
    lat_v = lat.to_numpy(np.float64)
    groups: dict[bytes, list[int]] = {}
    for i, blob in enumerate(geom.to_numpy(object)):
        if blob is not None:
            groups.setdefault(bytes(blob), []).append(i)
    for blob, idxs in groups.items():
        g = W.decode_wkb(blob)
        ix = np.asarray(idxs)
        out[ix] = G.points_in_polygon(lon_v[ix], lat_v[ix], g)
    return pd.Series(out, index=lon.index)


def _make_pair_refiner(condition: str):
    """General geometry-pair refine for WKB-vs-WKB candidates."""

    def refine(la: pd.Series, lb: pd.Series) -> pd.Series:
        cache: dict[bytes, object] = {}

        def dec(blob):
            b = bytes(blob)
            g = cache.get(b)
            if g is None:
                g = W.decode_wkb(b)
                cache[b] = g
            return g

        out = np.zeros(len(la), dtype=bool)
        av = la.to_numpy(object)
        bv = lb.to_numpy(object)
        for i in range(len(av)):
            if av[i] is None or bv[i] is None:
                continue
            ga, gb = dec(av[i]), dec(bv[i])
            if condition == "intersects":
                out[i] = G.geoms_intersect(ga, gb)
            elif condition == "within":
                out[i] = G.geom_within(ga, gb)
            elif condition == "contains":
                out[i] = G.geom_within(gb, ga)
            elif condition == "covers":
                # covers = contains incl. shared boundary; our parity-based
                # containment already admits boundary-on-interior-side cases
                out[i] = G.geom_within(gb, ga)
            elif condition == "equals":
                out[i] = _geom_equals(ga, gb)
            else:
                raise ValueError(f"unsupported condition {condition!r}")
        return pd.Series(out, index=la.index)

    return F.pandas_udf(refine, T.BooleanType())


def _geom_equals(ga, gb) -> bool:
    ca, cb = W.all_coords(ga), W.all_coords(gb)
    return ca.shape == cb.shape and bool((ca == cb).all()) and ga[0] == gb[0]


# ------------------------------------------------------------------
# planning helpers
# ------------------------------------------------------------------

def _prefix(df: DataFrame, prefix: str, exclude=()) -> DataFrame:
    for c in df.columns:
        if c not in exclude:
            df = df.withColumnRenamed(c, prefix + c)
    return df


def _salt_plan(probe: DataFrame, build_cells: DataFrame, probe_key: Column,
               salt_threshold: int, max_salt: int):
    """Explicit hot-cell salting: histogram probe cells, replicate build
    rows of hot cells × S, scatter probe rows deterministically.

    Returns (salted_probe, salted_build, join_cols). Deterministic: salt =
    pmod(xxhash64(probe key), S) — identical output set at any parallelism.
    """
    hot = (
        probe.groupBy("cell")
        .count()
        .filter(F.col("count") > salt_threshold)
        .select(
            "cell",
            F.least(
                F.lit(max_salt),
                F.ceil(F.col("count") / salt_threshold).cast("int"),
            ).alias("nsalt"),
        )
    )
    probe_s = (
        probe.join(F.broadcast(hot), "cell", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("nsalt").isNull(), F.lit(0)
            ).otherwise(F.pmod(F.xxhash64(probe_key), F.col("nsalt")).cast("int")),
        )
        .drop("nsalt")
    )
    build_s = (
        build_cells.join(F.broadcast(hot), "cell", "left")
        .withColumn(
            "salt",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("nsalt"), F.lit(1)) - 1)
            ),
        )
        .drop("nsalt")
    )
    return probe_s, build_s, ["cell", "salt"]


# ------------------------------------------------------------------
# operators
# ------------------------------------------------------------------

def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    *,
    lon: str = "lon",
    lat: str = "lat",
    polygon_geom: str = "geom",
    point_id: str | None = None,
    keepall: bool = False,
    subkey: tuple[str, str] | None = None,
    z: int | None = None,
    broadcast_rows: int = DEFAULT_BROADCAST_ROWS,
    salt_threshold: int = DEFAULT_SALT_THRESHOLD,
    max_salt: int = DEFAULT_MAX_SALT,
    how: str = "join",
    build_rows: int | None = None,
) -> DataFrame:
    """Tag each point with every polygon containing it — the reference's
    intersects/within spatial join for the point-left case
    (``pythongis/vector/manager.py:381-431``).

    Output columns: all point columns + polygon columns (duplicate names
    dropped from the polygon side, mirroring ``vector/data.py:1040-1043``).
    ``how``: 'join' (pairs), 'semi' (points with ≥1 match), 'anti'
    (points with none — the reference's disjoint where,
    ``manager.py:138-155``).
    """
    if "bbox_xmin" not in polygons.columns:
        from pythongis_spark.geometry.udfs import with_bbox

        polygons = with_bbox(polygons, polygon_geom)
    if z is None:
        z = IU.pick_level(polygons)

    pid = point_id or points.columns[0]
    # build side: polygons exploded to covering cells
    bbox_cols = ["bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax"]
    build = IU.explode_bbox_cells(polygons, z)
    build = _prefix(build, "r_", exclude=["cell"])
    # probe side: single cell per point (pure Catalyst)
    # null coordinates never match (reference skips null geometry,
    # manager.py:393-398); keepall re-adds them via the outer join below
    probe = points.filter(F.col(lon).isNotNull() & F.col(lat).isNotNull())
    probe = probe.withColumn("cell", IU.point_cell_expr(F.col(lon), F.col(lat), z))

    # planning statistic: an explicit hint avoids an extra job when the
    # caller knows the build side (dimension tables, repeated joins)
    build_count = build_rows if build_rows is not None else build.count()
    if build_count <= broadcast_rows:
        cand = probe.join(F.broadcast(build), "cell", "inner")
    else:
        probe_s, build_s, keys = _salt_plan(
            probe, build, F.col(pid), salt_threshold, max_salt
        )
        cand = probe_s.join(build_s, keys, "inner").drop("salt")

    if subkey is not None:
        lcol, rcol = subkey
        cand = cand.filter(F.col(lcol) == F.col("r_" + rcol))

    matched = cand.filter(
        _refine_pip(F.col(lon), F.col(lat), F.col("r_" + polygon_geom))
    )

    if how == "semi":
        return points.join(
            matched.select(F.col(pid)).distinct(), pid, "left_semi"
        )
    if how == "anti":
        return points.join(
            matched.select(F.col(pid)).distinct(), pid, "left_anti"
        )

    # assemble output: drop internal columns; dedupe column names
    drop_cols = ["cell"] + ["r_" + polygon_geom] + [f"r_{c}" for c in bbox_cols]
    out = matched.drop(*[c for c in drop_cols if c in matched.columns])
    # strip r_ prefix unless it collides with a point column
    for c in out.columns:
        if c.startswith("r_"):
            bare = c[2:]
            if bare not in points.columns:
                out = out.withColumnRenamed(c, bare)
            else:
                out = out.drop(c)  # duplicate right fields dropped (data.py:1040)
    if keepall:
        # left-outer null-pad: points with no match (manager.py:425-429)
        right_cols = [c for c in out.columns if c not in points.columns]
        return points.join(
            out.select([pid] + right_cols), pid, "left"
        )
    return out


def spatial_join(
    left: DataFrame,
    right: DataFrame,
    condition: str = "intersects",
    *,
    left_geom: str = "geom",
    right_geom: str = "geom",
    left_id: str | None = None,
    keepall: bool = False,
    z: int | None = None,
    broadcast_rows: int = DEFAULT_BROADCAST_ROWS,
) -> DataFrame:
    """General WKB-vs-WKB spatial join (predicate family of
    ``pythongis/vector/manager.py:381-431``).

    Both sides explode to covering cells; duplicate candidate pairs are
    eliminated shuffle-free by the reference-point rule (a pair is emitted
    only in the cell containing the SW corner of the bbox intersection) —
    no ``distinct`` pass needed.
    """
    from pythongis_spark.geometry.udfs import with_bbox

    if "bbox_xmin" not in left.columns:
        left = with_bbox(left, left_geom)
    if "bbox_xmin" not in right.columns:
        right = with_bbox(right, right_geom)
    if z is None:
        z = min(IU.pick_level(left), IU.pick_level(right))

    lid = left_id or left.columns[0]
    lx = IU.explode_bbox_cells(left, z)
    lx = _prefix(lx, "l_", exclude=["cell"])
    rx = IU.explode_bbox_cells(right, z)
    rx = _prefix(rx, "r_", exclude=["cell"])

    if rx.count() <= broadcast_rows:
        cand = lx.join(F.broadcast(rx), "cell", "inner")
    else:
        cand = lx.join(rx, "cell", "inner")

    # reference-point dedup: emit only in the cell of the SW corner of the
    # bbox intersection (guaranteed to be a shared covering cell)
    ref_x = F.greatest("l_bbox_xmin", "r_bbox_xmin")
    ref_y = F.greatest("l_bbox_ymin", "r_bbox_ymin")
    cand = cand.filter(F.col("cell") == IU.point_cell_expr(ref_x, ref_y, z))

    refiner = _make_pair_refiner(condition)
    matched = cand.filter(refiner(F.col("l_" + left_geom), F.col("r_" + right_geom)))

    internal = ["cell"] + [
        p + c
        for p in ("l_", "r_")
        for c in ("bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax")
    ]
    out = matched.drop(*[c for c in internal if c in matched.columns])
    out = out.drop("r_" + right_geom)
    for c in out.columns:
        if c.startswith("l_"):
            out = out.withColumnRenamed(c, c[2:])
    for c in out.columns:
        if c.startswith("r_"):
            bare = c[2:]
            if bare not in left.columns:
                out = out.withColumnRenamed(c, bare)
            else:
                out = out.drop(c)
    if keepall:
        right_cols = [c for c in out.columns if c not in left.columns]
        base = left.drop(*[c for c in ("bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax") if c in left.columns])
        return base.join(out.select([lid] + right_cols), lid, "left")
    return out


def spatial_semi_join(points: DataFrame, polygons: DataFrame, **kw) -> DataFrame:
    """Keep points matching ≥1 polygon (``pythongis/vector/manager.py:81``)."""
    return point_in_polygon_join(points, polygons, how="semi", **kw)


def spatial_anti_join(points: DataFrame, polygons: DataFrame, **kw) -> DataFrame:
    """Keep points disjoint from all polygons (``manager.py:138-155``)."""
    return point_in_polygon_join(points, polygons, how="anti", **kw)
