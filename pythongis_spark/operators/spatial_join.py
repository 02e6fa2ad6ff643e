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


def _pair_predicate(condition: str):
    """Boolean predicate fn(ga, gb) for decoded geometry tuples —
    the full reference condition family (``vector/manager.py:196``:
    intersects/within/contains/covers/crosses/touches/equals via
    shapely; here via :mod:`geometry.core`)."""
    if condition == "intersects":
        return G.geoms_intersect
    if condition == "within":
        # shapely within: a ⊆ closure(b) AND interiors intersect
        return lambda ga, gb: G.geom_within_covers(ga, gb, require_interior=True)
    if condition == "contains":
        return lambda ga, gb: G.geom_within_covers(gb, ga, require_interior=True)
    if condition == "covers":
        # covers admits boundary-only containment (no interior demand)
        return lambda ga, gb: G.geom_within_covers(gb, ga, require_interior=False)
    if condition == "coveredby":
        return lambda ga, gb: G.geom_within_covers(ga, gb, require_interior=False)
    if condition == "crosses":
        return G.geom_crosses
    if condition == "touches":
        return G.geom_touches
    if condition == "equals":
        return _geom_equals
    raise ValueError(f"unsupported condition {condition!r}")


def _make_pair_refiner(condition: str):
    """General geometry-pair refine for WKB-vs-WKB candidates.

    Vectorization mirrors ``_refine_pip``: pairs are grouped by the
    (usually low-cardinality) right geometry so each distinct build
    geometry is decoded once per Arrow batch; a vectorized bbox
    pre-reject then culls most pairs before the per-pair exact test."""
    pred = _pair_predicate(condition)

    def refine(la: pd.Series, lb: pd.Series) -> pd.Series:
        out = np.zeros(len(la), dtype=bool)
        av = la.to_numpy(object)
        bv = lb.to_numpy(object)
        cache_a: dict[bytes, object] = {}
        groups: dict[bytes, list[int]] = {}
        for i, blob in enumerate(bv):
            if blob is not None and av[i] is not None:
                groups.setdefault(bytes(blob), []).append(i)
        for blob, idxs in groups.items():
            gb = W.decode_wkb(blob)
            for i in idxs:
                ab = bytes(av[i])
                ga = cache_a.get(ab)
                if ga is None:
                    ga = W.decode_wkb(ab)
                    cache_a[ab] = ga
                out[i] = pred(ga, gb)
        return pd.Series(out, index=la.index)

    return F.pandas_udf(refine, T.BooleanType())


def _make_pair_clipper(clip: str = "intersection"):
    """Per-pair geometry clip for matched candidates — the reference's
    ``clip=`` spatial-join modes (``vector/manager.py:208-266``):
    'intersection' (output coerced to the pair's lowest dimension),
    'union' (highest dimension), 'difference' (left type). Convex
    intersection windows take the Sutherland–Hodgman fast path; every
    other case routes to the general boolean engine
    (``geometry/boolean.clip_pair``). Returns NULL for empty results —
    and, mirroring the reference's shapely TopologicalError→null
    fallback (``manager.py:250-253``), a pair whose boolean op fails on
    degenerate geometry warns and yields NULL rather than failing the
    job."""
    if clip not in ("intersection", "union", "difference"):
        raise NotImplementedError(
            "clip must be 'intersection', 'union' or 'difference'"
        )
    import warnings

    from pythongis_spark.geometry import boolean as BO

    def clipper(la: pd.Series, lb: pd.Series) -> pd.Series:
        out: list[bytes | None] = []
        cache_b: dict[bytes, object] = {}
        for ab, bb in zip(la.to_numpy(object), lb.to_numpy(object)):
            if ab is None or bb is None:
                out.append(None)
                continue
            key = bytes(bb)
            gb = cache_b.get(key)
            if gb is None:
                gb = W.decode_wkb(key)
                cache_b[key] = gb
            ga = W.decode_wkb(bytes(ab))
            try:
                if clip == "intersection":
                    try:
                        res = G.geom_intersection_convex(ga, gb)
                    except NotImplementedError:
                        res = BO.clip_pair(ga, gb, "intersection")
                else:
                    res = BO.clip_pair(ga, gb, clip)
            except (ValueError, ArithmeticError) as exc:
                # the reference's TopologicalError→null fallback
                # (manager.py:250-253) — scoped to the degeneracy errors
                # the arrangement engine raises on invalid geometry, so
                # genuine engine bugs (IndexError/TypeError/...) still
                # fail the job instead of shipping silent NULLs
                warnings.warn(f"clip {clip} failed ({exc}); null-geometry")
                res = None
            out.append(None if res is None else W.encode_wkb(res))
        return pd.Series(out, index=la.index)

    return F.pandas_udf(clipper, T.BinaryType())


def _geom_equals(ga, gb) -> bool:
    """Topological equality (shapely ``equals``, reference
    ``manager.py:196``): identical coordinate arrays fast-path, else
    mutual covers — so the same polygon ringed from a different start
    vertex (or MultiPolygon parts in another order) still matches."""
    ca, cb = W.all_coords(ga), W.all_coords(gb)
    if ca.shape == cb.shape and bool((ca == cb).all()) and ga[0] == gb[0]:
        return True
    return (G.geom_within_covers(ga, gb, require_interior=False)
            and G.geom_within_covers(gb, ga, require_interior=False))


# ------------------------------------------------------------------
# planning helpers
# ------------------------------------------------------------------

_PLAN_STATS: dict[tuple, object] = {}


def _sem_key(df: DataFrame):
    """Stable per-plan cache key (None disables caching for plans that
    can't be hashed)."""
    try:
        return df.semanticHash()
    except Exception:
        return None


def _plan_stat(key: tuple, fn, df: DataFrame = None):
    """Session-lifetime memo for plan-time sizing jobs (giant-feature
    emptiness probes, build-side cell counts). Repeated joins against
    the same dimension table — the common pattern the reference serves
    with its cached r-tree — then plan with ZERO pre-jobs. Stats can go
    stale if the underlying files change mid-session; call
    ``clear_plan_stats()`` then (same contract as catalog statistics).

    ``semanticHash`` is 32-bit, so hits are CONFIRMED with
    ``sameSemantics`` against the stored source frame (a collision or a
    stale frame from a stopped session falls through to a recompute
    instead of silently serving another plan's answer)."""
    if key[1] is None:
        return fn()
    hit = _PLAN_STATS.get(key)
    if hit is not None:
        src, val = hit
        if df is None or _same_plan(df, src):
            return val
    if len(_PLAN_STATS) > 256:
        _PLAN_STATS.clear()
    val = fn()
    _PLAN_STATS[key] = (df, val)
    return val


def _same_plan(a: DataFrame, b: DataFrame) -> bool:
    try:
        return a.sameSemantics(b)
    except Exception:
        return False


import collections
import threading

# Keyed LRU of PERSISTED broadcast build sides (the cell-exploded
# dimension table): the explode + bbox pandas-UDF chain re-ran on every
# query against the same dimension (~0.4 s/call measured at bench
# scale). Broadcast-path only — a shuffled build side may be large.
# Same staleness contract as _PLAN_STATS (files changed mid-session →
# clear_plan_stats()).
_BUILD_CACHE: "collections.OrderedDict[tuple, DataFrame]" = collections.OrderedDict()
_BUILD_CACHE_MAX = 8
_BUILD_LOCK = threading.Lock()


def _cached_build(key: tuple, make, src: DataFrame = None):
    if key[1] is None:  # unhashable plan: no caching
        return make()
    with _BUILD_LOCK:
        hit = _BUILD_CACHE.get(key)
        if hit is not None:
            cached_src, df = hit
            # confirm the 32-bit hash hit (collision / stale session →
            # recompute rather than serve another plan's build side)
            if src is None or _same_plan(src, cached_src):
                _BUILD_CACHE.move_to_end(key)
                return df
    df = make().persist()
    with _BUILD_LOCK:
        displaced = _BUILD_CACHE.get(key)
        if displaced is not None:
            # a sameSemantics-rejected hit is being replaced at the same
            # key: unpersist the evicted frame or its executor storage
            # leaks until session end (ADVICE r5)
            try:
                displaced[1].unpersist(blocking=False)
            except Exception:
                pass
        _BUILD_CACHE[key] = (src, df)
        while len(_BUILD_CACHE) > _BUILD_CACHE_MAX:
            _, (_, old) = _BUILD_CACHE.popitem(last=False)
            try:
                old.unpersist(blocking=False)
            except Exception:
                pass
    return df


def clear_plan_stats() -> None:
    _PLAN_STATS.clear()
    with _BUILD_LOCK:
        for _, df in _BUILD_CACHE.values():
            # entries are (src, df) tuples — unpersist the FRAME (the old
            # loop called .unpersist on the tuple, which raised into the
            # except and silently leaked every cached build side)
            try:
                df.unpersist(blocking=False)
            except Exception:
                pass
        _BUILD_CACHE.clear()


def _plan_size_bytes(df: DataFrame) -> int:
    """Optimizer size estimate of a frame (driver-side, no job). Unknown
    → +inf-ish so the caller treats it as big (the safe direction at
    scale: a wrongly-skipped repartition costs a single-task stage, a
    wrongly-added one costs a bounded exchange)."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return 1 << 62


def _repart_min_bytes(spark) -> int:
    """Byte floor enabling the parallelism-guard repartition, conf
    `pythongis.repartition.minBytes`. Default −1 = guard fully OFF
    (not even plan introspection, which itself costs 150-300 ms of
    driver time per call on the probe plans — measured). Deployments
    whose inputs can produce large single-split scans set a floor
    (e.g. 64 MiB): scans estimated above it with fewer partitions than
    defaultParallelism get hash-repartitioned before the broadcast
    join."""
    try:
        return int(spark.conf.get("pythongis.repartition.minBytes", "-1"))
    except Exception:
        return -1


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
    rect_fast_path: bool = True,
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
    bbox_cols = ["bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax"]
    # giant-polygon split: features covering > cell_cap cells go to a
    # broadcast nested-loop bbox path instead of the cell explode (one
    # continental polygon would otherwise expand to up to 4^z rows in a
    # single UDF call — OOM + skew)
    cnt = _bbox_cell_count_expr(z)
    polys_g = polygons.filter(cnt > DEFAULT_CELL_CAP)
    # gate the nested-loop leg on actual giants: the check is one tiny
    # job on the polygon DIM side; without it the NL leg re-scans the
    # probe table even when no giant exists (measurable regression).
    # Memoized per semantic plan like spatial_join's sizing jobs —
    # repeated joins against the same dimension table (the common
    # pattern) re-plan with zero pre-jobs (~0.4 s/call measured).
    has_giants = _plan_stat(
        ("giants", _sem_key(polygons), z, DEFAULT_CELL_CAP),
        lambda: polys_g.limit(1).count() > 0, polygons,
    )
    polys_n = polygons.filter(cnt <= DEFAULT_CELL_CAP) if has_giants else polygons

    # build side: polygons exploded to covering cells
    def _make_build():
        return _prefix(IU.explode_bbox_cells(polys_n, z), "r_", exclude=["cell"])

    build = _make_build()
    # probe side: single cell per point (pure Catalyst)
    # null coordinates never match (reference skips null geometry,
    # manager.py:393-398); keepall re-adds them via the outer join below
    probe = points.filter(F.col(lon).isNotNull() & F.col(lat).isNotNull())
    probe = probe.withColumn("cell", IU.point_cell_expr(F.col(lon), F.col(lat), z))

    # planning statistic: an explicit hint avoids an extra job when the
    # caller knows the build side (dimension tables, repeated joins);
    # without a hint the sizing count is memoized per semantic plan
    if build_rows is not None:
        build_count = build_rows
    else:
        build_count = _plan_stat(
            ("cells", _sem_key(polys_n), z, DEFAULT_CELL_CAP), build.count,
            polys_n,
        )
    if build_count <= broadcast_rows:
        build = _cached_build(("build", _sem_key(polys_n), z), _make_build, polys_n)
        # r6 scale-adaptive parallelism guard (guide §2.2): a broadcast
        # join keeps the probe's own partitioning, so a probe scanned
        # from fewer splits than the cluster has cores (single-row-group
        # parquet) runs the join + downstream partial aggs on those few
        # tasks. Opt-in via conf `pythongis.repartition.minBytes` ≥ 0:
        # hash-repartition the probe when (a) its scan has fewer
        # partitions than defaultParallelism and (b) the optimizer size
        # estimate clears the floor. A/B measurements shaped this twice:
        # with a materializing sink the repartition wins big (6.0→2.3 s
        # at sf1.0, noop sink), but with count-style sinks the exchange
        # is a net LOSS at ≤15 MB scans (1.10→1.64 s) — AND the guard's
        # own plan introspection (optimizedPlan stats / .rdd) costs
        # 150-300 ms of driver time per call on this host, so the
        # DEFAULT is fully off (no introspection at all) and deployments
        # with pathological big single-split scans opt in with a byte
        # floor. The checks run against the cheap pre-cell `points`
        # frame (same partitioning as the probe; the quadkey cell
        # expression makes the probe's own tree ~2× dearer to analyze).
        spark_s = points.sparkSession
        min_bytes = _repart_min_bytes(spark_s)
        par = spark_s.sparkContext.defaultParallelism
        if (
            min_bytes >= 0
            and not probe.isStreaming  # .rdd is illegal on streaming frames
            and _plan_size_bytes(points) >= min_bytes
            and points.rdd.getNumPartitions() < par
        ):
            probe = probe.repartition(par, F.col(pid))
        cand = probe.join(F.broadcast(build), "cell", "inner")
    else:
        probe_s, build_s, keys = _salt_plan(
            probe, build, F.col(pid), salt_threshold, max_salt
        )
        cand = probe_s.join(build_s, keys, "inner").drop("salt")
    cand = cand.drop("cell")
    pt_in_bbox = (
        (F.col(lon) >= F.col("r_bbox_xmin"))
        & (F.col(lon) <= F.col("r_bbox_xmax"))
        & (F.col(lat) >= F.col("r_bbox_ymin"))
        & (F.col(lat) <= F.col("r_bbox_ymax"))
    )
    if has_giants:
        nl = probe.drop("cell").join(
            F.broadcast(_prefix(polys_g, "r_")), pt_in_bbox, "inner"
        )
        cand = cand.unionByName(nl)

    if subkey is not None:
        lcol, rcol = subkey
        cand = cand.filter(F.col(lcol) == F.col("r_" + rcol))

    # rectangle fast path: when EVERY build polygon is exactly its own
    # bbox (gridded zone/tile dimensions — detected once per semantic
    # plan), the ray-cast parity reduces to the HALF-OPEN box test
    # x0 <= px < x1 AND y0 <= py < y1 (horizontal edges never cross a
    # horizontal ray; left/right edges give odd parity exactly in that
    # range), so a pure-codegen predicate replaces the Arrow refine —
    # bit-identical results, no Python in the plan.
    from pythongis_spark.geometry.udfs import st_is_bbox_rect

    all_rect = rect_fast_path and _plan_stat(
        ("allrect", _sem_key(polygons), 0, 0),
        lambda: polygons.filter(
            ~st_is_bbox_rect(F.col(polygon_geom))
        ).limit(1).count() == 0,
        polygons,
    )
    if all_rect:
        matched = cand.filter(
            (F.col(lon) >= F.col("r_bbox_xmin"))
            & (F.col(lon) < F.col("r_bbox_xmax"))
            & (F.col(lat) >= F.col("r_bbox_ymin"))
            & (F.col(lat) < F.col("r_bbox_ymax"))
        )
    else:
        # codegen point-in-bbox prefilter: a point in a covering cell can
        # still fall outside the polygon bbox — cull it before Python
        matched = cand.filter(pt_in_bbox).filter(
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


def _bbox_cell_count_expr(z: int, prefix: str = "") -> Column:
    """Number of level-z cells a bbox covers, as a pure Catalyst
    expression — the planning statistic behind the giant-feature split
    (one continental geometry would otherwise explode to up to 4^z rows
    inside a single UDF call: executor OOM + pathological skew)."""
    n = 1 << z
    tx0 = F.greatest(F.lit(0), F.floor((F.col(prefix + "bbox_xmin") + 180.0) / 360.0 * n))
    tx1 = F.least(F.lit(n - 1), F.floor((F.col(prefix + "bbox_xmax") + 180.0) / 360.0 * n))
    ty0 = F.greatest(F.lit(0), F.floor((90.0 - F.col(prefix + "bbox_ymax")) / 180.0 * n))
    ty1 = F.least(F.lit(n - 1), F.floor((90.0 - F.col(prefix + "bbox_ymin")) / 180.0 * n))
    return (tx1 - tx0 + 1) * (ty1 - ty0 + 1)


def _bbox_overlap_cond(lp: str = "l_", rp: str = "r_") -> Column:
    """Codegen bbox-intersects condition — culls candidate pairs JVM-side
    before any Python refine."""
    return (
        (F.col(lp + "bbox_xmin") <= F.col(rp + "bbox_xmax"))
        & (F.col(rp + "bbox_xmin") <= F.col(lp + "bbox_xmax"))
        & (F.col(lp + "bbox_ymin") <= F.col(rp + "bbox_ymax"))
        & (F.col(rp + "bbox_ymin") <= F.col(lp + "bbox_ymax"))
    )


DEFAULT_CELL_CAP = 4096  # max covering cells per feature before the NL path


def spatial_join(
    left: DataFrame,
    right: DataFrame,
    condition: str = "intersects",
    *,
    left_geom: str = "geom",
    right_geom: str = "geom",
    left_id: str | None = None,
    keepall: bool = False,
    clip: str | None = None,
    z: int | None = None,
    broadcast_rows: int = DEFAULT_BROADCAST_ROWS,
    salt_threshold: int = DEFAULT_SALT_THRESHOLD,
    max_salt: int = DEFAULT_MAX_SALT,
    build_rows: int | None = None,
    cell_cap: int = DEFAULT_CELL_CAP,
    rect_fast_path: bool = True,
) -> DataFrame:
    """General WKB-vs-WKB spatial join (predicate family of
    ``pythongis/vector/manager.py:196,381-431``): intersects, within,
    contains, covers, coveredby, crosses, touches, equals.

    Physical plan (same skeleton as ``point_in_polygon_join``):

    * both sides explode to covering cells; duplicate candidate pairs
      are eliminated shuffle-free by the reference-point rule (a pair
      is emitted only in the cell containing the SW corner of the bbox
      intersection);
    * right side broadcast when small (``build_rows`` hint skips the
      sizing job), else shuffled with explicit hot-cell salting;
    * features covering > ``cell_cap`` cells are split off to a
      broadcast nested-loop bbox join (they are few by definition, and
      exploding them would OOM one task);
    * a codegen bbox-overlap filter culls pairs before the Arrow refine
      (decode-once per distinct right geometry).

    ``clip='intersection'|'union'|'difference'`` adds a ``clip_geom``
    WKB column with the pairwise set-op result, dimension-coerced per
    the reference (``manager.py:208-266``: intersection→lowest dim,
    union→highest, difference→left type; failed ops → NULL geometry).
    """
    from pythongis_spark.geometry.udfs import with_bbox

    if "bbox_xmin" not in left.columns:
        left = with_bbox(left, left_geom)
    if "bbox_xmin" not in right.columns:
        right = with_bbox(right, right_geom)
    if z is None:
        z = min(IU.pick_level(left), IU.pick_level(right))

    lid = left_id or left.columns[0]
    bbox_cols = ("bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax")

    # giant-feature split (either side): cells-covered is pure Catalyst.
    # Each emptiness check is one bbox-columns-only pruned scan of that
    # side; when a side has no giants its nested-loop leg (and the extra
    # full-table scan it would imply) is skipped entirely.
    lcnt = _bbox_cell_count_expr(z)
    rcnt = _bbox_cell_count_expr(z)
    left_g = left.filter(lcnt > cell_cap)
    right_g = right.filter(rcnt > cell_cap)
    has_lg = _plan_stat(
        ("giants", _sem_key(left), z, cell_cap),
        lambda: left_g.select("bbox_xmin").limit(1).count() > 0, left,
    )
    has_rg = _plan_stat(
        ("giants", _sem_key(right), z, cell_cap),
        lambda: right_g.select("bbox_xmin").limit(1).count() > 0, right,
    )
    left_n = left.filter(lcnt <= cell_cap) if has_lg else left
    right_n = right.filter(rcnt <= cell_cap) if has_rg else right

    lxall = _prefix(left, "l_")
    lx = IU.explode_bbox_cells(left_n, z)
    lx = _prefix(lx, "l_", exclude=["cell"])

    def _make_rx():
        return _prefix(IU.explode_bbox_cells(right_n, z), "r_", exclude=["cell"])

    rx = _make_rx()
    if build_rows is not None:
        build_count = build_rows
    else:
        build_count = _plan_stat(
            ("cells", _sem_key(right), z, cell_cap), rx.count, right,
        )
    if build_count <= broadcast_rows:
        rx = _cached_build(("build", _sem_key(right_n), z), _make_rx, right_n)
        cand = lx.join(F.broadcast(rx), "cell", "inner")
    else:
        probe_s, build_s, keys = _salt_plan(
            lx, rx, F.col("l_" + lid), salt_threshold, max_salt
        )
        cand = probe_s.join(build_s, keys, "inner").drop("salt")

    # reference-point dedup: emit only in the cell of the SW corner of the
    # bbox intersection (guaranteed to be a shared covering cell)
    ref_x = F.greatest("l_bbox_xmin", "r_bbox_xmin")
    ref_y = F.greatest("l_bbox_ymin", "r_bbox_ymin")
    cand = cand.filter(F.col("cell") == IU.point_cell_expr(ref_x, ref_y, z)).drop("cell")

    # nested-loop paths for giant features (broadcast the small giant set;
    # Spark plans the bbox theta-join as BroadcastNestedLoopJoin)
    if has_rg:
        nl = lxall.join(
            F.broadcast(_prefix(right_g, "r_")), _bbox_overlap_cond(), "inner"
        )
        cand = cand.unionByName(nl)
    if has_lg:
        # giant-left × normal-right (giant×giant pairs are in `nl` when
        # both exist); the giant side is the broadcast side in both legs
        nl2 = F.broadcast(_prefix(left_g, "l_")).join(
            _prefix(right_n, "r_"), _bbox_overlap_cond(), "inner"
        )
        cand = cand.unionByName(nl2)

    # codegen bbox prefilter before any Python
    cand = cand.filter(_bbox_overlap_cond())

    # rectangle fast path: over two all-rectangle sides the closed bbox
    # relations ARE the exact predicates — overlap for 'intersects'
    # (axis-aligned rects intersect iff their boxes do, edge- and
    # corner-touch included) and containment for within/coveredby/
    # contains/covers (a proper rect's 2D interior forces the interior
    # demand automatically) — parity with the geometric predicates
    # verified per case in test_spatial_join, so the Arrow pair refine
    # is skipped and the plan stays whole-stage codegen.
    from pythongis_spark.geometry.udfs import st_is_bbox_rect

    def _all_rect(df, geom_col):
        return _plan_stat(
            ("allrect", _sem_key(df), 0, 0),
            lambda: df.filter(
                ~st_is_bbox_rect(F.col(geom_col))
            ).limit(1).count() == 0,
            df,
        )

    def _bbox_contained(inner: str, outer: str) -> Column:
        return (
            (F.col(inner + "bbox_xmin") >= F.col(outer + "bbox_xmin"))
            & (F.col(inner + "bbox_xmax") <= F.col(outer + "bbox_xmax"))
            & (F.col(inner + "bbox_ymin") >= F.col(outer + "bbox_ymin"))
            & (F.col(inner + "bbox_ymax") <= F.col(outer + "bbox_ymax"))
        )

    _RECT_EXACT = (
        "intersects", "within", "coveredby", "contains", "covers", "touches",
        "crosses",
    )
    if (
        rect_fast_path
        and condition in _RECT_EXACT
        and _all_rect(left, left_geom)
        and _all_rect(right, right_geom)
    ):
        if condition == "intersects":
            matched = cand  # bbox prefilter above is already exact
        elif condition in ("within", "coveredby"):
            matched = cand.filter(_bbox_contained("l_", "r_"))
        elif condition == "touches":
            # boundaries meet, interiors don't: closed overlap (already
            # enforced by the prefilter) minus OPEN overlap
            matched = cand.filter(
                ~(
                    (F.col("l_bbox_xmin") < F.col("r_bbox_xmax"))
                    & (F.col("r_bbox_xmin") < F.col("l_bbox_xmax"))
                    & (F.col("l_bbox_ymin") < F.col("r_bbox_ymax"))
                    & (F.col("r_bbox_ymin") < F.col("l_bbox_ymax"))
                )
            )
        elif condition == "crosses":
            # area x area never crosses (shapely: dim(intersection) must
            # be lower than both operands') — statically empty
            matched = cand.filter(F.lit(False))
        else:  # contains / covers
            matched = cand.filter(_bbox_contained("r_", "l_"))
    else:
        refiner = _make_pair_refiner(condition)
        matched = cand.filter(
            refiner(F.col("l_" + left_geom), F.col("r_" + right_geom))
        )

    if clip is not None:
        clipper = _make_pair_clipper(clip)
        matched = matched.withColumn(
            "clip_geom", clipper(F.col("l_" + left_geom), F.col("r_" + right_geom))
        )

    internal = [p + c for p in ("l_", "r_") for c in bbox_cols]
    out = matched.drop(*[c for c in internal if c in matched.columns])
    out = out.drop("r_" + right_geom)
    for c in out.columns:
        if c.startswith("l_"):
            out = out.withColumnRenamed(c, c[2:])
    for c in out.columns:
        if c.startswith("r_"):
            bare = c[2:]
            if bare not in left.columns and bare != "clip_geom":
                out = out.withColumnRenamed(c, bare)
            else:
                out = out.drop(c)
    if keepall:
        right_cols = [c for c in out.columns if c not in left.columns]
        base = left.drop(*[c for c in bbox_cols if c in left.columns])
        return base.join(out.select([lid] + right_cols), lid, "left")
    return out


def spatial_semi_join(points: DataFrame, polygons: DataFrame, **kw) -> DataFrame:
    """Keep points matching ≥1 polygon (``pythongis/vector/manager.py:81``)."""
    return point_in_polygon_join(points, polygons, how="semi", **kw)


def spatial_anti_join(points: DataFrame, polygons: DataFrame, **kw) -> DataFrame:
    """Keep points disjoint from all polygons (``manager.py:138-155``)."""
    return point_in_polygon_join(points, polygons, how="anti", **kw)
