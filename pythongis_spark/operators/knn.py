"""Distance joins and k-nearest-neighbour joins.

Reference semantics: ``pythongis/vector/manager.py:268-379`` — per left
feature, bbox-overlap matches first, then remaining candidates sorted by
distance; ``radius`` → within-distance join, ``n`` → k nearest. The
reference sort is unstable on ties; we document the divergence and break
ties deterministically by ``(dist, right_id)`` (SURVEY.md §7 build plan
item 5).

Physical plan (scales to 10^12 probe rows):

1. targets are cell-indexed at a level chosen from their count, then
   exploded to the neighbor cells within a Chebyshev ring R (build-side
   explosion ~ (2R+1)^2, bounded);
2. probe points keep their single pure-Catalyst cell → equi-join;
3. ``row_number() over (partition by left id order by dist, right_id) <= k``;
4. correctness guard: a row's k-th distance must not exceed the distance
   to the ring boundary (otherwise a nearer target could sit outside the
   ring). Rows failing the guard — and rows with < k matches — fall back
   to an exact broadcast cross-join, which only ever sees a tiny remnant.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pythongis_spark.index import udfs as IU
from pythongis_spark.index import quadkey as Q

EARTH_RADIUS_M = 6371008.8


def _dist_expr(lx, ly, rx, ry, metric: str) -> Column:
    if metric == "planar":
        # explicit multiply (not POWER) so the oracle SQL can reproduce the
        # exact IEEE result with (a-b)*(a-b)
        dx, dy = lx - rx, ly - ry
        return F.sqrt(dx * dx + dy * dy)
    if metric == "haversine":
        # fully JVM-side haversine (whole-stage codegen)
        rl1, rl2 = F.radians(ly), F.radians(ry)
        dlat = rl2 - rl1
        dlon = F.radians(rx) - F.radians(lx)
        h = F.sin(dlat / 2) ** 2 + F.cos(rl1) * F.cos(rl2) * F.sin(dlon / 2) ** 2
        return F.lit(2 * EARTH_RADIUS_M) * F.asin(F.sqrt(F.least(h, F.lit(1.0))))
    if metric == "vincenty":
        from pythongis_spark.geometry.udfs import st_geodetic_distance

        return st_geodetic_distance(lx, ly, rx, ry)
    raise ValueError(f"unknown metric {metric!r}")


def _boundary_guard_expr(lon, lat, z: int, ring: int, metric: str) -> Column:
    """Lower bound of the distance from a point to the outside of its
    (2*ring+1)^2 cell window.

    Longitude wraps: the window extends across the antimeridian (the
    neighbour explosion wraps too), so the east/west guard is the true
    lon-degree distance to the window edge — never +inf at the grid edge
    (a nearer target at lon +179.9 IS considered for a probe at -179.9).
    Latitude does not wrap; beyond the poles nothing exists → +inf."""
    n = 1 << z
    cw, ch = 360.0 / n, 180.0 / n
    tx = F.floor((lon + 180.0) / F.lit(360.0) * n)
    ty = F.floor((F.lit(90.0) - lat) / F.lit(180.0) * n)
    x_lo = F.lit(-180.0) + (tx - ring) * cw       # window west edge (may be < -180)
    x_hi = F.lit(-180.0) + (tx + ring + 1) * cw   # east (may be > 180)
    y_hi = F.lit(90.0) - (ty - ring) * ch         # north
    y_lo = F.lit(90.0) - (ty + ring + 1) * ch     # south
    inf = F.lit(float("inf"))
    wraps_world = (2 * ring + 1) >= n
    d_w = inf if wraps_world else lon - x_lo
    d_e = inf if wraps_world else x_hi - lon
    d_n = F.when(ty - ring <= 0, inf).otherwise(y_hi - lat)
    d_s = F.when(ty + ring >= n - 1, inf).otherwise(lat - y_lo)
    if metric == "planar":
        return F.least(d_w, d_e, d_n, d_s)
    # meters: provably conservative haversine lower bounds per edge.
    #
    # N/S: any target beyond a latitude edge satisfies d ≥ R·Δφ exactly
    # (haversine ≥ 2R·asin(sin(Δφ/2)) = R·Δφ), so deg→m is exact there.
    #
    # E/W: a target beyond the lon edge that is NOT also beyond a lat edge
    # has cos(φ_t) ≥ cos(maxabslat), giving
    #   d ≥ 2R·asin(√(cosφ_p·cosφ_t)·sin(Δλ/2)) ≥ 2R·cos(maxabslat)·sin(Δλ/2).
    # (Targets beyond a lat edge are covered by the exact N/S term because
    # the guard takes the least of all four.) The naive Δλ·deg_m·cosφ form
    # used previously OVERestimates by ≈sin²φ·Δλ²/6 and can admit a miss.
    deg_m = math.pi / 180.0 * EARTH_RADIUS_M
    maxabslat = F.greatest(F.abs(y_lo), F.abs(y_hi))
    coslat = F.cos(F.radians(F.least(maxabslat, F.lit(90.0))))
    if wraps_world:
        ew = inf
    else:
        half = F.radians(F.least(d_w, d_e)) / F.lit(2.0)
        ew = (
            F.lit(2.0 * EARTH_RADIUS_M)
            * F.sin(F.least(half, F.lit(math.pi / 2.0)))
            * coslat
        )
    return F.least(ew, F.least(d_n, d_s) * F.lit(deg_m))


def _explode_neighbor_cells(
    targets: DataFrame,
    lon: str,
    lat: str,
    z: int,
    ring: int,
    ring_x: Column | None = None,
) -> DataFrame:
    """One row per (target, neighbor cell within the ring window).

    The x offset wraps across the antimeridian (lon is periodic — the
    grid edge is NOT a wall); y is clipped at the poles. ``ring_x``
    optionally widens the east-west ring per row (lon degrees shrink by
    cos(lat), so geodetic joins need wider windows at high latitude)."""
    n = 1 << z
    tx = F.floor((F.col(lon) + 180.0) / F.lit(360.0) * n).cast("long")
    ty = F.floor((F.lit(90.0) - F.col(lat)) / F.lit(180.0) * n).cast("long")
    tx = F.greatest(F.lit(0), F.least(F.lit(n - 1), tx))
    ty = F.greatest(F.lit(0), F.least(F.lit(n - 1), ty))
    df = targets.withColumn("_tx", tx).withColumn("_ty", ty)
    rx = (ring_x if ring_x is not None else F.lit(ring)).cast("int")
    # x window: span columns starting `west` left of the target, wrapped.
    # Span is capped at the full world (n columns) so the window is
    # duplicate-free by construction — no dedup shuffle — while a ring
    # wider than the world still covers every column.
    span = F.least(rx * 2 + 1, F.lit(n))
    west = F.least(rx, F.lit(n // 2))
    df = df.withColumn("_dx", F.explode(F.sequence(F.lit(0), span - 1)))
    df = df.withColumn("_dy", F.explode(F.sequence(F.lit(-ring), F.lit(ring))))
    df = df.withColumn(
        "_nx", F.pmod(F.col("_tx") - west + F.col("_dx"), F.lit(n))
    ).withColumn("_ny", F.col("_ty") + F.col("_dy"))
    df = df.filter((F.col("_ny") >= 0) & (F.col("_ny") < n)).withColumn(
        "_nx", F.col("_nx").cast("long")
    )
    df = df.withColumn("cell", IU.interleave_expr(F.col("_nx"), F.col("_ny")))
    return df.drop("_tx", "_ty", "_dx", "_dy", "_nx", "_ny")


def _pick_target_level(n_targets: int, k: int) -> int:
    """Level where a cell holds ≈ k targets on average (so ring=1 holds ≈
    9k — comfortably more than k)."""
    if n_targets <= 0:
        return 0
    cells = max(1.0, n_targets / max(k, 1))
    z = int(math.floor(math.log(cells, 4)))
    return max(0, min(Q.MAX_LEVEL, z))


def knn_join(
    points: DataFrame,
    targets: DataFrame,
    k: int,
    *,
    point_id: str,
    target_id: str,
    lon: str = "lon",
    lat: str = "lat",
    t_lon: str = "lon",
    t_lat: str = "lat",
    metric: str = "planar",
    z: int | None = None,
    ring: int = 1,
    broadcast_targets_rows: int = 100_000,
    max_fallback_rounds: int = 3,
    target_rows: int | None = None,
    point_cols: list[str] | None = None,
) -> DataFrame:
    """k nearest targets per point → columns of ``points`` + ``target_id``
    + ``dist`` + ``knn_rank`` (1-based).

    Exact (guard + fallback), deterministic (ties by (dist, target_id)).
    Reference analog: ``spatial_join(condition='distance', n=k)``
    (``pythongis/vector/manager.py:293-296,345-355``); divergence: ties.

    ``point_cols`` (r6, guide §4.1): restrict the point-side columns in
    the RESULT to this list (coordinates are still used internally).
    Catalyst prunes the JVM paths on its own, but the tiny-target Arrow
    stage is opaque — without the hint every point column is serialized
    back from Python k times per point. Result rows are identical to
    selecting the same columns afterwards.
    """
    # planning statistic: an explicit hint avoids a count job per call
    # (dimension tables, repeated joins — reference keeps the r-tree
    # cached; our equivalent is caller-supplied cardinality)
    n_targets = target_rows if target_rows is not None else targets.count()
    tgt = targets.select(
        F.col(target_id).alias("_tid"),
        F.col(t_lon).alias("_tlon"),
        F.col(t_lat).alias("_tlat"),
    )
    pts = points.filter(F.col(lon).isNotNull() & F.col(lat).isNotNull())

    def _restrict(out: DataFrame) -> DataFrame:
        if point_cols is None:
            return out
        return out.select(*point_cols, target_id, "dist", "knn_rank")

    # tiny-table shortcut on an ABSOLUTE bound only: cross-join work is
    # O(points × targets), so tying this to broadcast_targets_rows (a
    # broadcast-SIZE knob) silently turned a raised broadcast budget into
    # a billion-row cartesian at scale (found by the sf0.1 sweep)
    if n_targets <= max(k * 4, 1000):
        if n_targets and metric == "planar":
            # tiny PLANAR target table: vectorized Arrow top-k — no
            # crossJoin materialization and no per-point window shuffle
            # (the crossJoin plan shuffled |points|×|targets| rows)
            return _restrict(
                _knn_tiny_arrow(
                    pts, tgt, k, point_id, lon, lat, out_cols=point_cols
                ).withColumnRenamed("_tid", target_id)
            )
        # tiny target table, trig metrics: exact broadcast cross join
        # (JVM trig keeps bit-parity with the SQL oracles; numpy libm
        # sin/cos can differ in the last ulp)
        return _restrict(
            _knn_bruteforce(
                pts, tgt, k, point_id, lon, lat, metric, n_targets
            ).withColumnRenamed("_tid", target_id)
        )

    if z is None:
        z = _pick_target_level(n_targets, k)

    result = None
    pending = pts
    cur_ring = ring
    for _ in range(max_fallback_rounds):
        if z <= 0:
            break
        exploded = _explode_neighbor_cells(tgt, "_tlon", "_tlat", z, cur_ring)
        if n_targets * (2 * cur_ring + 1) ** 2 <= broadcast_targets_rows:
            exploded = F.broadcast(exploded)
        probe = pending.withColumn(
            "cell", IU.point_cell_expr(F.col(lon), F.col(lat), z)
        )
        cand = probe.join(exploded, "cell", "inner").withColumn(
            "dist",
            _dist_expr(F.col(lon), F.col(lat), F.col("_tlon"), F.col("_tlat"), metric),
        )
        w = Window.partitionBy(point_id).orderBy("dist", "_tid")
        topk = cand.withColumn("knn_rank", F.row_number().over(w)).filter(
            F.col("knn_rank") <= k
        )
        guard = _boundary_guard_expr(F.col(lon), F.col(lat), z, cur_ring, metric)
        stats = topk.groupBy(point_id).agg(
            F.count("*").alias("_nm"), F.max("dist").alias("_kd")
        )
        topk = topk.join(stats, point_id)
        ok = topk.filter((F.col("_nm") >= k) & (F.col("_kd") < guard)).drop(
            "_nm", "_kd", "cell", "_tlon", "_tlat"
        )
        result = ok if result is None else result.unionByName(ok)
        ok_ids = ok.select(point_id).distinct()
        # cut lineage + materialize the (small) remnant: without this,
        # each fallback round's pending embeds the whole previous round's
        # plan MULTIPLE times (anti-join probe + next candidates + final
        # union), and Spark recomputes the chain combinatorially — at
        # sf0.1 the 3-round plan ran for minutes and OOMed the JVM
        pending = pending.join(ok_ids, point_id, "left_anti").localCheckpoint(
            eager=True
        )
        if pending.limit(1).count() == 0:
            pending = None
            break
        cur_ring *= 2
    if pending is not None and pending.limit(1).count() > 0:
        # the remnant set is tiny, but the TARGET side here is the full
        # table — only broadcast it when it's genuinely small, else use a
        # partition-pair cartesian (pending has few partitions, so task
        # count stays ~|target partitions|; no 8 GB broadcast cap risk)
        bf = _knn_bruteforce(
            pending, tgt, k, point_id, lon, lat, metric, n_targets,
            allow_broadcast=n_targets <= broadcast_targets_rows,
        )
        result = bf if result is None else result.unionByName(bf)
    return _restrict(result.withColumnRenamed("_tid", target_id))


def _knn_tiny_arrow(pts: DataFrame, tgt: DataFrame, k: int,
                    point_id: str, lon: str, lat: str,
                    out_cols: list[str] | None = None) -> DataFrame:
    """Exact planar kNN against a tiny target set as ONE mapInPandas
    pass: per Arrow batch, a (B × T) numpy distance matrix and a stable
    argsort emit exactly k rows per point — no join, no exchange.

    Bit-parity contract: dist = sqrt(dx*dx + dy*dy) evaluated in the
    same IEEE operation order as the Catalyst expression in
    :func:`_dist_expr` (multiply/add/sqrt are all correctly rounded),
    so values hash identically under the driver's oracle gate. Ties
    break by (dist, target id): targets are pre-sorted by id, and the
    stable argsort preserves that order among equal distances —
    the same (dist, _tid) order the window path uses. (Ranking must use
    the POST-sqrt value: two distinct d² can round to one sqrt, and such
    pairs are ties that break by _tid — an argsort on d² would order
    them by d² instead.)

    r6 perf (guide §4.2, §2.2): build the exploded output from
    numpy ``np.repeat`` columns instead of a pandas ``.loc`` row
    replication (~3× less per-batch overhead); and when the probe scan
    has fewer partitions than the cluster's parallelism (single-row-
    group local parquet), hash-repartition it so the Python stage runs
    on every core — scale-adaptive: a real many-row-group table skips
    the exchange entirely."""
    from pyspark.sql import types as T

    rows = sorted(tgt.collect(), key=lambda r: r["_tid"])
    tids = np.array([r["_tid"] for r in rows])
    tx = np.array([r["_tlon"] for r in rows], dtype=np.float64)
    ty = np.array([r["_tlat"] for r in rows], dtype=np.float64)
    kk = min(k, len(tids))
    # out_cols: only the listed point columns are serialized back from
    # Python (k copies per point) — the stage is opaque to Catalyst's
    # column pruning, so the caller's hint is the only way to shed them
    keep = list(pts.columns) if out_cols is None else list(out_cols)
    out_schema = T.StructType(
        [pts.schema[c] for c in keep]
        + [
            T.StructField("_tid", tgt.schema["_tid"].dataType),
            T.StructField("dist", T.DoubleType()),
            T.StructField("knn_rank", T.IntegerType()),
        ]
    )

    spark = pts.sparkSession
    par = spark.sparkContext.defaultParallelism
    if not pts.isStreaming and pts.rdd.getNumPartitions() < par:
        pts = pts.repartition(par, F.col(point_id))

    def gen(batches):
        ranks = np.arange(1, kk + 1, dtype=np.int32)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            px = pdf[lon].to_numpy(np.float64)
            py = pdf[lat].to_numpy(np.float64)
            # in-place chain (bit-identical values, ~half the memory
            # traffic — this op is bandwidth-bound on wide hosts):
            # dx←dx², dy←dy², dx←dx²+dy², dx←sqrt(·)
            dx = px[:, None] - tx[None, :]
            dy = py[:, None] - ty[None, :]
            np.multiply(dx, dx, out=dx)
            np.multiply(dy, dy, out=dy)
            np.add(dx, dy, out=dx)
            d = np.sqrt(dx, out=dx)
            idx = np.argsort(d, axis=1, kind="stable")[:, :kk]
            cols = {c: np.repeat(pdf[c].to_numpy(), kk) for c in keep}
            cols["_tid"] = tids[idx].ravel()
            cols["dist"] = np.take_along_axis(d, idx, axis=1).ravel()
            cols["knn_rank"] = np.tile(ranks, n)
            yield pd.DataFrame(cols)

    return pts.mapInPandas(gen, out_schema)


def _knn_bruteforce(pts, tgt, k, point_id, lon, lat, metric, n_targets=None,
                    allow_broadcast=True):
    """Exact kNN against a small target set: broadcast crossJoin +
    per-point window. (A literal-struct-array top-k variant was measured
    and is SLOWER — the per-target expression tree exceeds whole-stage
    codegen limits and falls back to interpreted eval.)"""
    if n_targets == 0:
        return (
            pts.withColumn("dist", F.lit(None).cast("double"))
            .withColumn("knn_rank", F.lit(None).cast("int"))
            .withColumn("_tid", F.lit(None).cast("long"))
            .filter(F.lit(False))
        )
    if not allow_broadcast:
        # coalesce the (small) probe side so the cartesian's task count is
        # bounded by the target side's partitioning
        pts = pts.coalesce(4)
        tgt = tgt.hint("shuffle_replicate_nl")
        cand = pts.crossJoin(tgt)
    else:
        cand = pts.crossJoin(F.broadcast(tgt))
    cand = cand.withColumn(
        "dist",
        _dist_expr(F.col(lon), F.col(lat), F.col("_tlon"), F.col("_tlat"), metric),
    )
    w = Window.partitionBy(point_id).orderBy("dist", "_tid")
    return (
        cand.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .drop("_tlon", "_tlat")
    )


def distance_join(
    points: DataFrame,
    targets: DataFrame,
    radius: float,
    *,
    point_id: str,
    target_id: str,
    lon: str = "lon",
    lat: str = "lat",
    t_lon: str = "lon",
    t_lat: str = "lat",
    metric: str = "planar",
    z: int | None = None,
    broadcast_targets_rows: int = 500_000,
    target_rows: int | None = None,
) -> DataFrame:
    """All (point, target) pairs within ``radius`` — the reference's
    within-distance join (``pythongis/vector/manager.py:282-291,333-337``,
    geodetic-buffer approach replaced by cell-ring candidates + exact
    distance refine). Output: point columns + ``target_id`` + ``dist``.
    """
    tgt = targets.select(
        F.col(target_id).alias("_tid"),
        F.col(t_lon).alias("_tlon"),
        F.col(t_lat).alias("_tlat"),
    )
    pts = points.filter(F.col(lon).isNotNull() & F.col(lat).isNotNull())
    def _n_targets():
        return target_rows if target_rows is not None else targets.count()

    # choose z so one cell edge ≥ radius → ring=1 window covers radius
    if metric == "planar":
        rad_deg = radius
    else:
        rad_deg = radius / (math.pi / 180.0 * EARTH_RADIUS_M)  # ≥ true lat-deg
    if z is None:
        # strict > so cellh(z) > rad_deg: with rad == cellh exactly and
        # boundary-aligned points, |Δty| can hit 2 — one ring would miss
        z = 0
        while z < Q.MAX_LEVEL and 180.0 / (1 << (z + 1)) > rad_deg:
            z += 1
    # at high z with huge radius fall back to brute force
    if z == 0:
        cand = pts.crossJoin(F.broadcast(tgt))
    elif metric == "planar":
        # planar degrees are isotropic: ring 1 covers the radius exactly
        exploded = _explode_neighbor_cells(tgt, "_tlon", "_tlat", z, 1)
        if _n_targets() * 9 <= broadcast_targets_rows:
            exploded = F.broadcast(exploded)
        probe = pts.withColumn("cell", IU.point_cell_expr(F.col(lon), F.col(lat), z))
        cand = probe.join(exploded, "cell", "inner").drop("cell")
    else:
        # geodetic: lon degrees shrink by cos(lat), so the x-ring widens
        # per target with the worst latitude either endpoint of a match
        # can reach (|tlat| + rad_deg). Targets whose matches can touch
        # the polar caps (cos → 0) go to an exact brute-force leg instead
        # of an unbounded explosion. The window itself wraps across the
        # antimeridian (see _explode_neighbor_cells).
        POLAR_CUTOFF = 85.0
        n = 1 << z
        cellw = 360.0 / n
        pair_lat = F.abs(F.col("_tlat")) + F.lit(rad_deg)
        main_t = tgt.filter(pair_lat < POLAR_CUTOFF)
        polar_t = tgt.filter(pair_lat >= POLAR_CUTOFF)
        # +1: cell-edge alignment can push |Δtx| to floor(Δlon/cellw)+1
        ring_x = F.ceil(
            F.lit(rad_deg) / (F.lit(cellw) * F.cos(F.radians(pair_lat)))
        ) + F.lit(1)
        exploded = _explode_neighbor_cells(main_t, "_tlon", "_tlat", z, 1, ring_x=ring_x)
        # worst-case x-span at the cutoff bounds the explosion factor
        max_span = 2 * (math.ceil(rad_deg / (cellw * math.cos(math.radians(POLAR_CUTOFF)))) + 1) + 1
        if _n_targets() * 3 * max_span <= broadcast_targets_rows:
            exploded = F.broadcast(exploded)
        probe = pts.withColumn("cell", IU.point_cell_expr(F.col(lon), F.col(lat), z))
        cand = probe.join(exploded, "cell", "inner").drop("cell")
        # polar leg: few targets by construction; probes prefiltered by
        # the only geometry that can reach them (lat within rad_deg)
        polar_probe = pts.filter(
            F.abs(F.col(lat)) >= F.lit(POLAR_CUTOFF - 2.0 * rad_deg)
        )
        cand = cand.unionByName(polar_probe.crossJoin(F.broadcast(polar_t)))
    out = cand.withColumn(
        "dist",
        _dist_expr(F.col(lon), F.col(lat), F.col("_tlon"), F.col("_tlat"), metric),
    ).filter(F.col("dist") <= radius)
    return out.drop("_tlon", "_tlat").withColumnRenamed("_tid", target_id)
