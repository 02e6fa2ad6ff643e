"""Raster map algebra and band statistics on cell tables.

Reference: band operator overloads via PIL.ImageMath
(``pythongis/raster/data.py:244-346``), expression strings
(``data.py:436-514``), band stats with the hand-rolled tiled two-pass
fallback (``data.py:592-779``), mosaic (``raster/manager.py:23-63``),
upscale (``manager.py:724-775``). Here every one is a Catalyst
expression / aggregation: partial+final aggregation, spills and AQE give
the tiled-fallback behavior natively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def band(df: DataFrame, b: int) -> DataFrame:
    return df.filter(F.col("band") == b)


def map_algebra(expr: str, **rasters: DataFrame) -> DataFrame:
    """Evaluate an expression over same-grid cell tables, e.g.
    ``map_algebra("rast1 + rast2 * 2", rast1=a, rast2=b)`` — the
    reference's ``mathexpr`` (``pythongis/raster/analyzer.py:94-143``).

    Inputs join on (x, y); each raster's ``val`` becomes a column named by
    its keyword. Nodata (NULL) propagates like the reference's unioned
    masks (``raster/data.py:264-273``).
    """
    names = list(rasters)
    out = None
    for name in names:
        d = rasters[name].select("x", "y", F.col("val").alias(name))
        out = d if out is None else out.join(d, ["x", "y"])
    return out.withColumn("val", F.expr(expr)).select("x", "y", "val")


def compute(df: DataFrame, expr: str, condition: str | None = None) -> DataFrame:
    """``Band.compute``: val → expr(val), optionally only where condition;
    nodata (NULL) preserved (``raster/data.py:436-514``). ``expr`` and
    ``condition`` are SQL over the column ``val``."""
    new = F.expr(expr)
    if condition is not None:
        new = F.when(F.expr(condition), new).otherwise(F.col("val"))
    return df.withColumn("val", F.when(F.col("val").isNull(), None).otherwise(new))


def recode(df: DataFrame, condition: str, newval: float) -> DataFrame:
    """``Band.recode`` (``raster/data.py:516-538``)."""
    return df.withColumn(
        "val",
        F.when(F.col("val").isNull(), None)
        .when(F.expr(condition), F.lit(newval))
        .otherwise(F.col("val")),
    )


def conditional(df: DataFrame, condition: str) -> DataFrame:
    """``Band.conditional`` → 1/0 mask band (``raster/data.py:540-590``)."""
    return df.withColumn(
        "val",
        F.when(F.col("val").isNull(), None).otherwise(
            F.expr(condition).cast("double")
        ),
    )


STATS_EXPRS = {
    "count": lambda c: F.count(c),
    "sum": lambda c: F.sum(c),
    "mean": lambda c: F.avg(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "median": lambda c: F.expr("percentile(val, 0.5)"),
}


def band_stats(df: DataFrame, stats: list[str], by: list[str] | None = None) -> DataFrame:
    """``Band.summarystats`` (``raster/data.py:592-779``): nodata (NULL)
    excluded automatically; majority/minority via deterministic
    count+row_number (ties → lowest value, documented divergence from the
    reference's dict order)."""
    by = by or ["band"]
    simple = [STATS_EXPRS[s](F.col("val")).alias(s) for s in stats if s in STATS_EXPRS]
    out = df.groupBy(*by).agg(*simple)
    for s in ("majority", "minority"):
        if s in stats:
            counts = (
                df.filter(F.col("val").isNotNull())
                .groupBy(*by, "val")
                .agg(F.count("*").alias("_n"))
            )
            order = (
                [F.col("_n").desc(), F.col("val").asc()]
                if s == "majority"
                else [F.col("_n").asc(), F.col("val").asc()]
            )
            w = Window.partitionBy(*by).orderBy(*order)
            top = (
                counts.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") == 1)
                .select(*by, F.col("val").alias(s))
            )
            out = out.join(top, by, "left")
    return out


def histogram(df: DataFrame, bins: int = 10, by: list[str] | None = None) -> DataFrame:
    """``Band.histogram`` (``raster/data.py:842-869``)."""
    by = by or ["band"]
    mm = df.agg(F.min("val").alias("lo"), F.max("val").alias("hi")).first()
    lo, hi = float(mm["lo"]), float(mm["hi"])
    width = (hi - lo) / bins if hi > lo else 1.0
    b = F.least(F.lit(bins - 1), F.floor((F.col("val") - F.lit(lo)) / F.lit(width))).cast("int")
    return (
        df.filter(F.col("val").isNotNull())
        .groupBy(*by, b.alias("bin"))
        .agg(F.count("*").alias("n"))
    )


def mosaic(rasters: list[DataFrame], overlaprule: str = "last") -> DataFrame:
    """Paste N same-grid cell tables; overlapping non-null cells resolved
    by paint order (``pythongis/raster/manager.py:23-63``): 'last' = later
    raster wins, 'first' = earlier wins."""
    tagged = [
        r.select("x", "y", "band", "val", F.lit(i).alias("_src"))
        for i, r in enumerate(rasters)
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    order = F.col("_src").desc() if overlaprule == "last" else F.col("_src").asc()
    w = Window.partitionBy("x", "y", "band").orderBy(F.col("val").isNull().asc(), order)
    return (
        u.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("x", "y", "band", "val")
    )


def upscale(df: DataFrame, k: int, stat: str = "sum") -> DataFrame:
    """Aggregate k×k cell blocks to one coarse cell
    (``pythongis/raster/manager.py:724-775``) — pure Catalyst groupBy, one
    shuffle (vs the reference's per-tile python loop)."""
    agg = STATS_EXPRS[stat](F.col("val")).alias("val")
    return (
        df.groupBy(
            F.floor(F.col("x") / k).cast("int").alias("x"),
            F.floor(F.col("y") / k).cast("int").alias("y"),
            "band",
        )
        .agg(agg)
    )


def morphology(df: DataFrame, op: str = "dilate", size: int = 1) -> DataFrame:
    """Grayscale morphology on a cell table — reference uses
    PIL.ImageMorph on binary masks (``pythongis/raster/analyzer.py:616-631``).

    Dilation = max (erosion = min) over the (2*size+1)^2 neighborhood,
    expressed as neighbor-offset explosion + groupBy — pure Catalyst, no
    halo exchange needed (the shuffle IS the halo). 'edge' = dilate minus
    erode > 0 mask."""
    offs = F.sequence(F.lit(-size), F.lit(size))
    spread = (
        df.filter(F.col("val").isNotNull())
        .withColumn("_dx", F.explode(offs))
        .withColumn("_dy", F.explode(offs))
        .select(
            (F.col("x") + F.col("_dx")).alias("x"),
            (F.col("y") + F.col("_dy")).alias("y"),
            "band",
            "val",
        )
    )
    if op == "dilate":
        return spread.groupBy("x", "y", "band").agg(F.max("val").alias("val"))
    if op == "erode":
        # erosion: min over the neighborhood, but only where the full
        # window exists in the input (missing neighbor = background 0)
        n_window = (2 * size + 1) ** 2
        return (
            spread.groupBy("x", "y", "band")
            .agg(F.min("val").alias("_mn"), F.count("*").alias("_n"))
            .select(
                "x", "y", "band",
                F.when(F.col("_n") == n_window, F.col("_mn")).otherwise(F.lit(0.0)).alias("val"),
            )
        )
    if op == "edge":
        d = morphology(df, "dilate", size).withColumnRenamed("val", "_d")
        e = morphology(df, "erode", size).withColumnRenamed("val", "_e")
        return d.join(e, ["x", "y", "band"], "left").select(
            "x", "y", "band",
            (F.col("_d") - F.coalesce(F.col("_e"), F.lit(0.0)) > 0).cast("double").alias("val"),
        )
    raise ValueError(f"unknown morphology op {op!r}")


def sequence_interpolate(r1: DataFrame, r2: DataFrame, t: float) -> DataFrame:
    """Linear interpolation between two same-grid rasters at fraction t —
    ``pythongis/raster/manager.py:65-160``. The inputs are two *rasters*
    (e.g. different bands or years), so the join key is the grid position
    only."""
    a = r1.select("x", "y", F.col("val").alias("v1"))
    b = r2.select("x", "y", F.col("val").alias("v2"))
    return a.join(b, ["x", "y"]).select(
        "x", "y",
        (F.col("v1") + (F.col("v2") - F.col("v1")) * F.lit(float(t))).alias("val"),
    )


def horn_terrain(
    df: DataFrame,
    cellsize: float = 1.0,
    z_factor: float = 1.0,
    altitude: float = 45.0,
    azimuth: float = 315.0,
) -> DataFrame:
    """Slope / aspect / hillshade via Horn's 8-neighbor method (Horn
    1981; the public ESRI surface-toolset formulas). The reference
    STUBS its terrain tools (``pythongis/raster/analyzer.py``: slope /
    viewshed raise NotImplementedError) — implemented here beyond
    reference parity.

    Same distribution shape as :func:`morphology`: neighbor-offset
    explode + one groupBy — the shuffle IS the halo exchange, so the
    stencil needs no per-partition edge plumbing at any raster size.
    The two directional sums accumulate in ``decimal(38,18)``
    (order-independent → oracle-exact ``gx8``/``gy8`` =
    ``(c+2f+i)-(a+2d+g)`` resp. ``(g+2h+i)-(a+2b+c)``); the trig
    transforms are per-row on top:

    - ``slope_deg`` = atan(z·hypot(gx8, gy8)/(8·cellsize)) in degrees;
    - ``aspect_deg`` = compass bearing of steepest descent,
      ``pmod(90 − 57.29578·atan2(dzdy, −dzdx), 360)``;
    - ``hillshade`` = 255·(cos zen·cos slope + sin zen·sin slope·
      cos(azm − aspect)), clamped at 0 (ESRI formula, default
      NW light at 45°).

    Cells without a FULL valid 3×3 window (raster border, or any
    neighbor/center nodata) emit NULL terrain — the standard nodata
    halo rule."""
    import math

    offs = F.sequence(F.lit(-1), F.lit(1))
    spread = (
        df.withColumn("_dx", F.explode(offs))
        .withColumn("_dy", F.explode(offs))
        .select(
            (F.col("x") + F.col("_dx")).alias("x"),
            (F.col("y") + F.col("_dy")).alias("y"),
            "band",
            "val",
            (-F.col("_dx") * F.when(F.col("_dy") == 0, 2).otherwise(1)).alias("_wx"),
            (-F.col("_dy") * F.when(F.col("_dx") == 0, 2).otherwise(1)).alias("_wy"),
        )
    )
    g = spread.groupBy("x", "y", "band").agg(
        F.count("*").alias("_n"),
        F.count("val").alias("_nv"),
        F.sum((F.col("val") * F.col("_wx")).cast("decimal(38,18)")).alias("_gx"),
        F.sum((F.col("val") * F.col("_wy")).cast("decimal(38,18)")).alias("_gy"),
    )
    full = (F.col("_n") == 9) & (F.col("_nv") == 9)
    out = g.select(
        "x", "y", "band",
        F.when(full, F.col("_gx").cast("double")).alias("gx8"),
        F.when(full, F.col("_gy").cast("double")).alias("gy8"),
    )
    dzdx = F.col("gx8") * z_factor / F.lit(8.0 * cellsize)
    dzdy = F.col("gy8") * z_factor / F.lit(8.0 * cellsize)
    rise = F.sqrt(dzdx * dzdx + dzdy * dzdy)
    slope_rad = F.atan(rise)
    aspect_deg = F.pmod(
        F.lit(90.0) - F.degrees(F.atan2(dzdy, -dzdx)), F.lit(360.0)
    )
    zen = math.radians(90.0 - altitude)
    azm = math.radians(360.0 - azimuth + 90.0)
    hs = F.lit(255.0) * (
        F.lit(math.cos(zen)) * F.cos(slope_rad)
        + F.lit(math.sin(zen)) * F.sin(slope_rad)
        * F.cos(F.lit(azm) - F.radians(F.lit(90.0) - aspect_deg))
    )
    return (
        out.withColumn("slope_deg", F.degrees(slope_rad))
        .withColumn("aspect_deg", aspect_deg)
        .withColumn("hillshade", F.greatest(F.lit(0.0), hs))
    )


def viewshed(
    df: DataFrame,
    ox: int,
    oy: int,
    observer_height: float = 1.0,
    radius: int = 40,
) -> DataFrame:
    """Observer-to-cell visibility over a DEM cell table — the
    reference STUBS viewshed (``pythongis/raster/analyzer.py`` raises);
    implemented beyond parity with the standard DDA line-of-sight
    method (public: Travis et al. R2 viewshed family).

    For a target at Chebyshev cell distance L from the observer, the
    sight line between cell centers is sampled at fractions k/L
    (k = 1..L−1); each sample reads the nearest cell's elevation, and
    the target is visible iff its own elevation angle is ≥ the maximum
    sample angle (tangents compared — no trig). Shape: one bounded
    explode (Σ L = O(radius³) rows — radius is the documented scale
    knob), one equi-join against the DEM for sample elevations, one
    groupBy max per target. Deterministic: max() is order-independent
    and every tangent is a fixed-order double expression.

    Rules: the observer cell is visible; NULL target elevation → NULL
    visibility; NULL sample elevations don't block (transparent
    nodata, documented choice). The observer cell itself must exist
    with a non-NULL elevation (one bounded 1-row collect) — a missing
    or nodata observer raises instead of silently reporting every
    in-radius cell visible (a NULL ``_oz`` nulls every sample tangent,
    so the no-blocker rule would fire everywhere).
    Returns (x, y, dist, visible)."""
    dem = df.select("x", "y", "val")
    orow = dem.filter((F.col("x") == ox) & (F.col("y") == oy)).head(1)
    if not orow or orow[0]["val"] is None:
        raise ValueError(
            f"viewshed observer cell ({ox}, {oy}) is missing or nodata")
    oz = float(orow[0]["val"]) + float(observer_height)
    dx = F.col("x") - F.lit(ox)
    dy = F.col("y") - F.lit(oy)
    L = F.greatest(F.abs(dx), F.abs(dy))
    tgt = (
        dem
        .filter(dx * dx + dy * dy <= F.lit(radius * radius))
        .select(
            "x", "y", "val", F.lit(oz).alias("_oz"),
            F.sqrt((dx * dx + dy * dy).cast("double")).alias("dist"),
            L.alias("_L"),
        )
    )
    # sample points k/L along the center-to-center sight line
    samp = (
        tgt.filter(F.col("_L") >= 2)
        .withColumn("_k", F.explode(F.sequence(F.lit(1), F.col("_L") - 1)))
        .select(
            "x", "y",
            (F.col("_k") / F.col("_L")).alias("_f"),
            (F.lit(ox + 0.5) + (F.col("x") - F.lit(ox)) * F.col("_k") / F.col("_L")).alias("_px"),
            (F.lit(oy + 0.5) + (F.col("y") - F.lit(oy)) * F.col("_k") / F.col("_L")).alias("_py"),
            "dist", "_oz",
        )
        .select(
            "x", "y", "_f", "dist", "_oz",
            F.floor(F.col("_px")).cast("int").alias("sx"),
            F.floor(F.col("_py")).cast("int").alias("sy"),
        )
    )
    sz = dem.select(
        F.col("x").alias("sx"), F.col("y").alias("sy"), F.col("val").alias("_sz")
    )
    blocked = (
        samp
        # a sample landing inside the target's own cell must not block
        # it (the k=(L-1)/L point floors into the target on diagonals)
        .filter(~((F.col("sx") == F.col("x")) & (F.col("sy") == F.col("y"))))
        .join(sz, ["sx", "sy"], "left")
        .filter(F.col("_sz").isNotNull())
        .groupBy("x", "y")
        .agg(
            F.max(
                (F.col("_sz") - F.col("_oz")) / (F.col("_f") * F.col("dist"))
            ).alias("_max_tan")
        )
    )
    out = tgt.join(blocked, ["x", "y"], "left").select(
        "x", "y", "dist",
        F.when(F.col("val").isNull(), F.lit(None).cast("boolean"))
        .when(F.col("_max_tan").isNull(), F.lit(True))
        .otherwise(
            (F.col("val") - F.col("_oz")) / F.col("dist") >= F.col("_max_tan")
        )
        .alias("visible"),
    )
    return out


def downscale(df: DataFrame, k: int, stat: str = "spread") -> DataFrame:
    """Inverse of :func:`upscale`: spread each cell across its k×k
    finer cells — the reference DECLARES this operator and raises
    NotImplementedError (``raster/manager.py:778``, stat='spread'
    default). ``spread`` divides the value by k² (mass-preserving:
    ``upscale(downscale(r, k), k, 'sum')`` reproduces ``r`` exactly
    when k² is a power of two); ``copy`` replicates it. Pure-Catalyst
    explode, no shuffle."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if stat not in ("spread", "copy"):
        raise ValueError(f"unknown downscale stat {stat!r}")
    offs = F.sequence(F.lit(0), F.lit(k - 1))
    val = F.col("val") / F.lit(float(k * k)) if stat == "spread" else F.col("val")
    return (
        df.withColumn("_dx", F.explode(offs))
        .withColumn("_dy", F.explode(offs))
        .select(
            (F.col("x") * k + F.col("_dx")).cast("int").alias("x"),
            (F.col("y") * k + F.col("_dy")).cast("int").alias("y"),
            "band",
            val.alias("val"),
        )
    )


_SQRT2 = 1.4142135623730951


def cost_distance(
    cost: DataFrame,
    sources: list,
    max_rounds: int = 64,
    diagonal: bool = True,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """Cumulative-cost raster from a set of source cells — the engine
    half of the reference's NotImplemented least-cost stack
    (``pythongis/raster/analyzer.py``). Standard cost-distance
    semantics (public ESRI/GRASS definition): moving between adjacent
    cells costs the mean of their per-cell costs, ×√2 diagonally;
    ``dist(cell)`` = minimum total cost over all paths from any source.
    NULL cost = impassable barrier.

    Distribution shape: Bellman relaxation — each round explodes the
    frontier by the 8 neighbor offsets, joins the cost raster once, and
    min-aggregates; ``localCheckpoint`` truncates the plan per round
    (same contract as connected_components) and a (count, bit_xor)
    checksum detects the fixpoint. Rounds needed = cells on the longest
    optimal path (the documented scale bound — quadratic-total-work in
    path length, each round one bounded shuffle); raises if not
    converged within ``max_rounds``. The result is deterministic: every
    path cost is a fixed-order fold along its path and min() is
    order-independent.

    ``fixed_rounds``: run exactly that many relaxation rounds with NO
    convergence checksums (halves the job count; the fixpoint is
    idempotent, so any value ≥ the longest optimal path's cell count is
    correct — the caller owns that bound, e.g. from the grid diameter).

    Returns (x, y, dist)."""
    grid = cost.select("x", "y", F.col("val").alias("c")).filter(
        F.col("c").isNotNull()
    )
    src = grid.sparkSession.createDataFrame(
        [(int(x), int(y)) for x, y in sources], "x int, y int"
    )
    dist = (
        grid.join(src, ["x", "y"], "left_semi")
        .select("x", "y", F.lit(0.0).alias("d"), "c")
        .localCheckpoint(eager=True)
    )
    # a source on a missing/nodata cell would silently yield an empty
    # raster — validate up front (bounded: |sources| rows, and the
    # checkpoint above already materialized them)
    found = {(r["x"], r["y"]) for r in dist.select("x", "y").collect()}
    missing = [(int(x), int(y)) for x, y in sources
               if (int(x), int(y)) not in found]
    if missing:
        raise ValueError(
            f"cost_distance source cells missing or nodata: {missing}")

    def checksum(df):
        row = df.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(x, y, d))").alias("h"),
        ).first()
        return (row["n"], row["h"])

    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0) and (diagonal or dx * dy == 0)]
    off_rows = grid.sparkSession.createDataFrame(
        [(dx, dy, _SQRT2 if dx * dy != 0 else 1.0) for dx, dy in offs],
        "dx int, dy int, w double",
    )
    prev = None if fixed_rounds is not None else checksum(dist)
    for _ in range(fixed_rounds if fixed_rounds is not None else max_rounds):
        cand = (
            dist.crossJoin(F.broadcast(off_rows))
            .select(
                (F.col("x") + F.col("dx")).alias("x"),
                (F.col("y") + F.col("dy")).alias("y"),
                F.col("d").alias("_d0"),
                F.col("c").alias("_c0"),
                "w",
            )
            .join(grid, ["x", "y"])
            .select(
                "x", "y",
                (F.col("_d0")
                 + ((F.col("_c0") + F.col("c")) / F.lit(2.0)) * F.col("w")
                 ).alias("d"),
                "c",
            )
        )
        nxt = (
            dist.unionByName(cand)
            .groupBy("x", "y", "c")
            .agg(F.min("d").alias("d"))
            .select("x", "y", "d", "c")
            .localCheckpoint(eager=True)
        )
        dist = nxt
        if fixed_rounds is None:
            cur = checksum(nxt)
            if cur == prev:
                return dist.select("x", "y", "d").withColumnRenamed("d", "dist")
            prev = cur
    if fixed_rounds is not None:
        return dist.select("x", "y", "d").withColumnRenamed("d", "dist")
    raise RuntimeError(f"cost_distance did not converge in {max_rounds} rounds")


def least_cost_path(
    cost: DataFrame, source: tuple, target: tuple,
    max_rounds: int = 64, diagonal: bool = True,
) -> list:
    """Steepest-descent backtrack over :func:`cost_distance` — returns
    the cell path target→source as a list of (x, y). The dist raster is
    computed distributed; the backtrack collects it (bounded: callers
    crop to the corridor of interest first, the same contract as the
    ASCII/BIL single-file writers)."""
    dist = cost_distance(cost, [source], max_rounds, diagonal).toPandas()
    dmap = {(int(r.x), int(r.y)): float(r.dist) for r in dist.itertuples()}
    if tuple(target) not in dmap:
        raise ValueError("target unreachable from source")
    path = [tuple(target)]
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0) and (diagonal or dx * dy == 0)]
    cur = tuple(target)
    while cur != tuple(source):
        nbrs = [(dmap[(cur[0] + dx, cur[1] + dy)], (cur[0] + dx, cur[1] + dy))
                for dx, dy in offs if (cur[0] + dx, cur[1] + dy) in dmap]
        best = min(nbrs)
        if best[0] >= dmap[cur]:
            raise RuntimeError("stuck backtracking (non-decreasing dist)")
        cur = best[1]
        path.append(cur)
    return path
