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
    gy = xc * rd.yskew + yc * rd.yscale + rd.yoffset
    return gx, gy


def geo_to_cell_exprs(rd: RasterDef, lon: Column, lat: Column) -> tuple[Column, Column]:
    """Inverse affine → integer cell coords (``raster/data.py:1269-1278``
    floor). Skew-free rasters keep the direct per-axis division (the
    form every SQL oracle replays bit-exactly); skewed affines invert
    the full 2×2 (the affine.py-style coefficients the reference
    computes at ``raster/data.py:1245-1256``)."""
    if rd.xskew == 0 and rd.yskew == 0:
        cx = F.floor((lon - rd.xoffset) / rd.xscale).cast("int")
        cy = F.floor((lat - rd.yoffset) / rd.yscale).cast("int")
        return cx, cy
    det = rd.xscale * rd.yscale - rd.xskew * rd.yskew
    if det == 0:
        raise ValueError("degenerate affine (zero determinant)")
    dx = lon - rd.xoffset
    dy = lat - rd.yoffset
    cx = F.floor((dx * rd.yscale - dy * rd.xskew) / det).cast("int")
    cy = F.floor((dy * rd.xscale - dx * rd.yskew) / det).cast("int")
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


# ------------------------------------------------------------------
# resample / align (``pythongis/raster/manager.py:560-650, 678-722``)
# ------------------------------------------------------------------

def _target_grid(spark, dst: RasterDef) -> DataFrame:
    """All target cells of ``dst`` with their source-lookup geo centers —
    ``spark.range`` is fully distributed (no driver materialization)."""
    return spark.range(dst.width * dst.height).select(
        F.pmod(F.col("id"), dst.width).cast("int").alias("x"),
        F.floor(F.col("id") / dst.width).cast("int").alias("y"),
    )


def resample(
    cells: DataFrame,
    src: RasterDef,
    dst: RasterDef,
    method: str = "nearest",
    spark=None,
    inv_transform=None,
) -> DataFrame:
    """Grid-to-grid resample of a cell table — the reference's
    ``resample`` (``raster/manager.py:560-650``, PIL QUAD transform)
    re-expressed as a target-driven cell remap:

    * nearest: one equi-join — target center → fractional source coord
      → floor → (sx, sy) lookup. Pure Catalyst, zero Python.
    * bilinear: explode each target into its 2×2 source neighbourhood
      with separable weights, equi-join, weighted groupBy (weights
      renormalized over non-null neighbours, so nodata cells don't
      bleed — the reference instead pastes nodata through a mask).
    * bicubic: same shape with the 4×4 cubic-convolution kernel
      (a = -0.5, the PIL/OpenCV constant).

    Missing source cells simply produce no row (sparse nodata), like
    every other cell-table operator here. Skewed (rotated) affines are
    supported on both sides via the full 2×2 forward/inverse; skew-free
    grids keep the direct per-axis expressions the oracles replay.
    Returns (x, y, band, val) on the ``dst`` grid.

    ``inv_transform``: optional callable (gx, gy Columns in dst CRS) →
    (gx', gy' Columns in src CRS) applied to target centers before the
    source lookup — this turns the remap into a CRS warp (see ``warp``).
    """
    spark = spark or cells.sparkSession
    tgt = _target_grid(spark, dst)
    if dst.xskew == 0 and dst.yskew == 0:
        gx = (F.col("x") + F.lit(0.5)) * dst.xscale + dst.xoffset
        gy = (F.col("y") + F.lit(0.5)) * dst.yscale + dst.yoffset
    else:
        gx, gy = cell_center_exprs(dst)
    if inv_transform is not None:
        # materialize the transformed centers in ONE projection: a
        # pandas-UDF-backed inverse (proj_parse.column_inverse exposes
        # its struct udf) would otherwise be re-planned once per
        # downstream use of gx/gy — 4 ArrowEvalPython stages instead of
        # 1 (plan-audited as warp_parsed_single_arrow)
        su = getattr(inv_transform, "struct_udf", None)
        if su is not None:
            tgt = tgt.select("*", su(gx, gy).alias("_w"))
            gx = F.col("_w").getField("x")
            gy = F.col("_w").getField("y")
        else:
            gx, gy = inv_transform(gx, gy)
            tgt = tgt.select("*", gx.alias("_wgx"), gy.alias("_wgy"))
            gx, gy = F.col("_wgx"), F.col("_wgy")
    if src.xskew == 0 and src.yskew == 0:
        u = (gx - src.xoffset) / src.xscale   # fractional source col
        v = (gy - src.yoffset) / src.yscale   # fractional source row
    else:
        det = src.xscale * src.yscale - src.xskew * src.yskew
        if det == 0:
            raise ValueError("degenerate affine (zero determinant)")
        dgx = gx - src.xoffset
        dgy = gy - src.yoffset
        u = (dgx * src.yscale - dgy * src.xskew) / det
        v = (dgy * src.xscale - dgx * src.yskew) / det

    if method == "nearest":
        tgt = tgt.withColumn("sx", F.floor(u).cast("int")).withColumn(
            "sy", F.floor(v).cast("int")
        )
        srcr = cells.select(
            F.col("x").alias("sx"), F.col("y").alias("sy"), "band", "val"
        )
        return tgt.join(srcr, ["sx", "sy"]).select("x", "y", "band", "val")

    if method == "bilinear":
        uc = u - F.lit(0.5)  # center-based coord: source cell i center at i+0.5
        vc = v - F.lit(0.5)
        x0, y0 = F.floor(uc), F.floor(vc)
        fx, fy = uc - x0, vc - y0
        xs = F.array(
            F.struct(x0.cast("int").alias("sx"), (F.lit(1.0) - fx).alias("wx")),
            F.struct((x0 + 1).cast("int").alias("sx"), fx.alias("wx")),
        )
        ys = F.array(
            F.struct(y0.cast("int").alias("sy"), (F.lit(1.0) - fy).alias("wy")),
            F.struct((y0 + 1).cast("int").alias("sy"), fy.alias("wy")),
        )
    elif method == "bicubic":
        uc = u - F.lit(0.5)
        vc = v - F.lit(0.5)
        x0, y0 = F.floor(uc), F.floor(vc)
        fx, fy = uc - x0, vc - y0

        def _cubic(t):
            # cubic convolution kernel, a = -0.5 (Keys 1981)
            a = -0.5
            t3 = t * t * t
            t2 = t * t
            return F.when(t <= 1.0, (a + 2) * t3 - (a + 3) * t2 + 1).otherwise(
                a * t3 - 5 * a * t2 + 8 * a * t - 4 * a
            )

        def _axis(base, frac, name_c, name_w):
            structs = []
            for d in (-1, 0, 1, 2):
                t = F.abs(F.lit(float(d)) - frac)
                structs.append(
                    F.struct((base + d).cast("int").alias(name_c), _cubic(t).alias(name_w))
                )
            return F.array(*structs)

        xs = _axis(x0, fx, "sx", "wx")
        ys = _axis(y0, fy, "sy", "wy")
    else:
        raise ValueError(f"unknown resample method {method!r}")

    exploded = (
        tgt.withColumn("xe", F.explode(xs))
        .withColumn("ye", F.explode(ys))
        .select(
            "x", "y",
            F.col("xe.sx").alias("sx"), F.col("ye.sy").alias("sy"),
            (F.col("xe.wx") * F.col("ye.wy")).alias("w"),
        )
    )
    srcr = cells.select(F.col("x").alias("sx"), F.col("y").alias("sy"), "band", "val")
    joined = exploded.join(srcr, ["sx", "sy"])
    return (
        joined.groupBy("x", "y", "band")
        .agg(
            # try_divide: a target whose only non-null neighbours carry
            # exactly-zero weight has denominator 0 -> null (nodata),
            # not an ANSI arithmetic error
            F.try_divide(
                F.sum(F.col("w") * F.col("val")),
                F.sum(F.when(F.col("val").isNotNull(), F.col("w"))),
            ).alias("val")
        )
    )


def warp(
    cells: DataFrame,
    src: RasterDef,
    dst: RasterDef,
    src_crs: str = "EPSG:4326",
    dst_crs: str = "EPSG:3857",
    method: str = "nearest",
    spark=None,
) -> DataFrame:
    """Single-call raster CRS warp — the reference's ``reproject``
    (``pythongis/raster/manager.py:175-395``) as a target-driven remap:
    every dst cell center is inverse-projected into the source CRS, then
    looked up with the chosen resampling (same machinery as
    :func:`resample`).

    The WGS84 ↔ web-mercator pair runs PURE CATALYST (sphere formulas
    from ``geometry/projections.py`` — exp/atan/ln codegen, no Python).
    Any other pair: pass a callable as ``dst_crs`` mapping (gx, gy
    Columns in the dst CRS) → (gx', gy') in the source CRS (e.g. the
    ellipsoidal UTM/LCC/Albers inverses in ``geometry/crs`` wrapped in a
    pandas UDF).
    """
    from pythongis_spark.geometry import projections as PJ

    def norm(c):
        # only short authority codes normalize to upper case — proj4
        # parameter strings and WKT blocks are case-sensitive specs
        if isinstance(c, str) and not c.startswith("+") \
                and not c.lstrip().startswith(("PROJCS", "GEOGCS")):
            return c.upper().replace("CRS:", "EPSG:")
        return c

    s, d = norm(src_crs), norm(dst_crs)
    if callable(d):
        inv = d
    elif s == d:
        inv = None
    elif (s, d) == ("EPSG:4326", "EPSG:3857"):
        def inv(gx, gy):
            return PJ.inv_webmercator_lon(gx), PJ.inv_webmercator_lat(gy)
    elif (s, d) == ("EPSG:3857", "EPSG:4326"):
        def inv(gx, gy):
            return PJ.webmercator_x(gx), PJ.webmercator_y(gy)
    else:
        # any parseable CRS pair (proj4 string / WKT1 / table EPSG code)
        # through the parameter parser: dst-inverse → src-forward in one
        # vectorized pandas UDF (geometry.proj_parse)
        from pythongis_spark.geometry import proj_parse

        try:
            inv = proj_parse.column_inverse(s, d)
        except (NotImplementedError, ValueError) as ex:
            raise NotImplementedError(
                f"warp {s}->{d}: {ex}; pass a dst->src inverse callable "
                f"as dst_crs") from ex
    return resample(cells, src, dst, method, spark=spark, inv_transform=inv)


def align(
    cells: DataFrame, src: RasterDef, ref: RasterDef, method: str = "nearest"
) -> tuple[DataFrame, RasterDef]:
    """Snap a raster's offsets onto another grid's scale ticks and
    resample onto the snapped grid (``raster/manager.py:678-722``).

    The reference's docstring and disabled code snap the offset to the
    reference grid's ticks; its shipped code calls ``geo_to_cell(...,
    fraction=True)`` whose round-trip is the identity, degenerating to
    a same-grid resample. We implement the documented intent with the
    non-fraction (floor) cell semantics of ``geo_to_cell``. Scales must
    match, like the reference. Returns (cells', snapped RasterDef).
    """
    if not (src.xscale == ref.xscale and src.yscale == ref.yscale):
        raise ValueError("align requires equal x/y scales")
    import math as _math

    px = _math.floor((src.xoffset - ref.xoffset) / ref.xscale)
    py = _math.floor((src.yoffset - ref.yoffset) / ref.yscale)
    snapped = RasterDef(
        width=src.width,
        height=src.height,
        affine=(
            src.xscale, 0.0, px * ref.xscale + ref.xoffset,
            0.0, src.yscale, py * ref.yscale + ref.yoffset,
        ),
        nodata=src.nodata,
    )
    return resample(cells, src, snapped, method=method), snapped


# ------------------------------------------------------------------
# tiepoint (GCP) warp — the reference's GCP path is a NotImplemented
# stub; standard public least-squares/normal-equations method
# ------------------------------------------------------------------

def fit_affine_gcps(gcps: DataFrame, src_cols=("px", "py"),
                    dst_cols=("gx", "gy")) -> tuple:
    """Least-squares affine from ground-control points:
    ``gx = a·px + b·py + c``, ``gy = d·px + e·py + f``.

    Moment sums accumulate distributed in ``decimal(38,12)``
    (order-independent — re-running on a different partitioning returns
    bit-identical parameters); exactly 12 scalars cross to the driver,
    where Cramer's rule solves the two 3×3 normal systems (bounded
    driver math, same contract as classify break computation).
    Raises on degenerate (collinear) control points."""
    px, py = (F.col(c).cast("double") for c in src_cols)
    gx, gy = (F.col(c).cast("double") for c in dst_cols)

    def dsum(e):
        return F.sum(e.cast("decimal(38,12)")).cast("double")

    m = gcps.agg(
        F.count("*").cast("double").alias("n"),
        dsum(px).alias("sx"), dsum(py).alias("sy"),
        dsum(px * px).alias("sxx"), dsum(px * py).alias("sxy"),
        dsum(py * py).alias("syy"),
        dsum(gx).alias("tx"), dsum(gx * px).alias("txx"),
        dsum(gx * py).alias("txy"),
        dsum(gy).alias("ty"), dsum(gy * px).alias("tyx"),
        dsum(gy * py).alias("tyy"),
    ).first()

    def det3(m00, m01, m02, m10, m11, m12, m20, m21, m22):
        return (m00 * (m11 * m22 - m12 * m21)
                - m01 * (m10 * m22 - m12 * m20)
                + m02 * (m10 * m21 - m11 * m20))

    A = (m["sxx"], m["sxy"], m["sx"],
         m["sxy"], m["syy"], m["sy"],
         m["sx"], m["sy"], m["n"])
    D = det3(*A)
    if D == 0:
        raise ValueError("degenerate GCPs (collinear or fewer than 3)")

    def solve(r0, r1, r2):
        da = det3(r0, A[1], A[2], r1, A[4], A[5], r2, A[7], A[8])
        db = det3(A[0], r0, A[2], A[3], r1, A[5], A[6], r2, A[8])
        dc = det3(A[0], A[1], r0, A[3], A[4], r1, A[6], A[7], r2)
        return da / D, db / D, dc / D

    a, b, c = solve(m["txx"], m["txy"], m["tx"])
    d, e, f = solve(m["tyx"], m["tyy"], m["ty"])
    return (a, b, c, d, e, f)


def warp_gcps(cells: DataFrame, src: RasterDef, dst: RasterDef,
              gcps: DataFrame, method: str = "nearest", spark=None,
              src_cols=("px", "py"), dst_cols=("gx", "gy")) -> DataFrame:
    """Tiepoint warp: fit the pixel→world affine from GCPs (fractional
    pixel coords, cell center at x+0.5, matching :func:`resample`'s
    convention), then remap every dst cell through its inverse — the
    same target-driven machinery as :func:`warp`, so every resampling
    method applies. The source raster's own geotransform is ignored
    (the tiepoints define it)."""
    a, b, c, d, e, f = fit_affine_gcps(gcps, src_cols, dst_cols)
    det = a * e - b * d
    if det == 0:
        raise ValueError("degenerate fitted affine")

    def inv(gx, gy):
        ux = gx - F.lit(c)
        uy = gy - F.lit(f)
        return ((ux * e - uy * b) / F.lit(det),
                (uy * a - ux * d) / F.lit(det))

    px_def = RasterDef(src.width, src.height, (1.0, 0.0, 0.0, 0.0, 1.0, 0.0))
    return resample(cells, px_def, dst, method, spark=spark, inv_transform=inv)
