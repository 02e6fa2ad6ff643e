"""resample/align (reference: pythongis/raster/manager.py:560-650,678-722)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pythongis_spark.raster.model import RasterDef, align, resample


def _grid(spark, w, h, valfn):
    rows = [(x, y, 0, float(valfn(x, y))) for y in range(h) for x in range(w)]
    return spark.createDataFrame(rows, "x INT, y INT, band INT, val DOUBLE")


GLOBAL = RasterDef(8, 4, (1.0, 0.0, -4.0, 0.0, -1.0, 2.0))


def test_nearest_identity(spark):
    cells = _grid(spark, 8, 4, lambda x, y: x * 10 + y)
    out = resample(cells, GLOBAL, GLOBAL, "nearest").toPandas()
    src = cells.toPandas()
    m = out.merge(src, on=["x", "y", "band"], suffixes=("_o", "_s"))
    assert len(m) == len(src)
    assert (m["val_o"] == m["val_s"]).all()


def test_nearest_downsample_2x(spark):
    cells = _grid(spark, 8, 4, lambda x, y: x * 10 + y)
    dst = RasterDef(4, 2, (2.0, 0.0, -4.0, 0.0, -2.0, 2.0))
    out = resample(cells, GLOBAL, dst, "nearest").toPandas().set_index(["x", "y"])["val"]
    # target center (x+0.5)*2-4 -> source col floor(2x+1) = 2x+1
    for tx in range(4):
        for ty in range(2):
            assert out[(tx, ty)] == (2 * tx + 1) * 10 + (2 * ty + 1)


def test_nearest_upsample_replicates(spark):
    cells = _grid(spark, 8, 4, lambda x, y: x * 10 + y)
    dst = RasterDef(16, 8, (0.5, 0.0, -4.0, 0.0, -0.5, 2.0))
    out = resample(cells, GLOBAL, dst, "nearest").toPandas()
    assert len(out) == 16 * 8
    got = out.set_index(["x", "y"])["val"]
    for tx in range(16):
        for ty in range(8):
            assert got[(tx, ty)] == (tx // 2) * 10 + (ty // 2)


def test_bilinear_constant_and_ramp(spark):
    const = _grid(spark, 8, 4, lambda x, y: 7.25)
    dst = RasterDef(5, 3, (1.6, 0.0, -4.0, 0.0, -4.0 / 3.0, 2.0))
    out = resample(const, GLOBAL, dst, "bilinear").toPandas()
    assert np.allclose(out["val"], 7.25)
    # a linear ramp val = x is reproduced exactly in the interior
    ramp = _grid(spark, 8, 4, lambda x, y: float(x))
    out = resample(ramp, GLOBAL, dst, "bilinear").toPandas()
    for _, r in out.iterrows():
        u = ((r.x + 0.5) * 1.6 - 4.0 + 4.0) / 1.0 - 0.5  # frac source col
        if 0.0 <= u <= 7.0:  # interior of the source grid
            assert r.val == pytest.approx(u, abs=1e-9)


def test_bicubic_constant_and_linear(spark):
    const = _grid(spark, 10, 6, lambda x, y: -3.5)
    src = RasterDef(10, 6, (1.0, 0.0, 0.0, 0.0, 1.0, 0.0))
    dst = RasterDef(7, 4, (10.0 / 7.0, 0.0, 0.0, 0.0, 1.5, 0.0))
    out = resample(const, src, dst, "bicubic").toPandas()
    # interior cells (full 4x4 neighbourhood) reproduce constants exactly
    interior = out[(out.x > 0) & (out.x < 6) & (out.y > 0) & (out.y < 3)]
    assert np.allclose(interior["val"], -3.5)
    ramp = _grid(spark, 10, 6, lambda x, y: float(y))
    out = resample(ramp, src, dst, "bicubic").toPandas()
    for _, r in out.iterrows():
        v = (r.y + 0.5) * 1.5 - 0.5
        if 1.0 <= v <= 4.0:  # full kernel support
            assert r.val == pytest.approx(v, abs=1e-9)


def test_bilinear_skips_nodata(spark):
    cells = _grid(spark, 4, 4, lambda x, y: 5.0)
    cells = cells.withColumn(
        "val", F.when((F.col("x") == 1) & (F.col("y") == 1), None).otherwise(F.col("val"))
    )
    src = RasterDef(4, 4, (1.0, 0.0, 0.0, 0.0, 1.0, 0.0))
    out = resample(cells, src, src, "bilinear").toPandas()
    # renormalized over non-null neighbours -> still 5.0 everywhere
    assert np.allclose(out["val"].dropna(), 5.0)


def test_align_snaps_offsets(spark):
    src = RasterDef(8, 4, (1.0, 0.0, -3.75, 0.0, -1.0, 1.6))
    ref = RasterDef(360, 180, (1.0, 0.0, -180.0, 0.0, -1.0, 90.0))
    cells = _grid(spark, 8, 4, lambda x, y: x + y)
    out, snapped = align(cells, src, ref)
    # offsets moved onto integer ticks of the reference grid
    # px = floor((-3.75+180)/1) = 176 -> -4.0; py = floor((1.6-90)/-1) = 88 -> 2.0
    assert snapped.xoffset == -4.0 and snapped.yoffset == 2.0
    assert snapped.width == src.width and snapped.height == src.height
    assert out.count() > 0
    # same scales required
    bad = RasterDef(8, 4, (2.0, 0.0, 0.0, 0.0, -2.0, 0.0))
    with pytest.raises(ValueError):
        align(cells, src, bad)


def test_warp_webmercator_roundtripish(spark):
    """4326→3857 nearest warp: every output value must exist in the
    source column at the inverse-projected cell (spot-check vs a numpy
    reimplementation), and the 3857→4326 direction works too."""
    import math

    from pythongis_spark import fixtures as FX
    from pythongis_spark.raster.model import RasterDef, warp

    cells = FX.raster_cells(spark, 360, 180, 1)
    src = RasterDef(360, 180, (1.0, 0.0, -180.0, 0.0, -1.0, 90.0))
    dst = RasterDef(40, 40, (999000.0, 0.0, -19987000.0, 0.0, -970000.0, 19400000.0))
    out = warp(cells, src, dst, "EPSG:4326", "EPSG:3857", "nearest", spark=spark)
    got = {(r["x"], r["y"]): r["val"] for r in out.filter(F.col("band") == 0).collect()}
    R = 6378137.0
    srcv = {(r["x"], r["y"]): r["val"]
            for r in cells.filter(F.col("band") == 0).collect()}
    assert len(got) > 1000
    for (x, y), v in list(got.items())[:500]:
        gx = (x + 0.5) * 999000.0 - 19987000.0
        gy = (y + 0.5) * -970000.0 + 19400000.0
        lon = math.degrees(gx / R)
        lat = math.degrees(2 * math.atan(math.exp(gy / R)) - math.pi / 2)
        sx = math.floor((lon + 180.0) / 1.0)
        sy = math.floor((lat - 90.0) / -1.0)
        assert srcv.get((sx, sy)) == v
    # reverse direction: 3857 source grid → 4326 target
    src2 = RasterDef(40, 40, (999000.0, 0.0, -19987000.0, 0.0, -970000.0, 19400000.0))
    dst2 = RasterDef(90, 45, (4.0, 0.0, -180.0, 0.0, -4.0, 90.0))
    cells2 = out  # reuse warped cells as a 3857 raster
    back = warp(cells2, src2, dst2, "EPSG:3857", "EPSG:4326", "nearest", spark=spark)
    assert back.count() > 500


# ------------------------------------------------------------------
# skewed (rotated) affines — full 2x2 forward/inverse
# ------------------------------------------------------------------

def _rot_def(w, h, theta_deg, scale=2.0, x0=10.0, y0=50.0):
    t = np.deg2rad(theta_deg)
    c, s = np.cos(t) * scale, np.sin(t) * scale
    # affine = (xscale, xskew, xoffset, yskew, yscale, yoffset):
    # a rotation-by-theta grid, reference data.py:1263-1267 orientation
    return RasterDef(w, h, (c, -s, x0, s, c, y0))


def test_cell_center_orientation_matches_reference(spark):
    """gy must be driven by the ROW (reference data.py:1266:
    y_coord = x*yskew + y*yscale + yoffset) — regression for a
    transposed gy in the exported helper."""
    from pythongis_spark.raster.model import cell_center_exprs

    rd = RasterDef(360, 180, (1.0, 0.0, -180.0, 0.0, -1.0, 90.0))
    df = spark.createDataFrame([(3, 7)], "x int, y int")
    gx, gy = cell_center_exprs(rd)
    got = df.select(gx.alias("gx"), gy.alias("gy")).collect()[0]
    assert got.gx == -176.5 and got.gy == 82.5


def test_skewed_cell_geo_roundtrip(spark):
    """Every cell center of a rotated grid maps back to its own cell
    through the general inverse (floor semantics)."""
    from pythongis_spark.raster.model import cell_center_exprs, geo_to_cell_exprs

    rd = _rot_def(9, 6, 30.0)
    df = spark.range(9 * 6).select(
        (F.col("id") % 9).cast("int").alias("x"),
        F.floor(F.col("id") / 9).cast("int").alias("y"),
    )
    gx, gy = cell_center_exprs(rd)
    cx, cy = geo_to_cell_exprs(rd, gx, gy)
    out = df.select("x", "y", cx.alias("cx"), cy.alias("cy")).toPandas()
    assert (out["cx"] == out["x"]).all() and (out["cy"] == out["y"]).all()


def test_skewed_nearest_identity_and_vs_numpy(spark):
    """Nearest resample with a rotated source: identity on the same
    grid, and a rotated->axis-aligned remap equals the numpy brute
    force of the same floor(inverse(center)) rule."""
    rd = _rot_def(7, 5, 20.0)
    cells = _grid(spark, 7, 5, lambda x, y: x * 100 + y)
    out = resample(cells, rd, rd, "nearest").toPandas()
    src = cells.toPandas()
    m = out.merge(src, on=["x", "y", "band"], suffixes=("_o", "_s"))
    assert len(m) == len(src) and (m["val_o"] == m["val_s"]).all()

    # rotated source -> axis-aligned destination covering its bbox
    dst = RasterDef(12, 10, (2.0, 0.0, 0.0, 0.0, -2.0, 70.0))
    got = (
        resample(cells, rd, dst, "nearest")
        .toPandas()
        .set_index(["x", "y"])["val"]
        .to_dict()
    )
    a, b, c0, d, e, f0 = rd.affine
    det = a * e - b * d
    want = {}
    for y in range(10):
        for x in range(12):
            gx = (x + 0.5) * 2.0 + 0.0
            gy = 70.0 - (y + 0.5) * 2.0
            u = ((gx - c0) * e - (gy - f0) * b) / det
            v = ((gy - f0) * a - (gx - c0) * d) / det
            sx, sy = int(np.floor(u)), int(np.floor(v))
            if 0 <= sx < 7 and 0 <= sy < 5:
                want[(x, y)] = float(sx * 100 + sy)
    assert got == want


def test_fit_affine_gcps_exact_and_lstsq(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from pythongis_spark.raster.model import fit_affine_gcps

    true = (2.0, 0.5, 10.0, -0.25, 1.5, -20.0)
    rows = []
    for i in range(300):
        px, py = float(i % 20), float((i // 20) % 15)
        nx, ny = ((i % 7) - 3) / 16.0, ((i % 5) - 2) / 16.0
        rows.append((px, py,
                     true[0] * px + true[1] * py + true[2] + nx,
                     true[3] * px + true[4] * py + true[5] + ny))
    df = spark.createDataFrame(rows, "px double, py double, gx double, gy double")
    got = fit_affine_gcps(df)
    # numpy least squares oracle
    A = np.array([[r[0], r[1], 1.0] for r in rows])
    wx, *_ = np.linalg.lstsq(A, np.array([r[2] for r in rows]), rcond=None)
    wy, *_ = np.linalg.lstsq(A, np.array([r[3] for r in rows]), rcond=None)
    assert np.allclose(got, [*wx, *wy], atol=1e-9)

    # exact GCPs (no noise) recover the affine to fp precision
    ex = spark.createDataFrame(
        [(px, py, true[0]*px + true[1]*py + true[2],
          true[3]*px + true[4]*py + true[5])
         for px, py in [(0., 0.), (10., 0.), (0., 10.), (7., 3.)]],
        "px double, py double, gx double, gy double")
    assert np.allclose(fit_affine_gcps(ex), true, atol=1e-12)


def test_warp_gcps_identity_translation(spark):
    """GCPs encoding 'pixel (x+0.5, y+0.5) sits at world (x+3, y-2)'
    (unit scale, pure translation): nearest warp_gcps onto the matching
    world grid returns the original values shifted."""
    from pythongis_spark.raster.model import RasterDef, warp_gcps

    w, h = 8, 6
    cells = spark.createDataFrame(
        [(x, y, 0, float(x + 10 * y)) for y in range(h) for x in range(w)],
        "x int, y int, band int, val double")
    gcps = spark.createDataFrame(
        [(x + 0.5, y + 0.5, x + 3.0, y - 2.0)
         for x, y in [(0, 0), (7, 0), (0, 5), (4, 3)]],
        "px double, py double, gx double, gy double")
    # dst grid chosen so dst cell centers land exactly on the mapped
    # pixel centers: center of dst cell x is (x+0.5)+2.5 = x+3, the
    # world position of pixel center x+0.5
    dst = RasterDef(w, h, (1.0, 0.0, 2.5, 0.0, 1.0, -2.5))
    src = RasterDef(w, h, (1.0, 0.0, 0.0, 0.0, 1.0, 0.0))
    out = {(r["x"], r["y"]): r["val"]
           for r in warp_gcps(cells, src, dst, gcps).collect()}
    assert len(out) == w * h
    for y in range(h):
        for x in range(w):
            assert out[(x, y)] == float(x + 10 * y)
