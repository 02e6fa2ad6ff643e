"""rasterize priority/partial modes and merged-mode vectorize
(reference: pythongis/raster/manager.py:933-972, 1076-1142)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pythongis_spark.geometry import core as G
from pythongis_spark.geometry import wkb as W
from pythongis_spark.raster.model import RasterDef
from pythongis_spark.raster.zonal import (
    _trace_region_rings,
    rasterize,
    vectorize_merged,
)

RD = RasterDef(10, 10, (1.0, 0.0, 0.0, 0.0, -1.0, 10.0))


def _rect(x0, y0, x1, y1):
    return W.wkb_polygon(
        np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)
    )


def test_rasterize_priority(spark):
    # two overlapping rectangles; priority picks the higher-priority one
    feats = spark.createDataFrame(
        pd.DataFrame(
            {
                "fid": [1, 2],
                "v": [10.0, 20.0],
                "pri": [1, 5],
                "geom": [_rect(0, 0, 6, 10), _rect(4, 0, 10, 10)],
            }
        )
    )
    out = rasterize(
        feats, RD, valuekey="v", stat="sum", priority_col="pri"
    ).toPandas().set_index(["x", "y"])["val"]
    # overlap zone x in [4,6): only feature 2 (pri 5) survives
    assert out[(4, 5)] == 20.0 and out[(5, 5)] == 20.0
    assert out[(1, 5)] == 10.0 and out[(8, 5)] == 20.0


def test_rasterize_partial_weights(spark):
    # rectangle covering half of the border cells: partial weights by
    # covered fraction; total mass == exact geometric area * value
    feats = spark.createDataFrame(
        pd.DataFrame({"fid": [1], "v": [2.0], "geom": [_rect(0.5, 0.5, 3.5, 3.5)]})
    )
    out = rasterize(feats, RD, valuekey="v", stat="sum", partial=True).toPandas()
    total = out["val"].sum()
    assert total == pytest.approx(2.0 * 9.0)  # area 3x3
    got = out.set_index(["x", "y"])["val"]
    # interior cell fully covered
    assert got[(1, 7)] == pytest.approx(2.0)
    # corner cell quarter covered
    assert got[(0, 9)] == pytest.approx(0.5)
    # without partial, center-rule drops the half-covered border cells
    strict = rasterize(feats, RD, valuekey="v", stat="sum").toPandas()
    assert len(strict) < len(out)


def test_trace_simple_square():
    rings = _trace_region_rings({(0, 0), (1, 0), (0, 1), (1, 1)})
    assert len(rings) == 1
    assert abs(G.ring_signed_area(rings[0])) == pytest.approx(4.0)


def test_trace_region_with_hole():
    cells = {(x, y) for x in range(3) for y in range(3)} - {(1, 1)}
    rings = _trace_region_rings(cells)
    areas = sorted(G.ring_signed_area(r) for r in rings)
    assert len(rings) == 2
    assert areas[1] == pytest.approx(9.0)   # exterior CCW
    assert areas[0] == pytest.approx(-1.0)  # hole CW


def test_trace_pinch_vertex():
    # U-shape folded to touch diagonally: {(0,0),(1,1)} not 4-connected,
    # but {(0,0),(1,0),(1,1)} pinches nothing; use the classic diagonal
    # double-lobe within one edge set
    rings = _trace_region_rings({(0, 0), (1, 1)})
    # two separate loops, one per lobe (no crossing)
    assert len(rings) == 2
    for r in rings:
        assert abs(G.ring_signed_area(r)) == pytest.approx(1.0)


def test_vectorize_merged(spark):
    # two regions of value 1 (L-shape + distant square) and one of value 2
    rows = []
    lshape = [(0, 0), (0, 1), (1, 1)]
    far = [(5, 5), (6, 5)]
    other = [(3, 3)]
    for x, y in lshape + far:
        rows.append((x, y, 0, 1.0))
    for x, y in other:
        rows.append((x, y, 0, 2.0))
    cells = spark.createDataFrame(rows, "x INT, y INT, band INT, val DOUBLE")
    out = vectorize_merged(cells, RD).toPandas()
    assert len(out) == 3
    by_val = out.groupby("val")["n_cells"].sum()
    assert by_val[1.0] == 5 and by_val[2.0] == 1
    for _, r in out.iterrows():
        g = W.decode_wkb(bytes(r["geom"]))
        assert G.polygon_area(g) == pytest.approx(float(r["n_cells"]))


def test_vectorize_merged_hole(spark):
    rows = [
        (x, y, 0, 7.0)
        for x in range(3)
        for y in range(3)
        if not (x == 1 and y == 1)
    ]
    cells = spark.createDataFrame(rows, "x INT, y INT, band INT, val DOUBLE")
    out = vectorize_merged(cells, RD).toPandas()
    assert len(out) == 1
    g = W.decode_wkb(bytes(out.iloc[0]["geom"]))
    assert g[0] == "Polygon" and len(g[1]) == 2  # exterior + hole
    assert G.polygon_area(g) == pytest.approx(8.0)


def test_distance_raster_exact_vs_brute(spark):
    from pythongis_spark.raster.zonal import distance_raster

    rd = RasterDef(12, 8, (1.0, 0.0, 0.0, 0.0, -1.0, 8.0))
    feats = spark.createDataFrame(
        pd.DataFrame(
            {
                "fid": [1, 2],
                "geom": [
                    W.wkb_point(2.5, 5.5),   # cell (2, 2)
                    _rect(8, 1, 10, 3),       # cells x 8..9, y 5..6
                ],
            }
        )
    )
    out = distance_raster(feats, rd).toPandas().set_index(["x", "y"])["val"]
    # brute force: occupied set from the same rasterize rule
    from pythongis_spark.raster.zonal import rasterize

    occ = rasterize(feats, rd, stat="count").toPandas()
    occ_set = list(zip(occ["x"], occ["y"]))
    assert len(out) == 12 * 8
    for x in range(12):
        for y in range(8):
            want = min(
                np.hypot(float(x - ox), float(y - oy)) for ox, oy in occ_set
            )
            assert out[(x, y)] == pytest.approx(want, abs=1e-9), (x, y)


def test_distance_raster_anisotropic(spark):
    from pythongis_spark.raster.zonal import distance_raster

    rd = RasterDef(6, 6, (2.0, 0.0, 0.0, 0.0, -1.0, 6.0))  # 2x1 cells
    feats = spark.createDataFrame(
        pd.DataFrame({"fid": [1], "geom": [W.wkb_point(1.0, 5.5)]})  # cell (0,0)
    )
    out = distance_raster(feats, rd).toPandas().set_index(["x", "y"])["val"]
    assert out[(0, 0)] == 0.0
    assert out[(3, 0)] == pytest.approx(6.0)   # 3 cells * 2.0 wide
    assert out[(0, 4)] == pytest.approx(4.0)   # 4 cells * 1.0 tall
    assert out[(3, 4)] == pytest.approx(np.hypot(6.0, 4.0))


def test_giant_feature_window_split(spark):
    """A polygon covering the whole grid must be split into tile windows
    before the cover UDF — no single UDF row may evaluate the full grid
    (the 100TB giant-feature guard). Results must equal the unsplit
    cover set."""
    import numpy as np
    from pythongis_spark.geometry import wkb as W
    from pythongis_spark.raster import zonal as Z
    from pythongis_spark.raster.model import RasterDef

    rd = RasterDef(width=360, height=180,
                   affine=(1.0, 0.0, -180.0, 0.0, -1.0, 90.0))
    ring = np.array([[-200, -100], [200, -100], [200, 100], [-200, 100],
                     [-200, -100]], dtype=float)
    import pandas as pd
    pdf = pd.DataFrame({"zid": [7], "geom": [W.wkb_polygon(ring)]})
    df = spark.createDataFrame(pdf)

    # with a small cap, the split must produce many windows
    split = Z._window_split(df, rd, "geom", cell_cap=1024)  # tile=32
    n_windows = split.count()
    assert n_windows == (360 // 32 + (360 % 32 > 0)) * (180 // 32 + (180 % 32 > 0))
    # windowed cover == full grid, no dups
    cells = Z.cover_cells(df, rd, "geom", cell_cap=1024)
    assert cells.count() == 360 * 180
    assert cells.select("x", "y").distinct().count() == 360 * 180
    # partial mode: interior weights 1.0, count matches too
    w = Z.cover_cells(df, rd, "geom", partial=True, cell_cap=1024)
    row = w.agg(F.count("*").alias("n"), F.min("w").alias("mn"),
                F.max("w").alias("mx")).collect()[0]
    assert row["n"] == 360 * 180 and row["mn"] == 1.0 and row["mx"] == 1.0


def test_window_split_small_feature_single_window(spark):
    import numpy as np
    import pandas as pd
    from pythongis_spark.geometry import wkb as W
    from pythongis_spark.raster import zonal as Z
    from pythongis_spark.raster.model import RasterDef

    rd = RasterDef(width=360, height=180,
                   affine=(1.0, 0.0, -180.0, 0.0, -1.0, 90.0))
    ring = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    df = spark.createDataFrame(
        pd.DataFrame({"zid": [1], "geom": [W.wkb_polygon(ring)]})
    )
    assert Z._window_split(df, rd, "geom", Z.DEFAULT_COVER_CELL_CAP).count() == 1
    assert Z.cover_cells(df, rd, "geom").count() == 100
