"""Boundary-melding dissolve (reference cascaded_union analog for
touching polygons)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pythongis_spark.geometry import core as G
from pythongis_spark.geometry import wkb as W
from pythongis_spark.geometry.dissolve import dissolve, dissolve_touching, union_parts


def sq(x0, y0, x1, y1):
    return ("Polygon", [np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)])


def test_meld_two_adjacent_squares():
    out = dissolve_touching([sq(0, 0, 1, 1), sq(1, 0, 2, 1)])
    assert out[0] == "Polygon"
    assert len(out[1]) == 1
    assert G.polygon_area(out) == pytest.approx(2.0)
    # melded boundary: the shared edge is gone (4 corners + closing pt)
    assert len(out[1][0]) == 5


def test_meld_row_of_ten():
    row = [sq(i, 0, i + 1, 1) for i in range(10)]
    out = dissolve_touching(row)
    assert out[0] == "Polygon" and G.polygon_area(out) == pytest.approx(10.0)


def test_meld_ring_of_squares_creates_hole():
    cells = [(x, y) for x in range(3) for y in range(3) if (x, y) != (1, 1)]
    out = dissolve_touching([sq(x, y, x + 1, y + 1) for x, y in cells])
    assert out[0] == "Polygon"
    assert len(out[1]) == 2  # exterior + hole
    assert G.polygon_area(out) == pytest.approx(8.0)


def test_disjoint_stay_multipolygon():
    out = dissolve_touching([sq(0, 0, 1, 1), sq(5, 5, 6, 6)])
    assert out[0] == "MultiPolygon" and len(out[1]) == 2


def test_overlapping_raises_then_fallback():
    with pytest.raises(NotImplementedError):
        dissolve_touching([sq(0, 0, 2, 2), sq(1, 1, 3, 3)])
    parts = union_parts([sq(0, 0, 2, 2), sq(1, 1, 3, 3)])
    assert parts[0] == "MultiPolygon" and len(parts[1]) == 2


def test_dissolve_operator_zone_rows(spark):
    from pythongis_spark import fixtures as FX

    from pyspark.sql import functions as F

    zones = FX.oracle_zones(spark).withColumn(
        "row_id", F.floor(F.col("zone_id") / 10).cast("int")
    )
    out = dissolve(zones.select("row_id", "geom"), "row_id").toPandas()
    assert len(out) == 6
    assert (out["n_parts"] == 1).all()  # 10 adjacent rects meld into one
    for _, r in out.iterrows():
        g = W.decode_wkb(bytes(r["geom"]))
        assert G.polygon_area(g) == pytest.approx(360.0 * 30.0)
