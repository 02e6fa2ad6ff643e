"""simplify/clean, buffer, cut (reference manager.py:576-610,726-830)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pythongis_spark.geometry import core as G
from pythongis_spark.geometry import edit as E
from pythongis_spark.geometry import wkb as W


def test_simplify_repeat_points():
    line = ("LineString", np.array([[0, 0], [0, 0], [1, 1], [1, 1], [2, 2]], float))
    s = E.simplify_geom(line, 0)
    assert len(s[1]) == 3


def test_simplify_douglas_peucker():
    # nearly-straight line with a tiny kink: tolerance removes it
    line = ("LineString", np.array([[0, 0], [5, 0.01], [10, 0]], float))
    s = E.simplify_geom(line, 0.1)
    assert len(s[1]) == 2
    s2 = E.simplify_geom(line, 0.001)
    assert len(s2[1]) == 3  # below tolerance -> kept


def test_simplify_polygon_hole_collapse():
    ext = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    tiny = np.array([[5, 5], [5.001, 5], [5.001, 5.001], [5, 5.001], [5, 5]], float)
    g = ("Polygon", [ext, tiny])
    s = E.simplify_geom(g, 0.01)
    assert s[0] == "Polygon" and len(s[1]) == 1  # hole collapsed away


def test_buffer_point_circle_area():
    g = ("Point", np.array([[3.0, 4.0]]))
    b = E.buffer_geom(g, 2.0, resolution=256)
    assert b[0] == "Polygon"
    assert abs(G.polygon_area(b)) == pytest.approx(math.pi * 4, rel=1e-3)


def test_buffer_convex_polygon_positive_round():
    sq = ("Polygon", [np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)])
    b = E.buffer_geom(sq, 1.0, resolution=512)
    # area = 100 + perimeter*d + pi*d^2
    assert G.polygon_area(b) == pytest.approx(100 + 40 + math.pi, rel=1e-3)
    flat = E.buffer_geom(sq, 1.0, join_style="flat")
    # bevel joins: corner arcs replaced by triangles (area d^2/2 each * ... )
    assert G.polygon_area(flat) == pytest.approx(100 + 40 + 2.0, rel=1e-9)


def test_buffer_negative_inset():
    sq = ("Polygon", [np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)])
    b = E.buffer_geom(sq, -2.0)
    assert G.polygon_area(b) == pytest.approx(36.0)
    gone = E.buffer_geom(sq, -6.0)
    assert gone is None


def test_buffer_segment_capsule():
    seg = ("LineString", np.array([[0, 0], [10, 0]], float))
    b = E.buffer_geom(seg, 1.0, resolution=512)
    assert G.polygon_area(b) == pytest.approx(20 + math.pi, rel=1e-3)


def test_buffer_concave_now_supported():
    # V-notch polygon (deep reflex at (5,2)) — formerly raised; the
    # offset-ring + distance-select path handles it (tests/test_boolean.py
    # covers the L-shape analytics; here sanity-check topology + bounds)
    concave = ("Polygon", [np.array(
        [[0, 0], [10, 0], [10, 10], [5, 2], [0, 10], [0, 0]], float)])
    b = E.buffer_geom(concave, 0.5, resolution=64)
    assert b is not None
    a0 = G.polygon_area(concave)
    assert a0 < G.polygon_area(b) < a0 + 0.5 * 60  # < A + P·d bound
    inner = E.buffer_geom(concave, -0.5, resolution=64)
    assert inner is not None and G.polygon_area(inner) < a0


def test_cut_by_line():
    sq = ("Polygon", [np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)])
    pieces = E.cut_by_line(sq, (5, -1), (5, 11))
    assert len(pieces) == 2
    areas = sorted(abs(G.polygon_area(p)) for p in pieces)
    assert areas == [pytest.approx(50.0), pytest.approx(50.0)]
    # line missing the polygon -> single piece
    same = E.cut_by_line(sq, (50, 0), (50, 10))
    assert len(same) == 1
    assert abs(G.polygon_area(same[0])) == pytest.approx(100.0)


def test_udf_wrappers(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from pythongis_spark.geometry.udfs import st_buffer, st_simplify

    df = spark.createDataFrame(
        pd.DataFrame({"fid": [1], "geom": [W.wkb_polygon(
            np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float))]})
    )
    out = df.withColumn("buf", st_buffer(1.0, resolution=256)("geom")).withColumn(
        "simp", st_simplify(0.0)("geom")
    ).collect()[0]
    bg = W.decode_wkb(bytes(out["buf"]))
    assert G.polygon_area(bg) == pytest.approx(16 + 16 + math.pi, rel=1e-3)
    assert W.decode_wkb(bytes(out["simp"]))[0] == "Polygon"


def test_cut_by_line_concave_no_bridging():
    # U-shape cut horizontally through both arms: the upper half must be
    # TWO separate pieces (the old Sutherland-Hodgman path bridged them)
    u = ("Polygon", [np.array(
        [[0, 0], [12, 0], [12, 10], [8, 10], [8, 3], [4, 3], [4, 10],
         [0, 10], [0, 0]], float)])
    pieces = E.cut_by_line(u, (-1, 5), (13, 5))
    areas = sorted(round(abs(G.polygon_area(p)), 6) for p in pieces)
    # below y=5: 12*3 + two arm stubs 4..5 → 36 + 2*(4*2) = 52
    # above: two arms 4x5 each = 20, 20
    assert len(pieces) == 3
    assert areas == [pytest.approx(20.0), pytest.approx(20.0), pytest.approx(52.0)]


def test_cut_by_polyline_bent_path():
    sq = ("Polygon", [np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)])
    # staircase polyline: enters left at y=4, bends at (5,4)->(5,8), exits right at y=8
    pieces = E.cut_by_polyline(sq, [(-2, 4), (5, 4), (5, 8), (12, 8)])
    assert len(pieces) == 2
    areas = sorted(abs(G.polygon_area(p)) for p in pieces)
    # lower-right side: y<4 strip (40) + x>5,4<y<8 (20) = 60; other = 40
    assert areas == [pytest.approx(40.0), pytest.approx(60.0)]
    # total preserved
    assert sum(areas) == pytest.approx(100.0)


def test_cut_by_polyline_concave_multi_piece():
    u = ("Polygon", [np.array(
        [[0, 0], [12, 0], [12, 10], [8, 10], [8, 3], [4, 3], [4, 10],
         [0, 10], [0, 0]], float)])
    pieces = E.cut_by_polyline(u, [(-1, 5), (13, 5)])
    assert len(pieces) == 3
    total = sum(abs(G.polygon_area(p)) for p in pieces)
    assert total == pytest.approx(92.0)  # U area = 120 - 28 notch


# ------------------------------------------------------------ clean/repair


def test_repair_bowtie_keeps_ccw_lobe():
    """Classic crossed bowtie: the counterclockwise-wound lobe survives,
    the reverse-wound one is dropped (GEOS buffer(0) behavior)."""
    import numpy as np

    from pythongis_spark.geometry import boolean as BO
    from pythongis_spark.geometry import core as G

    ring = np.array([[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]], dtype=float)
    geom = ("Polygon", [ring])
    assert not BO.polygon_is_valid(geom)
    rep = BO.repair_polygon(geom)
    assert rep is not None and rep[0] == "Polygon" and len(rep[1]) == 1
    out = rep[1][0]
    assert G.ring_signed_area(out) == 1.0
    assert {tuple(p) for p in out[:-1]} == {(0.0, 0.0), (0.0, 2.0), (1.0, 1.0)}


def test_repair_self_touch_two_lobes():
    """A pinched ring with two same-winding lobes keeps BOTH as a
    MultiPolygon (no crossing, just a shared vertex)."""
    import numpy as np

    from pythongis_spark.geometry import boolean as BO
    from pythongis_spark.geometry import core as G

    ring = np.array([[0, 0], [2, 0], [1, 1], [2, 2], [0, 2], [1, 1], [0, 0]],
                    dtype=float)
    rep = BO.repair_polygon(("Polygon", [ring]))
    assert rep is not None and rep[0] == "MultiPolygon"
    areas = sorted(abs(G.ring_signed_area(p[0])) for p in rep[1])
    assert areas == [1.0, 1.0]


def test_repair_hole_poking_outside():
    """A hole extending past its exterior is trimmed to the contained
    part: kept area = |ext| − |hole ∩ ext|."""
    import numpy as np

    from pythongis_spark.geometry import boolean as BO
    from pythongis_spark.geometry import core as G

    ext = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    hole = np.array([[2, 1], [2, 3], [6, 3], [6, 1], [2, 1]], dtype=float)  # CW
    geom = ("Polygon", [ext, hole])
    assert not BO.polygon_is_valid(geom)
    rep = BO.repair_polygon(geom)
    assert rep is not None
    assert G.polygon_area(rep) == 12.0


def test_clean_geom_pipeline_and_validity():
    import numpy as np

    from pythongis_spark.geometry import boolean as BO
    from pythongis_spark.geometry import core as G
    from pythongis_spark.geometry.edit import clean_geom

    ext = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    hole = np.array([[1, 1], [1, 2], [2, 2], [2, 1], [1, 1]], dtype=float)
    valid = ("Polygon", [ext, hole])
    assert BO.polygon_is_valid(valid)
    out = clean_geom(valid, 0.0)
    assert G.polygon_area(out) == G.polygon_area(valid)

    # repeat points removed AND bowtie repaired in one pass
    bow = np.array([[0, 0], [0, 0], [2, 2], [2, 0], [2, 0], [0, 2], [0, 0]],
                   dtype=float)
    out = clean_geom(("Polygon", [bow]), 0.0)
    assert out is not None and G.polygon_area(out) == 1.0
    # a zero-area sliver is unrepairable -> dropped
    line_ring = np.array([[0, 0], [2, 0], [0, 0], [2, 0], [0, 0]], dtype=float)
    assert clean_geom(("Polygon", [line_ring]), 0.0) is None
