"""Property-based tests (hypothesis) for the pure-numpy kernel — beyond
the reference's test strategy (it has no randomized testing, SURVEY §5)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pythongis_spark.geometry import core as G
from pythongis_spark.geometry import wkb as W
from pythongis_spark.index import quadkey as Q

coord = st.floats(-179.9, 179.9, allow_nan=False, width=64)
latc = st.floats(-89.9, 89.9, allow_nan=False, width=64)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(coord, latc), min_size=1, max_size=20))
def test_wkb_multipoint_roundtrip(pts):
    blob = W.wkb_multipoint(np.array(pts))
    t, parts = W.decode_wkb(blob)
    assert t == "MultiPoint"
    np.testing.assert_allclose(np.vstack(parts), np.array(pts))


@settings(max_examples=200, deadline=None)
@given(coord, latc, st.integers(0, Q.MAX_LEVEL))
def test_point_cell_within_bounds(lon, lat, z):
    cell = int(Q.cell_of_points(np.array([lon]), np.array([lat]), z)[0])
    xmin, ymin, xmax, ymax = Q.cell_bounds(cell, z)
    # 1e-9 tolerance: the (lon+180)/360 grid arithmetic rounds within 1
    # ulp of 180 (~3e-14), far below any cell width (≥ 5e-6° at z=26)
    tol = 1e-9
    assert xmin - tol <= lon < xmax + tol
    assert ymin - tol < lat <= ymax + tol


@settings(max_examples=100, deadline=None)
@given(st.integers(0, (1 << 26) - 1), st.integers(0, (1 << 26) - 1))
def test_morton_roundtrip_prop(tx, ty):
    code = Q.morton_encode(np.array([tx]), np.array([ty]))
    rx, ry = Q.morton_decode(code)
    assert (rx[0], ry[0]) == (tx, ty)


@settings(max_examples=100, deadline=None)
@given(
    st.floats(-170, 160, allow_nan=False),
    st.floats(-80, 70, allow_nan=False),
    st.floats(0.1, 10.0, allow_nan=False),
    st.lists(st.tuples(coord, latc), min_size=5, max_size=30),
)
def test_pip_matches_rect_membership(x0, y0, size, pts):
    """For an axis-aligned rectangle, ray-cast containment must equal
    plain coordinate comparison (strict interior)."""
    x1, y1 = x0 + size, y0 + size
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
    arr = np.array(pts)
    got = G.points_in_polygon(arr[:, 0], arr[:, 1], ("Polygon", [ring]))
    strict_in = (
        (arr[:, 0] > x0) & (arr[:, 0] < x1) & (arr[:, 1] > y0) & (arr[:, 1] < y1)
    )
    on_edge = (
        ((arr[:, 0] == x0) | (arr[:, 0] == x1)) & (arr[:, 1] >= y0) & (arr[:, 1] <= y1)
    ) | (
        ((arr[:, 1] == y0) | (arr[:, 1] == y1)) & (arr[:, 0] >= x0) & (arr[:, 0] <= x1)
    )
    mask = ~on_edge  # edge behavior is half-open by design; skip exact-edge pts
    assert (got[mask] == strict_in[mask]).all()


@settings(max_examples=100, deadline=None)
@given(
    st.floats(-150, 140, allow_nan=False),
    st.floats(-60, 50, allow_nan=False),
    st.floats(1.0, 20.0, allow_nan=False),
)
def test_clip_area_never_grows(x0, y0, size):
    ring = np.array(
        [[x0, y0], [x0 + size, y0], [x0 + size, y0 + size], [x0, y0 + size], [x0, y0]]
    )
    clipped = G.clip_ring_to_rect(ring, -10.0, -10.0, 10.0, 10.0)
    area = G.polygon_area(("Polygon", [ring]))
    if clipped is None:
        # no overlap with the clip window
        assert x0 >= 10 or y0 >= 10 or x0 + size <= -10 or y0 + size <= -10
    else:
        carea = G.polygon_area(("Polygon", [clipped]))
        assert carea <= area + 1e-9
        assert carea <= 20.0 * 20.0 + 1e-9


@settings(max_examples=50, deadline=None)
@given(coord, latc, coord, latc)
def test_haversine_symmetry_triangle(lon1, lat1, lon2, lat2):
    from pythongis_spark.geometry import geodesy

    d12 = float(geodesy.haversine_m(lon1, lat1, lon2, lat2))
    d21 = float(geodesy.haversine_m(lon2, lat2, lon1, lat1))
    assert abs(d12 - d21) < 1e-6
    assert d12 >= 0
    # no distance exceeds half the circumference: pi * 6371008.8 m =
    # 2.00151e7, so the bound must sit above that (2.001e7 was flaky
    # for near-antipodal pairs).
    assert d12 <= 2.002e7
