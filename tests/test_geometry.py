"""Unit tests for the pure-numpy geometry kernel (no Spark)."""

import numpy as np
import pytest

from pythongis_spark.geometry import core as G
from pythongis_spark.geometry import wkb as W
from pythongis_spark.geometry import geodesy


SQUARE = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
HOLE = np.array([[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]], dtype=float)


def test_wkb_point_roundtrip():
    blob = W.wkb_point(1.5, -2.25)
    t, coords = W.decode_wkb(blob)
    assert t == "Point"
    assert coords.tolist() == [[1.5, -2.25]]


def test_wkb_points_vectorized_matches_scalar():
    xs = np.array([0.0, 1.25, -179.99])
    ys = np.array([0.0, -45.5, 89.0])
    blobs = W.wkb_points_vectorized(xs, ys)
    assert blobs[1] == W.wkb_point(1.25, -45.5)
    assert all(len(b) == 21 for b in blobs)


def test_wkb_polygon_roundtrip_with_hole():
    blob = W.wkb_polygon(SQUARE, [HOLE])
    t, rings = W.decode_wkb(blob)
    assert t == "Polygon"
    assert len(rings) == 2
    np.testing.assert_allclose(rings[0], SQUARE)
    np.testing.assert_allclose(rings[1], HOLE)


def test_wkb_multipolygon_roundtrip():
    blob = W.wkb_multipolygon([(SQUARE, [HOLE]), (SQUARE + 10, [])])
    t, polys = W.decode_wkb(blob)
    assert t == "MultiPolygon"
    assert len(polys) == 2 and len(polys[0]) == 2 and len(polys[1]) == 1


def test_bbox():
    blob = W.wkb_polygon(SQUARE, [HOLE])
    assert W.geom_bbox(blob) == (0.0, 0.0, 4.0, 4.0)


def test_point_in_polygon_with_hole():
    geom = ("Polygon", [SQUARE, HOLE])
    px = np.array([2.0, 0.5, 5.0, 2.0])
    py = np.array([2.0, 0.5, 2.0, 0.5])
    # center is inside the hole -> out; (0.5,0.5) inside; (5,2) outside; (2,0.5) inside
    assert G.points_in_polygon(px, py, geom).tolist() == [False, True, False, True]


def test_point_in_multipolygon():
    geom = W.decode_wkb(W.wkb_multipolygon([(SQUARE, []), (SQUARE + 10, [])]))
    assert G.points_in_polygon(
        np.array([2.0, 12.0, 7.0]), np.array([2.0, 12.0, 7.0]), geom
    ).tolist() == [True, True, False]


def test_area_length_centroid():
    geom = ("Polygon", [SQUARE, HOLE])
    assert G.polygon_area(geom) == 16.0 - 4.0
    assert G.geom_length(geom) == 16.0 + 8.0
    cx, cy = G.geom_centroid(("Polygon", [SQUARE]))
    assert (cx, cy) == (2.0, 2.0)
    line = ("LineString", np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0]]))
    assert G.geom_length(line) == 4.0
    assert G.geom_centroid(line) == (1.5, 0.5)


def test_point_distance_to_polygon():
    geom = ("Polygon", [SQUARE])
    d = G.points_to_geom_dist(np.array([2.0, 6.0, -3.0]), np.array([2.0, 2.0, 0.0]), geom)
    np.testing.assert_allclose(d, [0.0, 2.0, 3.0])


def test_geoms_intersect():
    a = W.decode_wkb(W.wkb_polygon(SQUARE))
    b = W.decode_wkb(W.wkb_polygon(SQUARE + 2))  # overlapping
    c = W.decode_wkb(W.wkb_polygon(SQUARE + 10))  # disjoint
    d = W.decode_wkb(W.wkb_polygon(SQUARE * 0.25 + 1.0))  # fully inside a
    assert G.geoms_intersect(a, b)
    assert not G.geoms_intersect(a, c)
    assert G.geoms_intersect(a, d)
    line_in = ("LineString", np.array([[1.0, 1.0], [2.0, 2.0]]))
    line_out = ("LineString", np.array([[10.0, 1.0], [12.0, 2.0]]))
    assert G.geoms_intersect(a, line_in)
    assert not G.geoms_intersect(a, line_out)


def test_within():
    a = W.decode_wkb(W.wkb_polygon(SQUARE))
    small = W.decode_wkb(W.wkb_polygon(SQUARE * 0.25 + 1.0))
    cross = W.decode_wkb(W.wkb_polygon(SQUARE + 2))
    assert G.geom_within(small, a)
    assert not G.geom_within(cross, a)
    pt = ("Point", np.array([[2.0, 2.0]]))
    assert G.geom_within(pt, a)


def test_clip_ring_to_rect():
    out = G.clip_ring_to_rect(SQUARE, 2, 2, 10, 10)
    assert out is not None
    t = ("Polygon", [out])
    assert G.polygon_area(t) == 4.0  # overlap of [0,4]^2 with [2,10]^2
    assert G.clip_ring_to_rect(SQUARE, 10, 10, 20, 20) is None


def test_clip_line_to_rect():
    line = np.array([[-1.0, 2.0], [5.0, 2.0]])
    segs = G.clip_line_to_rect(line, 0, 0, 4, 4)
    assert len(segs) == 1
    np.testing.assert_allclose(segs[0], [[0.0, 2.0], [4.0, 2.0]])


def test_haversine_vs_vincenty():
    # Paris -> NYC approx 5837 km
    d_h = geodesy.haversine_m(2.35, 48.85, -74.0, 40.71)
    d_v = geodesy.vincenty_inverse_m(2.35, 48.85, -74.0, 40.71)
    assert 5.80e6 < d_h < 5.90e6
    assert 5.80e6 < d_v < 5.90e6
    assert abs(d_h - d_v) / d_v < 0.01
    # zero distance
    assert geodesy.vincenty_inverse_m(10.0, 50.0, 10.0, 50.0) == 0.0


def test_vincenty_direct_roundtrip():
    lon2, lat2 = geodesy.vincenty_direct(
        np.array([2.35]), np.array([48.85]), np.array([90.0]), np.array([100000.0])
    )
    d = geodesy.vincenty_inverse_m(2.35, 48.85, lon2[0], lat2[0])
    assert abs(d - 100000.0) < 1.0


def test_geodetic_area_zone_band_closed_form():
    """A lon/lat rectangle integrates to the EXACT spherical zone slice
    R²·Δλ·(sinφ₂−sinφ₁) under the Chamberlain–Duquette line integral."""
    import math

    R = geodesy.WGS84_AUTHALIC_R
    for lam1, lam2, phi1, phi2 in [(-180.0, 180.0, 30.0, 60.0),
                                   (10.0, 20.0, -45.0, -40.0),
                                   (0.0, 90.0, 0.0, 10.0)]:
        ring = np.array([[lam1, phi1], [lam2, phi1], [lam2, phi2],
                         [lam1, phi2], [lam1, phi1]])
        expect = (R * R * math.radians(lam2 - lam1)
                  * (math.sin(math.radians(phi2)) - math.sin(math.radians(phi1))))
        got = geodesy.cd_ring_area_m2(ring)
        assert abs(got - expect) / expect < 1e-12, (lam1, phi1)
    # the full 30°-60° band is the published spherical zone 2πR²Δsinφ
    band = geodesy.cd_ring_area_m2(np.array(
        [[-180.0, 30.0], [180.0, 30.0], [180.0, 60.0], [-180.0, 60.0],
         [-180.0, 30.0]]))
    assert abs(band - 2 * math.pi * R * R * (math.sin(math.radians(60))
                                             - math.sin(math.radians(30)))
               ) / band < 1e-12


def test_geodetic_area_holes_multipolygon_and_types():
    """Reference semantics (geography.py:68-102): |exterior| − Σ|holes|
    per part, parts summed, km² output; non-polygons → None."""
    ext = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
    hole = np.array([[0.25, 0.25], [0.75, 0.25], [0.75, 0.75],
                     [0.25, 0.75], [0.25, 0.25]], dtype=float)
    a_ext = geodesy.cd_ring_area_m2(ext) / 1e6
    a_hole = geodesy.cd_ring_area_m2(hole) / 1e6
    # ring orientation must not matter (reference takes abs per ring)
    assert geodesy.geodetic_area_km2(("Polygon", [ext[::-1]])) == a_ext
    got = geodesy.geodetic_area_km2(("Polygon", [ext, hole]))
    assert abs(got - (a_ext - a_hole)) < 1e-9
    # 1°×1° at the equator ≈ 111.19 km × 111.19 km ≈ 12364 km²
    assert 12000 < a_ext < 12700
    got_mp = geodesy.geodetic_area_km2(
        ("MultiPolygon", [[ext, hole], [ext + 5.0]]))
    a_ext5 = geodesy.cd_ring_area_m2(ext + 5.0) / 1e6
    assert abs(got_mp - (a_ext - a_hole + a_ext5)) < 1e-9
    assert geodesy.geodetic_area_km2(("LineString", ext)) is None
    assert geodesy.geodetic_area_km2(("Point", ext[:1])) is None


def test_geodetic_length_segments_and_types():
    line = np.array([[2.35, 48.85], [0.0, 45.0], [-5.0, 40.0]])
    got = geodesy.geodetic_length_m(("LineString", line))
    segs = geodesy.vincenty_inverse_m(
        line[:-1, 0], line[:-1, 1], line[1:, 0], line[1:, 1])
    assert abs(got - float(np.sum(segs))) < 1e-9
    got_ml = geodesy.geodetic_length_m(("MultiLineString", [line, line + 1.0]))
    assert got_ml > got
    assert geodesy.geodetic_length_m(("Point", line[:1])) == 0.0
    assert geodesy.geodetic_length_m(("Polygon", [SQUARE])) is None


def test_geodetic_length_reference_parity():
    """Per-segment Vincenty matches the reference's own pure-python
    `_vincenty_distance` (imported from the read-only tree as a
    behavioral oracle). The reference returns km rounded to 1e-6 km
    (1 mm) per segment, so parity holds to n_segments × 0.5 mm."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ref_helpers", "/root/reference/pythongis/vector/_helpers.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    line = np.array([[2.35, 48.85], [-74.0, 40.71], [-74.1, 40.8],
                     [139.69, 35.68]])
    ours_km = geodesy.geodetic_length_m(("LineString", line)) / 1000.0
    # _vincenty_distance expects (lat, lon) pairs (its doctest uses
    # boston=(42.35, -71.07)); the reference's geodetic_length feeds it
    # raw GeoJSON (lon, lat) pairs unswapped — we implement the
    # documented intent (Vincenty length of the lon/lat line), same
    # policy as the `align` divergence note
    theirs_km = sum(
        ref._vincenty_distance((line[i, 1], line[i, 0]),
                               (line[i + 1, 1], line[i + 1, 0]))
        for i in range(len(line) - 1))
    assert abs(ours_km - theirs_km) < 3 * 0.5e-6 + 1e-9


def test_great_circle_path():
    path = geodesy.great_circle_path(0.0, 0.0, 90.0, 0.0, segments=10)
    assert path.shape == (11, 2)
    np.testing.assert_allclose(path[0], [0, 0], atol=1e-9)
    np.testing.assert_allclose(path[-1], [90, 0], atol=1e-9)


def test_buffer_points_spark():
    # exercised through Spark in test suite via udfs; pure check of ring shape here
    import pandas as pd

    from pythongis_spark.geometry.udfs import _buffer_points_udf  # noqa: F401
    # kernel-level check: the generated ring is a closed 33-point circle
    from pythongis_spark.geometry import wkb as W
    import numpy as np

    ang = np.linspace(0.0, 2 * np.pi, 32, endpoint=False)
    ring = np.stack([1.0 + 2.0 * np.cos(ang), -1.0 + 2.0 * np.sin(ang)], axis=1)
    ring = np.vstack([ring, ring[:1]])
    blob = W.wkb_polygon(ring)
    t, rings = W.decode_wkb(blob)
    assert t == "Polygon" and len(rings[0]) == 33
    from pythongis_spark.geometry.core import polygon_area
    # area of 32-gon close to pi*r^2
    assert abs(polygon_area((t, rings)) - np.pi * 4) < 0.2
