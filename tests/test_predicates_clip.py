"""Boundary-aware predicates (within/covers/crosses/touches) and convex
polygon clipping (reference: pythongis/vector/manager.py:196,208-266)."""

from __future__ import annotations

import numpy as np
import pytest

from pythongis_spark.geometry import core as G
from pythongis_spark.geometry import wkb as W


def sq(x0, y0, x1, y1):
    return ("Polygon", [np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float
    )])


def ln(*pts):
    return ("LineString", np.array(pts, dtype=float))


def pt(x, y):
    return ("Point", np.array([[x, y]], dtype=float))


# ------------------------------------------------------------ within/covers

def test_within_allows_boundary_contact():
    outer = sq(0, 0, 10, 10)
    # inner square sharing the left edge of outer: shapely within == True
    inner = sq(0, 2, 4, 6)
    assert G.geom_within_covers(inner, outer, require_interior=True)
    assert G.geom_within_covers(inner, outer, require_interior=False)


def test_within_rejects_protruding():
    outer = sq(0, 0, 10, 10)
    poking = sq(-2, 2, 4, 6)  # crosses the left edge
    assert not G.geom_within_covers(poking, outer, require_interior=True)
    assert not G.geom_within_covers(poking, outer, require_interior=False)


def test_covers_vs_within_boundary_line():
    outer = sq(0, 0, 10, 10)
    edge_line = ln((0, 0), (0, 10))  # runs along the boundary
    # coveredby: yes (on closure); within: no (no interior intersection)
    assert G.geom_within_covers(edge_line, outer, require_interior=False)
    assert not G.geom_within_covers(edge_line, outer, require_interior=True)


def test_within_interior_line():
    outer = sq(0, 0, 10, 10)
    assert G.geom_within_covers(ln((1, 1), (9, 9)), outer, require_interior=True)
    assert not G.geom_within_covers(ln((1, 1), (11, 11)), outer, require_interior=True)


# ------------------------------------------------------------ crosses

def test_crosses_lines():
    assert G.geom_crosses(ln((0, 0), (10, 10)), ln((0, 10), (10, 0)))
    # touching at an endpoint is not crossing
    assert not G.geom_crosses(ln((0, 0), (5, 5)), ln((5, 5), (10, 0)))
    # collinear overlap is not crossing
    assert not G.geom_crosses(ln((0, 0), (10, 0)), ln((5, 0), (15, 0)))


def test_crosses_line_polygon():
    box = sq(0, 0, 10, 10)
    assert G.geom_crosses(ln((-5, 5), (15, 5)), box)       # passes through
    assert not G.geom_crosses(ln((1, 1), (9, 9)), box)     # fully inside
    assert not G.geom_crosses(ln((-5, -5), (-1, -1)), box)  # fully outside
    # polygons never cross polygons
    assert not G.geom_crosses(box, sq(5, 5, 15, 15))
    # points never cross
    assert not G.geom_crosses(pt(5, 5), box)


# ------------------------------------------------------------ touches

def test_touches_polygons():
    a = sq(0, 0, 10, 10)
    b = sq(10, 0, 20, 10)   # shared edge
    c = sq(5, 5, 15, 15)    # overlapping
    d = sq(10, 10, 20, 20)  # corner contact
    assert G.geom_touches(a, b)
    assert not G.geom_touches(a, c)
    assert G.geom_touches(a, d)


def test_touches_point_polygon():
    box = sq(0, 0, 10, 10)
    assert G.geom_touches(pt(0, 5), box)      # on boundary
    assert not G.geom_touches(pt(5, 5), box)  # interior
    assert not G.geom_touches(pt(20, 20), box)


def test_touches_lines():
    assert G.geom_touches(ln((0, 0), (5, 5)), ln((5, 5), (10, 0)))  # endpoint
    assert not G.geom_touches(ln((0, 0), (10, 10)), ln((0, 10), (10, 0)))  # cross
    assert not G.geom_touches(ln((0, 0), (10, 0)), ln((5, 0), (15, 0)))  # overlap


def test_point_touches_closed_line_ring():
    """A closed LineString has an EMPTY boundary (DE-9IM mod-2 rule):
    a point at its start/end vertex meets line INTERIOR → not touches
    (shapely agrees); an open line's endpoint still touches."""
    ring = ("LineString",
            np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float))
    assert not G.geom_touches(pt(0, 0), ring)   # ring start == interior
    assert not G.geom_touches(pt(10, 0), ring)  # mid-ring vertex
    open_l = ln((0, 0), (10, 0), (10, 10))
    assert G.geom_touches(pt(0, 0), open_l)     # true endpoint


def test_touches_lines_interior_contact_de9im():
    """T/V contacts at a vertex interior to BOTH lines have
    interior∩interior ≠ ∅ → shapely classifies them as NOT touches."""
    # T: endpoint of B on interior of A — boundary∩interior → touches
    assert G.geom_touches(ln((0, 0), (10, 0)), ln((5, 0), (5, 5)))
    # V at interior vertices of both: A bends at (5,0), B bends at (5,0)
    a = ("LineString", np.array([[0, 0], [5, 0], [5, 5]], dtype=float))
    b = ("LineString", np.array([[0, 2], [5, 0], [10, 2]], dtype=float))
    assert not G.geom_touches(a, b)
    # interior vertex of B on interior (non-vertex) of A's segment
    c = ("LineString", np.array([[0, 2], [5, 0], [10, 2]], dtype=float))
    assert not G.geom_touches(ln((0, 0), (10, 0)), c)
    # both endpoints meeting — still touches
    assert G.geom_touches(ln((0, 0), (5, 0)), ln((5, 0), (5, 5)))


# ------------------------------------------------------------ convex clip

def test_clip_ring_to_convex_triangle():
    tri = np.array([[0, 0], [10, 0], [0, 10], [0, 0]], dtype=float)
    ring = np.array([[2, 2], [8, 2], [8, 8], [2, 8], [2, 2]], dtype=float)
    out = G.clip_ring_to_convex(ring, tri)
    assert out is not None
    # square [2,8]^2 (area 36) minus the triangle above x+y=10, which has
    # vertices (2,8),(8,2),(8,8) -> area 18
    area = abs(G.ring_signed_area(out))
    assert area == pytest.approx(18.0)


def test_clip_matches_rect_path():
    ring = np.array([[2, 2], [14, 2], [14, 9], [2, 9], [2, 2]], dtype=float)
    rect = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    a = G.clip_ring_to_rect(ring, 0, 0, 10, 10)
    b = G.clip_ring_to_convex(ring, rect)
    assert a is not None and b is not None
    assert abs(G.ring_signed_area(a)) == pytest.approx(abs(G.ring_signed_area(b)))


def test_geom_intersection_convex_types():
    box = sq(0, 0, 10, 10)
    # point in / out
    assert G.geom_intersection_convex(pt(5, 5), box)[0] == "Point"
    assert G.geom_intersection_convex(pt(50, 5), box) is None
    # line clipped
    res = G.geom_intersection_convex(ln((-5, 5), (15, 5)), box)
    assert res[0] == "LineString"
    assert np.allclose(res[1][0], [0, 5]) and np.allclose(res[1][-1], [10, 5])
    # polygon clipped to overlap region
    res = G.geom_intersection_convex(sq(5, 5, 15, 15), box)
    assert res[0] == "Polygon"
    assert abs(G.ring_signed_area(res[1][0])) == pytest.approx(25.0)
    # disjoint polygon -> None
    assert G.geom_intersection_convex(sq(50, 50, 60, 60), box) is None
    # concave clip raises
    concave = ("Polygon", [np.array(
        [[0, 0], [10, 0], [10, 10], [5, 2], [0, 10], [0, 0]], dtype=float
    )])
    with pytest.raises(NotImplementedError):
        G.geom_intersection_convex(sq(1, 1, 2, 2), concave)


def test_encode_decode_roundtrip():
    geoms = [
        pt(1.5, -2.5),
        ln((0, 0), (1, 1), (2, 0)),
        sq(0, 0, 4, 4),
        ("MultiPoint", np.array([[0, 0], [1, 1]], dtype=float)),
        ("MultiLineString", [np.array([[0, 0], [1, 1]], dtype=float),
                             np.array([[2, 2], [3, 3]], dtype=float)]),
    ]
    for g in geoms:
        rt = W.decode_wkb(W.encode_wkb(g))
        assert rt[0] == g[0]
        assert np.allclose(W.all_coords(rt), W.all_coords(g))


def test_within_identical_polygons():
    """shapely parity: poly.within(poly) is True — a 2D interior
    contained in b cannot avoid b's interior even when the boundaries
    coincide exactly (regression: the boundary-only probe set used to
    fail the interior demand here)."""
    s = sq(0, 0, 10, 10)
    assert G.geom_within_covers(s, s, require_interior=True)
    assert G.geom_within_covers(s, s, require_interior=False)


def test_predicate_family_shapely_parity_edge_cases():
    """Spot-matrix of boundary configurations against shapely-known
    truths (the configurations most likely to hide parity bugs — the
    identical-polygon within bug lived here)."""
    s = sq(0, 0, 10, 10)
    assert not G.geom_touches(s, s)                       # interiors meet
    assert not G.geom_touches(s, sq(5, 5, 15, 15))        # overlap
    assert G.geom_touches(s, sq(10, 10, 20, 20))          # corner only
    assert not G.geom_touches(s, sq(2, 2, 8, 8))          # contained
    assert not G.geom_touches(s, sq(0, 2, 5, 8))          # contained, shared edge
    assert not G.geom_within_covers(pt(0, 5), s, require_interior=True)
    assert G.geom_within_covers(pt(0, 5), s, require_interior=False)
    assert G.geom_within_covers(pt(5, 5), s, require_interior=True)
    assert not G.geom_crosses(s, sq(5, 5, 15, 15))        # area x area never crosses
