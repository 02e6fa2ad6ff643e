"""Planar geometry algorithms, numpy-vectorized.

From-scratch replacements for the shapely calls the reference makes
(``pythongis/vector/geometry.py:64-122``): point-in-polygon, area/length/
centroid, predicates, distances, rectangle clipping. Everything is
vectorized over *points* (the big side of every join); polygon-side loops
run over small dimension tables only.

Determinism note: all predicates use pure IEEE-754 double arithmetic with
a fixed evaluation order, so results are identical across partitionings
and cluster sizes.
"""

from __future__ import annotations

import numpy as np

from pythongis_spark.geometry import wkb as W


# ------------------------------------------------------------- containment

def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd ray-cast crossing parity of N points vs one ring.

    Vectorized over points; loop-free over edges via broadcasting when the
    ring is small, edge-chunked otherwise.
    """
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    inside = np.zeros(len(px), dtype=bool)
    # chunk edges to bound the (points x edges) broadcast matrix
    n_edges = len(x0)
    max_cells = 4_000_000
    step = max(1, max_cells // max(len(px), 1))
    for s in range(0, n_edges, step):
        ax0, ay0 = x0[s : s + step], y0[s : s + step]
        ax1, ay1 = x1[s : s + step], y1[s : s + step]
        pyc = py[:, None]
        pxc = px[:, None]
        cond = (ay0 > pyc) != (ay1 > pyc)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = ax0 + (pyc - ay0) / (ay1 - ay0) * (ax1 - ax0)
        cross = cond & (pxc < xint)
        inside ^= (cross.sum(axis=1) % 2).astype(bool)
    return inside


def points_in_polygon(px: np.ndarray, py: np.ndarray, geom) -> np.ndarray:
    """Even-odd containment of N points in a Polygon/MultiPolygon.

    Holes are handled by parity (a point inside exterior and inside a hole
    crosses an even number of ring edges). Matches the semantics the
    reference gets from shapely ``contains`` for interior points
    (``pythongis/vector/manager.py:414``); boundary points are resolved by
    crossing parity (callers keep test coordinates off edges).
    """
    inside = np.zeros(len(px), dtype=bool)
    for ring in W.iter_rings(geom):
        inside ^= points_in_ring(px, py, ring)
    return inside


def points_in_polygon_wkb(px, py, poly_wkb: bytes) -> np.ndarray:
    return points_in_polygon(
        np.asarray(px, dtype=np.float64),
        np.asarray(py, dtype=np.float64),
        W.decode_wkb(poly_wkb),
    )


# ------------------------------------------------------------- measures

def ring_signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area (CCW positive)."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def polygon_area(geom) -> float:
    """Planar area, holes subtracted — shapely-``area`` equivalent
    (``pythongis/vector/data.py:315``)."""
    total = 0.0
    for rings in W.iter_polygons(geom):
        total += abs(ring_signed_area(rings[0]))
        for hole in rings[1:]:
            total -= abs(ring_signed_area(hole))
    return total


def line_length(coords: np.ndarray) -> float:
    d = np.diff(coords, axis=0)
    return float(np.sqrt((d**2).sum(axis=1)).sum())


def geom_length(geom) -> float:
    """Planar length — shapely-``length`` equivalent
    (``pythongis/vector/data.py:318``)."""
    t, payload = geom
    if t == "LineString":
        return line_length(payload)
    if t == "MultiLineString":
        return sum(line_length(c) for c in payload)
    if t in ("Polygon", "MultiPolygon"):
        return sum(line_length(r) for r in W.iter_rings(geom))
    return 0.0


def geom_centroid(geom) -> tuple[float, float]:
    """Area/length/point-weighted centroid (matches GEOS semantics for the
    common cases used by ``pythongis/vector/converter.py:46``)."""
    t, payload = geom
    if t == "Point":
        return float(payload[0, 0]), float(payload[0, 1])
    if t == "MultiPoint":
        coords = W.all_coords(geom)
        return float(coords[:, 0].mean()), float(coords[:, 1].mean())
    if t in ("LineString", "MultiLineString"):
        lines = [payload] if t == "LineString" else payload
        wsum = 0.0
        cx = cy = 0.0
        for coords in lines:
            mids = 0.5 * (coords[:-1] + coords[1:])
            lens = np.sqrt((np.diff(coords, axis=0) ** 2).sum(axis=1))
            wsum += lens.sum()
            cx += float((mids[:, 0] * lens).sum())
            cy += float((mids[:, 1] * lens).sum())
        if wsum == 0:
            coords = W.all_coords(geom)
            return float(coords[:, 0].mean()), float(coords[:, 1].mean())
        return cx / wsum, cy / wsum
    # polygonal: ring-weighted shoelace centroid, holes negative
    asum = cx = cy = 0.0
    for rings in W.iter_polygons(geom):
        for i, ring in enumerate(rings):
            x, y = ring[:-1, 0], ring[:-1, 1]
            x1, y1 = ring[1:, 0], ring[1:, 1]
            cross = x * y1 - x1 * y
            a = 0.5 * float(cross.sum())
            sign = 1.0 if i == 0 else -1.0
            a = abs(a) * sign
            if cross.sum() == 0:
                continue
            scale = a / (0.5 * float(cross.sum()))
            cx += scale * float(((x + x1) * cross).sum()) / 6.0
            cy += scale * float(((y + y1) * cross).sum()) / 6.0
            asum += a
    if asum == 0:
        coords = W.all_coords(geom)
        return float(coords[:, 0].mean()), float(coords[:, 1].mean())
    return cx / asum, cy / asum


# ------------------------------------------------------------- distances

def points_to_segments_dist(px, py, seg: np.ndarray) -> np.ndarray:
    """Min distance from N points to the polyline ``seg`` ((M,2) coords).

    Vectorized (points x edges) with chunking.
    """
    a = seg[:-1]
    b = seg[1:]
    ab = b - a
    ab2 = (ab**2).sum(axis=1)
    ab2 = np.where(ab2 == 0, 1.0, ab2)
    best = np.full(len(px), np.inf)
    n_edges = len(a)
    max_cells = 4_000_000
    step = max(1, max_cells // max(len(px), 1))
    p = np.stack([px, py], axis=1)
    for s in range(0, n_edges, step):
        aa, bb = a[s : s + step], ab[s : s + step]
        t = ((p[:, None, :] - aa[None, :, :]) * bb[None, :, :]).sum(-1) / ab2[
            None, s : s + step
        ]
        t = np.clip(t, 0.0, 1.0)
        proj = aa[None, :, :] + t[:, :, None] * bb[None, :, :]
        d2 = ((p[:, None, :] - proj) ** 2).sum(-1)
        best = np.minimum(best, d2.min(axis=1))
    return np.sqrt(best)


def points_to_geom_dist(px, py, geom) -> np.ndarray:
    """Planar distance from N points to a geometry (0 inside polygons)."""
    t, payload = geom
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    if t in ("Point", "MultiPoint"):
        coords = W.all_coords(geom)
        d2 = (px[:, None] - coords[None, :, 0]) ** 2 + (
            py[:, None] - coords[None, :, 1]
        ) ** 2
        return np.sqrt(d2.min(axis=1))
    if t in ("LineString", "MultiLineString"):
        lines = [payload] if t == "LineString" else payload
        best = np.full(len(px), np.inf)
        for coords in lines:
            best = np.minimum(best, points_to_segments_dist(px, py, coords))
        return best
    # polygonal
    best = np.full(len(px), np.inf)
    for ring in W.iter_rings(geom):
        best = np.minimum(best, points_to_segments_dist(px, py, ring))
    inside = points_in_polygon(px, py, geom)
    best[inside] = 0.0
    return best


# ------------------------------------------------------------- predicates

def bbox_intersects(a, b) -> bool:
    return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])


def _segments_intersect_any(A: np.ndarray, B: np.ndarray) -> bool:
    """True if any segment of polyline A properly/improperly intersects any
    segment of polyline B (orientation tests, vectorized pairwise)."""
    a0, a1 = A[:-1], A[1:]
    b0, b1 = B[:-1], B[1:]

    def cross(o, p, q):
        return (p[..., 0] - o[..., 0]) * (q[..., 1] - o[..., 1]) - (
            p[..., 1] - o[..., 1]
        ) * (q[..., 0] - o[..., 0])

    # broadcast (na, nb)
    o1 = cross(a0[:, None], a1[:, None], b0[None, :])
    o2 = cross(a0[:, None], a1[:, None], b1[None, :])
    o3 = cross(b0[None, :], b1[None, :], a0[:, None])
    o4 = cross(b0[None, :], b1[None, :], a1[:, None])
    proper = (np.sign(o1) != np.sign(o2)) & (np.sign(o3) != np.sign(o4))
    if proper.any():
        return True
    # collinear touch: any orientation exactly zero with overlap boxes
    touch = (o1 == 0) | (o2 == 0) | (o3 == 0) | (o4 == 0)
    if not touch.any():
        return False
    # conservative bbox-overlap check for zero-orientation candidates
    axmin = np.minimum(a0, a1)[:, None]
    axmax = np.maximum(a0, a1)[:, None]
    bxmin = np.minimum(b0, b1)[None, :]
    bxmax = np.maximum(b0, b1)[None, :]
    boxes = ((axmin <= bxmax) & (bxmin <= axmax)).all(axis=-1)
    return bool((touch & boxes).any())


def geoms_intersect(ga, gb) -> bool:
    """Exact pairwise ``intersects`` for any type combination — the refine
    step behind the candidate cell join (reference exact test at
    ``pythongis/vector/manager.py:414``)."""
    ta, _ = ga
    tb, _ = gb
    ca, cb = W.all_coords(ga), W.all_coords(gb)
    bba = (ca[:, 0].min(), ca[:, 1].min(), ca[:, 0].max(), ca[:, 1].max())
    bbb = (cb[:, 0].min(), cb[:, 1].min(), cb[:, 0].max(), cb[:, 1].max())
    if not bbox_intersects(bba, bbb):
        return False
    pa = ta in ("Polygon", "MultiPolygon")
    pb = tb in ("Polygon", "MultiPolygon")
    # point cases
    if ta in ("Point", "MultiPoint"):
        return _points_touch_geom(ca, gb)
    if tb in ("Point", "MultiPoint"):
        return _points_touch_geom(cb, ga)
    la = [ga[1]] if ta == "LineString" else (
        ga[1] if ta == "MultiLineString" else W.iter_rings(ga)
    )
    lb = [gb[1]] if tb == "LineString" else (
        gb[1] if tb == "MultiLineString" else W.iter_rings(gb)
    )
    for A in la:
        for B in lb:
            if _segments_intersect_any(A, B):
                return True
    # containment without boundary crossing
    if pa and points_in_polygon(cb[:1, 0], cb[:1, 1], ga)[0]:
        return True
    if pb and points_in_polygon(ca[:1, 0], ca[:1, 1], gb)[0]:
        return True
    return False


def _points_touch_geom(pts: np.ndarray, geom) -> bool:
    t, _ = geom
    if t in ("Polygon", "MultiPolygon"):
        return bool(points_in_polygon(pts[:, 0], pts[:, 1], geom).any())
    if t in ("Point", "MultiPoint"):
        other = W.all_coords(geom)
        return bool(
            ((pts[:, None, :] == other[None, :, :]).all(-1)).any()
        )
    d = points_to_geom_dist(pts[:, 0], pts[:, 1], geom)
    return bool((d == 0).any())


def geom_within(ga, gb) -> bool:
    """``a within b``: all of a's coords inside b and no boundary crossing.
    Exact for the point/polygon cases the reference exercises
    (``pythongis/vector/manager.py:381-431`` with condition='within')."""
    tb, _ = gb
    if tb not in ("Polygon", "MultiPolygon"):
        return False
    ca = W.all_coords(ga)
    if not points_in_polygon(ca[:, 0], ca[:, 1], gb).all():
        return False
    ta, _ = ga
    if ta in ("Point", "MultiPoint"):
        return True
    la = [ga[1]] if ta == "LineString" else (
        ga[1] if ta == "MultiLineString" else W.iter_rings(ga)
    )
    for A in la:
        for B in W.iter_rings(gb):
            if _segments_intersect_any(A, B):
                return False
    return True


# ------------------------------------------------------------- clipping

def clip_ring_to_rect(ring: np.ndarray, xmin, ymin, xmax, ymax) -> np.ndarray | None:
    """Sutherland–Hodgman polygon clip against an axis-aligned rectangle —
    powers tile cropping (reference crop-with-intersection per tile,
    ``pythongis/vector/manager.py:26-45``)."""
    poly = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring

    def clip_edge(pts, inside_fn, intersect_fn):
        if len(pts) == 0:
            return pts
        out = []
        prev = pts[-1]
        prev_in = inside_fn(prev)
        for cur in pts:
            cur_in = inside_fn(cur)
            if cur_in:
                if not prev_in:
                    out.append(intersect_fn(prev, cur))
                out.append(cur)
            elif prev_in:
                out.append(intersect_fn(prev, cur))
            prev, prev_in = cur, cur_in
        return np.array(out) if out else np.empty((0, 2))

    def ix_x(xv):
        def f(p, q):
            t = (xv - p[0]) / (q[0] - p[0])
            return np.array([xv, p[1] + t * (q[1] - p[1])])
        return f

    def ix_y(yv):
        def f(p, q):
            t = (yv - p[1]) / (q[1] - p[1])
            return np.array([p[0] + t * (q[0] - p[0]), yv])
        return f

    pts = np.asarray(poly, dtype=np.float64)
    pts = clip_edge(pts, lambda p: p[0] >= xmin, ix_x(xmin))
    pts = clip_edge(pts, lambda p: p[0] <= xmax, ix_x(xmax))
    pts = clip_edge(pts, lambda p: p[1] >= ymin, ix_y(ymin))
    pts = clip_edge(pts, lambda p: p[1] <= ymax, ix_y(ymax))
    if len(pts) < 3:
        return None
    return np.vstack([pts, pts[:1]])


def clip_line_to_rect(coords: np.ndarray, xmin, ymin, xmax, ymax) -> list[np.ndarray]:
    """Cohen–Sutherland-style per-segment line clip → list of sub-lines."""
    segs = []
    cur: list[np.ndarray] = []
    for i in range(len(coords) - 1):
        p, q = coords[i], coords[i + 1]
        clipped = _clip_segment(p, q, xmin, ymin, xmax, ymax)
        if clipped is None:
            if len(cur) >= 2:
                segs.append(np.array(cur))
            cur = []
            continue
        cp, cq = clipped
        if cur and np.allclose(cur[-1], cp):
            cur.append(cq)
        else:
            if len(cur) >= 2:
                segs.append(np.array(cur))
            cur = [cp, cq]
    if len(cur) >= 2:
        segs.append(np.array(cur))
    return segs


def _clip_segment(p, q, xmin, ymin, xmax, ymax):
    t0, t1 = 0.0, 1.0
    dx, dy = q[0] - p[0], q[1] - p[1]
    for pval, qval in (
        (-dx, p[0] - xmin),
        (dx, xmax - p[0]),
        (-dy, p[1] - ymin),
        (dy, ymax - p[1]),
    ):
        if pval == 0:
            if qval < 0:
                return None
        else:
            r = qval / pval
            if pval < 0:
                t0 = max(t0, r)
            else:
                t1 = min(t1, r)
            if t0 > t1:
                return None
    return (
        np.array([p[0] + t0 * dx, p[1] + t0 * dy]),
        np.array([p[0] + t1 * dx, p[1] + t1 * dy]),
    )
