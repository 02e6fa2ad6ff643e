"""Geometry editing: simplify/clean, buffer, cut.

Reference: ``pythongis/vector/manager.py:576-610`` (clean = validity
fix + shapely ``simplify``), ``:726-788`` (buffer via shapely),
``:790-830`` (cut via shapely.ops.split). Without GEOS the engine
implements the exact subsets it can do correctly and raises on the
rest (documented limits, no silent wrong answers):

* simplify: Douglas–Peucker (tolerance > 0) / repeat-point removal
  (tolerance 0) — general, exact.
* buffer: points → sampled circles; convex polygons → exact offset
  (positive: edge offset + round/flat vertex joins; negative:
  half-plane inset); single-segment lines → capsules. Concave polygon
  buffering needs boolean union (GEOS) → NotImplementedError.
* cut: split any polygon by the infinite line through a segment
  (two half-plane clips). Concave splits use Sutherland–Hodgman, which
  bridges disconnected pieces (documented).
"""

from __future__ import annotations

import math

import numpy as np

from pythongis_spark.geometry import core as G
from pythongis_spark.geometry import wkb as W


# ------------------------------------------------------------ simplify

def simplify_coords(coords: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas–Peucker polyline simplification; tolerance 0 removes
    exact repeat points only (the reference's clean(tolerance=0))."""
    pts = np.asarray(coords, dtype=np.float64)
    if len(pts) < 3:
        return pts
    keep = np.ones(len(pts), dtype=bool)
    # drop exact repeats first
    same = (np.diff(pts, axis=0) == 0).all(axis=1)
    keep[1:][same] = False
    pts = pts[keep]
    if tolerance <= 0 or len(pts) < 3:
        return pts

    out_keep = np.zeros(len(pts), dtype=bool)
    out_keep[0] = out_keep[-1] = True
    stack = [(0, len(pts) - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        a, b = pts[i], pts[j]
        ab = b - a
        seg = pts[i + 1 : j]
        denom = math.hypot(ab[0], ab[1])
        if denom == 0:
            d = np.hypot(seg[:, 0] - a[0], seg[:, 1] - a[1])
        else:
            d = np.abs(ab[0] * (seg[:, 1] - a[1]) - ab[1] * (seg[:, 0] - a[0])) / denom
        kmax = int(np.argmax(d))
        if d[kmax] > tolerance:
            mid = i + 1 + kmax
            out_keep[mid] = True
            stack.append((i, mid))
            stack.append((mid, j))
    return pts[out_keep]


def simplify_geom(geom, tolerance: float):
    """Simplify any geometry; degenerate results (rings < 4 points,
    lines < 2) → None, like the reference's drop-unfixable rule."""
    t, payload = geom
    if t in ("Point", "MultiPoint"):
        return geom
    if t == "LineString":
        s = simplify_coords(payload, tolerance)
        return ("LineString", s) if len(s) >= 2 else None
    if t == "MultiLineString":
        parts = [simplify_coords(c, tolerance) for c in payload]
        parts = [p for p in parts if len(p) >= 2]
        if not parts:
            return None
        return ("MultiLineString", parts) if len(parts) > 1 else ("LineString", parts[0])
    if t in ("Polygon", "MultiPolygon"):
        polys_out = []
        for rings in W.iter_polygons(geom):
            new_rings = []
            for k, r in enumerate(rings):
                body = simplify_coords(r[:-1], tolerance)
                if len(body) < 3:
                    if k == 0:
                        new_rings = None
                        break
                    continue  # collapsed hole just disappears
                new_rings.append(np.vstack([body, body[:1]]))
            if new_rings:
                polys_out.append(new_rings)
        if not polys_out:
            return None
        return ("Polygon", polys_out[0]) if len(polys_out) == 1 else (
            "MultiPolygon", polys_out
        )
    raise ValueError(t)


# ------------------------------------------------------------ buffer

def _circle(cx: float, cy: float, r: float, resolution: int = 32) -> np.ndarray:
    ang = np.linspace(0.0, 2 * math.pi, resolution, endpoint=False)
    ring = np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])
    return np.vstack([ring, ring[:1]])


def _arc(cx, cy, a0, a1, r, resolution) -> np.ndarray:
    """CCW arc from angle a0 to a1 (a1 normalized above a0)."""
    while a1 < a0:
        a1 += 2 * math.pi
    n = max(1, int(math.ceil((a1 - a0) / (2 * math.pi) * resolution)))
    ang = np.linspace(a0, a1, n + 1)
    return np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])


def buffer_convex_polygon(
    rings: list[np.ndarray], dist: float, join_style: str = "round", resolution: int = 32
):
    """Exact buffer of a CONVEX polygon ring set.

    Positive dist: offset each edge outward by dist; vertices joined by
    arcs (round) or the offset-edge endpoints (flat ≈ bevel). Negative
    dist: inset via successive half-plane clips (empty → None). Holes
    are buffered the opposite way (a grown polygon shrinks its holes).
    """
    ext = rings[0]
    if not G.ring_is_convex(ext):
        raise NotImplementedError(
            "buffer of concave polygons needs boolean union (GEOS absent)"
        )
    out_ext = _offset_convex_ring(ext, dist, join_style, resolution)
    if out_ext is None:
        return None
    out_rings = [out_ext]
    for h in rings[1:]:
        if not G.ring_is_convex(h):
            raise NotImplementedError("concave hole buffer unsupported")
        hb = _offset_convex_ring(h, -dist, join_style, resolution)
        if hb is not None:
            out_rings.append(hb)
    return ("Polygon", out_rings)


def _offset_convex_ring(ring: np.ndarray, dist: float, join_style: str, resolution: int):
    pts = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
    # force CCW
    closed = np.vstack([pts, pts[:1]])
    if G.ring_signed_area(closed) < 0:
        pts = pts[::-1]
    n = len(pts)
    if dist == 0:
        return np.vstack([pts, pts[:1]])
    if dist < 0:
        # inset: clip by each edge's inward-shifted half-plane
        cur = np.vstack([pts, pts[:1]])
        for i in range(n):
            a, b = pts[i], pts[(i + 1) % n]
            e = b - a
            ln = math.hypot(e[0], e[1])
            if ln == 0:
                continue
            nrm = np.array([-e[1], e[0]]) / ln  # inward for CCW
            a2, b2 = a + nrm * (-dist), b + nrm * (-dist)
            # half-plane as a huge clip triangle is messy; reuse convex clip:
            # clip against the shifted edge by building a big rectangle
            # aligned with the edge
            span = 4 * (np.abs(pts).max() + abs(dist) + 1)
            big = np.array(
                [a2, b2, b2 + nrm * span, a2 + nrm * span, a2]
            )
            cur = G.clip_ring_to_convex(cur, big)
            if cur is None:
                return None
        return cur
    # positive: offset edges outward, join vertices
    out = []
    offs = []
    for i in range(n):
        a, b = pts[i], pts[(i + 1) % n]
        e = b - a
        ln = math.hypot(e[0], e[1])
        if ln == 0:
            continue
        nrm = np.array([e[1], -e[0]]) / ln  # outward for CCW
        offs.append((a + nrm * dist, b + nrm * dist, nrm))
    m = len(offs)
    for i in range(m):
        a_off, b_off, nrm = offs[i]
        out.append(a_off)
        out.append(b_off)
        nxt = offs[(i + 1) % m]
        if join_style == "round":
            v = pts[(i + 1) % n]
            a0 = math.atan2(nrm[1], nrm[0])
            a1 = math.atan2(nxt[2][1], nxt[2][0])
            arc = _arc(v[0], v[1], a0, a1, dist, resolution)
            out.extend(arc[1:-1])
        # flat/bevel: straight jump to the next offset edge start
    out.append(out[0])
    return np.array(out)


def buffer_geom(geom, dist: float, join_style: str = "round", resolution: int = 32):
    """Buffer a geometry (``manager.py:726-788`` subset — see module
    docstring for the exact/unsupported matrix)."""
    t, payload = geom
    if t == "Point":
        if dist <= 0:
            return None
        return ("Polygon", [_circle(payload[0, 0], payload[0, 1], dist, resolution)])
    if t == "MultiPoint":
        if dist <= 0:
            return None
        pts = W.all_coords(geom)
        return (
            "MultiPolygon",
            [[_circle(x, y, dist, resolution)] for x, y in pts],
        )
    if t == "LineString":
        if dist <= 0:
            return None
        if len(payload) == 2:
            return _capsule(payload[0], payload[1], dist, resolution)
        # polyline: offset loop + distance selection
        return _buffer_lines_general([payload], dist, resolution)
    if t == "MultiLineString":
        if dist <= 0:
            return None
        return _buffer_lines_general(list(payload), dist, resolution)
    if t == "Polygon":
        try:
            return buffer_convex_polygon(payload, dist, join_style, resolution)
        except NotImplementedError:
            return _buffer_polygon_general(geom, dist, resolution)
    if t == "MultiPolygon":
        try:
            parts = []
            for rings in payload:
                r = buffer_convex_polygon(rings, dist, join_style, resolution)
                if r is not None:
                    parts.append(r[1])
            if not parts:
                return None
            return ("Polygon", parts[0]) if len(parts) == 1 else (
                "MultiPolygon", parts
            )
        except NotImplementedError:
            return _buffer_polygon_general(geom, dist, resolution)
    raise NotImplementedError(f"buffer of {t} not supported")


def _arc_grid(cx, cy, a0, a1, r, resolution) -> np.ndarray:
    """CCW arc a0→a1 sampled on the GLOBAL angle grid (multiples of
    2π/resolution) plus the exact endpoints. Arcs of the same circle
    emitted by different capsules then share bitwise-identical interior
    vertices, so the boolean engine sees exact collinear overlaps instead
    of criss-crossing near-tangent chords (which break ring stitching)."""
    two_pi = 2.0 * math.pi
    while a1 < a0:
        a1 += two_pi
    step = two_pi / resolution
    k0 = int(math.ceil(a0 / step))
    k1 = int(math.floor(a1 / step))
    pts = [(cx + r * math.cos(a0), cy + r * math.sin(a0))]
    for k in range(k0, k1 + 1):
        if k * step - a0 < 1e-9 or a1 - k * step < 1e-9:
            continue
        th = (k % resolution) * step  # canonical angle → identical doubles
        pts.append((cx + r * math.cos(th), cy + r * math.sin(th)))
    pts.append((cx + r * math.cos(a1), cy + r * math.sin(a1)))
    return np.array(pts, dtype=np.float64)


def _capsule(a: np.ndarray, b: np.ndarray, dist: float, resolution: int):
    """Exact-offset capsule (Minkowski sum of a segment and a disk),
    end-cap arcs on the global angle grid (see ``_arc_grid``)."""
    e = b - a
    ln = math.hypot(e[0], e[1])
    if ln == 0:
        ring = _arc_grid(a[0], a[1], 0.0, 2 * math.pi, dist, resolution)
        ring[-1] = ring[0]  # exact closure (sin(2π) as double ≠ 0)
        return ("Polygon", [ring])
    nrm = np.array([e[1], -e[0]]) / ln
    ang = math.atan2(nrm[1], nrm[0])
    cap_b = _arc_grid(b[0], b[1], ang, ang + math.pi, dist, resolution)
    cap_a = _arc_grid(a[0], a[1], ang + math.pi, ang + 2 * math.pi, dist, resolution)
    ring = np.vstack([cap_b, cap_a])
    ring = np.vstack([ring, ring[:1]])
    return ("Polygon", [ring])


def _soup_for_loop(loop_pts: np.ndarray, d: float, resolution: int,
                   caps_at: set[int] | None = None) -> list[tuple]:
    """Raw right-side offset edge soup for one closed directed traversal.

    ``loop_pts``: vertex cycle WITHOUT repeated closing point. Each edge
    contributes its offset segment (normal = (ey, -ex)/|e|, the right
    side of travel); each LEFT turn (cross > 0) contributes a CCW arc of
    radius d around the vertex; vertices listed in ``caps_at`` always
    get the arc (polyline end caps, where the traversal reverses). Right
    turns get nothing — their offset segments overshoot and the
    distance-selection pass drops the overshoot."""
    n = len(loop_pts)
    soup: list[tuple] = []
    for i in range(n):
        a, b = loop_pts[i], loop_pts[(i + 1) % n]
        e = b - a
        ln = math.hypot(e[0], e[1])
        if ln == 0:
            continue
        nrm = np.array([e[1], -e[0]]) / ln
        p = (float(a[0] + nrm[0] * d), float(a[1] + nrm[1] * d))
        q = (float(b[0] + nrm[0] * d), float(b[1] + nrm[1] * d))
        soup.append((p, q))
        # vertex joint between this edge and the next non-degenerate one
        j = (i + 1) % n
        c = loop_pts[(i + 2) % n] if n > 2 else loop_pts[i]
        e2 = c - b
        ln2 = math.hypot(e2[0], e2[1])
        if ln2 == 0:
            continue
        crossz = e[0] * e2[1] - e[1] * e2[0]
        cap = caps_at is not None and j in caps_at
        if crossz > 0 or cap:
            a0 = math.atan2(-e[0] / ln, e[1] / ln)      # angle of nrm
            a1 = math.atan2(-e2[0] / ln2, e2[1] / ln2)  # angle of next nrm
            arc = _arc_grid(b[0], b[1], a0, a1, d, resolution)
            for k in range(len(arc) - 1):
                pa = (float(arc[k, 0]), float(arc[k, 1]))
                pb = (float(arc[k + 1, 0]), float(arc[k + 1, 1]))
                if pa != pb:
                    soup.append((pa, pb))
    return soup


def _dist_selector(rings: list[np.ndarray]):
    """Vectorized min point→segment distance over all ring edges."""
    A = np.vstack([r[:-1] for r in rings])
    Bp = np.vstack([r[1:] for r in rings])
    E = Bp - A
    L2 = (E * E).sum(axis=1)
    L2[L2 == 0] = 1.0

    def dist(mx: float, my: float) -> float:
        t = ((mx - A[:, 0]) * E[:, 0] + (my - A[:, 1]) * E[:, 1]) / L2
        t = np.clip(t, 0.0, 1.0)
        dx = mx - (A[:, 0] + t * E[:, 0])
        dy = my - (A[:, 1] + t * E[:, 1])
        return float(np.sqrt((dx * dx + dy * dy).min()))

    return dist


def _offset_select_stitch(soup: list[tuple], rings: list[np.ndarray],
                          d: float, resolution: int,
                          keep_inside: bool | None, flip: bool = False):
    """Split the offset soup at pairwise intersections, keep sub-edges
    whose midpoint sits at distance ≈ d from the source boundary (≥ the
    chord-sagitta threshold d·cos(π/res)) and on the requested side of
    the source polygon, then weld + stitch into rings.

    The selection criterion is the DISTANCE function — smooth, so
    tangential contacts between equal-radius offsets (which break
    parity-based boolean classification) are harmless: borderline chords
    all sit at dist ≈ d and are kept consistently. (Chen & McMains 2005
    describe this offset-then-clip-by-distance construction.)"""
    from pythongis_spark.geometry import boolean as BO

    dist = _dist_selector(rings)
    thresh = d * math.cos(math.pi / resolution) * (1.0 - 1e-9)
    sel = []
    for p, q in soup:
        for sa, sb in BO._split_edge(p, q, soup):
            mx, my = (sa[0] + sb[0]) * 0.5, (sa[1] + sb[1]) * 0.5
            if dist(mx, my) < thresh:
                continue
            if keep_inside is not None:
                inside = False
                pxa, pya = np.array([mx]), np.array([my])
                for r in rings:
                    inside ^= bool(G.points_in_ring(pxa, pya, r)[0])
                if inside != keep_inside:
                    continue
            sel.append((sb, sa) if flip else (sa, sb))
    return BO._assemble(sel)


def _buffer_polygon_general(geom, dist: float, resolution: int):
    """Buffer of an arbitrary (concave / holed / multipart) polygon by
    offset-ring construction + distance selection. Reference analog:
    shapely ``buffer`` in ``pythongis/vector/manager.py:726-788``; round
    joins only. Outward (d>0): offset every ring rightward (exterior CCW
    → outward; holes CW → into the hole), arcs at left turns; keep
    pieces outside the polygon at distance d. Inward (d<0): offset
    leftward by traversing each ring REVERSED, keep pieces inside."""
    if dist == 0:
        return geom
    rings = [np.asarray(r, dtype=np.float64)
             for poly in W.iter_polygons(_orient_polygon(geom)) for r in poly]
    soup: list[tuple] = []
    for r in rings:
        pts = r[:-1] if np.array_equal(r[0], r[-1]) else r
        if dist > 0:
            soup.extend(_soup_for_loop(pts, dist, resolution))
        else:
            # inward: offset the LEFT side by traversing reversed (right
            # offset of the reverse), then flip each selected sub-edge so
            # travel direction — hence ring orientation — is restored
            soup.extend(_soup_for_loop(pts[::-1], -dist, resolution))
    return _offset_select_stitch(
        soup, rings, abs(dist), resolution, keep_inside=dist < 0,
        flip=dist < 0,
    )


def _orient_polygon(geom):
    """Exterior rings CCW, holes CW."""
    polys = []
    for rings in W.iter_polygons(geom):
        fixed = []
        for k, r in enumerate(rings):
            ccw = G.ring_signed_area(r) > 0
            fixed.append(r if ccw == (k == 0) else r[::-1])
        polys.append(fixed)
    if len(polys) == 1:
        return ("Polygon", polys[0])
    return ("MultiPolygon", polys)


def _buffer_lines_general(lines: list[np.ndarray], dist: float, resolution: int):
    """Buffer of polylines: traverse each line forward then backward as
    one closed loop (caps = π arcs at both endpoints), offset rightward,
    distance-select (no interior test — lines have no interior)."""
    soup: list[tuple] = []
    rings = []
    for ln in lines:
        # drop repeated consecutive points
        keep = [0] + [i for i in range(1, len(ln))
                      if ln[i, 0] != ln[i - 1, 0] or ln[i, 1] != ln[i - 1, 1]]
        ln = ln[keep]
        if len(ln) < 2:
            continue
        loop = np.vstack([ln, ln[-2:0:-1]])  # cycle v0..vn,vn-1..v1
        caps = {len(ln) - 1, 0}  # u-turn vertices (both line ends)
        soup.extend(_soup_for_loop(loop, dist, resolution, caps_at=caps))
        rings.append(np.vstack([ln, ln[::-1]]))  # degenerate ring for dist()
    if not soup:
        return None
    return _offset_select_stitch(soup, rings, dist, resolution, keep_inside=None)


# ------------------------------------------------------------ cut

def _split_parts(g) -> list:
    """Polygon/MultiPolygon tuple → list of single-Polygon tuples (the
    reference's shapely.ops.split lists each connected piece)."""
    if g is None:
        return []
    return [("Polygon", rings) for rings in W.iter_polygons(g)]


def cut_by_line(geom, p0, p1):
    """Split a polygon by the infinite line through (p0, p1) — the
    half-plane form of the reference's ``cut`` (``manager.py:790-830``,
    shapely.ops.split). Returns a list of geometry tuples (1 if the line
    misses); each connected piece is returned separately. Exact for any
    polygon (concave pieces are NOT bridged — the halves go through the
    general boolean engine)."""
    from pythongis_spark.geometry import boolean as BO

    t, _ = geom
    if t not in ("Polygon", "MultiPolygon"):
        raise ValueError("cut_by_line expects polygonal input")
    p0 = np.asarray(p0, dtype=np.float64)
    p1 = np.asarray(p1, dtype=np.float64)
    e = p1 - p0
    ln = math.hypot(e[0], e[1])
    if ln == 0:
        return [geom]
    e = e / ln
    nrm = np.array([-e[1], e[0]])
    # half-plane rectangles sized to the scene (a 1e9 span would blow up
    # the relative epsilons in the arrangement)
    coords = W.all_coords(geom)
    cx, cy = coords[:, 0].mean(), coords[:, 1].mean()
    diag = max(1.0, np.abs(coords - [cx, cy]).max() * 4.0 + abs(
        np.dot([cx, cy] - p0, nrm)
    ))
    mid = p0 + e * np.dot([cx, cy] - p0, e)

    pieces = []
    for sign in (1.0, -1.0):
        a = mid - e * diag
        b = mid + e * diag
        rect = np.array(
            [a, b, b + nrm * sign * diag, a + nrm * sign * diag, a]
        )
        if G.ring_signed_area(rect) < 0:
            rect = rect[::-1]
        half = BO.polygon_boolean(geom, ("Polygon", [rect]), "intersection")
        pieces.extend(_split_parts(half))
    return pieces if pieces else [geom]


def cut_by_polyline(geom, line_pts):
    """Split a polygon by an open polyline — the reference's
    ``shapely.ops.split`` cut (``pythongis/vector/manager.py:782-820``),
    without concave bridging:

    1. extend the polyline's end segments beyond the scene bbox;
    2. clip the extended path to a margin rectangle (entry/exit land
       exactly on its boundary);
    3. close the path along the rectangle perimeter to form one side
       region;
    4. intersect/difference the polygon with that region via the
       general boolean engine; every connected piece is returned
       separately.

    Requires the (extended) polyline to cross the scene in one piece —
    a path that exits and re-enters the margin rect raises."""
    from pythongis_spark.geometry import boolean as BO

    t, _ = geom
    if t not in ("Polygon", "MultiPolygon"):
        raise ValueError("cut_by_polyline expects polygonal input")
    pts = np.asarray(line_pts, dtype=np.float64)
    if len(pts) < 2:
        return [geom]
    coords = W.all_coords(geom)
    allc = np.vstack([coords, pts])
    x0, y0 = allc[:, 0].min(), allc[:, 1].min()
    x1, y1 = allc[:, 0].max(), allc[:, 1].max()
    m = max(x1 - x0, y1 - y0, 1.0) * 0.5 + 1.0
    x0, y0, x1, y1 = x0 - m, y0 - m, x1 + m, y1 + m
    big = 4.0 * max(x1 - x0, y1 - y0)
    u0 = pts[0] - pts[1]
    u0 = u0 / math.hypot(*u0)
    un = pts[-1] - pts[-2]
    un = un / math.hypot(*un)
    ext = np.vstack([pts[0] + u0 * big, pts, pts[-1] + un * big])
    rect_ring = np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
    )
    clipped = BO.clip_geometry(("LineString", ext), ("Polygon", [rect_ring]))
    if clipped is None or clipped[0] != "LineString":
        raise NotImplementedError(
            "cut polyline must cross the scene in a single piece"
        )
    path = clipped[1]

    def perim_t(p):
        """Perimeter parameter in [0, 4) along the CCW margin rect."""
        px, py = p
        if abs(py - y0) < 1e-9:
            return (px - x0) / (x1 - x0)
        if abs(px - x1) < 1e-9:
            return 1.0 + (py - y0) / (y1 - y0)
        if abs(py - y1) < 1e-9:
            return 2.0 + (x1 - px) / (x1 - x0)
        return 3.0 + (y1 - py) / (y1 - y0)

    corner_at = {
        0: np.array([x0, y0]), 1: np.array([x1, y0]),
        2: np.array([x1, y1]), 3: np.array([x0, y1]),
    }
    t_exit, t_entry = perim_t(path[-1]), perim_t(path[0])
    dist = (t_entry - t_exit) % 4.0
    # walk CCW from exit back to entry, collecting passed corners
    walk = []
    tc, traveled = t_exit, 0.0
    while True:
        k = math.floor(tc + 1e-12) + 1.0  # next corner's perimeter param
        step = k - tc
        if traveled + step >= dist - 1e-12:
            break
        walk.append(corner_at[int(k) % 4])
        traveled += step
        tc = k
    side_ring = np.vstack([path, walk, path[:1]])
    side = ("Polygon", [side_ring])
    a = BO.polygon_boolean(geom, side, "intersection")
    b = BO.polygon_boolean(geom, side, "difference")
    pieces = _split_parts(a) + _split_parts(b)
    return pieces if pieces else [geom]


def clean_geom(geom, tolerance: float = 0.0):
    """The reference's full ``clean`` pipeline per feature
    (``pythongis/vector/manager.py:576-610``): (1) invalid polygonal
    geometries get the buffer-0 analog repair
    (:func:`~pythongis_spark.geometry.boolean.repair_polygon` —
    arrangement noding + positive-winding reassembly); (2) repeat-point
    removal / Douglas–Peucker simplify at ``tolerance``; (3) still-
    degenerate results → None (the reference drops them)."""
    from pythongis_spark.geometry import boolean as BO

    if geom is None:
        return None
    t = geom[0]
    if t in ("Polygon", "MultiPolygon") and not BO.polygon_is_valid(geom):
        geom = BO.repair_polygon(geom)
        if geom is None:
            return None
    return simplify_geom(geom, tolerance)
