"""General polygon boolean operations (intersection / union / difference)
without GEOS, via planar-arrangement edge selection.

Reference analog: the shapely set ops behind the reference's clip, union
and buffer-resolve paths (``pythongis/vector/manager.py:243-266``,
``pythongis/vector/geometry.py:115-122``). Method (the classic
arrangement approach; see Martinez–Rueda–Feito 2009 for the degeneracy
taxonomy it follows):

1. orient every operand ring (exterior CCW, hole CW) and emit directed
   boundary edges;
2. split each edge at every intersection — proper crossings, vertex
   touches, and collinear overlaps — with the OTHER operand's edges;
3. classify each sub-edge by its midpoint against the other operand:
   ``in`` / ``out`` (even-odd over all rings) or ``same`` / ``opp``
   (midpoint on a collinear boundary edge, same or opposite direction);
4. keep the subset the boolean op prescribes:

   ===============  =======================  ==========================
   op               edges of A               edges of B
   ===============  =======================  ==========================
   intersection     in ∪ same                in
   union            out ∪ same               out
   difference A−B   out ∪ opp                in (reversed)
   ===============  =======================  ==========================

5. stitch selected directed edges into rings (most-CCW turn at
   junctions), positive area → exterior, negative → hole, holes assigned
   to the smallest containing exterior.

Handles concave polygons, holes, multipolygons, shared borders and
vertex contact exactly on lattice inputs (all predicates are exact
integer-like comparisons there); a relative 1e-12 tolerance guards
general float inputs. Degenerate lower-dimensional results (pure
line/point contact) return None — shapely would return a LineString;
callers needing the reference's lowest-dimension coercion get it from
``clip_geometry`` which routes point/line inputs separately.

Per-pair cost is O((Ea+Eb)^2) — these run inside per-row UDFs on small
feature geometries, never as a driver loop; the distributed candidate
pairing (cell join) happens upstream in ``operators/spatial_join``.
"""

from __future__ import annotations

import numpy as np

from pythongis_spark.geometry import core as G
from pythongis_spark.geometry import dissolve as DS
from pythongis_spark.geometry import wkb as W

_SNAP_DECIMALS = 9


def _snap(v: float) -> float:
    return round(float(v), _SNAP_DECIMALS)


def _oriented_rings(geom) -> list[np.ndarray]:
    """All rings of a polygonal geometry, exteriors CCW / holes CW,
    zero-area rings dropped."""
    if geom is None:
        return []
    rings = []
    for poly in W.iter_polygons(geom):
        for k, r in enumerate(poly):
            r = np.asarray(r, dtype=np.float64)
            area = G.ring_signed_area(r)
            if area == 0:
                continue
            want_ccw = k == 0
            if (area > 0) != want_ccw:
                r = r[::-1]
            rings.append(r)
    return rings


def _directed_edges(rings: list[np.ndarray]) -> list[tuple]:
    out = []
    for r in rings:
        for i in range(len(r) - 1):
            a, b = r[i], r[i + 1]
            if a[0] == b[0] and a[1] == b[1]:
                continue
            out.append(((float(a[0]), float(a[1])), (float(b[0]), float(b[1]))))
    return out


def _eps_for(*vals: float) -> float:
    m = max([abs(v) for v in vals] + [1.0])
    return m * m * 1e-12


def _split_edge(p: tuple, q: tuple, other: list[tuple]) -> list[tuple]:
    """Sub-edges of directed edge p→q, split at every contact with the
    other operand's edges (crossings, vertex touches, collinear
    overlaps). Interior split points are snapped to the key grid."""
    dx, dy = q[0] - p[0], q[1] - p[1]
    L2 = dx * dx + dy * dy
    ts = {0.0, 1.0}
    for r, s in other:
        ex, ey = s[0] - r[0], s[1] - r[1]
        denom = dx * ey - dy * ex
        eps = _eps_for(p[0], p[1], q[0], q[1], r[0], r[1], s[0], s[1])
        rx, ry = r[0] - p[0], r[1] - p[1]
        if abs(denom) > eps:
            t = (rx * ey - ry * ex) / denom
            u = (rx * dy - ry * dx) / denom
            if -1e-12 <= t <= 1.0 + 1e-12 and -1e-12 <= u <= 1.0 + 1e-12:
                ts.add(min(1.0, max(0.0, t)))
        elif abs(rx * dy - ry * dx) <= eps:
            # collinear overlap: project the other edge's endpoints
            for px_, py_ in (r, s):
                t = ((px_ - p[0]) * dx + (py_ - p[1]) * dy) / L2
                if 1e-12 < t < 1.0 - 1e-12:
                    ts.add(t)
    tl = sorted(ts)
    subs = []
    for t0, t1 in zip(tl[:-1], tl[1:]):
        if t1 - t0 <= 1e-12:
            continue
        a = p if t0 == 0.0 else (_snap(p[0] + t0 * dx), _snap(p[1] + t0 * dy))
        b = q if t1 == 1.0 else (_snap(p[0] + t1 * dx), _snap(p[1] + t1 * dy))
        a = (_snap(a[0]), _snap(a[1]))
        b = (_snap(b[0]), _snap(b[1]))
        if a != b:
            subs.append((a, b))
    return subs


def _classify_mid(a: tuple, b: tuple, other_rings: list[np.ndarray],
                  other_edges: list[tuple]) -> str:
    """Midpoint classification of sub-edge a→b vs the other operand:
    'same'/'opp' when on a collinear boundary edge, else 'in'/'out' by
    even-odd parity. After splitting, a sub-edge interior can only meet
    the other boundary collinearly, so this is exhaustive."""
    mx, my = (a[0] + b[0]) * 0.5, (a[1] + b[1]) * 0.5
    dx, dy = b[0] - a[0], b[1] - a[1]
    for r, s in other_edges:
        eps = _eps_for(mx, my, r[0], r[1], s[0], s[1])
        c = (s[0] - r[0]) * (my - r[1]) - (s[1] - r[1]) * (mx - r[0])
        if abs(c) > eps:
            continue
        if not (
            min(r[0], s[0]) - 1e-12 <= mx <= max(r[0], s[0]) + 1e-12
            and min(r[1], s[1]) - 1e-12 <= my <= max(r[1], s[1]) + 1e-12
        ):
            continue
        ex, ey = s[0] - r[0], s[1] - r[1]
        if abs(dx * ey - dy * ex) <= eps:
            return "same" if (dx * ex + dy * ey) > 0 else "opp"
    inside = False
    pxa = np.array([mx])
    pya = np.array([my])
    for ring in other_rings:
        inside ^= bool(G.points_in_ring(pxa, pya, ring)[0])
    return "in" if inside else "out"


def _ring_interior_point(ring: np.ndarray) -> np.ndarray:
    """A point strictly interior to a simple ring (O'Rourke's method:
    extreme vertex is convex; probe its ear or bisect toward the deepest
    contained reflex vertex)."""
    pts = ring[:-1]
    n = len(pts)
    i = int(np.lexsort((pts[:, 1], pts[:, 0]))[0])
    u, v, w = pts[(i - 1) % n], pts[i], pts[(i + 1) % n]

    def in_tri(p):
        d1 = (v[0] - u[0]) * (p[1] - u[1]) - (v[1] - u[1]) * (p[0] - u[0])
        d2 = (w[0] - v[0]) * (p[1] - v[1]) - (w[1] - v[1]) * (p[0] - v[0])
        d3 = (u[0] - w[0]) * (p[1] - w[1]) - (u[1] - w[1]) * (p[0] - w[0])
        neg = (d1 < 0) or (d2 < 0) or (d3 < 0)
        pos = (d1 > 0) or (d2 > 0) or (d3 > 0)
        return not (neg and pos)

    best, bestd = None, -1.0
    for p in pts:
        if (p == u).all() or (p == v).all() or (p == w).all():
            continue
        if in_tri(p):
            d = abs((w[0] - u[0]) * (p[1] - u[1]) - (w[1] - u[1]) * (p[0] - u[0]))
            if d > bestd:
                bestd, best = d, p
    if best is None:
        return (u + v + w) / 3.0
    return (v + best) / 2.0


_WELD_DECIMALS = 6


def _weld(sel: list[tuple]) -> list[tuple]:
    """Merge vertices within ~2·10⁻⁶ to a canonical representative
    (first-seen wins, 3×3 neighbor-cell search on a 10⁻⁶ grid).

    Near-tangent crossings interpolate ill-conditioned intersection
    points whose error can exceed the 10⁻⁹ key snap; welding restores
    the endpoint identity ring stitching needs. Exact lattice inputs
    (spacing 1/256 ≫ weld grid) pass through bitwise-unchanged — every
    computed vertex is its own representative."""
    reps: dict[tuple, tuple] = {}
    scale = 10.0 ** _WELD_DECIMALS

    def canon(v: tuple) -> tuple:
        gx, gy = round(v[0] * scale), round(v[1] * scale)
        for dx in (0, -1, 1):
            for dy in (0, -1, 1):
                r = reps.get((gx + dx, gy + dy))
                if r is not None:
                    return r
        reps[(gx, gy)] = v
        return v

    out = []
    for a, b in sel:
        ca, cb = canon(a), canon(b)
        if ca != cb:
            out.append((ca, cb))
    return out


def _assemble(sel: list[tuple]):
    """Directed sub-edges → geometry tuple (Polygon/MultiPolygon/None)."""
    if not sel:
        return None
    sel = _weld(sel)
    adj: dict[tuple, list[tuple]] = {}
    seen = set()
    for a, b in sel:
        if (a, b) in seen:  # same edge selected twice (shared borders)
            continue
        seen.add((a, b))
        adj.setdefault(a, []).append(b)
    rings = DS._stitch(adj)
    exts, holes = [], []
    for r in rings:
        r2 = DS._drop_collinear(r)
        if r2 is None:
            continue
        area = G.ring_signed_area(r2)
        if area > 0:
            exts.append(r2)
        elif area < 0:
            holes.append(r2)
    if not exts:
        return None
    polys = [[e] for e in exts]
    ext_areas = [abs(G.ring_signed_area(e)) for e in exts]
    for h in holes:
        probe = _ring_interior_point(h)
        px = np.array([probe[0]])
        py = np.array([probe[1]])
        best_i, best_a = None, float("inf")
        for i, e in enumerate(exts):
            if ext_areas[i] > abs(G.ring_signed_area(h)) - 1e-15 and bool(
                G.points_in_ring(px, py, e)[0]
            ):
                if ext_areas[i] < best_a:
                    best_i, best_a = i, ext_areas[i]
        if best_i is not None:
            polys[best_i].append(h)
    if len(polys) == 1:
        return ("Polygon", polys[0])
    return ("MultiPolygon", polys)


def polygon_boolean(ga, gb, op: str):
    """Boolean op between two polygonal geometry tuples.

    op ∈ {'intersection', 'union', 'difference'} (difference = a − b).
    Returns a Polygon/MultiPolygon tuple, or None when the result has no
    area (including degenerate line/point contact — documented
    divergence from shapely's lower-dimensional results)."""
    if op not in ("intersection", "union", "difference"):
        raise ValueError(f"unknown boolean op {op!r}")
    ra, rb = _oriented_rings(ga), _oriented_rings(gb)
    if not ra:
        return _assemble_rings(rb) if op == "union" else None
    if not rb:
        return None if op == "intersection" else _assemble_rings(ra)
    ea, eb = _directed_edges(ra), _directed_edges(rb)

    sel: list[tuple] = []
    for p, q in ea:
        for sa, sb in _split_edge(p, q, eb):
            cls = _classify_mid(sa, sb, rb, eb)
            if (
                (op == "intersection" and cls in ("in", "same"))
                or (op == "union" and cls in ("out", "same"))
                or (op == "difference" and cls in ("out", "opp"))
            ):
                sel.append((sa, sb))
    for p, q in eb:
        for sa, sb in _split_edge(p, q, ea):
            cls = _classify_mid(sa, sb, ra, ea)
            if op == "intersection" and cls == "in":
                sel.append((sa, sb))
            elif op == "union" and cls == "out":
                sel.append((sa, sb))
            elif op == "difference" and cls == "in":
                sel.append((sb, sa))
    return _assemble(sel)


def _assemble_rings(rings: list[np.ndarray]):
    """Oriented rings (one operand, no arrangement needed) → tuple."""
    if not rings:
        return None
    return _assemble(_directed_edges(rings))


def union_all(geoms: list) -> tuple | None:
    """Fold boolean union over a list of polygonal geometry tuples."""
    acc = None
    for g in geoms:
        if g is None:
            continue
        acc = g if acc is None else polygon_boolean(acc, g, "union")
    return acc


def clip_geometry(ga, gclip):
    """General a ∩ clip for ANY polygonal clip window (concave, holes,
    multipart), with the reference's lowest-dimension output coercion
    (``pythongis/vector/manager.py:212-222``): points → kept points,
    lines → clipped sub-lines, polygons → clipped polygons. Returns a
    geometry tuple or None."""
    tclip, _ = gclip
    if tclip not in ("Polygon", "MultiPolygon"):
        raise ValueError("clip geometry must be polygonal")
    ta, payload = ga
    if ta in ("Point", "MultiPoint"):
        pts = W.all_coords(ga)
        keep = G.points_in_polygon(pts[:, 0], pts[:, 1], gclip) | G.points_on_boundary(
            pts[:, 0], pts[:, 1], gclip
        )
        kept = pts[keep]
        if len(kept) == 0:
            return None
        if len(kept) == 1:
            return ("Point", kept)
        return ("MultiPoint", kept)
    if ta in ("LineString", "MultiLineString"):
        return _clip_line(ga, gclip, ("in", "same", "opp"))
    if ta in ("Polygon", "MultiPolygon"):
        return polygon_boolean(ga, gclip, "intersection")
    raise ValueError(f"unsupported geometry type {ta!r}")


def _clip_line(gline, gclip, keep: tuple) -> tuple | None:
    """Sub-segments of a (multi)linestring classified against a polygonal
    window, keeping the classes in ``keep``: ('in','same','opp') yields
    the inside parts (clip), ('out',) the outside parts (difference)."""
    ta, payload = gline
    rings = _oriented_rings(gclip)
    edges = _directed_edges(rings)
    lines = [payload] if ta == "LineString" else list(payload)
    out = []
    for ln in lines:
        cur: list[tuple] = []
        for i in range(len(ln) - 1):
            p = (float(ln[i, 0]), float(ln[i, 1]))
            q = (float(ln[i + 1, 0]), float(ln[i + 1, 1]))
            if p == q:
                continue
            for sa, sb in _split_edge(p, q, edges):
                cls = _classify_mid(sa, sb, rings, edges)
                if cls in keep:
                    if cur and cur[-1] == sa:
                        cur.append(sb)
                    else:
                        if len(cur) >= 2:
                            out.append(np.array(cur, dtype=np.float64))
                        cur = [sa, sb]
                else:
                    if len(cur) >= 2:
                        out.append(np.array(cur, dtype=np.float64))
                    cur = []
        if len(cur) >= 2:
            out.append(np.array(cur, dtype=np.float64))
    if not out:
        return None
    if len(out) == 1:
        return ("LineString", out[0])
    return ("MultiLineString", out)


_DIM = {
    "Point": 0, "MultiPoint": 0,
    "LineString": 1, "MultiLineString": 1,
    "Polygon": 2, "MultiPolygon": 2,
}


def _points_on_lines(pts: np.ndarray, gline, eps: float = 1e-9) -> np.ndarray:
    """Boolean mask: which points lie ON a (multi)linestring (within eps
    of some segment) — the shapely point∩line / point−line predicate."""
    ta, payload = gline
    lines = [payload] if ta == "LineString" else list(payload)
    on = np.zeros(len(pts), dtype=bool)
    for ln in lines:
        a, b = ln[:-1], ln[1:]
        d = b - a  # (S, 2)
        seg_len2 = (d * d).sum(axis=1)
        seg_len2[seg_len2 == 0] = 1.0
        for i, (px, py) in enumerate(pts):
            if on[i]:
                continue
            ap = np.array([px, py]) - a
            t = np.clip((ap * d).sum(axis=1) / seg_len2, 0.0, 1.0)
            proj = a + t[:, None] * d
            dx = proj[:, 0] - px
            dy = proj[:, 1] - py
            if ((dx * dx + dy * dy) <= eps * eps).any():
                on[i] = True
    return on


def _as_points(coords: np.ndarray) -> tuple | None:
    if len(coords) == 0:
        return None
    if len(coords) == 1:
        return ("Point", coords)
    return ("MultiPoint", coords)


def clip_pair(ga, gb, op: str):
    """Pairwise clip for spatial-join ``clip=`` modes with the
    reference's dimension-coercion rules
    (``pythongis/vector/manager.py:210-241``): the output type is the
    pair's LOWEST dimension for ``intersection``, HIGHEST for
    ``union``, and the LEFT operand's for ``difference``; result parts
    of any other dimension are dropped (the reference filters its
    shapely GeometryCollection down to ``newtyp``). Returns a geometry
    tuple or None (the reference's null-geometry replacement).

    Documented divergences (measure-zero geometry only, never match
    rows): line∪line concatenates parts without noding at crossings;
    line−line / line−point return the left line unchanged (shapely
    would re-node; the point set is identical).
    """
    da, db = _DIM[ga[0]], _DIM[gb[0]]
    if op == "intersection":
        if da == 2 and db == 2:
            return polygon_boolean(ga, gb, "intersection")
        if db == 2:
            return clip_geometry(ga, gb)
        if da == 2:  # symmetric: clip the lower-dim operand
            return clip_geometry(gb, ga)
        if min(da, db) == 0:
            gp, go = (ga, gb) if da == 0 else (gb, ga)
            pts = W.all_coords(gp)
            if _DIM[go[0]] == 0:
                other = W.all_coords(go)
                keep = np.array(
                    [bool((np.abs(other - p).max(axis=1) < 1e-12).any()) for p in pts]
                )
            else:
                keep = _points_on_lines(pts, go)
            return _as_points(pts[keep])
        raise NotImplementedError(
            "line×line intersection clip (collinear-overlap extraction) "
            "is not implemented"
        )
    if op == "union":
        if da == 2 and db == 2:
            return polygon_boolean(ga, gb, "union")
        if da == 2:
            return ga  # highest-dim coercion drops the lower-dim operand
        if db == 2:
            return gb
        if da == 1 and db == 1:
            la = [ga[1]] if ga[0] == "LineString" else list(ga[1])
            lb = [gb[1]] if gb[0] == "LineString" else list(gb[1])
            parts = la + lb
            return ("LineString", parts[0]) if len(parts) == 1 else (
                "MultiLineString", parts
            )
        if da == 1:
            return ga
        if db == 1:
            return gb
        # point ∪ point: distinct coordinates (stable: a's order then b's new)
        pa, pb = W.all_coords(ga), W.all_coords(gb)
        new = [p for p in pb if not (np.abs(pa - p).max(axis=1) < 1e-12).any()]
        allp = np.vstack([pa] + [np.asarray(new)]) if new else pa
        return _as_points(allp)
    if op == "difference":
        if da == 2:
            return polygon_boolean(ga, gb, "difference") if db == 2 else ga
        if da == 1:
            return _clip_line(ga, gb, ("out",)) if db == 2 else ga
        # da == 0: drop points covered by b (closure semantics)
        pts = W.all_coords(ga)
        if db == 2:
            drop = G.points_in_polygon(pts[:, 0], pts[:, 1], gb) | (
                G.points_on_boundary(pts[:, 0], pts[:, 1], gb)
            )
        elif db == 1:
            drop = _points_on_lines(pts, gb)
        else:
            other = W.all_coords(gb)
            drop = np.array(
                [bool((np.abs(other - p).max(axis=1) < 1e-12).any()) for p in pts]
            )
        return _as_points(pts[~drop])
    raise ValueError(f"unknown clip op {op!r}")


# ---------------------------------------------------------------- repair

def _winding(px: float, py: float, rings: list) -> int:
    """Winding number of (px, py) w.r.t. the directed ring set —
    standard signed upward/downward crossing count, vectorized."""
    w = 0
    for r in rings:
        x1, y1 = r[:-1, 0], r[:-1, 1]
        x2, y2 = r[1:, 0], r[1:, 1]
        cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        up = (y1 <= py) & (y2 > py) & (cross > 0)
        dn = (y2 <= py) & (y1 > py) & (cross < 0)
        w += int(np.count_nonzero(up)) - int(np.count_nonzero(dn))
    return w


def polygon_is_valid(geom) -> bool:
    """Light OGC validity check for Polygon/MultiPolygon tuples: no
    edge of any ring may properly cross, or collinearly overlap, any
    other edge (self-touches at shared vertices pass — shapely also
    accepts ring self-contact at isolated points for MultiPolygon
    assembly, and the repair path handles them via winding)."""
    rings = [np.asarray(r, dtype=np.float64) for r in W.iter_rings(geom)]
    edges = _directed_edges(rings)
    n = len(edges)
    for i in range(n):
        p, q = edges[i]
        dx, dy = q[0] - p[0], q[1] - p[1]
        L2 = dx * dx + dy * dy
        for j in range(i + 1, n):
            r, s = edges[j]
            ex, ey = s[0] - r[0], s[1] - r[1]
            eps = _eps_for(p[0], p[1], q[0], q[1], r[0], r[1], s[0], s[1])
            denom = dx * ey - dy * ex
            rx, ry = r[0] - p[0], r[1] - p[1]
            if abs(denom) > eps:
                t = (rx * ey - ry * ex) / denom
                u = (rx * dy - ry * dx) / denom
                if 1e-9 < t < 1 - 1e-9 and 1e-9 < u < 1 - 1e-9:
                    return False  # proper interior crossing
            elif abs(rx * dy - ry * dx) <= eps and L2 > 0:
                # collinear: overlap of positive length is invalid
                t0 = ((r[0] - p[0]) * dx + (r[1] - p[1]) * dy) / L2
                t1 = ((s[0] - p[0]) * dx + (s[1] - p[1]) * dy) / L2
                lo, hi = min(t0, t1), max(t0, t1)
                if min(hi, 1.0) - max(lo, 0.0) > 1e-9:
                    return False
    return True


def repair_polygon(geom):
    """Buffer-0 analog for invalid (self-intersecting) polygons — the
    reference's ``shapelyobj.buffer(0.0)`` fix in ``clean``
    (``pythongis/vector/manager.py:576-610``), built on this module's
    arrangement machinery:

    1. normalize the GLOBAL orientation (flip everything if the net
       shoelace area is negative — so the dominant winding is positive,
       matching GEOS's bowtie behavior);
    2. node every ring edge at every self-contact (:func:`_split_edge`
       against all other edges);
    3. keep each noded sub-edge iff exactly one of its two sides has
       POSITIVE winding number (the nonzero-positive rule GEOS's
       zero-distance buffer applies), oriented positive-side-left;
    4. stitch with :func:`_assemble` (exteriors CCW, holes assigned to
       smallest container).

    The classic bowtie keeps only its counterclockwise lobe (the other
    is wound negative — exactly shapely's buffer(0)); a self-touching
    ring with two same-winding lobes keeps both as a MultiPolygon;
    a hole poking outside its exterior is trimmed to the contained
    part. Returns a Polygon/MultiPolygon tuple, or None when nothing
    positive-wound remains (caller drops the feature, like the
    reference's "if still invalid: continue")."""
    rings = []
    for poly in W.iter_polygons(geom):
        for r in poly:
            r = np.asarray(r, dtype=np.float64)
            if len(r) >= 4:
                rings.append(r)
    if not rings:
        return None
    net = sum(G.ring_signed_area(r) for r in rings)
    if net < 0:
        rings = [r[::-1] for r in rings]
    edges = _directed_edges(rings)
    sel = []
    for i, (p, q) in enumerate(edges):
        others = edges[:i] + edges[i + 1:]
        for a, b in _split_edge(p, q, others):
            mx, my = (a[0] + b[0]) * 0.5, (a[1] + b[1]) * 0.5
            dx, dy = b[0] - a[0], b[1] - a[1]
            ln = float(np.hypot(dx, dy))
            if ln == 0:
                continue
            off = max(abs(mx), abs(my), 1.0) * 1e-6
            nx, ny = -dy / ln * off, dx / ln * off
            wl = _winding(mx + nx, my + ny, rings)
            wr = _winding(mx - nx, my - ny, rings)
            if (wl > 0) and not (wr > 0):
                sel.append((a, b))
            elif (wr > 0) and not (wl > 0):
                sel.append((b, a))
    return _assemble(sel)
