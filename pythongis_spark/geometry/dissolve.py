"""Boundary-melding dissolve for touching polygons.

Reference: geometry aggregation in ``pythongis/vector/manager.py``
dissolves grouped features via shapely ``cascaded_union``. Without GEOS
the engine implements the case that covers real dissolve workloads
exactly: polygons that tile an area (shared borders digitized with
identical coordinates — admin boundaries, zone grids, tiles):

1. orient every exterior CCW / hole CW and emit directed edges;
2. identical shared borders appear as opposite directed pairs → cancel;
3. stitch the surviving edges into rings (most-counterclockwise turn at
   junction vertices, as in the raster region trace);
4. positive rings = exteriors, negative = holes (assigned by
   containment).

Inputs whose interiors OVERLAP are detected (pairwise predicate) and
raise — overlap union is GEOS-grade; the caller falls back to
keep-parts (the engine's previous behaviour, still available via
``union_parts``).
"""

from __future__ import annotations

import math

import numpy as np

from pythongis_spark.geometry import core as G
from pythongis_spark.geometry import wkb as W


def _oriented_polys(geoms):
    """All polygon parts as [ext CCW, holes CW] ring lists."""
    out = []
    for g in geoms:
        for rings in W.iter_polygons(g):
            fixed = []
            for k, r in enumerate(rings):
                ccw = G.ring_signed_area(r) > 0
                want_ccw = k == 0
                fixed.append(r if ccw == want_ccw else r[::-1])
            out.append(fixed)
    return out


def _check_no_overlap(polys):
    for i in range(len(polys)):
        gi = ("Polygon", polys[i])
        for j in range(i + 1, len(polys)):
            gj = ("Polygon", polys[j])
            if G.geoms_intersect(gi, gj) and not G.geom_touches(gi, gj):
                raise NotImplementedError(
                    "dissolve of polygons with overlapping interiors needs "
                    "boolean union (GEOS absent); only touching/disjoint "
                    "inputs are supported"
                )


def _stitch(edges: dict) -> list[np.ndarray]:
    rings = []
    while edges:
        start = next(iter(edges))
        ring = [np.array(start)]
        cur = start
        d_in = None
        while True:
            outs = edges.get(cur)
            if not outs:
                break
            if d_in is None or len(outs) == 1:
                nxt = outs.pop(0)
            else:
                best_i, best_a = 0, -10.0
                ain = math.atan2(d_in[1], d_in[0])
                for i, cand in enumerate(outs):
                    d = (cand[0] - cur[0], cand[1] - cur[1])
                    if d[0] == -d_in[0] and d[1] == -d_in[1]:
                        a = -10.0  # never reverse
                    else:
                        # CCW turn angle in (-pi, pi]: larger = more left
                        a = math.atan2(d[1], d[0]) - ain
                        while a <= -math.pi:
                            a += 2 * math.pi
                        while a > math.pi:
                            a -= 2 * math.pi
                    if a > best_a:
                        best_i, best_a = i, a
                nxt = outs.pop(best_i)
            if not outs:
                edges.pop(cur, None)
            d_in = (nxt[0] - cur[0], nxt[1] - cur[1])
            cur = nxt
            ring.append(np.array(cur))
            if cur == start:
                break
        if len(ring) >= 4 and ring[0] is not None and tuple(ring[-1]) == tuple(ring[0]):
            rings.append(np.array(ring, dtype=np.float64))
    return rings


def dissolve_touching(geoms: list) -> tuple:
    """Union of touching/disjoint polygons with exact boundary melding.
    ``geoms``: decoded geometry tuples (Polygon/MultiPolygon)."""
    polys = _oriented_polys(geoms)
    if not polys:
        return None
    _check_no_overlap(polys)
    # directed edge multiset with opposite-pair cancellation
    count: dict[tuple, int] = {}
    for rings in polys:
        for r in rings:
            for i in range(len(r) - 1):
                a = (float(r[i, 0]), float(r[i, 1]))
                b = (float(r[i + 1, 0]), float(r[i + 1, 1]))
                if a == b:
                    continue
                rev = (b, a)
                if count.get(rev, 0) > 0:
                    count[rev] -= 1
                else:
                    count[(a, b)] = count.get((a, b), 0) + 1
    edges: dict[tuple, list[tuple]] = {}
    for (a, b), c in count.items():
        for _ in range(c):
            edges.setdefault(a, []).append(b)
    rings = _stitch(edges)
    rings = [r for r in (_drop_collinear(r) for r in rings) if r is not None]
    if not rings:
        return None
    exts = [(r, G.ring_signed_area(r)) for r in rings if G.ring_signed_area(r) > 0]
    holes = [r for r in rings if G.ring_signed_area(r) <= 0]
    if not exts:
        exts = [(r, abs(G.ring_signed_area(r))) for r in rings]
        holes = []
    polys_out = [[e[0]] for e in exts]
    for h in holes:
        placed = False
        for i, (e, _a) in enumerate(exts):
            if G.points_in_polygon(
                np.array([h[0, 0]]), np.array([h[0, 1]]), ("Polygon", [e])
            )[0]:
                polys_out[i].append(h)
                placed = True
                break
        if not placed and polys_out:
            polys_out[0].append(h)
    if len(polys_out) == 1:
        return ("Polygon", polys_out[0])
    return ("MultiPolygon", polys_out)


def _drop_collinear(ring: np.ndarray) -> np.ndarray | None:
    """Remove vertices that are exactly collinear with their neighbours
    (shared-border endpoints survive the meld as midpoints); geometry is
    unchanged."""
    pts = ring[:-1]
    n = len(pts)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        o, p, q = pts[i - 1], pts[i], pts[(i + 1) % n]
        cross = (p[0] - o[0]) * (q[1] - o[1]) - (p[1] - o[1]) * (q[0] - o[0])
        if cross == 0:
            keep[i] = False
    body = pts[keep]
    if len(body) < 3:
        return None
    return np.vstack([body, body[:1]])


def union_parts(geoms: list) -> tuple:
    """Keep-parts union (the reference-compatible fallback): all polygon
    parts collected into one MultiPolygon, no melding."""
    polys = _oriented_polys(geoms)
    if not polys:
        return None
    if len(polys) == 1:
        return ("Polygon", polys[0])
    return ("MultiPolygon", polys)


def dissolve(df, by, geom_col: str = "geom", meld: bool = True):
    """Grouped geometry dissolve as a DataFrame operator: per group,
    meld touching polygon boundaries (fallback to keep-parts when
    interiors overlap). Returns (by..., geom, n_parts)."""
    import pandas as pd
    from pyspark.sql import functions as F

    keys = [by] if isinstance(by, str) else list(by)

    def _run(pdf: pd.DataFrame) -> pd.DataFrame:
        geoms = [
            W.decode_wkb(bytes(b)) for b in pdf[geom_col] if b is not None
        ]
        res = None
        if geoms:
            if meld:
                try:
                    res = dissolve_touching(geoms)
                except NotImplementedError:
                    # overlapping interiors: general boolean union
                    from pythongis_spark.geometry import boolean as BO

                    res = BO.union_all(geoms)
            else:
                res = union_parts(geoms)
        n_parts = 0 if res is None else len(W.iter_polygons(res))
        row = {k: pdf[k].iloc[0] for k in keys}
        row["geom"] = None if res is None else W.encode_wkb(res)
        row["n_parts"] = n_parts
        return pd.DataFrame([row])

    sample = df.select(*keys).limit(1).schema
    key_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in sample.fields)
    return df.groupBy(*keys).applyInPandas(
        _run, f"{key_ddl}, geom binary, n_parts int"
    )
