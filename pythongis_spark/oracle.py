"""Pure-Python oracle that mirrors the *reference's* algorithms exactly
(FIXTURES.md §6) — not by running the py2-era reference, but by
reimplementing the cited code paths line-for-line in plain Python.

These produce the goldens the Spark operators are tested against where
DuckDB SQL can't express the semantics (paint order, aggreg quirks,
tile loops).
"""

from __future__ import annotations

import numpy as np

from pythongis_spark.geometry import core as G
from pythongis_spark.geometry import wkb as W


# ------------------------------------------------------------------
# hash join — pythongis/vector/data.py:1071-1106
# ------------------------------------------------------------------

def ref_hash_join(left_rows, right_rows, key, keepall=True):
    """Reference hash join: build dict on right key (last row per key wins
    the slot list append), probe left in order; keepall → None-pad.
    Rows are dicts; key is a field name or callable."""
    keyf = key if callable(key) else (lambda r: r[key])
    table: dict = {}
    for r in right_rows:
        table.setdefault(keyf(r), []).append(r)
    out = []
    for l in left_rows:
        matches = table.get(keyf(l))
        if matches:
            for m in matches:
                row = dict(l)
                for k, v in m.items():
                    if k not in row:  # duplicate right fields dropped (:1040-1043)
                        row[k] = v
                out.append(row)
        elif keepall:
            out.append(dict(l))
    return out


# ------------------------------------------------------------------
# aggreg — pythongis/vector/sql.py:103-137
# ------------------------------------------------------------------

def _make_number(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def ref_aggreg(rows, fieldmapping):
    """Reference aggregate semantics on one group of dict-rows:
    missing values dropped (:109-118); numeric stats coerce to float and
    drop non-numeric (:120-122); empty → '' (:124-127); majority =
    max-count with dict-iteration tie order (:81-82)."""
    out = {}
    for outfield, valuefield, stat in fieldmapping:
        values = [r[valuefield] for r in rows]
        values = [v for v in values if v is not None and v == v]  # drop None/NaN
        if stat in ("sum", "max", "min", "mean", "avg", "average"):
            values = [n for n in (_make_number(v) for v in values) if n is not None]
        if not values:
            out[outfield] = ""  # the reference's empty-group marker
            continue
        if stat == "count":
            out[outfield] = len(values)
        elif stat == "sum":
            out[outfield] = sum(values)
        elif stat == "max":
            out[outfield] = max(values)
        elif stat == "min":
            out[outfield] = min(values)
        elif stat in ("mean", "avg", "average"):
            out[outfield] = sum(values) / len(values)
        elif stat == "first":
            out[outfield] = values[0]
        elif stat == "last":
            out[outfield] = values[-1]
        elif stat == "majority":
            # reference groups over sorted(seq) (vector/manager.py majority
            # path), so count ties resolve to the smallest value. Building
            # counts from sorted(values) makes dict order = value order, and
            # max/min return the first (= smallest) value on tied counts —
            # matching both the reference and the Spark implementation's
            # (count desc, value asc) ordering.
            counts: dict = {}
            for v in sorted(values):
                counts[v] = counts.get(v, 0) + 1
            out[outfield] = max(counts.items(), key=lambda kv: kv[1])[0]
        elif stat == "minority":
            counts = {}
            for v in sorted(values):
                counts[v] = counts.get(v, 0) + 1
            out[outfield] = min(counts.items(), key=lambda kv: kv[1])[0]
        elif stat.endswith("concat"):
            delim = stat[: -len("concat")]
            out[outfield] = delim.join(str(v) for v in values)
        else:
            raise ValueError(stat)
    return out


# ------------------------------------------------------------------
# spatial join matching — pythongis/vector/manager.py:381-431
# ------------------------------------------------------------------

def ref_spatial_join_pairs(left, right, condition="intersects"):
    """(left_id, right_id) matches: per left feature, bbox candidates then
    exact predicate — the reference loop with our numpy predicates in
    place of shapely. left/right: list of (id, wkb)."""
    rgeoms = [(rid, W.decode_wkb(blob), W.geom_bbox(blob)) for rid, blob in right]
    pairs = []
    for lid, lblob in left:
        if lblob is None:
            continue
        lg = W.decode_wkb(lblob)
        lb = W.geom_bbox(lblob)
        for rid, rg, rb in rgeoms:
            if not G.bbox_intersects(lb, rb):
                continue
            if condition == "intersects":
                ok = G.geoms_intersect(lg, rg)
            elif condition == "within":
                ok = G.geom_within_covers(lg, rg, require_interior=True)
            elif condition == "contains":
                ok = G.geom_within_covers(rg, lg, require_interior=True)
            elif condition == "covers":
                ok = G.geom_within_covers(rg, lg, require_interior=False)
            elif condition == "crosses":
                ok = G.geom_crosses(lg, rg)
            elif condition == "touches":
                ok = G.geom_touches(lg, rg)
            else:
                raise ValueError(condition)
            if ok:
                pairs.append((lid, rid))
    return pairs


# ------------------------------------------------------------------
# tile assignment — pythongis/raster/manager.py:1386-1408 and
# vector/manager.py:59-79
# ------------------------------------------------------------------

def ref_raster_tiles(width, height, tw, th):
    """Raster tiled(): windows at multiples of (tw, th), capped at the
    grid edge — mirrors the row/col loop."""
    out = []
    ty = 0
    y0 = 0
    while y0 < height:
        tx = 0
        x0 = 0
        while x0 < width:
            out.append(
                dict(
                    tx=tx,
                    ty=ty,
                    x0=x0,
                    y0=y0,
                    w=min(tw, width - x0),
                    h=min(th, height - y0),
                )
            )
            x0 += tw
            tx += 1
        y0 += th
        ty += 1
    return out


def ref_vector_tiles(features, bbox, tiles):
    """Vector tiled(): per tile rect, keep features whose bbox overlaps and
    whose clipped geometry is non-empty; empty tiles skipped
    (``vector/manager.py:77-79``). features: list of (id, wkb).
    Returns {(tx, ty): [ids]}."""
    xmin, ymin, xmax, ymax = bbox
    ntx, nty = tiles
    tw = (xmax - xmin) / ntx
    th = (ymax - ymin) / nty
    out = {}
    for ty in range(nty):
        for tx in range(ntx):
            rect = (
                xmin + tx * tw,
                ymin + ty * th,
                xmin + (tx + 1) * tw,
                ymin + (ty + 1) * th,
            )
            ids = []
            for fid, blob in features:
                if blob is None:
                    continue
                bb = W.geom_bbox(blob)
                if not G.bbox_intersects(bb, rect):
                    continue
                from pythongis_spark.operators.tiling import _clip_geom

                if _clip_geom(W.decode_wkb(blob), rect) is not None:
                    ids.append(fid)
            if ids:
                out[(tx, ty)] = ids
    return out
