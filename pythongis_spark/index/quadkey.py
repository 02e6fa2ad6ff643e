"""Deterministic quadkey / Morton (Z-order) cell grid over lon/lat.

This is the engine's spatial access path: a *column*, not a data
structure. It replaces the reference's per-dataset r-tree
(``pythongis/vector/data.py:1189-1243``) — candidate generation for every
spatial operator becomes an equi-join on cell id, which Catalyst can plan
as broadcast or shuffled hash join, salt, and prune.

Grid definition (level ``z``): 2^z × 2^z cells over
lon ∈ [-180, 180), lat ∈ [-90, 90]; ``tx`` grows eastward, ``ty`` grows
*southward* from lat=+90 (tile-pyramid convention, matching the y-flipped
affine of the reference's rasters, ``pythongis/raster/loader.py:276``).

Cell id = Morton interleave of (tx, ty) with x in the even (low) bits —
equal to the base-4 value of the Bing-style quadkey string. All math is
numpy ``uint64`` bit-twiddling, fully vectorized.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 26  # 2*26 = 52 bits < float/long safe range


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of v into even bit positions (Morton helper,
    standard magic-number bit interleave)."""
    v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact1by1(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def morton_encode(tx: np.ndarray, ty: np.ndarray) -> np.ndarray:
    """Interleave (tx, ty) → int64 Morton code (x = even bits)."""
    return (_part1by1(np.asarray(tx)) | (_part1by1(np.asarray(ty)) << np.uint64(1))).astype(
        np.int64
    )


def morton_decode(code: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    c = np.asarray(code).astype(np.uint64)
    return (
        _compact1by1(c).astype(np.int64),
        _compact1by1(c >> np.uint64(1)).astype(np.int64),
    )


def tile_xy(lon: np.ndarray, lat: np.ndarray, z: int) -> tuple[np.ndarray, np.ndarray]:
    """(tx, ty) tile coordinates at level z; clipped to grid edges."""
    n = 1 << z
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    tx = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    ty = np.floor((90.0 - lat) / 180.0 * n).astype(np.int64)
    return np.clip(tx, 0, n - 1), np.clip(ty, 0, n - 1)


def cell_of_points(lon, lat, z: int) -> np.ndarray:
    """Morton cell id of N points at level z (vectorized; points are the
    probe side of every spatial join)."""
    tx, ty = tile_xy(lon, lat, z)
    return morton_encode(tx, ty)


def cell_bounds(cell: int, z: int) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax) of one cell."""
    tx, ty = morton_decode(np.array([cell]))
    n = 1 << z
    w, h = 360.0 / n, 180.0 / n
    xmin = -180.0 + tx[0] * w
    ymax = 90.0 - ty[0] * h
    return (float(xmin), float(ymax - h), float(xmin + w), float(ymax))


def cells_of_bbox(xmin, ymin, xmax, ymax, z: int, cap: int | None = None) -> np.ndarray:
    """All cell ids at level z whose tile rectangle overlaps the bbox —
    the candidate-set semantics of the reference's
    ``quick_overlap`` (``pythongis/vector/data.py:1231-1243``) at cell
    granularity. ``cap`` guards explosion for huge geometries."""
    n = 1 << z
    tx0 = max(0, int(np.floor((xmin + 180.0) / 360.0 * n)))
    tx1 = min(n - 1, int(np.floor((xmax + 180.0) / 360.0 * n)))
    ty0 = max(0, int(np.floor((90.0 - ymax) / 180.0 * n)))
    ty1 = min(n - 1, int(np.floor((90.0 - ymin) / 180.0 * n)))
    nx, ny = tx1 - tx0 + 1, ty1 - ty0 + 1
    if cap is not None and nx * ny > cap:
        raise ValueError(f"bbox covers {nx * ny} cells at z={z} (> cap {cap})")
    txs = np.arange(tx0, tx1 + 1, dtype=np.int64)
    tys = np.arange(ty0, ty1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(txs, tys, indexing="ij")
    return morton_encode(gx.ravel(), gy.ravel())


def pick_level_for_bbox(widths: np.ndarray, heights: np.ndarray, target_cells: float = 4.0) -> int:
    """Choose an index level so a typical build-side bbox covers ≈
    ``target_cells`` cells: resolution tuning the reference never needed
    (its r-tree adapts; our grid must pick z up front)."""
    w = float(np.median(widths)) if len(widths) else 1.0
    h = float(np.median(heights)) if len(heights) else 1.0
    w = max(w, 1e-9)
    h = max(h, 1e-9)
    # cells covered ≈ (w / cellw) * (h / cellh); solve for z
    for z in range(MAX_LEVEL, -1, -1):
        n = 1 << z
        cov = (w / (360.0 / n) + 1.0) * (h / (180.0 / n) + 1.0)
        if cov <= target_cells:
            return z
    return 0


def neighbors(cell: int, z: int, ring: int = 1) -> np.ndarray:
    """Cells at Chebyshev distance ≤ ring (incl. self), clipped to grid —
    the kNN expanding-ring candidate generator (reference analog:
    ``quick_nearest`` bbox growth, ``pythongis/vector/data.py:1261-1314``)."""
    tx, ty = morton_decode(np.array([cell]))
    n = 1 << z
    xs = np.arange(max(0, tx[0] - ring), min(n - 1, tx[0] + ring) + 1)
    ys = np.arange(max(0, ty[0] - ring), min(n - 1, ty[0] + ring) + 1)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return morton_encode(gx.ravel(), gy.ravel())


def ring_cells(cell: int, z: int, ring: int) -> np.ndarray:
    """Cells at Chebyshev distance exactly ``ring``."""
    if ring == 0:
        return np.array([cell], dtype=np.int64)
    inner = set(neighbors(cell, z, ring - 1).tolist())
    outer = neighbors(cell, z, ring)
    return np.array([c for c in outer.tolist() if c not in inner], dtype=np.int64)


def quadkey_str(cells: np.ndarray, z: int) -> list[str]:
    """Bing-style quadkey strings (one digit per level, MSB first).

    The digit stream is exactly the Morton code read 2 bits at a time, so
    ``int(quadkey, 4) == cell``.
    """
    cells = np.asarray(cells).astype(np.int64)
    out = []
    for c in cells.tolist():
        digits = []
        for lvl in range(z - 1, -1, -1):
            digits.append(str((c >> (2 * lvl)) & 3))
        out.append("".join(digits))
    return out


def parent_cell(cells: np.ndarray, z_from: int, z_to: int) -> np.ndarray:
    """Coarsen cell ids from level z_from to z_to (prefix truncation)."""
    shift = np.uint64(2 * (z_from - z_to))
    return (np.asarray(cells).astype(np.uint64) >> shift).astype(np.int64)
