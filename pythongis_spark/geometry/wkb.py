"""WKB encode/decode in pure numpy / stdlib struct.

Replaces the reference's GeoJSON-dict geometry payloads
(``pythongis/vector/data.py:132-139``) with the standard little-endian
2-D WKB wire format so geometries travel as Spark ``BinaryType`` columns.

Point encode/decode is fully numpy-vectorized (the hot path: billions of
image-footprint anchor points); multi-vertex types use per-geometry struct
packing, which only ever runs inside Arrow-batched pandas UDFs on small
dimension tables (zones/polygons).
"""

from __future__ import annotations

import struct

import numpy as np

# WKB geometry type codes (2-D, little-endian)
POINT, LINESTRING, POLYGON = 1, 2, 3
MULTIPOINT, MULTILINESTRING, MULTIPOLYGON = 4, 5, 6

TYPE_NAMES = {
    POINT: "Point",
    LINESTRING: "LineString",
    POLYGON: "Polygon",
    MULTIPOINT: "MultiPoint",
    MULTILINESTRING: "MultiLineString",
    MULTIPOLYGON: "MultiPolygon",
}
NAME_TYPES = {v: k for k, v in TYPE_NAMES.items()}

_HDR = struct.Struct("<BI")
_PT = struct.Struct("<BIdd")


# ---------------------------------------------------------------- encode

def wkb_point(x: float, y: float) -> bytes:
    return _PT.pack(1, POINT, float(x), float(y))


def wkb_points_vectorized(xs: np.ndarray, ys: np.ndarray) -> list[bytes]:
    """Vectorized Point WKB for N points: builds one (N, 21) byte matrix."""
    n = len(xs)
    out = np.empty((n, 21), dtype=np.uint8)
    out[:, 0] = 1
    out[:, 1:5] = np.frombuffer(np.uint32(POINT).tobytes(), dtype=np.uint8)
    out[:, 5:13] = np.asarray(xs, dtype="<f8").reshape(-1, 1).view(np.uint8)
    out[:, 13:21] = np.asarray(ys, dtype="<f8").reshape(-1, 1).view(np.uint8)
    return [r.tobytes() for r in out]


def _pack_coords(coords: np.ndarray) -> bytes:
    coords = np.ascontiguousarray(np.asarray(coords, dtype="<f8"))
    return struct.pack("<I", len(coords)) + coords.tobytes()


def wkb_linestring(coords) -> bytes:
    return _HDR.pack(1, LINESTRING) + _pack_coords(coords)


def wkb_polygon(exterior, holes=()) -> bytes:
    rings = [np.asarray(exterior, dtype=np.float64)] + [
        np.asarray(h, dtype=np.float64) for h in holes
    ]
    body = struct.pack("<I", len(rings)) + b"".join(_pack_coords(r) for r in rings)
    return _HDR.pack(1, POLYGON) + body


def wkb_multipoint(points) -> bytes:
    body = struct.pack("<I", len(points)) + b"".join(
        wkb_point(x, y) for x, y in points
    )
    return _HDR.pack(1, MULTIPOINT) + body


def wkb_multilinestring(lines) -> bytes:
    body = struct.pack("<I", len(lines)) + b"".join(
        wkb_linestring(ls) for ls in lines
    )
    return _HDR.pack(1, MULTILINESTRING) + body


def wkb_multipolygon(polys) -> bytes:
    """polys: iterable of (exterior, holes) tuples."""
    body = struct.pack("<I", len(polys)) + b"".join(
        wkb_polygon(ext, holes) for ext, holes in polys
    )
    return _HDR.pack(1, MULTIPOLYGON) + body


def encode_wkb(geom) -> bytes:
    """Encode a decoded geometry tuple back to WKB (inverse of
    :func:`decode_wkb`; MultiPoint also accepts an (N,2) array)."""
    t, payload = geom
    if t == "Point":
        return wkb_point(payload[0, 0], payload[0, 1])
    if t == "LineString":
        return wkb_linestring(payload)
    if t == "Polygon":
        return wkb_polygon(payload[0], payload[1:])
    if t == "MultiPoint":
        pts = np.vstack(payload) if isinstance(payload, list) else np.asarray(payload)
        return wkb_multipoint([(p[0], p[1]) for p in pts])
    if t == "MultiLineString":
        return wkb_multilinestring(payload)
    if t == "MultiPolygon":
        return wkb_multipolygon([(rings[0], rings[1:]) for rings in payload])
    raise ValueError(f"unsupported geometry type {t!r}")


# ---------------------------------------------------------------- decode

def _read_coords(buf: memoryview, off: int) -> tuple[np.ndarray, int]:
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    arr = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
    return arr, off + 16 * n


def _decode_at(buf: memoryview, off: int):
    byte_order, gtype = struct.unpack_from("<BI", buf, off)
    if byte_order != 1:  # pragma: no cover - we only emit LE
        raise ValueError("big-endian WKB not supported")
    off += 5
    if gtype == POINT:
        x, y = struct.unpack_from("<dd", buf, off)
        return ("Point", np.array([[x, y]])), off + 16
    if gtype == LINESTRING:
        coords, off = _read_coords(buf, off)
        return ("LineString", coords), off
    if gtype == POLYGON:
        (nrings,) = struct.unpack_from("<I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            ring, off = _read_coords(buf, off)
            rings.append(ring)
        return ("Polygon", rings), off
    if gtype in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON):
        (nparts,) = struct.unpack_from("<I", buf, off)
        off += 4
        parts = []
        for _ in range(nparts):
            part, off = _decode_at(buf, off)
            parts.append(part[1])
        return (TYPE_NAMES[gtype], parts), off
    raise ValueError(f"unsupported WKB type {gtype}")


def decode_wkb(wkb: bytes):
    """Decode one WKB blob → (type_name, payload).

    payload: Point/LineString → (N,2) ndarray; Polygon → [rings];
    MultiPoint → [(1,2) ndarrays]; MultiLineString → [coords];
    MultiPolygon → [[rings], ...].
    """
    geom, _ = _decode_at(memoryview(wkb), 0)
    return geom


def iter_rings(geom) -> list[np.ndarray]:
    """All polygon rings (exterior + holes) of a Polygon/MultiPolygon."""
    t, payload = geom
    if t == "Polygon":
        return list(payload)
    if t == "MultiPolygon":
        return [r for rings in payload for r in rings]
    raise ValueError(f"not a polygonal geometry: {t}")


def iter_polygons(geom) -> list[list[np.ndarray]]:
    """List of [rings] per polygon part (1 for Polygon, n for MultiPolygon)."""
    t, payload = geom
    if t == "Polygon":
        return [payload]
    if t == "MultiPolygon":
        return list(payload)
    raise ValueError(f"not a polygonal geometry: {t}")


def all_coords(geom) -> np.ndarray:
    """Stacked (N,2) coordinate array of any geometry."""
    t, payload = geom
    if t in ("Point", "LineString"):
        return payload
    if t == "Polygon":
        return np.vstack(payload)
    if t == "MultiPoint":
        return np.vstack(payload)
    if t == "MultiLineString":
        return np.vstack(payload)
    if t == "MultiPolygon":
        return np.vstack([r for rings in payload for r in rings])
    raise ValueError(t)


def geom_bbox(wkb: bytes) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax) — mirrors per-type bbox computation in the
    reference (``pythongis/vector/data.py:176-199``)."""
    coords = all_coords(decode_wkb(wkb))
    return (
        float(coords[:, 0].min()),
        float(coords[:, 1].min()),
        float(coords[:, 0].max()),
        float(coords[:, 1].max()),
    )
