"""Pure-numpy geometry kernel.

The reference backs geometry ops with shapely/GEOS
(``pythongis/vector/geometry.py:7``); shapely is not available in this
environment, so the kernel is implemented from scratch in numpy — which
also keeps every predicate bit-for-bit deterministic across cluster sizes
(a requirement of the scaling-efficiency goldens).

Geometry interchange format: WKB ``binary`` columns (little-endian, 2-D,
types 1..6 = Point/LineString/Polygon/MultiPoint/MultiLineString/
MultiPolygon). In-Python decoded form is ``(type_name, payload)`` with
numpy ``(N,2)`` float64 coordinate arrays.
"""

from pythongis_spark.geometry.wkb import (  # noqa: F401
    wkb_point,
    wkb_points_vectorized,
    wkb_linestring,
    wkb_polygon,
    wkb_multipolygon,
    wkb_multipoint,
    wkb_multilinestring,
    decode_wkb,
    geom_bbox,
)
