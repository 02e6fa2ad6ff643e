"""Coordinate reprojection without pyproj (not installed): exact closed
forms for the projections that matter to tiling — WGS84 lon/lat ↔ Web
Mercator (EPSG:3857) and equirectangular.

Reference analog: ``pythongis/vector/manager.py:822-846`` (pyproj batch
transform). Point columns transform in pure Catalyst expressions
(whole-stage codegen); WKB geometries via a vectorized pandas UDF over
all coordinates.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

R_MAJOR = 6378137.0
MAX_LAT = 85.05112877980659  # web-mercator square clamp


def webmercator_x(lon: Column) -> Column:
    return F.radians(lon) * R_MAJOR


def webmercator_y(lat: Column) -> Column:
    clamped = F.greatest(F.lit(-MAX_LAT), F.least(F.lit(MAX_LAT), lat))
    return F.log(F.tan(F.lit(math.pi / 4) + F.radians(clamped) / 2)) * R_MAJOR


def inv_webmercator_lon(x: Column) -> Column:
    return F.degrees(x / F.lit(R_MAJOR))


def inv_webmercator_lat(y: Column) -> Column:
    return F.degrees(2 * F.atan(F.exp(y / F.lit(R_MAJOR))) - F.lit(math.pi / 2))


def reproject_points(
    df: DataFrame, lon: str = "lon", lat: str = "lat",
    to: str = "EPSG:3857", out_x: str = "x_m", out_y: str = "y_m",
) -> DataFrame:
    """Attach projected point columns — JVM-side, no Python."""
    if to in ("EPSG:3857", "webmercator"):
        return df.withColumn(out_x, webmercator_x(F.col(lon))).withColumn(
            out_y, webmercator_y(F.col(lat))
        )
    if to in ("EPSG:4087", "equirect"):
        k = math.pi / 180.0 * R_MAJOR
        return df.withColumn(out_x, F.col(lon) * k).withColumn(out_y, F.col(lat) * k)
    fwd = _param_forward(to)
    if fwd is not None:
        from pyspark.sql import types as T

        schema = T.StructType(
            [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
        )

        @F.pandas_udf(schema)
        def proj(lo: pd.Series, la: pd.Series) -> pd.DataFrame:
            x, y = fwd(lo.to_numpy(np.float64), la.to_numpy(np.float64))
            return pd.DataFrame({"x": x, "y": y}, index=lo.index)

        st = proj(F.col(lon), F.col(lat))
        return df.withColumn("_p", st).withColumn(out_x, F.col("_p.x")).withColumn(
            out_y, F.col("_p.y")
        ).drop("_p")
    raise ValueError(f"unsupported target {to!r} (pyproj not installed)")


def _param_forward(to):
    """Forward transform fn(lon_arr, lat_arr) -> (x, y) for the
    ellipsoidal projections in :mod:`.crs`: 'EPSG:326xx'/'EPSG:327xx'
    (UTM), ('utm', zone, north), ('lcc', {lat1,lat2,lat0,lon0,...}),
    ('aea', {...}), ('tmerc', {...}) — plus any PROJ.4 ``+proj=...``
    string, OGC WKT1 ``PROJCS`` block, or table-known EPSG code via
    :mod:`.proj_parse` (the reference's pyproj-style arbitrary-CRS
    surface, closed parser-first)."""
    from pythongis_spark.geometry import crs

    if isinstance(to, str) and to.upper().startswith("EPSG:32"):
        code = int(to.split(":")[1])
        if 32601 <= code <= 32660:
            return lambda lo, la: crs.utm_forward(lo, la, code - 32600, True)
        if 32701 <= code <= 32760:
            return lambda lo, la: crs.utm_forward(lo, la, code - 32700, False)
        return None
    if isinstance(to, tuple):
        kind = to[0]
        if kind == "utm":
            _, zone, north = to
            return lambda lo, la: crs.utm_forward(lo, la, zone, north)
        if kind == "lcc":
            p = crs.LambertConformal(**to[1])
            return p.forward
        if kind == "aea":
            p = crs.AlbersEqualArea(**to[1])
            return p.forward
        if kind == "tmerc":
            from pythongis_spark.geometry import proj_parse

            return proj_parse.forward(dict(to[1], proj="tmerc"))
    if isinstance(to, str) and (
        to.startswith("+") or to.lstrip().startswith(("PROJCS", "GEOGCS"))
        or to.upper().startswith("EPSG:")
    ):
        from pythongis_spark.geometry import proj_parse

        try:
            return proj_parse.forward(to)
        except (NotImplementedError, ValueError):
            return None
    return None


def _np_fwd(to: str):
    if to in ("EPSG:3857", "webmercator"):
        def f(coords: np.ndarray) -> np.ndarray:
            lon = coords[:, 0]
            lat = np.clip(coords[:, 1], -MAX_LAT, MAX_LAT)
            x = np.radians(lon) * R_MAJOR
            y = np.log(np.tan(np.pi / 4 + np.radians(lat) / 2)) * R_MAJOR
            return np.stack([x, y], axis=1)

        return f
    if to in ("EPSG:4326", "wgs84"):
        def f(coords: np.ndarray) -> np.ndarray:
            lon = np.degrees(coords[:, 0] / R_MAJOR)
            lat = np.degrees(2 * np.arctan(np.exp(coords[:, 1] / R_MAJOR)) - np.pi / 2)
            return np.stack([lon, lat], axis=1)

        return f
    fwd = _param_forward(to)
    if fwd is not None:
        def f(coords: np.ndarray) -> np.ndarray:
            x, y = fwd(coords[:, 0], coords[:, 1])
            return np.stack([x, y], axis=1)

        return f
    raise ValueError(f"unsupported target {to!r}")


def reproject_geom(df: DataFrame, to: str = "EPSG:3857", geom: str = "geom") -> DataFrame:
    """Transform every coordinate of a WKB geometry column (vectorized;
    the reference's per-feature ``Feature.transform``,
    ``pythongis/vector/data.py:249-310``)."""
    from pythongis_spark.geometry import wkb as W

    fwd = _np_fwd(to)

    @F.pandas_udf("binary")
    def tr(blobs: pd.Series) -> pd.Series:
        out = []
        for blob in blobs.to_numpy(object):
            if blob is None:
                out.append(None)
                continue
            t, payload = W.decode_wkb(bytes(blob))
            if t == "Point":
                c = fwd(payload)
                out.append(W.wkb_point(c[0, 0], c[0, 1]))
            elif t == "LineString":
                out.append(W.wkb_linestring(fwd(payload)))
            elif t == "Polygon":
                out.append(W.wkb_polygon(fwd(payload[0]), [fwd(h) for h in payload[1:]]))
            elif t == "MultiPoint":
                out.append(W.wkb_multipoint(np.vstack([fwd(p) for p in payload])))
            elif t == "MultiLineString":
                out.append(W.wkb_multilinestring([fwd(c) for c in payload]))
            elif t == "MultiPolygon":
                out.append(
                    W.wkb_multipolygon(
                        [(fwd(r[0]), [fwd(h) for h in r[1:]]) for r in payload]
                    )
                )
            else:
                out.append(None)
        return pd.Series(out, index=blobs.index)

    return df.withColumn(geom, tr(F.col(geom)))
