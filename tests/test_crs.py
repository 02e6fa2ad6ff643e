"""Ellipsoidal projections (Karney TM / Snyder LCC & Albers) — property
tests: round trips, known geodetic constants, scale/area laws."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pythongis_spark.geometry import crs

QUARTER_MERIDIAN = 10001965.729  # WGS84 meridian arc equator->pole (m)


def _merid_radius(phi_deg):
    phi = math.radians(phi_deg)
    return crs.A_ * (1 - crs.E2) / (1 - crs.E2 * math.sin(phi) ** 2) ** 1.5


def test_utm_roundtrip_submm_in_zone():
    rng = np.random.Generator(np.random.PCG64(5))
    for zone, north in [(18, True), (32, True), (55, False)]:
        lon0 = -183 + 6 * zone
        lon = lon0 + rng.uniform(-2.9, 2.9, 50)
        lat = rng.uniform(2, 80, 50) * (1 if north else -1)
        x, y = crs.utm_forward(lon, lat, zone, north)
        lon2, lat2 = crs.utm_inverse(x, y, zone, north)
        assert np.abs(lon2 - lon).max() * 111_000 < 1e-3  # < 1 mm
        assert np.abs(lat2 - lat).max() * 111_000 < 1e-3


def test_utm_anchors():
    # central meridian x equator -> false easting / northing exactly
    x, y = crs.utm_forward(np.array([-75.0]), np.array([0.0]), 18, True)
    assert x[0] == 500_000.0 and y[0] == 0.0
    # northing to the pole = k0 * quarter meridian (known WGS84 constant)
    x, y = crs.utm_forward(np.array([-75.0]), np.array([89.999999]), 18, True)
    assert y[0] == pytest.approx(0.9996 * QUARTER_MERIDIAN, abs=1.0)
    # southern hemisphere false northing
    x, y = crs.utm_forward(np.array([147.0]), np.array([-0.0001]), 55, False)
    assert y[0] == pytest.approx(10_000_000.0, abs=20)


def test_tmerc_scale_at_central_meridian():
    # d(northing)/d(meridian arc) == k0 along the CM (ellipsoidal M(phi))
    for lat in (0.0, 25.0, 60.0):
        _, y1 = crs.tmerc_forward(np.array([3.0]), np.array([lat]), 3.0, 0.9996, 0, 0)
        _, y2 = crs.tmerc_forward(np.array([3.0]), np.array([lat + 1e-4]), 3.0, 0.9996, 0, 0)
        arc = _merid_radius(lat) * math.radians(1e-4)
        assert (y2[0] - y1[0]) / arc == pytest.approx(0.9996, rel=1e-6)


def test_lcc_roundtrip_and_scale_true_parallels():
    lcc = crs.LambertConformal(33, 45, 39, -96)
    rng = np.random.Generator(np.random.PCG64(6))
    lon = rng.uniform(-120, -70, 50)
    lat = rng.uniform(25, 50, 50)
    x, y = lcc.forward(lon, lat)
    lon2, lat2 = lcc.inverse(x, y)
    assert np.abs(lon2 - lon).max() < 1e-12
    assert np.abs(lat2 - lat).max() < 1e-10
    # scale factor along a standard parallel == 1 (conformal 2SP law):
    for sp in (33.0, 45.0):
        x1, y1 = lcc.forward(np.array([-96.0]), np.array([sp]))
        x2, y2 = lcc.forward(np.array([-95.999]), np.array([sp]))
        d_proj = math.hypot(x2[0] - x1[0], y2[0] - y1[0])
        # ellipsoidal parallel arc: N(phi) cos(phi) dlambda
        nrad = crs.A_ / math.sqrt(1 - crs.E2 * math.sin(math.radians(sp)) ** 2)
        d_true = nrad * math.cos(math.radians(sp)) * math.radians(0.001)
        assert d_proj / d_true == pytest.approx(1.0, rel=1e-6)


def test_albers_roundtrip_and_area_preservation():
    aea = crs.AlbersEqualArea(29.5, 45.5, 37.5, -96)
    rng = np.random.Generator(np.random.PCG64(7))
    lon = rng.uniform(-120, -70, 50)
    lat = rng.uniform(22, 52, 50)
    x, y = aea.forward(lon, lat)
    lon2, lat2 = aea.inverse(x, y)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9
    # equal-area law: projected area of a small quad == ellipsoidal area
    for lo, la in [(-100.0, 30.0), (-90.0, 44.0)]:
        d = 0.01
        quad_lon = np.array([lo, lo + d, lo + d, lo])
        quad_lat = np.array([la, la, la + d, la + d])
        qx, qy = aea.forward(quad_lon, quad_lat)
        area_proj = 0.5 * abs(
            np.dot(qx, np.roll(qy, -1)) - np.dot(qy, np.roll(qx, -1))
        )
        phi = math.radians(la + d / 2)
        # ellipsoid surface element: M(phi) N(phi) cos(phi) dphi dlambda
        m = crs.A_ * (1 - crs.E2) / (1 - crs.E2 * math.sin(phi) ** 2) ** 1.5
        nn = crs.A_ / math.sqrt(1 - crs.E2 * math.sin(phi) ** 2)
        area_true = m * nn * math.cos(phi) * math.radians(d) ** 2
        assert area_proj / area_true == pytest.approx(1.0, rel=1e-5)


def test_utm_zone_helper():
    assert crs.utm_zone(-77.0, 38.9) == (18, True)
    assert crs.utm_zone(147.0, -41.2) == (55, False)
    assert crs.utm_zone(-180.0, 10.0)[0] == 1
    assert crs.utm_zone(179.9, 10.0)[0] == 60


def test_reproject_points_utm_spark(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from pythongis_spark.geometry.projections import reproject_points

    pdf = pd.DataFrame({"id": [1, 2], "lon": [-75.5, -74.2], "lat": [40.0, 41.5]})
    df = spark.createDataFrame(pdf)
    out = reproject_points(df, to="EPSG:32618").toPandas().set_index("id")
    x, y = crs.utm_forward(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 18, True)
    assert out["x_m"].to_numpy() == pytest.approx(x)
    assert out["y_m"].to_numpy() == pytest.approx(y)
    out2 = reproject_points(
        df, to=("lcc", dict(lat1=33, lat2=45, lat0=39, lon0=-96))
    ).toPandas()
    assert out2["x_m"].notna().all()


def test_reproject_geom_utm_spark(spark):
    import pandas as pd
    from pythongis_spark.geometry import wkb as W
    from pythongis_spark.geometry.projections import reproject_geom

    ring = np.array([[-75.5, 40.0], [-75.0, 40.0], [-75.0, 40.5], [-75.5, 40.5], [-75.5, 40.0]])
    df = spark.createDataFrame(pd.DataFrame({"fid": [1], "geom": [W.wkb_polygon(ring)]}))
    out = reproject_geom(df, to="EPSG:32618").collect()[0]
    g = W.decode_wkb(bytes(out["geom"]))
    coords = W.all_coords(g)
    ex, ey = crs.utm_forward(ring[:, 0], ring[:, 1], 18, True)
    assert coords[:, 0] == pytest.approx(ex)
    assert coords[:, 1] == pytest.approx(ey)
