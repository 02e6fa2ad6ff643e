"""Datum shifts + non-WGS84 ellipsoids (geometry/datum.py, r5).

Reference analog: ``pythongis/vector/manager.py:822-846`` reprojects via
pyproj, which performs these datum transformations for CRS pairs on
different datums. pyproj is banned in this image, so the anchors here
are published worked examples and closed-form invariants:

- the Ordnance Survey's worked example from "A guide to coordinate
  systems in Great Britain" (OSGB36 geodetic -> National Grid E/N),
- exact round-trip closure of the Helmert position-vector transform
  (the reverse leg is the exact matrix inverse),
- geocentric conversion identities on the ellipsoid surface.
"""

import numpy as np
import pytest

from pythongis_spark.geometry import datum as D
from pythongis_spark.geometry import proj_parse as PP

AIRY = D.ELLIPSOIDS["airy"]

# OS worked example point (Annex of the OS coordinate-systems guide):
# phi = 52°39'27.2531" N, lam = 1°43'4.5177" E (OSGB36 geodetic)
OS_LAT = 52 + 39 / 60 + 27.2531 / 3600
OS_LON = 1 + 43 / 60 + 4.5177 / 3600


def _bng_tm():
    return D.TransverseMercator(
        AIRY, lon0=-2.0, k0=0.9996012717, x0=400_000.0, y0=-100_000.0,
        lat0=49.0)


def test_os_worked_example_airy_tm():
    """Published OS E/N: 651409.903, 313177.270 — the Karney n^4 series
    on Airy 1830 must land within a millimeter of the OS's own
    (Redfearn-series) result."""
    x, y = _bng_tm().forward(np.array([OS_LON]), np.array([OS_LAT]))
    assert x[0] == pytest.approx(651409.903, abs=1.5e-3)
    assert y[0] == pytest.approx(313177.270, abs=1.5e-3)


def test_airy_tm_roundtrip_grid():
    lon, lat = np.meshgrid(np.linspace(-7.5, 1.8, 7), np.linspace(49.9, 60.8, 7))
    tm = _bng_tm()
    x, y = tm.forward(lon.ravel(), lat.ravel())
    lon2, lat2 = tm.inverse(x, y)
    # n^4 series truncation on Airy: ~2e-11 deg (sub-3-µm)
    assert np.abs(lon2 - lon.ravel()).max() < 5e-11
    assert np.abs(lat2 - lat.ravel()).max() < 5e-11


def test_geocentric_roundtrip():
    lon = np.linspace(-179.0, 179.0, 41)
    lat = np.linspace(-89.0, 89.0, 41)
    for ell in (D.WGS84, AIRY, D.ELLIPSOIDS["bessel"]):
        X, Y, Z = D.geodetic_to_geocentric(lon, lat, ell)
        lon2, lat2 = D.geocentric_to_geodetic(X, Y, Z, ell)
        assert np.abs(lon2 - lon).max() < 1e-12
        # fixed 4-iteration recursion: < 1e-8 deg (~1 mm) on the surface
        assert np.abs(lat2 - lat).max() < 1e-8
    # equator / pole exact identities
    X, Y, Z = D.geodetic_to_geocentric(np.array([0.0]), np.array([0.0]), AIRY)
    assert X[0] == pytest.approx(AIRY.a, abs=1e-9) and Z[0] == 0.0


def test_helmert_exact_inverse_and_identity():
    h = D.Helmert([446.448, -125.157, 542.06, 0.15, 0.247, 0.842, -20.489])
    X = np.array([3874938.4, 3898.1, -2349535.2])
    Y = np.array([116218.6, -4723837.9, 4811321.7])
    Z = np.array([5047168.2, 4244292.3, 3170373.8])
    X2, Y2, Z2 = h.inverse(*h.forward(X, Y, Z))
    assert np.abs(X2 - X).max() < 1e-8
    assert np.abs(Y2 - Y).max() < 1e-8
    assert np.abs(Z2 - Z).max() < 1e-8
    # 3-param form pads rotations/scale with zeros; identity detected
    assert D.Helmert([0, 0, 0]).identity
    h3 = D.Helmert([-87.0, -96.0, -120.0])
    Xo, Yo, Zo = h3.forward(X, Y, Z)
    assert np.allclose(Xo - X, -87.0) and np.allclose(Zo - Z, -120.0)
    with pytest.raises(ValueError, match="3 or 7"):
        D.Helmert([1, 2, 3, 4])


def test_epsg_27700_full_chain():
    """WGS84 lon/lat -> British National Grid through the parsed EPSG
    code: Helmert (WGS84->OSGB36 exact-inverse leg) + Airy TM."""
    f, i = PP.forward("EPSG:27700"), PP.inverse("EPSG:27700")
    lon = np.array([-0.1278, -2.0, -3.1883, 1.7177])
    lat = np.array([51.5074, 49.0, 55.9533, 52.6575])
    x, y = f(lon, lat)
    lon2, lat2 = i(x, y)
    assert np.abs(lon2 - lon).max() < 5e-8
    assert np.abs(lat2 - lat).max() < 5e-8
    # the datum leg moves points by the OSGB36<->WGS84 offset (~60-130 m
    # over GB), distinct from the projection-only result
    x0, y0 = _bng_tm().forward(lon, lat)
    d = np.hypot(x - x0, y - y0)
    assert (d > 60.0).all() and (d < 140.0).all()
    # London lands in the published 500x500 km grid square TQ
    assert 500_000 < x[0] < 600_000 and 100_000 < y[0] < 200_000


def test_epsg_ed50_utm_and_dhdn_gk():
    # ED50 / UTM 31N over Paris: ~180 m NE of the WGS84 UTM position
    f = PP.forward("EPSG:23031")
    x, y = f(np.array([2.35]), np.array([48.85]))
    from pythongis_spark.geometry import crs as C

    xw, yw = C.utm_forward(np.array([2.35]), np.array([48.85]), 31, True)
    d = float(np.hypot(x - xw, y - yw)[0])
    assert 100.0 < d < 300.0
    lon2, lat2 = PP.inverse("EPSG:23031")(x, y)
    assert abs(lon2[0] - 2.35) < 5e-8 and abs(lat2[0] - 48.85) < 5e-8
    # DHDN / Gauss-Krüger zone 3 (Bessel): false easting 3.5e6 at lon 9
    x, y = PP.forward("EPSG:31467")(np.array([9.0]), np.array([50.0]))
    assert abs(x[0] - 3_500_000.0) < 150.0  # datum shift only
    lon2, lat2 = PP.inverse("EPSG:31467")(x, y)
    assert abs(lon2[0] - 9.0) < 5e-8 and abs(lat2[0] - 50.0) < 5e-8


def test_epsg_4277_geographic_shift():
    """EPSG:4277 = OSGB36 geodetic: pure datum shift, no projection."""
    f = PP.forward("EPSG:4277")
    lon, lat = np.array([-0.1278]), np.array([51.5074])
    lo, la = f(lon, lat)
    dist_m = float(np.hypot((lo - lon) * 111_320 * np.cos(np.radians(51.5)),
                            (la - lat) * 111_320)[0])
    assert 60.0 < dist_m < 140.0
    lon2, lat2 = PP.inverse("EPSG:4277")(lo, la)
    assert abs(lon2[0] - lon[0]) < 5e-8 and abs(lat2[0] - lat[0]) < 5e-8


def test_wkt1_towgs84_parse_matches_epsg():
    """A real-world EPSG:27700 WKT1 block (Airy spheroid + TOWGS84 node)
    resolves to the same transform as the built-in EPSG entry."""
    wkt = (
        'PROJCS["OSGB 1936 / British National Grid",GEOGCS["OSGB 1936",'
        'DATUM["OSGB_1936",SPHEROID["Airy 1830",6377563.396,299.3249646],'
        'TOWGS84[446.448,-125.157,542.06,0.15,0.247,0.842,-20.489]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],'
        'PARAMETER["latitude_of_origin",49],'
        'PARAMETER["central_meridian",-2],'
        'PARAMETER["scale_factor",0.9996012717],'
        'PARAMETER["false_easting",400000],'
        'PARAMETER["false_northing",-100000],UNIT["metre",1]]'
    )
    lon = np.array([-0.1278, -3.1883])
    lat = np.array([51.5074, 55.9533])
    xe, ye = PP.forward("EPSG:27700")(lon, lat)
    x, y = PP.forward(wkt)(lon, lat)
    assert np.array_equal(x, xe) and np.array_equal(y, ye)


def test_datum_shortcut_and_geogcs_wkt():
    # +datum=OSGB36 expands to airy + towgs84 (PROJ datum table)
    p = PP.normalize("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
                     "+x_0=400000 +y_0=-100000 +datum=OSGB36")
    assert p["ellps"] == "airy" and "towgs84" in p
    # GEOGCS-only WKT with a TOWGS84 node keeps the datum leg
    wkt = ('GEOGCS["OSGB 1936",DATUM["OSGB_1936",'
           'SPHEROID["Airy 1830",6377563.396,299.3249646],'
           'TOWGS84[446.448,-125.157,542.06,0.15,0.247,0.842,-20.489]],'
           'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]')
    p = PP.parse_wkt(wkt)
    assert p["proj"] == "longlat" and p["ellps"] == "airy"
    lo, la = PP.forward(wkt)(np.array([-0.1278]), np.array([51.5074]))
    loe, lae = PP.forward("EPSG:4277")(np.array([-0.1278]), np.array([51.5074]))
    assert lo[0] == loe[0] and la[0] == lae[0]


def test_reproject_points_epsg27700_spark(spark):
    """reproject_points through the parsed 27700 chain matches the
    direct numpy transform bit-for-bit (one pandas-UDF stage)."""
    import pandas as pd

    from pythongis_spark.geometry.projections import reproject_points

    pdf = pd.DataFrame({"lon": [-0.1278, -2.25, 0.5], "lat": [51.5074, 53.0, 52.0]})
    out = reproject_points(
        spark.createDataFrame(pdf), to="EPSG:27700"
    ).toPandas().sort_values("lon").reset_index(drop=True)
    xe, ye = PP.forward("EPSG:27700")(
        np.sort(pdf["lon"].to_numpy()),
        pdf.sort_values("lon")["lat"].to_numpy())
    assert np.array_equal(out["x_m"].to_numpy(), xe)
    assert np.array_equal(out["y_m"].to_numpy(), ye)
