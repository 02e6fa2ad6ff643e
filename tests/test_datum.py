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


# ---------------- conic / Mercator families on non-WGS84 datums (r5)


def _fd_scale(fwd, lon_deg, lat_deg, ell):
    """Finite-difference parallel scale factor h_lam of a projection at
    a point, measured on the given ellipsoid (dx per unit of true
    ellipsoidal distance along the parallel)."""
    d = 1e-7
    x1, y1 = fwd(np.array([lon_deg]), np.array([lat_deg]))
    x2, y2 = fwd(np.array([lon_deg + d]), np.array([lat_deg]))
    phi = np.radians(lat_deg)
    N = ell.a / np.sqrt(1 - ell.e2 * np.sin(phi) ** 2)
    return float(np.hypot(x2 - x1, y2 - y1)[0] / (np.radians(d) * N * np.cos(phi)))


def test_lcc_1sp_k0_scale_law_clrk80ign():
    """LCC 1SP (EPSG 9801): local scale at the latitude of origin equals
    k0 exactly — on Clarke 1880 IGN (the NTF Lambert-zone form)."""
    from pythongis_spark.geometry import crs as C

    ell = D.ELLIPSOIDS["clrk80ign"]
    k0 = 0.99987742
    inst = C.LambertConformal(46.8, 46.8, 46.8, 0.0, 600_000.0,
                              2_200_000.0, k0=k0, a=ell.a, e=ell.e)
    assert _fd_scale(inst.forward, 0.0, 46.8, ell) == pytest.approx(k0, rel=1e-7)
    # 200 km north: scale grows away from the standard parallel
    assert _fd_scale(inst.forward, 0.0, 48.8, ell) > k0
    # round trip
    lon = np.array([-1.2, 0.0, 3.4])
    lat = np.array([45.1, 46.8, 48.9])
    lon2, lat2 = inst.inverse(*inst.forward(lon, lat))
    assert np.abs(lon2 - lon).max() < 1e-11
    assert np.abs(lat2 - lat).max() < 1e-11


def test_lcc_2sp_intl_standard_parallels():
    """Belgian Lambert 72's projection core (intl ellipsoid): scale is
    exactly 1 on both standard parallels, < 1 between them."""
    p = PP.normalize("EPSG:31370")
    ell = D.ELLIPSOIDS["intl"]
    inst = PP._conic_of(p, a=ell.a, e=ell.e)
    for sp in (51.16666723333333, 49.8333339):
        assert _fd_scale(inst.forward, 4.5, sp, ell) == pytest.approx(1.0, rel=1e-7)
    assert _fd_scale(inst.forward, 4.5, 50.5, ell) < 1.0


def test_albers_equal_area_law_intl():
    """Albers on a non-WGS84 ellipsoid: h * k = 1 everywhere (meridian
    scale is the reciprocal of the parallel scale)."""
    from pythongis_spark.geometry import crs as C

    ell = D.ELLIPSOIDS["intl"]
    inst = C.AlbersEqualArea(40.0, 50.0, 45.0, 10.0, a=ell.a, e=ell.e)
    d = 1e-7
    for lat0 in (41.0, 45.0, 52.0):
        k = _fd_scale(inst.forward, 12.0, lat0, ell)
        x1, y1 = inst.forward(np.array([12.0]), np.array([lat0]))
        x2, y2 = inst.forward(np.array([12.0]), np.array([lat0 + d]))
        phi = np.radians(lat0)
        M = (ell.a * (1 - ell.e2)
             / (1 - ell.e2 * np.sin(phi) ** 2) ** 1.5)
        h = float(np.hypot(x2 - x1, y2 - y1)[0] / (np.radians(d) * M))
        assert h * k == pytest.approx(1.0, rel=1e-6)


def test_mercator_bessel_scale_and_roundtrip():
    from pythongis_spark.geometry import crs as C

    ell = D.ELLIPSOIDS["bessel"]
    fwd = lambda lo, la: C.merc_forward(lo, la, lon0=110.0, a=ell.a, e=ell.e)  # noqa: E731
    # equatorial scale is exactly k0 = 1 on any ellipsoid
    assert _fd_scale(fwd, 112.0, 1e-9, ell) == pytest.approx(1.0, rel=1e-7)
    x, y = C.merc_forward(np.array([112.0]), np.array([-7.25]),
                          lon0=110.0, a=ell.a, e=ell.e)
    lon2, lat2 = C.merc_inverse(x, y, lon0=110.0, a=ell.a, e=ell.e)
    assert abs(lon2[0] - 112.0) < 1e-11 and abs(lat2[0] + 7.25) < 1e-9


def test_epsg_31370_belgian_lambert():
    """EPSG:31370 end-to-end (intl + 7-param Helmert + LCC 2SP):
    Brussels Grand-Place lands at its known Lambert-72 coordinates
    (~148.9 km E, ~170.7 km N) and the WGS84 round trip closes."""
    f, i = PP.forward("EPSG:31370"), PP.inverse("EPSG:31370")
    x, y = f(np.array([4.3525]), np.array([50.8467]))
    assert abs(x[0] - 148_900.0) < 2_000.0
    assert abs(y[0] - 170_700.0) < 2_000.0
    lon2, lat2 = i(x, y)
    assert abs(lon2[0] - 4.3525) < 5e-8 and abs(lat2[0] - 50.8467) < 5e-8


def test_epsg_27572_ntf_lambert_zone_ii():
    """EPSG:27572 (NTF Paris / Lambert zone II étendu): the +pm=paris
    shift + Clarke 1880 IGN + 3-param Helmert + LCC 1SP. Central Paris
    lands near (601 km, 2429 km) and round-trips."""
    f, i = PP.forward("EPSG:27572"), PP.inverse("EPSG:27572")
    x, y = f(np.array([2.3522]), np.array([48.8566]))
    assert abs(x[0] - 601_000.0) < 3_000.0
    assert abs(y[0] - 2_428_500.0) < 3_000.0
    lon2, lat2 = i(x, y)
    assert abs(lon2[0] - 2.3522) < 5e-8 and abs(lat2[0] - 48.8566) < 5e-8
    # lon_0=0 means the PARIS meridian: a point on it maps to x ~ x_0
    xp, _ = f(np.array([2.337229166666667]), np.array([46.8]))
    assert abs(xp[0] - 600_000.0) < 150.0  # datum shift only


def test_pm_paris_equals_explicit_lon0():
    """+pm folds into the effective central meridian: +lon_0=0 +pm=paris
    is bit-identical to +lon_0=2.337229166666667 for projected CRS."""
    base = ("+proj=lcc +lat_1=46.8 +lat_0=46.8 +k_0=0.99987742 "
            "+x_0=600000 +y_0=2200000 +ellps=clrk80ign "
            "+towgs84=-168,-60,320,0,0,0,0 ")
    fa = PP.forward(base + "+lon_0=0 +pm=paris")
    fb = PP.forward(base + "+lon_0=2.337229166666667")
    lon = np.array([1.1, 2.35, 4.8])
    lat = np.array([45.5, 48.86, 50.1])
    xa, ya = fa(lon, lat)
    xb, yb = fb(lon, lat)
    assert (xa == xb).all() and (ya == yb).all()


def test_epsg_4807_paris_meridian_geographic():
    """EPSG:4807 (NTF Paris geographic): longitudes come back measured
    east of the Paris meridian — the Paris Observatory sits near 0."""
    f, i = PP.forward("EPSG:4807"), PP.inverse("EPSG:4807")
    lo, la = f(np.array([2.337229166666667]), np.array([48.8364]))
    # NTF<->WGS84 datum wobble is ~2.5e-3 deg in lon over France
    assert abs(lo[0]) < 5e-3 and abs(la[0] - 48.8364) < 5e-3
    lon2, lat2 = i(lo, la)
    assert abs(lon2[0] - 2.337229166666667) < 5e-8


def test_wkt_nonzero_primem_raises():
    wkt = ('PROJCS["NTF (Paris) / Lambert zone II",GEOGCS["NTF (Paris)",'
           'DATUM["NTF_Paris",SPHEROID["Clarke 1880 (IGN)",6378249.2,'
           '293.466021293627]],PRIMEM["Paris",2.5969213],'
           'UNIT["grad",0.01570796326794897]],'
           'PROJECTION["Lambert_Conformal_Conic_1SP"],'
           'PARAMETER["latitude_of_origin",52],'
           'PARAMETER["central_meridian",0],'
           'PARAMETER["scale_factor",0.99987742],'
           'PARAMETER["false_easting",600000],'
           'PARAMETER["false_northing",2200000],UNIT["metre",1]]')
    with pytest.raises(NotImplementedError, match="PRIMEM"):
        PP.parse_wkt(wkt)


def test_wgs84_defaults_bit_frozen():
    """The r5 ellipsoid parameterization must not move a single bit on
    the WGS84 default path (the 2154/5070 oracles are bit-frozen):
    k0=1.0 and a=A_/e=E_ multiply/substitute exactly."""
    from pythongis_spark.geometry import crs as C

    lon = np.linspace(-5.0, 9.0, 23)
    lat = np.linspace(41.0, 51.0, 23)
    l1 = C.LambertConformal(49, 44, 46.5, 3, 700000, 6600000)
    l2 = C.LambertConformal(49, 44, 46.5, 3, 700000, 6600000,
                            k0=1.0, a=C.A_, e=C.E_)
    for v1, v2 in zip(l1.forward(lon, lat), l2.forward(lon, lat)):
        assert (v1 == v2).all()
    a1 = C.AlbersEqualArea(29.5, 45.5, 23, -96)
    a2 = C.AlbersEqualArea(29.5, 45.5, 23, -96, a=C.A_, e=C.E_)
    for v1, v2 in zip(a1.forward(lon, lat), a2.forward(lon, lat)):
        assert (v1 == v2).all()
    m1 = C.merc_forward(lon, lat, 0.0, 1.0, 0.0, 0.0)
    m2 = C.merc_forward(lon, lat, 0.0, 1.0, 0.0, 0.0, a=C.A_, e=C.E_)
    assert (m1[0] == m2[0]).all() and (m1[1] == m2[1]).all()


# --------- oblique stereographic (RD New) + Swiss oblique cylindrical


def test_oblique_stereographic_epsg_guidance_example():
    """EPSG Guidance Note 7-2 worked example for Amersfoort / RD New
    (method 9809, Bessel 1841): phi = 53°N, lam = 6°E (Amersfoort
    geodetic) → E 196105.283, N 557057.739 — projection only, no
    datum leg."""
    ell = D.ELLIPSOIDS["bessel"]
    inst = D.ObliqueStereographic(
        ell, lat0=52.15616055555555, lon0=5.38763888888889,
        k0=0.9999079, x0=155_000.0, y0=463_000.0)
    x, y = inst.forward(np.array([6.0]), np.array([53.0]))
    assert x[0] == pytest.approx(196105.283, abs=2e-3)
    assert y[0] == pytest.approx(557057.739, abs=2e-3)
    # inverse of the published E/N reproduces the input coordinates
    lon2, lat2 = inst.inverse(np.array([196105.283]), np.array([557057.739]))
    assert lon2[0] == pytest.approx(6.0, abs=5e-9)
    assert lat2[0] == pytest.approx(53.0, abs=5e-9)


def test_oblique_stereographic_roundtrip_and_scale():
    ell = D.ELLIPSOIDS["bessel"]
    inst = D.ObliqueStereographic(
        ell, lat0=52.15616055555555, lon0=5.38763888888889,
        k0=0.9999079, x0=155_000.0, y0=463_000.0)
    lon, lat = np.meshgrid(np.linspace(3.3, 7.2, 6), np.linspace(50.7, 53.6, 6))
    x, y = inst.forward(lon.ravel(), lat.ravel())
    lon2, lat2 = inst.inverse(x, y)
    assert np.abs(lon2 - lon.ravel()).max() < 1e-9
    assert np.abs(lat2 - lat.ravel()).max() < 1e-9
    # scale at the origin equals k0; grows away from it (stereographic)
    k_origin = _fd_scale(inst.forward, 5.38763888888889, 52.15616055555555, ell)
    assert k_origin == pytest.approx(0.9999079, rel=1e-7)
    assert _fd_scale(inst.forward, 5.38763888888889, 53.6, ell) > 0.9999079
    # origin maps to the false origin exactly
    x0, y0 = inst.forward(np.array([5.38763888888889]),
                          np.array([52.15616055555555]))
    assert abs(x0[0] - 155_000.0) < 1e-6 and abs(y0[0] - 463_000.0) < 1e-6


def test_swiss_oblique_mercator_center_and_conformality():
    """CH1903/LV03: the projection center (old Bern observatory) maps
    EXACTLY to (600000, 200000) by construction; the projection is
    conformal (isotropic local scale) and k = 1 at the center."""
    ell = D.ELLIPSOIDS["bessel"]
    inst = D.SwissObliqueMercator(
        ell, lat0=46.95240555555556, lon0=7.439583333333333,
        k0=1.0, x0=600_000.0, y0=200_000.0)
    x, y = inst.forward(np.array([7.439583333333333]),
                        np.array([46.95240555555556]))
    assert abs(x[0] - 600_000.0) < 1e-6 and abs(y[0] - 200_000.0) < 1e-6
    assert _fd_scale(inst.forward, 7.439583333333333,
                     46.95240555555556, ell) == pytest.approx(1.0, rel=1e-7)
    # conformality: meridian scale == parallel scale away from center
    d = 1e-7
    for lo, la in ((8.5, 46.0), (6.6, 47.3)):
        k = _fd_scale(inst.forward, lo, la, ell)
        x1, y1 = inst.forward(np.array([lo]), np.array([la]))
        x2, y2 = inst.forward(np.array([lo]), np.array([la + d]))
        phi = np.radians(la)
        M = ell.a * (1 - ell.e2) / (1 - ell.e2 * np.sin(phi) ** 2) ** 1.5
        h = float(np.hypot(x2 - x1, y2 - y1)[0] / (np.radians(d) * M))
        assert h == pytest.approx(k, rel=1e-6)
    # round trip over Switzerland
    lon, lat = np.meshgrid(np.linspace(6.0, 10.5, 6), np.linspace(45.8, 47.8, 6))
    x, y = inst.forward(lon.ravel(), lat.ravel())
    lon2, lat2 = inst.inverse(x, y)
    assert np.abs(lon2 - lon.ravel()).max() < 1e-9
    assert np.abs(lat2 - lat.ravel()).max() < 1e-9


def test_epsg_28992_and_21781_end_to_end():
    """Parsed EPSG codes resolve with the datum leg: WGS84 input lands
    near the national-grid coordinates (shift ~a hundred meters from
    the projection-only result) and round-trips."""
    for code, lonlat, near in (
        ("EPSG:28992", (5.38763888888889, 52.15616055555555), (155_000.0, 463_000.0)),
        ("EPSG:21781", (7.439583333333333, 46.95240555555556), (600_000.0, 200_000.0)),
        ("EPSG:2056", (7.439583333333333, 46.95240555555556), (2_600_000.0, 1_200_000.0)),
    ):
        f, i = PP.forward(code), PP.inverse(code)
        x, y = f(np.array([lonlat[0]]), np.array([lonlat[1]]))
        d = float(np.hypot(x[0] - near[0], y[0] - near[1]))
        assert 10.0 < d < 400.0, (code, d)  # datum shift, not identity
        lon2, lat2 = i(x, y)
        assert abs(lon2[0] - lonlat[0]) < 5e-8
        assert abs(lat2[0] - lonlat[1]) < 5e-8


def test_krovak_prague_brno_and_roundtrip():
    """S-JTSK / Krovak East North (EPSG:5514): Prague and Brno land on
    their known national-grid coordinates (negative east-north
    orientation), and the WGS84 round trip closes."""
    f, i = PP.forward("EPSG:5514"), PP.inverse("EPSG:5514")
    x, y = f(np.array([14.4208, 16.6068]), np.array([50.0880, 49.1951]))
    assert abs(x[0] + 742_840.0) < 1_500.0   # Prague ~ -743 km
    assert abs(y[0] + 1_042_960.0) < 1_500.0  # ~ -1043 km
    assert abs(x[1] + 598_250.0) < 1_500.0   # Brno
    assert abs(y[1] + 1_160_750.0) < 1_500.0
    lon = np.linspace(12.2, 22.5, 9)
    lat = np.linspace(47.8, 51.0, 9)
    lon2, lat2 = i(*f(lon, lat))
    assert np.abs(lon2 - lon).max() < 5e-8
    assert np.abs(lat2 - lat).max() < 5e-8


def test_krovak_conformality_and_pseudo_parallel_scale():
    """Projection-only invariants on Bessel: Krovak is conformal
    (meridian scale == parallel scale) and the overall scale on the
    pseudo-standard parallel is the design k0 = 0.9999 (to the Gaussian-
    sphere residual, < 1e-5 near the center latitude)."""
    ell = D.ELLIPSOIDS["bessel"]
    inst = D.Krovak(ell, 49.5, 24.833333333333332, 30.28813972222222)
    d = 1e-7
    for lo, la in ((14.4, 50.1), (17.5, 48.7), (20.0, 49.3)):
        k = _fd_scale(inst.forward, lo, la, ell)
        x1, y1 = inst.forward(np.array([lo]), np.array([la]))
        x2, y2 = inst.forward(np.array([lo]), np.array([la + d]))
        phi = np.radians(la)
        M = ell.a * (1 - ell.e2) / (1 - ell.e2 * np.sin(phi) ** 2) ** 1.5
        h = float(np.hypot(x2 - x1, y2 - y1)[0] / (np.radians(d) * M))
        assert h == pytest.approx(k, rel=1e-6)
    # point on the pseudo-standard parallel along D = 0: U = 78.5 - alpha
    lon0 = 24.833333333333332
    lam_pt, phi_pt = inst.inverse(
        *(-np.array([0.0]), -np.array([inst.r0 * inst.tanP ** inst.n
                                       / np.tan(np.radians(78.5) / 2
                                                + np.pi / 4) ** inst.n])))
    # that inverse lands exactly on (lon0, phi at T = 78.5)
    assert lam_pt[0] == pytest.approx(lon0, abs=1e-9)
    k_psp = _fd_scale(inst.forward, lam_pt[0], phi_pt[0], ell)
    assert k_psp == pytest.approx(0.9999, abs=1e-5)


def test_warp_raster_to_rdnew_datum_chain(spark):
    """Raster warp through a parsed datum-shifted CRS: 4326 source →
    EPSG:28992 (RD New) target grid. Every output value must equal the
    source cell that the dst cell center inverse-projects into
    (numpy replay of the same Helmert + oblique-stereographic chain)."""
    import pyspark.sql.functions as F

    from pythongis_spark import fixtures as FX
    from pythongis_spark.raster.model import RasterDef, warp

    # source: 0.05° cells over 3-8°E, 50-54°N (100 x 80)
    w, h = 100, 80
    cells = FX.raster_cells(spark, w, h, 1)
    src = RasterDef(w, h, (0.05, 0.0, 3.0, 0.0, -0.05, 54.0))
    # target: 5 km cells over RD New 0..300 km E, 300..600 km N
    dst = RasterDef(60, 60, (5000.0, 0.0, 0.0, 0.0, -5000.0, 600000.0))
    out = warp(cells, src, dst, "EPSG:4326", "EPSG:28992",
               "nearest", spark=spark)
    got = {(r["x"], r["y"]): r["val"]
           for r in out.filter(F.col("band") == 0).collect()}
    srcv = {(r["x"], r["y"]): r["val"]
            for r in cells.filter(F.col("band") == 0).collect()}
    assert len(got) > 500  # NL window overlaps the source extent
    inv = PP.inverse("EPSG:28992")
    xs = np.array([k[0] for k in got])
    ys = np.array([k[1] for k in got])
    lon, lat = inv((xs + 0.5) * 5000.0, 600000.0 - (ys + 0.5) * 5000.0)
    sx = np.floor((lon - 3.0) / 0.05).astype(int)
    sy = np.floor((54.0 - lat) / 0.05).astype(int)
    for (k, vx, vy) in zip(got, sx, sy):
        assert got[k] == srcv[(vx, vy)]


# ------------------- Hotine oblique Mercator (EPSG 9812 / 9815, r5)


def test_omerc_epsg_guidance_example_rso_borneo():
    """EPSG Guidance Note 7-2 worked example for Timbalai 1948 / RSO
    Borneo (m) (method 9815 variant B, Everest 1830 1967 Definition):
    phi = 5°23'14.1129"N, lam = 115°48'19.8196"E (Timbalai geodetic)
    → E 679245.73, N 596562.78 — projection only, no datum leg."""
    ell = D.ELLIPSOIDS["evrstSS"]
    inst = D.HotineObliqueMercator(
        ell, lat0=4.0, lonc=115.0, alpha=53.31582047222222,
        gamma=53.13010236111111, k0=0.99984,
        x0=590476.87, y0=442857.65)
    lat = 5 + 23 / 60 + 14.1129 / 3600
    lon = 115 + 48 / 60 + 19.8196 / 3600
    x, y = inst.forward(np.array([lon]), np.array([lat]))
    assert x[0] == pytest.approx(679245.73, abs=5e-3)
    assert y[0] == pytest.approx(596562.78, abs=5e-3)
    # variant B maps the projection center exactly to (Ec, Nc)
    xc, yc = inst.forward(np.array([115.0]), np.array([4.0]))
    assert abs(xc[0] - 590476.87) < 1e-6 and abs(yc[0] - 442857.65) < 1e-6
    # inverse of the published E/N reproduces the input coordinates
    lon2, lat2 = inst.inverse(np.array([679245.73]), np.array([596562.78]))
    assert lon2[0] == pytest.approx(lon, abs=5e-8)
    assert lat2[0] == pytest.approx(lat, abs=5e-8)


def test_omerc_conformality_and_center_scale():
    """omerc is conformal (h == k away from the line) and the local
    scale at the projection center equals the design kc; scale grows
    away from the initial line (oblique Mercator law)."""
    ell = D.ELLIPSOIDS["evrstSS"]
    inst = D.HotineObliqueMercator(
        ell, lat0=4.0, lonc=115.0, alpha=53.31582047222222,
        gamma=53.13010236111111, k0=0.99984,
        x0=590476.87, y0=442857.65)
    assert _fd_scale(inst.forward, 115.0, 4.0, ell) == pytest.approx(
        0.99984, rel=1e-6)
    d = 1e-7
    for lo, la in ((117.0, 2.0), (113.0, 6.0)):  # perpendicular to the line
        k = _fd_scale(inst.forward, lo, la, ell)
        x1, y1 = inst.forward(np.array([lo]), np.array([la]))
        x2, y2 = inst.forward(np.array([lo]), np.array([la + d]))
        phi = np.radians(la)
        M = ell.a * (1 - ell.e2) / (1 - ell.e2 * np.sin(phi) ** 2) ** 1.5
        h = float(np.hypot(x2 - x1, y2 - y1)[0] / (np.radians(d) * M))
        assert h == pytest.approx(k, rel=1e-6)
        assert k > 0.99984  # off the initial line


def test_omerc_variant_a_alaska_and_peninsular():
    """Variant A (+no_uoff, EPSG 9812): the natural origin (u=0, v=0)
    carries the false coordinates — for a west-of-north azimuth
    (323°) the projection center no longer lands on (FE, FN). Round
    trips close over each zone's extent on GRS80."""
    for code, box in (
        ("EPSG:26931", (-141.0, -130.0, 54.5, 60.3)),
        ("EPSG:3375", (99.6, 104.6, 1.2, 6.7)),
    ):
        f, i = PP.forward(code), PP.inverse(code)
        lon, lat = np.meshgrid(np.linspace(box[0], box[1], 6),
                               np.linspace(box[2], box[3], 6))
        x, y = f(lon.ravel(), lat.ravel())
        lon2, lat2 = i(x, y)
        assert np.abs(lon2 - lon.ravel()).max() < 5e-8
        assert np.abs(lat2 - lat.ravel()).max() < 5e-8
    # variant A vs variant B on the same parameters differ by the
    # constant center offset u_c along the rotated grid
    ell = D.ELLIPSOIDS["GRS80"]
    args = dict(lat0=4.0, lonc=102.25, alpha=323.0257964666666,
                gamma=323.1301023611111, k0=0.99984)
    va = D.HotineObliqueMercator(ell, no_uoff=True, **args)
    vb = D.HotineObliqueMercator(ell, no_uoff=False, **args)
    lon = np.array([101.0, 103.5])
    lat = np.array([2.5, 5.5])
    xa, ya = va.forward(lon, lat)
    xb, yb = vb.forward(lon, lat)
    de, dn = xa - xb, ya - yb
    assert np.ptp(de) < 1e-6 and np.ptp(dn) < 1e-6  # rigid translation
    assert float(np.hypot(de[0], dn[0])) == pytest.approx(
        abs(vb.uc), rel=1e-12)


def test_omerc_epsg29873_datum_chain_and_wkt():
    """EPSG:29873 end-to-end (WGS84 → 3-param Helmert → omerc on
    Everest SS): the datum leg moves the result hundreds of meters from
    the projection-only coordinates, round-trips close, and the WKT1
    variant-B name parses to the same transform."""
    f, i = PP.forward("EPSG:29873"), PP.inverse("EPSG:29873")
    lon, lat = np.array([115.80550544444444]), np.array([5.387253583333333])
    x, y = f(lon, lat)
    # vs the worked example (Timbalai geodetic == projection-only): the
    # WGS84 input must land a datum-shift distance away
    d = float(np.hypot(x[0] - 679245.73, y[0] - 596562.78))
    assert 100.0 < d < 1000.0
    lon2, lat2 = i(x, y)
    assert abs(lon2[0] - lon[0]) < 5e-8 and abs(lat2[0] - lat[0]) < 5e-8
    wkt = (
        'PROJCS["Timbalai 1948 / RSO Borneo (m)",GEOGCS["Timbalai 1948",'
        'DATUM["Timbalai_1948",SPHEROID["Everest 1830 (1967 Definition)",'
        '6377298.556,300.8017],TOWGS84[-679,669,-48,0,0,0,0]],'
        'PRIMEM["Greenwich",0]],'
        'PROJECTION["Hotine_Oblique_Mercator_Azimuth_Center"],'
        'PARAMETER["latitude_of_center",4],'
        'PARAMETER["longitude_of_center",115],'
        'PARAMETER["azimuth",53.31582047222222],'
        'PARAMETER["rectified_grid_angle",53.13010236111111],'
        'PARAMETER["scale_factor",0.99984],'
        'PARAMETER["false_easting",590476.87],'
        'PARAMETER["false_northing",442857.65]]')
    fw = PP.forward(wkt)
    xw, yw = fw(lon, lat)
    assert abs(xw[0] - x[0]) < 1e-6 and abs(yw[0] - y[0]) < 1e-6


def test_omerc_no_off_alias_matches_no_uoff():
    """PROJ accepts both +no_uoff and +no_off for variant A — the
    parser treats them identically."""
    base = ("+proj=omerc +lat_0=4 +lonc=102.25 +alpha=323.0257964666666 "
            "+gamma=323.1301023611111 +k=0.99984 +x_0=804671 +ellps=GRS80 ")
    fa = PP.forward(base + "+no_uoff")
    fb = PP.forward(base + "+no_off")
    lon = np.array([101.0, 103.5])
    lat = np.array([2.5, 5.5])
    xa, ya = fa(lon, lat)
    xb, yb = fb(lon, lat)
    assert np.array_equal(xa, xb) and np.array_equal(ya, yb)


def test_omerc_missing_alpha_and_alpha90_raise():
    with pytest.raises(NotImplementedError, match="two-point"):
        PP.forward("+proj=omerc +lat_0=4 +lonc=115 +lat_1=1 +lon_1=110 "
                   "+lat_2=6 +lon_2=118 +ellps=WGS84")
    with pytest.raises(NotImplementedError, match="somerc"):
        D.HotineObliqueMercator(
            D.ELLIPSOIDS["bessel"], lat0=46.95, lonc=7.44, alpha=90.0)
