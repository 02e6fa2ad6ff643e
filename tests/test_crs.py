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


# ------------------------------------------------- CRS spec parsing


def test_proj_parse_utm_epsg_and_proj4_agree():
    from pythongis_spark.geometry import proj_parse as PP

    lon = np.array([14.2, 15.9, 12.1])
    lat = np.array([48.0, 55.5, 37.25])
    ref = crs.utm_forward(lon, lat, 33, True)
    for spec in ("EPSG:32633", "+proj=utm +zone=33 +datum=WGS84",
                 "+proj=utm +zone=33 +ellps=GRS80"):
        x, y = PP.forward(spec)(lon, lat)
        assert np.array_equal(x, ref[0]) and np.array_equal(y, ref[1]), spec
    xs, ys = PP.forward("+proj=utm +zone=33 +south")(lon, -lat)
    assert np.array_equal(ys, crs.utm_forward(lon, -lat, 33, False)[1])


def test_proj_parse_tmerc_lat0_origin_and_roundtrip():
    """PROJ semantics: the projected origin (lon_0, lat_0) maps to
    exactly (x_0, y_0); forward∘inverse is sub-mm."""
    from pythongis_spark.geometry import proj_parse as PP

    spec = "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 +y_0=-100000 +ellps=GRS80"
    x, y = PP.forward(spec)(np.array([-2.0]), np.array([49.0]))
    assert x[0] == pytest.approx(400000.0, abs=1e-6)
    assert y[0] == pytest.approx(-100000.0, abs=1e-6)
    lon = np.array([-3.5, -1.0, 0.4])
    lat = np.array([50.1, 53.0, 57.7])
    fx, fy = PP.forward(spec)(lon, lat)
    lon2, lat2 = PP.inverse(spec)(fx, fy)
    assert np.abs(lon2 - lon).max() * 111_000 < 1e-3
    assert np.abs(lat2 - lat).max() * 111_000 < 1e-3


def test_proj_parse_lambert93_epsg_wkt_proj4_agree():
    from pythongis_spark.geometry import proj_parse as PP

    wkt = (
        'PROJCS["RGF93 / Lambert-93",GEOGCS["RGF93",DATUM["Reseau_Geodesique_Francais_1993",'
        'SPHEROID["GRS 1980",6378137,298.257222101]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433]],PROJECTION["Lambert_Conformal_Conic_2SP"],'
        'PARAMETER["standard_parallel_1",49],PARAMETER["standard_parallel_2",44],'
        'PARAMETER["latitude_of_origin",46.5],PARAMETER["central_meridian",3],'
        'PARAMETER["false_easting",700000],PARAMETER["false_northing",6600000],'
        'UNIT["metre",1]]'
    )
    lon = np.array([3.0, 2.35, 5.4, -1.55])
    lat = np.array([46.5, 48.85, 43.3, 47.22])
    xe, ye = PP.forward("EPSG:2154")(lon, lat)
    for spec in (wkt, EPSG_2154_P4 := PP.EPSG_PROJ4[2154]):
        x, y = PP.forward(spec)(lon, lat)
        assert np.array_equal(x, xe) and np.array_equal(y, ye)
    # grid origin is the published (700000, 6600000)
    assert xe[0] == pytest.approx(700000.0, abs=1e-6)
    assert ye[0] == pytest.approx(6600000.0, abs=1e-6)
    lon2, lat2 = PP.inverse("EPSG:2154")(xe, ye)
    assert np.abs(lon2 - lon).max() * 111_000 < 1e-3


def test_proj_parse_spherical_merc_params_and_ogc_crs():
    """+proj=merc with +a==+b honors the sphere radius, lon_0, lat_ts
    and false origins (previously every spherical spec silently got the
    EPSG:3857 constants); EPSG:3857's own parameterization keeps the
    bit-frozen web-Mercator kernel; OGC CRS:84 maps to WGS84 lon/lat
    instead of a bogus EPSG:84 lookup."""
    from pythongis_spark.geometry import proj_parse as PP

    R = 6371000.0
    f = PP.forward(f"+proj=merc +a={R} +b={R}")
    x, y = f(np.array([90.0]), np.array([0.0]))
    assert x[0] == pytest.approx(R * np.pi / 2, rel=1e-15)
    assert y[0] == 0.0
    # lon_0 recenters; x_0/y_0 offset; lat_ts scales by cos
    f2 = PP.forward(f"+proj=merc +a={R} +b={R} +lon_0=100 +lat_ts=30 "
                    "+x_0=500000 +y_0=-100000")
    x2, y2 = f2(np.array([100.0]), np.array([0.0]))
    assert x2[0] == 500000.0 and y2[0] == -100000.0
    x3, _ = f2(np.array([190.0]), np.array([0.0]))
    assert (x3[0] - 500000.0) == pytest.approx(
        R * np.cos(np.radians(30.0)) * np.pi / 2, rel=1e-15)
    i2 = PP.inverse(f"+proj=merc +a={R} +b={R} +lon_0=100 +lat_ts=30 "
                    "+x_0=500000 +y_0=-100000")
    lon, lat = np.array([60.0, 140.0]), np.array([-55.0, 71.0])
    lo, la = i2(*f2(lon, lat))
    assert np.abs(lo - lon).max() < 1e-12 and np.abs(la - lat).max() < 1e-12
    # EPSG:3857 stays on the frozen kernel (same bits incl. MAX_LAT clamp)
    from pythongis_spark.geometry import projections as PJ
    g = PP.forward("EPSG:3857")
    pts = (np.array([-179.0, 0.0, 17.25]), np.array([-89.0, 0.0, 52.5]))
    xg, yg = g(*pts)
    c = PJ._np_fwd("EPSG:3857")(np.stack(pts, 1))
    assert np.array_equal(xg, c[:, 0]) and np.array_equal(yg, c[:, 1])
    # OGC authority
    lo, la = PP.forward("CRS:84")(np.array([5.0]), np.array([50.0]))
    assert lo[0] == 5.0 and la[0] == 50.0
    with pytest.raises(NotImplementedError, match="nadgrids"):
        PP.forward("CRS:27")


def test_proj_parse_conus_albers_and_errors():
    from pythongis_spark.geometry import proj_parse as PP

    x, y = PP.forward("EPSG:5070")(np.array([-96.0]), np.array([23.0]))
    assert x[0] == pytest.approx(0.0, abs=1e-6)
    assert y[0] == pytest.approx(0.0, abs=1e-6)
    with pytest.raises(NotImplementedError, match="semi-minor"):
        PP.forward("+proj=merc +a=6378137 +b=6300000")
    # r5: Airy tmerc / EPSG:27700 / Airy WKT spheroids resolve, and the
    # late-r5 ellipsoid parameterization extends lcc/aea/merc to
    # non-WGS84 datums too (EPSG:31370, NTF Lambert zones); what still
    # raises is an azimuthal/CEA/polar family on a non-WGS84 ellipsoid,
    # an unknown ellipsoid and grid-based datums
    lcc_airy = PP.forward("+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 "
                          "+lon_0=3 +ellps=airy")
    x, y = lcc_airy(np.array([3.0]), np.array([46.5]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    with pytest.raises(NotImplementedError, match="tmerc/utm/lcc/aea"):
        PP.forward("+proj=laea +lat_0=52 +lon_0=10 +ellps=airy")
    with pytest.raises(NotImplementedError, match="tmerc/utm/lcc/aea"):
        PP.forward("+proj=cea +lat_ts=30 +ellps=bessel")
    # evrst30 joined the registry with the omerc family (late r5):
    # Everest tmerc (Indian-subcontinent grids) resolves now
    x, y = PP.forward("+proj=tmerc +lon_0=-2 +ellps=evrst30")(
        np.array([-2.0]), np.array([0.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6  # central meridian, equator
    with pytest.raises(NotImplementedError, match="known names"):
        PP.forward("+proj=tmerc +lon_0=-2 +ellps=plessis")
    with pytest.raises(NotImplementedError, match="nadgrids"):
        PP.forward("+proj=utm +zone=14 +datum=NAD27 +nadgrids=conus")
    with pytest.raises(NotImplementedError, match="datum"):
        PP.forward("+proj=utm +zone=14 +datum=NAD27")


def test_reproject_points_parsed_crs_spark(spark):
    """reproject_points accepts a raw proj4 string and matches the
    direct family transform bit-for-bit."""
    import pandas as pd

    from pythongis_spark.geometry import proj_parse as PP
    from pythongis_spark.geometry.projections import reproject_points

    pdf = pd.DataFrame({"id": [1, 2, 3],
                        "lon": [2.35, 3.0, 5.4], "lat": [48.85, 46.5, 43.3]})
    out = reproject_points(
        spark.createDataFrame(pdf), to=PP.EPSG_PROJ4[2154]
    ).orderBy("id").toPandas()
    ex, ey = PP.forward("EPSG:2154")(pdf.lon.to_numpy(), pdf.lat.to_numpy())
    assert np.array_equal(out.x_m.to_numpy(), ex)
    assert np.array_equal(out.y_m.to_numpy(), ey)


def test_ellipsoidal_mercator_epsg3395():
    """EPSG:3395 (Mercator variant A) against the independent
    isometric-latitude formula psi = atanh(sin phi) - e*atanh(e sin phi)
    and the published grid value at 50N."""
    import math

    from pythongis_spark.geometry import crs, proj_parse as PP

    lon = np.array([10.0, -75.3, 0.0, 179.9])
    lat = np.array([50.0, -33.7, 0.0, 84.0])
    x, y = PP.forward("EPSG:3395")(lon, lat)
    assert x[0] == pytest.approx(crs.A_ * math.radians(10.0), abs=1e-9)
    sphi = np.sin(np.radians(lat))
    psi = np.arctanh(sphi) - crs.E_ * np.arctanh(crs.E_ * sphi)
    assert np.allclose(y, crs.A_ * psi, rtol=0, atol=1e-6)
    assert y[0] == pytest.approx(6413524.5942, abs=5e-4)  # published 3395 northing
    lo2, la2 = PP.inverse("EPSG:3395")(x, y)
    assert np.abs(lo2 - lon).max() < 1e-12 and np.abs(la2 - lat).max() < 1e-12
    # variant B: k0 from a standard parallel; identity at the equator
    assert crs.merc_k0_from_lat_ts(0.0) == pytest.approx(1.0, abs=1e-15)


def test_polar_stereographic_families():
    """Polar stereographic (EPSG 9810/9829): true scale at lat_ts,
    variant A == variant B under the k0 equivalence, UPS false origin,
    south-aspect E/N convention, round-trips for all built-in codes."""
    import math

    from pythongis_spark.geometry import crs, proj_parse as PP

    # parallel scale k = rho / (A * m(phi)) is exactly 1 at lat_ts
    for lat_ts, south in [(70.0, False), (-71.0, True)]:
        ps = crs.PolarStereographic(lat_ts=lat_ts, south=south)
        x, y = ps.forward(np.array([10.0]),
                          np.array([math.copysign(abs(lat_ts), -1 if south else 1)]))
        m = float(crs._m(np.array([math.radians(abs(lat_ts))]))[0])
        assert math.hypot(x[0], y[0]) / (crs.A_ * m) == pytest.approx(1.0, abs=1e-12)
    # variant A (k0) == variant B (lat_ts) bit-for-bit
    ps_b = crs.PolarStereographic(lon0=-45, lat_ts=70)
    ps_a = crs.PolarStereographic(lon0=-45, k0=ps_b.k0)
    lon, lat = np.array([30.0, -120.0]), np.array([75.0, 82.0])
    assert np.array_equal(ps_a.forward(lon, lat)[0], ps_b.forward(lon, lat)[0])
    assert np.array_equal(ps_a.forward(lon, lat)[1], ps_b.forward(lon, lat)[1])
    # UPS north pole lands on the (2e6, 2e6) false origin
    x, y = PP.forward("EPSG:5041")(np.array([45.0]), np.array([90.0]))
    assert x[0] == pytest.approx(2e6, abs=1e-6) and y[0] == pytest.approx(2e6, abs=1e-6)
    # south aspect: at the central meridian northing grows POSITIVE (EPSG 3031)
    x, y = PP.forward("EPSG:3031")(np.array([0.0]), np.array([-71.0]))
    assert abs(x[0]) < 1e-9 and y[0] > 2e6
    # round-trips through every built-in stere code
    for code in (3413, 3976, 3031, 5041, 5042):
        south = code in (3976, 3031, 5042)
        lat = np.array([-75.0, -88.0, -66.0]) if south else np.array([75.0, 88.0, 66.0])
        lon = np.array([13.0, -170.0, 91.5])
        x, y = PP.forward(f"EPSG:{code}")(lon, lat)
        lo2, la2 = PP.inverse(f"EPSG:{code}")(x, y)
        assert np.abs(((lo2 - lon + 180) % 360) - 180).max() < 1e-9
        assert np.abs(la2 - lat).max() < 1e-9


def test_polar_stereographic_wkt_variant_b():
    """WKT1 Polar_Stereographic variant B (EPSG:3031 style: the standard
    parallel rides in latitude_of_origin) parses to lat_ts."""
    from pythongis_spark.geometry import proj_parse as PP

    wkt = ('PROJCS["WGS 84 / Antarctic Polar Stereographic",'
           'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",'
           '6378137,298.257223563]]],PROJECTION["Polar_Stereographic"],'
           'PARAMETER["latitude_of_origin",-71],'
           'PARAMETER["central_meridian",0],'
           'PARAMETER["false_easting",0],PARAMETER["false_northing",0],'
           'UNIT["metre",1]]')
    lon = np.array([13.0, -170.0, 91.5])
    lat = np.array([-75.0, -88.0, -66.0])
    xe, ye = PP.forward("EPSG:3031")(lon, lat)
    x, y = PP.forward(wkt)(lon, lat)
    assert np.array_equal(x, xe) and np.array_equal(y, ye)


def test_albers_southern_hemisphere_inverse():
    """Southern standard parallels give n < 0: the inverse needs the
    same sign(n) rho/theta handling as LCC, else longitudes come back
    off by 180/n degrees (EPSG:3577 Australian Albers hit this)."""
    from pythongis_spark.geometry import proj_parse as PP

    f, i = PP.forward("EPSG:3577"), PP.inverse("EPSG:3577")
    lon = np.array([145.0, 132.0, 120.0, 153.5])
    lat = np.array([-25.0, -12.0, -33.0, -43.0])
    lo, la = i(*f(lon, lat))
    assert np.abs(lo - lon).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9


def test_proj_parse_eqc_params_and_merc_sphere_forms():
    """eqc honors lon_0/lat_ts/x_0/y_0 (they were silently dropped);
    +R and a lone +a select the PROJ sphere forms of merc."""
    from pythongis_spark.geometry import proj_parse as PP

    R = 6371000.0
    f = PP.forward(f"+proj=eqc +lon_0=90 +lat_ts=60 +x_0=100000 +R={R}")
    x, y = f(np.array([90.0, 92.0]), np.array([10.0, -5.0]))
    km = np.pi / 180.0 * R
    assert x[0] == 100000.0
    assert x[1] - 100000.0 == pytest.approx(2.0 * km * np.cos(np.radians(60.0)),
                                            rel=1e-15)
    assert y[0] == pytest.approx(10.0 * km, rel=1e-15)
    lo, la = PP.inverse(f"+proj=eqc +lon_0=90 +lat_ts=60 +x_0=100000 +R={R}")(x, y)
    assert lo[1] == pytest.approx(92.0, rel=1e-15) and la[1] == pytest.approx(-5.0)
    # +R / lone +a sphere forms of merc (previously fell through to the
    # WGS84 ellipsoid with the radius discarded)
    for spec in (f"+proj=merc +R={R}", f"+proj=merc +a={R}"):
        x, _ = PP.forward(spec)(np.array([10.0]), np.array([0.0]))
        assert x[0] == pytest.approx(R * np.radians(10.0), rel=1e-15), spec
    # +pm with omerc's +lonc shifts the center meridian (it was applied
    # to lon_0, which omerc never reads); utm +pm raises
    pm = 2.337229166666667
    tmpl = ("+proj=omerc +lat_0=4 +lonc={c} +alpha=53.31582047222222 "
            "+gamma=53.13010236111111 +k=0.99984 +ellps=evrstSS")
    lon, lat = np.array([116.0, 113.5]), np.array([5.0, 3.2])
    xs, ys = PP.forward(tmpl.format(c=115 + pm))(lon, lat)
    xp, yp = PP.forward(tmpl.format(c=115) + f" +pm={pm}")(lon, lat)
    assert np.abs(xp - xs).max() < 1e-9 and np.abs(yp - ys).max() < 1e-9
    with pytest.raises(NotImplementedError, match="tmerc"):
        PP.forward("+proj=utm +zone=31 +ellps=WGS84 +pm=paris")


def test_equal_area_inverse_pole_cases():
    """The shared authalic-latitude Newton (_phi_from_q) handles the
    Snyder |q| >= qp pole case and stays accurate approaching it — the
    q/2-seeded iteration silently lost ~1.7 km at lat 89.99 and could
    not reach ±90 at all."""
    from pythongis_spark.geometry import crs as C

    lats = np.array([-90.0, -89.9999, -89.99, 0.0, 89.99, 89.9999, 90.0])
    lons = np.full_like(lats, 17.0)
    x, y = C.cea_forward(lons, lats, lon0=0.0, lat_ts=30.0)
    _, la = C.cea_inverse(x, y, lon0=0.0, lat_ts=30.0)
    assert np.abs(la - lats).max() < 5e-8  # ≈ 5 mm of arc
    inst = C.LambertAzimuthalEqualArea(lat0=52.0, lon0=10.0,
                                       x0=4321000.0, y0=3210000.0)
    x, y = inst.forward(lons, lats)
    _, la = inst.inverse(x, y)
    assert np.abs(la - lats).max() < 5e-8
    assert la[0] == -90.0 and la[-1] == 90.0  # exact at the poles


def test_laea_epsg3035():
    """Lambert azimuthal equal-area (EPSG:3035, Snyder 24-2..24-20):
    grid-origin anchor, equal-area law, WKT==EPSG, round trip."""
    import math

    from pythongis_spark.geometry import crs, proj_parse as PP

    lon = np.array([10.0, -5.2, 28.7, 24.0])
    lat = np.array([52.0, 41.3, 66.0, 62.0])
    x, y = PP.forward("EPSG:3035")(lon, lat)
    # published false origin: (10E, 52N) -> (4321000, 3210000)
    assert x[0] == pytest.approx(4321000.0, abs=1e-6)
    assert y[0] == pytest.approx(3210000.0, abs=1e-6)
    lo2, la2 = PP.inverse("EPSG:3035")(x, y)
    assert np.abs(lo2 - lon).max() < 1e-9 and np.abs(la2 - lat).max() < 1e-9
    wkt = ('PROJCS["ETRS89-extended / LAEA Europe",GEOGCS["ETRS89",'
           'DATUM["ETRS89",SPHEROID["GRS 1980",6378137,298.257222101]]],'
           'PROJECTION["Lambert_Azimuthal_Equal_Area"],'
           'PARAMETER["latitude_of_center",52],'
           'PARAMETER["longitude_of_center",10],'
           'PARAMETER["false_easting",4321000],'
           'PARAMETER["false_northing",3210000],UNIT["metre",1]]')
    xw, yw = PP.forward(wkt)(lon, lat)
    assert np.array_equal(x, xw) and np.array_equal(y, yw)
    # equal-area law: projected quad area == ellipsoid surface element
    laea = crs.LambertAzimuthalEqualArea(lat0=52, lon0=10)
    for lo, la in [(5.0, 45.0), (24.0, 62.0)]:
        d = 0.01
        qx, qy = laea.forward(np.array([lo, lo + d, lo + d, lo]),
                              np.array([la, la, la + d, la + d]))
        area_p = 0.5 * abs(np.dot(qx, np.roll(qy, -1)) - np.dot(qy, np.roll(qx, -1)))
        phi = math.radians(la + d / 2)
        m = crs.A_ * (1 - crs.E2) / (1 - crs.E2 * math.sin(phi) ** 2) ** 1.5
        nn = crs.A_ / math.sqrt(1 - crs.E2 * math.sin(phi) ** 2)
        area_t = m * nn * math.cos(phi) * math.radians(d) ** 2
        assert area_p / area_t == pytest.approx(1.0, rel=1e-5)
    with pytest.raises(NotImplementedError, match="polar-aspect"):
        crs.LambertAzimuthalEqualArea(lat0=90, lon0=0)


def test_cea_epsg6933_and_sinusoidal():
    """Cylindrical equal-area (EPSG:6933 EASE-Grid 2.0) and the MODIS
    sinusoidal sphere: round trips, equal-area law, WKT sphere parse."""
    import math

    from pythongis_spark.geometry import crs, proj_parse as PP

    rng = np.random.Generator(np.random.PCG64(13))
    lon = rng.uniform(-179, 179, 100)
    lat = rng.uniform(-84, 84, 100)
    x, y = PP.forward("EPSG:6933")(lon, lat)
    lo2, la2 = PP.inverse("EPSG:6933")(x, y)
    assert np.abs(lo2 - lon).max() < 1e-9 and np.abs(la2 - lat).max() < 1e-9
    for lo, la in [(0.0, 0.0), (100.0, 55.0), (-60.0, -30.0)]:
        d = 0.01
        qx, qy = crs.cea_forward(np.array([lo, lo + d, lo + d, lo]),
                                 np.array([la, la, la + d, la + d]), lat_ts=30.0)
        area_p = 0.5 * abs(np.dot(qx, np.roll(qy, -1)) - np.dot(qy, np.roll(qx, -1)))
        phi = math.radians(la + d / 2)
        m = crs.A_ * (1 - crs.E2) / (1 - crs.E2 * math.sin(phi) ** 2) ** 1.5
        nn = crs.A_ / math.sqrt(1 - crs.E2 * math.sin(phi) ** 2)
        area_t = m * nn * math.cos(phi) * math.radians(d) ** 2
        assert area_p / area_t == pytest.approx(1.0, rel=1e-5)
    # sinusoidal: y is the spherical meridian arc; WKT sphere == proj4 +R
    R = 6371007.181
    x, y = PP.forward("+proj=sinu +R=6371007.181")(np.array([30.0]), np.array([45.0]))
    assert y[0] == pytest.approx(R * math.radians(45.0), abs=1e-9)
    assert x[0] == pytest.approx(R * math.radians(30.0) * math.cos(math.radians(45.0)), abs=1e-9)
    wkt = ('PROJCS["MODIS Sinusoidal",GEOGCS["Unknown",DATUM["Unknown",'
           'SPHEROID["Authalic_Sphere",6371007.181,0]]],'
           'PROJECTION["Sinusoidal"],PARAMETER["central_meridian",0],'
           'PARAMETER["false_easting",0],PARAMETER["false_northing",0],'
           'UNIT["metre",1]]')
    xw, yw = PP.forward(wkt)(np.array([30.0]), np.array([45.0]))
    assert x[0] == xw[0] and y[0] == yw[0]
    lo2, la2 = PP.inverse("+proj=sinu +R=6371007.181")(x, y)
    assert lo2[0] == pytest.approx(30.0, abs=1e-12)
    # new EPSG conveniences: ETRS89/NAD83 UTM ranges, GDA94 Albers, NZTM
    xr, yr = PP.forward("EPSG:25832")(np.array([9.0]), np.array([48.0]))
    xe, ye = crs.utm_forward(np.array([9.0]), np.array([48.0]), 32, True)
    assert xr[0] == xe[0] and yr[0] == ye[0]
    xr, yr = PP.forward("EPSG:26918")(np.array([-75.0]), np.array([40.0]))
    xe, ye = crs.utm_forward(np.array([-75.0]), np.array([40.0]), 18, True)
    assert xr[0] == xe[0] and yr[0] == ye[0]
    x, y = PP.forward("EPSG:3577")(np.array([132.0]), np.array([0.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    x, y = PP.forward("EPSG:2193")(np.array([173.0]), np.array([0.0]))
    assert x[0] == pytest.approx(1600000.0, abs=1e-9)
    assert y[0] == pytest.approx(10000000.0, abs=1e-6)
    with pytest.raises(NotImplementedError, match="semi-major"):
        PP.forward("+proj=laea +lat_0=52 +lon_0=10 +a=6370997")
    # GRS80 geographic aliases resolve to identity (no datum shift)
    for code in (4269, 4258, 4283, 4167):
        lo, la = PP.forward(f"EPSG:{code}")(np.array([1.5]), np.array([-2.25]))
        assert lo[0] == 1.5 and la[0] == -2.25
