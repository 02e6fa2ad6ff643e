"""PROJ.4-string / WKT1 / EPSG-code CRS resolution onto the engine's
projection families — the practical closure of the reference's
pyproj-backed "reproject to any CRS" (``pythongis/vector/manager.py:
822-846``; pyproj is not installed in this image).

The overwhelming majority of real-world projected EPSG codes are
instances of exactly the families implemented in :mod:`.crs`:
UTM / transverse Mercator (Karney series), Lambert conformal conic,
Albers equal-area, Lambert azimuthal equal-area, cylindrical
equal-area, ellipsoidal Mercator, polar stereographic, sinusoidal,
plus spherical (web) Mercator and equirectangular.
This module parses ``+proj=...`` parameter strings, OGC WKT1 ``PROJCS``
blocks, and ``EPSG:n`` codes (small built-in table + the full UTM
ranges) into those families, giving numpy forward/inverse transforms
and a Catalyst column inverse for raster warps.

Datum support (round 5): non-WGS84 ellipsoids (Airy, International,
Bessel, Krassowsky, Clarke — :mod:`.datum`) are accepted for the
transverse-Mercator / UTM / Lambert-conformal / Albers / Mercator /
longlat families, and ``+towgs84`` 3/7-parameter Helmert shifts ARE
applied (position-vector convention, exact-inverse reverse leg) —
EPSG:27700 (British National Grid), ED50 UTM, DHDN Gauss-Krüger,
EPSG:31370 (Belgian Lambert 72) and the NTF (Paris) Lambert carto
zones (27571-27574, incl. the ``+pm=paris`` prime-meridian shift and
the LCC-1SP ``+k_0`` form) resolve end-to-end. ``forward``/``inverse``
keep the WGS84-hub convention: ``forward`` maps WGS84 lon/lat to the
target CRS (datum shift + projection), exactly like pyproj's
``Transformer.from_crs(4326, crs)``.

Documented divergences: non-WGS84 ellipsoids on the azimuthal /
cylindrical-equal-area / polar-stereographic families raise (no known
high-use EPSG code needs them here); grid-based datums (NAD27 NADCON,
+nadgrids) raise loudly; WKT1 with a non-Greenwich PRIMEM raises (the
EPSG Paris-meridian WKTs express it in grads — pass the proj4 string).
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

from pythongis_spark.geometry import crs as C
from pythongis_spark.geometry import projections as PJ

# +towgs84 strings shared by several codes (public PROJ definitions)
_TOWGS84_OSGB36 = ("+towgs84=446.448,-125.157,542.06,"
                   "0.15,0.247,0.842,-20.489")
_TOWGS84_ED50 = "+towgs84=-87,-96,-120"
_TOWGS84_DHDN = "+towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7"
_TOWGS84_NTF = "+towgs84=-168,-60,320,0,0,0,0"

# EPSG codes → proj4 parameter strings (public definitions, e.g. the
# epsg.io registry); UTM 326xx/327xx are generated, not listed.
EPSG_PROJ4 = {
    4326: "+proj=longlat +datum=WGS84",
    # GRS80 geographic datums (NAD83 / ETRS89 / GDA94 / NZGD2000):
    # coordinates are treated as WGS84-equivalent (no datum shift applied
    # — module-docstring divergence)
    4269: "+proj=longlat +ellps=GRS80",
    4258: "+proj=longlat +ellps=GRS80",
    4283: "+proj=longlat +ellps=GRS80",
    4167: "+proj=longlat +ellps=GRS80",
    4087: "+proj=eqc +lat_0=0 +lon_0=0 +x_0=0 +y_0=0 +datum=WGS84",
    3857: "+proj=merc +a=6378137 +b=6378137 +lon_0=0 +x_0=0 +y_0=0 +k=1",
    # RGF93 / Lambert-93 (France)
    2154: ("+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 +lat_2=44 "
           "+x_0=700000 +y_0=6600000 +ellps=GRS80"),
    # NAD83 / Conus Albers
    5070: ("+proj=aea +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5 "
           "+x_0=0 +y_0=0 +ellps=GRS80"),
    # NAD83 / California Albers
    3310: ("+proj=aea +lat_0=0 +lon_0=-120 +lat_1=34 +lat_2=40.5 "
           "+x_0=0 +y_0=-4000000 +ellps=GRS80"),
    # WGS 84 / World Mercator (ellipsoidal)
    3395: "+proj=merc +lon_0=0 +k=1 +x_0=0 +y_0=0 +datum=WGS84",
    # NSIDC Sea Ice Polar Stereographic North / South
    3413: ("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0 "
           "+datum=WGS84"),
    3976: ("+proj=stere +lat_0=-90 +lat_ts=-70 +lon_0=0 +x_0=0 +y_0=0 "
           "+datum=WGS84"),
    # WGS 84 / Antarctic Polar Stereographic
    3031: ("+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +x_0=0 +y_0=0 "
           "+datum=WGS84"),
    # Universal Polar Stereographic North / South
    5041: ("+proj=stere +lat_0=90 +k=0.994 +lon_0=0 +x_0=2000000 "
           "+y_0=2000000 +datum=WGS84"),
    5042: ("+proj=stere +lat_0=-90 +k=0.994 +lon_0=0 +x_0=2000000 "
           "+y_0=2000000 +datum=WGS84"),
    # ETRS89-extended / LAEA Europe (the EU INSPIRE standard grid)
    3035: ("+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
           "+ellps=GRS80"),
    # WGS 84 / NSIDC EASE-Grid 2.0 Global
    6933: "+proj=cea +lat_ts=30 +lon_0=0 +x_0=0 +y_0=0 +datum=WGS84",
    # GDA94 / Australian Albers
    3577: ("+proj=aea +lat_0=0 +lon_0=132 +lat_1=-18 +lat_2=-36 "
           "+x_0=0 +y_0=0 +ellps=GRS80"),
    # NZGD2000 / New Zealand Transverse Mercator 2000
    2193: ("+proj=tmerc +lat_0=0 +lon_0=173 +k=0.9996 +x_0=1600000 "
           "+y_0=10000000 +ellps=GRS80"),
    # --- non-WGS84 datums (r5: +towgs84 Helmert applied; parameter
    # values are the public PROJ/epsg.io definitions) ---
    # OSGB36 geographic / British National Grid (Airy 1830)
    4277: "+proj=longlat +ellps=airy " + _TOWGS84_OSGB36,
    27700: ("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
            "+x_0=400000 +y_0=-100000 +ellps=airy " + _TOWGS84_OSGB36),
    # ED50 geographic (International 1924); UTM zones via the range below
    4230: "+proj=longlat +ellps=intl " + _TOWGS84_ED50,
    # DHDN geographic / Gauss-Krüger zones (Bessel 1841)
    4314: "+proj=longlat +ellps=bessel " + _TOWGS84_DHDN,
    # NTF geographic (Clarke 1880 IGN); 4807 is the Paris-meridian form
    4275: "+proj=longlat +ellps=clrk80ign " + _TOWGS84_NTF,
    4807: "+proj=longlat +ellps=clrk80ign +pm=paris " + _TOWGS84_NTF,
    # Amersfoort / RD New (Netherlands): oblique stereographic on
    # Bessel 1841, 7-param Helmert
    28992: ("+proj=sterea +lat_0=52.15616055555555 "
            "+lon_0=5.38763888888889 +k_0=0.9999079 +x_0=155000 "
            "+y_0=463000 +ellps=bessel +towgs84=565.417,50.3319,"
            "465.552,-0.398957,0.343988,-1.8774,4.0725"),
    # CH1903 / LV03 and CH1903+ / LV95 (Switzerland): Swiss oblique
    # cylindrical on Bessel 1841, 3-param Helmert
    21781: ("+proj=somerc +lat_0=46.95240555555556 "
            "+lon_0=7.439583333333333 +k_0=1 +x_0=600000 +y_0=200000 "
            "+ellps=bessel +towgs84=674.374,15.056,405.346"),
    # S-JTSK / Krovak East North (Czech Republic / Slovakia)
    5514: ("+proj=krovak +lat_0=49.5 +lon_0=24.83333333333333 "
           "+alpha=30.28813972222222 +k=0.9999 +x_0=0 +y_0=0 "
           "+ellps=bessel +towgs84=589,76,480"),
    2056: ("+proj=somerc +lat_0=46.95240555555556 "
           "+lon_0=7.439583333333333 +k_0=1 +x_0=2600000 +y_0=1200000 "
           "+ellps=bessel +towgs84=674.374,15.056,405.346"),
    # Timbalai 1948 / RSO Borneo (m): Hotine oblique Mercator variant B
    # (EPSG 9815) on Everest 1830 (1967 Definition)
    29873: ("+proj=omerc +lat_0=4 +lonc=115 +alpha=53.31582047222222 "
            "+gamma=53.13010236111111 +k=0.99984 +x_0=590476.87 "
            "+y_0=442857.65 +ellps=evrstSS +towgs84=-679,669,-48"),
    # GDM2000 / Peninsular RSO: variant A (+no_uoff) on GRS80
    3375: ("+proj=omerc +lat_0=4 +lonc=102.25 +alpha=323.0257964666666 "
           "+gamma=323.1301023611111 +k=0.99984 +x_0=804671 +y_0=0 "
           "+no_uoff +ellps=GRS80"),
    # NAD83 / Alaska zone 1: variant A (+no_uoff) on GRS80
    26931: ("+proj=omerc +lat_0=57 +lonc=-133.6666666666667 "
            "+alpha=323.1301023611111 +gamma=323.1301023611111 "
            "+k=0.9999 +x_0=5000000.001016002 +y_0=-5000000.001016002 "
            "+no_uoff +ellps=GRS80"),
    # BD72 / Belgian Lambert 72 (International 1924, 7-param Helmert,
    # LCC 2SP with the pole as latitude of origin)
    31370: ("+proj=lcc +lat_1=51.16666723333333 +lat_2=49.8333339 "
            "+lat_0=90 +lon_0=4.367486666666666 +x_0=150000.013 "
            "+y_0=5400088.438 +ellps=intl +towgs84=-106.869,52.2978,"
            "-103.724,0.3366,-0.457,1.8422,-1.2747"),
    # NTF (Paris) / Lambert carto zones I-IV (LCC 1SP on Clarke 1880
    # IGN, Paris prime meridian; zone-number × 1e6 m false northing)
    27571: ("+proj=lcc +lat_1=49.5 +lat_0=49.5 +lon_0=0 "
            "+k_0=0.999877341 +x_0=600000 +y_0=1200000 "
            "+ellps=clrk80ign +pm=paris " + _TOWGS84_NTF),
    27572: ("+proj=lcc +lat_1=46.8 +lat_0=46.8 +lon_0=0 "
            "+k_0=0.99987742 +x_0=600000 +y_0=2200000 "
            "+ellps=clrk80ign +pm=paris " + _TOWGS84_NTF),
    27573: ("+proj=lcc +lat_1=44.1 +lat_0=44.1 +lon_0=0 "
            "+k_0=0.999877499 +x_0=600000 +y_0=3200000 "
            "+ellps=clrk80ign +pm=paris " + _TOWGS84_NTF),
    27574: ("+proj=lcc +lat_1=42.165 +lat_0=42.165 +lon_0=0 "
            "+k_0=0.99994471 +x_0=234.358 +y_0=4185861.369 "
            "+ellps=clrk80ign +pm=paris " + _TOWGS84_NTF),
    # WGS84/ETRS89/NAD83 UTM zones and ED50 UTM / DHDN GK via the
    # generated ranges below.
}

# PROJ prime-meridian table (degrees east of Greenwich)
_PM_DEFS = {
    "greenwich": 0.0,
    "paris": 2.337229166666667,      # 2°20'14.025"E
    "lisbon": -9.131906111111112,    # 9°07'54.862"W
    "madrid": -3.687938888888889,    # 3°41'16.58"W
    "rome": 12.452333333333334,      # 12°27'08.4"E
    "bern": 7.439583333333333,       # 7°26'22.5"E
    "oslo": 10.722916666666666,      # 10°43'22.5"E
    "athens": 23.7163375,            # 23°42'58.815"E
}


# PROJ +datum= shortcuts (public PROJ datum table): name → proj4 tail
_DATUM_DEFS = {
    "WGS84": "+ellps=WGS84",
    "OSGB36": "+ellps=airy " + _TOWGS84_OSGB36,
    "potsdam": "+ellps=bessel " + _TOWGS84_DHDN,
    "GGRS87": "+ellps=GRS80 +towgs84=-199.87,74.79,246.62",
    "hermannskogel": ("+ellps=bessel +towgs84=577.326,90.129,463.919,"
                      "5.137,1.474,5.297,2.4232"),
    "carthage": "+ellps=clrk80ign +towgs84=-263.0,6.0,431.0",
    "nzgd49": ("+ellps=intl +towgs84=59.47,-5.04,187.44,"
               "0.47,-0.1,1.024,-4.5993"),
}

_WKT_PROJ_NAMES = {
    "transverse_mercator": "tmerc",
    "gauss_kruger": "tmerc",
    "lambert_conformal_conic": "lcc",
    "lambert_conformal_conic_2sp": "lcc",
    "lambert_conformal_conic_1sp": "lcc",
    "albers_conic_equal_area": "aea",
    "albers": "aea",
    "mercator_1sp": "merc",
    "mercator_2sp": "merc",
    "mercator": "merc",
    "equirectangular": "eqc",
    "equidistant_cylindrical": "eqc",
    "popular_visualisation_pseudo_mercator": "webmerc",
    "polar_stereographic": "stere",
    "polar_stereographic_(variant_a)": "stere",
    "polar_stereographic_(variant_b)": "stere",
    "lambert_azimuthal_equal_area": "laea",
    "cylindrical_equal_area": "cea",
    "sinusoidal": "sinu",
    "oblique_stereographic": "sterea",
    "double_stereographic": "sterea",
    "swiss_oblique_cylindrical": "somerc",
    # Hotine oblique Mercator: "natural origin" / variant A names get
    # +no_uoff in parse_wkt; "center" / variant B names are the default
    "oblique_mercator": "omerc",
    "hotine_oblique_mercator": "omerc",
    "hotine_oblique_mercator_(variant_a)": "omerc",
    "hotine_oblique_mercator_(variant_b)": "omerc",
    "hotine_oblique_mercator_azimuth_natural_origin": "omerc",
    "hotine_oblique_mercator_azimuth_center": "omerc",
    "rectified_skew_orthomorphic_natural_origin": "omerc",
    "rectified_skew_orthomorphic_center": "omerc",
}

# WKT omerc names that mean variant A (EPSG 9812, +no_uoff)
_WKT_OMERC_VARIANT_A = {
    "hotine_oblique_mercator",
    "hotine_oblique_mercator_(variant_a)",
    "hotine_oblique_mercator_azimuth_natural_origin",
    "rectified_skew_orthomorphic_natural_origin",
}

_WKT_PARAM_NAMES = {
    "central_meridian": "lon_0",
    "longitude_of_center": "lon_0",
    "latitude_of_origin": "lat_0",
    "latitude_of_center": "lat_0",
    "standard_parallel_1": "lat_1",
    "standard_parallel_2": "lat_2",
    "azimuth": "alpha",
    "rectified_grid_angle": "gamma",
    "scale_factor": "k",
    "false_easting": "x_0",
    "false_northing": "y_0",
}


def parse_proj4(s: str) -> dict:
    """``+key=value`` pairs → dict (bare ``+flag`` → True)."""
    out: dict = {}
    for tok in s.split():
        if not tok.startswith("+"):
            continue
        if "=" in tok:
            k, v = tok[1:].split("=", 1)
            try:
                out[k] = float(v)
            except ValueError:
                out[k] = v
        else:
            out[tok[1:]] = True
    return out


def parse_wkt(s: str) -> dict:
    """OGC WKT1 PROJCS/GEOGCS → the same normalized proj4-style dict."""
    name = re.search(r'PROJECTION\s*\[\s*"([^"]+)"', s)
    if name is None:
        if not re.match(r"\s*GEOGCS", s):
            raise ValueError("WKT without PROJECTION or GEOGCS")
        proj = "longlat"
    else:
        key = name.group(1).strip().lower().replace(" ", "_")
        proj = _WKT_PROJ_NAMES.get(key)
        if proj is None:
            raise NotImplementedError(
                f"WKT projection {name.group(1)!r} is not an implemented "
                f"family {tuple(set(_WKT_PROJ_NAMES.values()))}")
    out: dict = {"proj": proj}
    if proj == "omerc" and name is not None and key in _WKT_OMERC_VARIANT_A:
        out["no_uoff"] = True
    for m in re.finditer(
        r'PARAMETER\s*\[\s*"([^"]+)"\s*,\s*([-+0-9.eE]+)', s
    ):
        pk = _WKT_PARAM_NAMES.get(m.group(1).strip().lower())
        if pk:
            out[pk] = float(m.group(2))
    sph = re.search(
        r'SPHEROID\s*\[\s*"[^"]*"\s*,\s*([-+0-9.eE]+)\s*,\s*([-+0-9.eE]+)', s)
    if sph and abs(float(sph.group(1)) - 6378137.0) > 0.5:
        if proj == "sinu":
            out["R"] = float(sph.group(1))  # MODIS authalic sphere
        else:
            ell = _datum_mod().ellipsoid_from_axes(
                float(sph.group(1)), float(sph.group(2)))
            if ell.name not in _datum_mod().ELLIPSOIDS:
                raise NotImplementedError(
                    f"spheroid a={sph.group(1)} rf={sph.group(2)} matches "
                    f"no registry ellipsoid and is not WGS84/GRS80")
            out["ellps"] = ell.name
    tw = re.search(r"TOWGS84\s*\[([^\]]+)\]", s)
    if tw:
        out["towgs84"] = ",".join(
            v.strip() for v in tw.group(1).split(","))
    pmm = re.search(r'PRIMEM\s*\[\s*"[^"]*"\s*,\s*([-+0-9.eE]+)', s)
    if pmm and abs(float(pmm.group(1))) > 1e-9:
        # EPSG Paris-meridian WKTs give PRIMEM (and parameters) in the
        # GEOGCS angular unit (grads for NTF) — ambiguous to resolve
        # here; the proj4 strings (+pm=paris, degrees) are supported
        raise NotImplementedError(
            "WKT with a non-Greenwich PRIMEM is not supported; pass the "
            "proj4 string (+pm=...) instead")
    if proj == "stere" and abs(abs(out.get("lat_0", 90.0)) - 90.0) > 1e-9:
        # WKT1 "Polar_Stereographic" (variant B) carries the standard
        # parallel in latitude_of_origin (EPSG:3031 WKT has -71 there);
        # proj4 +lat_0 always means the pole for the polar aspect
        out["lat_ts"] = out["lat_0"]
        out["lat_0"] = math.copysign(90.0, out["lat_0"])
    if proj == "webmerc":
        out["a"] = out["b"] = 6378137.0
    return out


def normalize(spec) -> dict:
    """Any accepted CRS spec → normalized parameter dict with ``proj``."""
    if isinstance(spec, dict):
        p = dict(spec)
    elif isinstance(spec, str):
        s = spec.strip()
        up = s.upper()
        if up.startswith("CRS:") or up.startswith("OGC:CRS"):
            # OGC CRS codes are NOT EPSG codes: map the common ones
            # explicitly (this engine is lon/lat-ordered throughout, so
            # CRS:84's axis-order distinction from EPSG:4326 is moot)
            code = up.split("CRS", 1)[1].lstrip(":")
            ogc = {"84": "EPSG:4326", "83": "EPSG:4269"}
            if code not in ogc:
                raise NotImplementedError(
                    f"OGC CRS:{code} has no EPSG mapping here (CRS:27 is "
                    f"NAD27, which needs +nadgrids)")
            up = ogc[code]
        if up.startswith("EPSG:"):
            code = int(up.split(":")[1])
            if 32601 <= code <= 32660:
                return {"proj": "utm", "zone": code - 32600}
            if 32701 <= code <= 32760:
                return {"proj": "utm", "zone": code - 32700, "south": True}
            if 25828 <= code <= 25838:  # ETRS89 / UTM (GRS80)
                return {"proj": "utm", "zone": code - 25800}
            if 26901 <= code <= 26923:  # NAD83 / UTM (GRS80)
                return {"proj": "utm", "zone": code - 26900}
            if 23028 <= code <= 23038:  # ED50 / UTM (intl + Helmert)
                return dict(parse_proj4(_TOWGS84_ED50), proj="utm",
                            zone=code - 23000, ellps="intl")
            if 31466 <= code <= 31469:  # DHDN / Gauss-Krüger zones 2-5
                z = code - 31464
                return parse_proj4(
                    f"+proj=tmerc +lat_0=0 +lon_0={3 * z} +k=1 "
                    f"+x_0={z * 1_000_000 + 500_000} +y_0=0 "
                    f"+ellps=bessel {_TOWGS84_DHDN}")
            if code not in EPSG_PROJ4:
                raise NotImplementedError(
                    f"EPSG:{code} is not in the built-in table "
                    f"({sorted(EPSG_PROJ4)} + UTM 326xx/327xx); pass its "
                    f"proj4 string or WKT instead")
            p = parse_proj4(EPSG_PROJ4[code])
        elif s.startswith("+"):
            p = parse_proj4(s)
        elif re.match(r"\s*(PROJCS|GEOGCS)", s):
            p = parse_wkt(s)
        elif up in ("WEBMERCATOR",):
            return {"proj": "merc", "a": 6378137.0, "b": 6378137.0}
        elif up in ("EQUIRECT",):
            return {"proj": "eqc"}
        elif up in ("WGS84", "LONGLAT"):
            return {"proj": "longlat"}
        else:
            raise ValueError(f"unrecognized CRS spec {spec!r}")
    else:
        raise ValueError(f"unrecognized CRS spec {spec!r}")
    if "nadgrids" in p:
        raise NotImplementedError(
            "+nadgrids (grid-based datum shift, e.g. NAD27 NADCON) is "
            "not supported; only +towgs84 Helmert shifts are")
    dat = p.get("datum")
    if isinstance(dat, str) and "ellps" not in p:
        # expand the PROJ +datum= shortcut into +ellps (+towgs84)
        dd = _DATUM_DEFS.get(dat, _DATUM_DEFS.get(dat.upper()))
        if dd is None:
            raise NotImplementedError(
                f"datum {dat!r}: known shortcuts are "
                f"{sorted(_DATUM_DEFS)}; pass +ellps/+towgs84 instead")
        for k, v in parse_proj4(dd).items():
            p.setdefault(k, v)
    ell = p.get("ellps", "WGS84")
    if isinstance(ell, str) and _ellps_lookup(ell) is None:
        raise NotImplementedError(
            f"ellipsoid {ell!r}: known names are "
            f"{sorted(_datum_mod().ELLIPSOIDS)}")
    pm = p.get("pm")
    if pm is not None:
        if isinstance(pm, str):
            pmd = _PM_DEFS.get(pm.lower())
            if pmd is None:
                raise NotImplementedError(
                    f"prime meridian {pm!r}: known names are "
                    f"{sorted(_PM_DEFS)}; pass degrees east instead")
        else:
            pmd = float(pm)
        p["pm"] = pmd
    av = p.get("a")
    if (av is not None and p.get("proj") not in ("sinu", "merc", "webmerc")
            and abs(float(av) - 6378137.0) > 0.5):
        # sinu and spherical merc take a custom sphere radius (merc's
        # ellipsoidal branch rejects non-WGS84 +b itself); webmerc is
        # WGS84-sphere by definition; other families need a NAMED
        # registry ellipsoid
        if _ellipsoid_from_axes_params(p) is None:
            raise NotImplementedError(
                f"+a={av} matches no registry ellipsoid "
                f"({sorted(_datum_mod().ELLIPSOIDS)}) and is not the "
                f"WGS84/GRS80 semi-major axis")
    if "proj" not in p:
        raise ValueError(f"CRS spec has no +proj: {spec!r}")
    return p


def _datum_mod():
    from pythongis_spark.geometry import datum as D

    return D


def _ellps_lookup(name: str):
    D = _datum_mod()
    if name in D.ELLIPSOIDS:
        return D.ELLIPSOIDS[name]
    for k, v in D.ELLIPSOIDS.items():
        if k.lower() == name.lower():
            return v
    return None


def _ellipsoid_from_axes_params(p: dict):
    """(+a, +b or +rf) → registry Ellipsoid, or None if no match."""
    D = _datum_mod()
    a = float(p["a"])
    if "rf" in p:
        cand = D.ellipsoid_from_axes(a, float(p["rf"]))
    elif "b" in p:
        cand = D.ellipsoid_from_axes(a, float(p["b"]), is_b=True)
    else:
        return None
    return cand if cand.name in D.ELLIPSOIDS else None


def _ellipsoid_of(p: dict):
    """Resolved Ellipsoid for a normalized dict (WGS84 default)."""
    D = _datum_mod()
    ell = p.get("ellps")
    if isinstance(ell, str):
        found = _ellps_lookup(ell)
        if found is not None:
            return found
    if p.get("a") is not None:
        found = _ellipsoid_from_axes_params(p)
        if found is not None:
            return found
    return D.WGS84


def _helmert_of(p: dict):
    """Parsed +towgs84 → Helmert, or None (absent / identity)."""
    tw = p.get("towgs84")
    if tw is None:
        return None
    D = _datum_mod()
    vals = [float(v) for v in str(tw).split(",")]
    h = D.Helmert(vals)
    return None if h.identity else h


def _tmerc_args(p: dict) -> dict:
    k = float(p.get("k", p.get("k_0", 1.0)))
    lon0 = float(p.get("lon_0", 0.0))
    lat0 = float(p.get("lat_0", 0.0))
    y0 = float(p.get("y_0", 0.0))
    if lat0 != 0.0:
        # PROJ measures northing from lat_0: shift the false northing by
        # the meridian arc (the Karney xi at lam=0, scaled)
        _, m0 = C.tmerc_forward(np.array([lon0]), np.array([lat0]),
                                lon0, k, 0.0, 0.0)
        y0 = y0 - float(m0[0])
    return dict(lon0=lon0, k0=k, x0=float(p.get("x_0", 0.0)), y0=y0)


def _family(p: dict):
    """Normalized dict → (forward, inverse) numpy callables.

    WGS84-hub convention (pyproj ``Transformer.from_crs(4326, crs)``):
    ``forward`` maps WGS84 lon/lat to the CRS — applying the +towgs84
    Helmert datum leg (when present) before the projection; ``inverse``
    is the exact reverse. Non-WGS84 ellipsoids route tmerc/utm through
    the parameterized Karney TM in :mod:`.datum`."""
    proj = p.get("proj")
    ell = _ellipsoid_of(p)
    helm = _helmert_of(p)
    pm = float(p.get("pm", 0.0) or 0.0)
    if pm != 0.0 and proj != "longlat":
        # PROJ +pm: projection longitudes are measured from the named
        # meridian — the effective Greenwich central meridian is
        # lon_0 + pm (every family subtracts lon0 in degrees). omerc
        # reads +lonc, which must shift the same way; utm derives its
        # meridian from the zone and cannot absorb the shift — raise.
        if proj == "utm":
            raise NotImplementedError(
                "+proj=utm with a non-Greenwich +pm: the UTM central "
                "meridian comes from the zone; spell it as +proj=tmerc")
        p = dict(p)
        if "lonc" in p:
            p["lonc"] = float(p["lonc"]) + pm
        p["lon_0"] = float(p.get("lon_0", 0.0)) + pm
    if proj in ("sterea", "somerc"):
        # oblique stereographic (EPSG 9809, RD New) / Swiss oblique
        # cylindrical (EPSG 9814, LV03/LV95): ellipsoid-parameterized
        # from the start (their canonical instances are Bessel)
        D = _datum_mod()
        cls = (D.ObliqueStereographic if proj == "sterea"
               else D.SwissObliqueMercator)
        inst = cls(ell, lat0=float(p.get("lat_0", 0.0)),
                   lon0=float(p.get("lon_0", 0.0)),
                   k0=float(p.get("k", p.get("k_0", 1.0))),
                   x0=float(p.get("x_0", 0.0)),
                   y0=float(p.get("y_0", 0.0)))
        fwd, inv = inst.forward, inst.inverse
    elif proj == "omerc":
        # Hotine oblique Mercator (EPSG 9812 variant A via +no_uoff,
        # 9815 variant B default) — ellipsoid-parameterized from the
        # start (RSO Borneo is Everest, Alaska/Peninsular are GRS80)
        D = _datum_mod()
        if "alpha" not in p:
            raise NotImplementedError(
                "+proj=omerc needs +alpha (the two-point "
                "+lat_1/+lon_1/+lat_2/+lon_2 form is not implemented)")
        inst = D.HotineObliqueMercator(
            ell, lat0=float(p.get("lat_0", 0.0)),
            lonc=float(p.get("lonc", p.get("lon_0", 0.0))),
            alpha=float(p["alpha"]),
            gamma=(float(p["gamma"]) if "gamma" in p else None),
            k0=float(p.get("k", p.get("k_0", 1.0))),
            x0=float(p.get("x_0", 0.0)), y0=float(p.get("y_0", 0.0)),
            no_uoff=bool(p.get("no_uoff", p.get("no_off", False))),
            no_rot=bool(p.get("no_rot", False)))
        fwd, inv = inst.forward, inst.inverse
    elif proj == "krovak":
        # Krovak oblique conic (EPSG 9819, S-JTSK) — PROJ parameter
        # defaults; east-north orientation (EPSG:5514)
        D = _datum_mod()
        inst = D.Krovak(
            ell, lat0=float(p.get("lat_0", 49.5)),
            lon0=float(p.get("lon_0", 24.833333333333332)),
            alpha=float(p.get("alpha", 30.28813972222222)),
            k0=float(p.get("k", p.get("k_0", 0.9999))),
            x0=float(p.get("x_0", 0.0)), y0=float(p.get("y_0", 0.0)))
        fwd, inv = inst.forward, inst.inverse
    elif ell.name not in ("WGS84", "GRS80"):
        D = _datum_mod()
        if proj == "utm":
            zone = int(p["zone"])
            tm = D.TransverseMercator(
                ell, lon0=-183.0 + 6 * zone, k0=0.9996, x0=500_000.0,
                y0=10_000_000.0 if p.get("south", False) else 0.0)
            fwd, inv = tm.forward, tm.inverse
        elif proj == "tmerc":
            tm = D.TransverseMercator(
                ell, lon0=float(p.get("lon_0", 0.0)),
                k0=float(p.get("k", p.get("k_0", 1.0))),
                x0=float(p.get("x_0", 0.0)), y0=float(p.get("y_0", 0.0)),
                lat0=float(p.get("lat_0", 0.0)))
            fwd, inv = tm.forward, tm.inverse
        elif proj in ("lcc", "aea"):
            inst = _conic_of(p, a=ell.a, e=ell.e)
            fwd, inv = inst.forward, inst.inverse
        elif proj == "merc":
            k = float(p.get("k", p.get("k_0", 1.0)))
            ts = p.get("lat_ts", p.get("lat_1"))
            if ts is not None:
                k = C.merc_k0_from_lat_ts(float(ts), ell.e2)
            ma = dict(lon0=float(p.get("lon_0", 0.0)), k0=k,
                      x0=float(p.get("x_0", 0.0)),
                      y0=float(p.get("y_0", 0.0)), a=ell.a, e=ell.e)
            fwd = lambda lo, la: C.merc_forward(lo, la, **ma)  # noqa: E731
            inv = lambda x, y: C.merc_inverse(x, y, **ma)  # noqa: E731
        elif proj == "longlat":
            ident = lambda a, b: (np.asarray(a, float), np.asarray(b, float))  # noqa: E731
            fwd = inv = ident
        else:
            raise NotImplementedError(
                f"+proj={proj} on ellipsoid {ell.name!r}: non-WGS84 "
                f"ellipsoids are implemented for tmerc/utm/lcc/aea/merc/"
                f"longlat only")
    else:
        fwd, inv = _family_base(p)
    if pm != 0.0 and proj == "longlat":
        # geographic CRS on a non-Greenwich meridian (e.g. EPSG:4807):
        # longitudes are measured east of that meridian
        f1, i1 = fwd, inv

        def fwd(lon, lat, _f=f1, _pm=pm):
            lo, la = _f(lon, lat)
            return lo - _pm, la

        def inv(x, y, _i=i1, _pm=pm):
            return _i(np.asarray(x, dtype=np.float64) + _pm, y)
    if helm is None:
        return fwd, inv
    D = _datum_mod()
    f0, i0 = fwd, inv

    def fwd_shifted(lon, lat):
        lo, la = D.wgs84_to_datum(lon, lat, ell, helm)
        return f0(lo, la)

    def inv_shifted(x, y):
        lo, la = i0(x, y)
        return D.datum_to_wgs84(lo, la, ell, helm)

    return fwd_shifted, inv_shifted


def _conic_of(p: dict, a: float | None = None, e: float | None = None):
    """lcc/aea parameter dict → crs conic instance (``a``/``e`` override
    the WGS84 defaults for non-WGS84 ellipsoids). lcc honors the 1SP
    ``+k_0`` scale factor (EPSG 9801; lat_1 == lat_0 with k0 ≠ 1 is the
    NTF Lambert-zone / Belgian form)."""
    lat1 = float(p.get("lat_1", p.get("lat_0", 0.0)))
    args = dict(
        lat1=lat1,
        lat2=float(p.get("lat_2", lat1)),
        lat0=float(p.get("lat_0", 0.0)),
        lon0=float(p.get("lon_0", 0.0)),
        x0=float(p.get("x_0", 0.0)),
        y0=float(p.get("y_0", 0.0)),
    )
    if a is not None:
        args["a"] = float(a)
        args["e"] = float(e)
    if p["proj"] == "lcc":
        args["k0"] = float(p.get("k", p.get("k_0", 1.0)))
        return C.LambertConformal(**args)
    return C.AlbersEqualArea(**args)


def _family_base(p: dict):
    """WGS84/GRS80 projection families (no datum leg)."""
    proj = p["proj"]
    if proj == "longlat":
        ident = lambda a, b: (np.asarray(a, float), np.asarray(b, float))  # noqa: E731
        return ident, ident
    if proj == "merc":
        # sphere specs (+R, +a==+b, or a lone +a — PROJ's sphere forms)
        # select the spherical path below; everything else is
        # ellipsoidal Mercator on WGS84 (EPSG:3395 family), so an
        # explicit +b must be the WGS84/GRS80 semi-minor
        av, bv = p.get("a"), p.get("b")
        sphere = ("R" in p
                  or (av is not None and bv is not None
                      and float(av) == float(bv))
                  or (av is not None and bv is None
                      and "rf" not in p and "ellps" not in p
                      and "datum" not in p))
        if not sphere:
            if bv is not None and abs(float(bv) - 6356752.3142) > 0.5:
                raise NotImplementedError(
                    f"+b={bv} is not the WGS84/GRS80 semi-minor axis; "
                    f"only WGS84/GRS80 ellipsoids are supported")
            k = float(p.get("k", p.get("k_0", 1.0)))
            ts = p.get("lat_ts", p.get("lat_1"))
            if ts is not None:
                k = C.merc_k0_from_lat_ts(float(ts))
            a = dict(lon0=float(p.get("lon_0", 0.0)), k0=k,
                     x0=float(p.get("x_0", 0.0)), y0=float(p.get("y_0", 0.0)))
            return (lambda lo, la: C.merc_forward(lo, la, **a),
                    lambda x, y: C.merc_inverse(x, y, **a))
    if proj == "stere":
        lat0 = float(p.get("lat_0", 90.0))
        if abs(abs(lat0) - 90.0) > 1e-9:
            raise NotImplementedError(
                "+proj=stere is implemented for the polar aspect only "
                "(+lat_0=90 or -90); oblique stereographic is not")
        ts = p.get("lat_ts", p.get("lat_1"))
        inst = C.PolarStereographic(
            lon0=float(p.get("lon_0", 0.0)),
            lat_ts=None if ts is None else float(ts),
            k0=float(p.get("k", p.get("k_0", 1.0))),
            x0=float(p.get("x_0", 0.0)), y0=float(p.get("y_0", 0.0)),
            south=lat0 < 0)
        return inst.forward, inst.inverse
    if proj == "merc" or proj == "webmerc":
        # spherical Mercator: R from +R or +a (webmerc and the bare
        # default are the WGS84 major-axis sphere); honor +lon_0/+k/
        # +lat_ts/+x_0/+y_0 instead of silently assuming EPSG:3857's
        R = (PJ.R_MAJOR if proj == "webmerc"
             else float(p.get("R", p.get("a", PJ.R_MAJOR))))
        k = float(p.get("k", p.get("k_0", 1.0)))
        ts = p.get("lat_ts", p.get("lat_1"))
        if ts is not None:
            k = math.cos(math.radians(float(ts)))  # spherical variant B
        lon0 = float(p.get("lon_0", 0.0))
        x0, y0 = float(p.get("x_0", 0.0)), float(p.get("y_0", 0.0))
        if (R == PJ.R_MAJOR and k == 1.0 and lon0 == 0.0
                and x0 == 0.0 and y0 == 0.0):
            # EPSG:3857's exact parameterization — keep the bit-frozen
            # kernel (incl. its MAX_LAT clamp) that the oracles lock

            def fwd(lon, lat):
                c = PJ._np_fwd("EPSG:3857")(
                    np.stack([np.asarray(lon, float),
                              np.asarray(lat, float)], 1))
                return c[:, 0], c[:, 1]

            def inv(x, y):
                c = PJ._np_fwd("EPSG:4326")(
                    np.stack([np.asarray(x, float), np.asarray(y, float)], 1))
                return c[:, 0], c[:, 1]

            return fwd, inv
        Rk = R * k

        def fwd(lon, lat):
            lam = np.radians(np.asarray(lon, float) - lon0)
            phi = np.radians(np.asarray(lat, float))
            return (x0 + Rk * lam,
                    y0 + Rk * np.log(np.tan(math.pi / 4 + phi / 2)))

        def inv(x, y):
            lon = lon0 + np.degrees((np.asarray(x, float) - x0) / Rk)
            lat = np.degrees(
                2 * np.arctan(np.exp((np.asarray(y, float) - y0) / Rk))
                - math.pi / 2)
            return lon, lat

        return fwd, inv
    if proj == "eqc":
        # honor the full parameter set (lon_0 / lat_ts x-scale / false
        # origins) — the bare-constant form silently dropped them
        R = float(p.get("R", p.get("a", PJ.R_MAJOR)))
        km = math.pi / 180.0 * R
        kx = km * math.cos(math.radians(float(p.get("lat_ts", 0.0))))
        lon0 = float(p.get("lon_0", 0.0))
        x0, y0 = float(p.get("x_0", 0.0)), float(p.get("y_0", 0.0))

        def fwd(lon, lat):
            return (x0 + (np.asarray(lon, float) - lon0) * kx,
                    y0 + np.asarray(lat, float) * km)

        def inv(x, y):
            return (lon0 + (np.asarray(x, float) - x0) / kx,
                    (np.asarray(y, float) - y0) / km)

        return fwd, inv
    if proj == "utm":
        zone = int(p["zone"])
        north = not p.get("south", False)
        return (lambda lo, la: C.utm_forward(lo, la, zone, north),
                lambda x, y: C.utm_inverse(x, y, zone, north))
    if proj == "tmerc":
        a = _tmerc_args(p)
        return (lambda lo, la: C.tmerc_forward(lo, la, **a),
                lambda x, y: C.tmerc_inverse(x, y, **a))
    if proj == "cea":
        a = dict(lon0=float(p.get("lon_0", 0.0)),
                 lat_ts=float(p.get("lat_ts", p.get("lat_1", 0.0))),
                 x0=float(p.get("x_0", 0.0)), y0=float(p.get("y_0", 0.0)))
        return (lambda lo, la: C.cea_forward(lo, la, **a),
                lambda x, y: C.cea_inverse(x, y, **a))
    if proj == "laea":
        inst = C.LambertAzimuthalEqualArea(
            lat0=float(p.get("lat_0", 0.0)), lon0=float(p.get("lon_0", 0.0)),
            x0=float(p.get("x_0", 0.0)), y0=float(p.get("y_0", 0.0)))
        return inst.forward, inst.inverse
    if proj == "sinu":
        # MODIS grid sphere by default; +R / spherical +a override
        a = dict(lon0=float(p.get("lon_0", 0.0)),
                 R=float(p.get("R", p.get("a", 6371007.181))),
                 x0=float(p.get("x_0", 0.0)), y0=float(p.get("y_0", 0.0)))
        return (lambda lo, la: C.sinu_forward(lo, la, **a),
                lambda x, y: C.sinu_inverse(x, y, **a))
    if proj in ("lcc", "aea"):
        inst = _conic_of(p)
        return inst.forward, inst.inverse
    raise NotImplementedError(
        f"+proj={proj} is not an implemented family "
        f"(longlat/merc/webmerc/eqc/utm/tmerc/lcc/aea/stere/laea/cea/sinu)")


def forward(spec):
    """CRS spec → fn(lon_deg, lat_deg) -> (x, y) (numpy arrays)."""
    return _family(normalize(spec))[0]


def inverse(spec):
    """CRS spec → fn(x, y) -> (lon_deg, lat_deg) (numpy arrays)."""
    return _family(normalize(spec))[1]


def column_inverse(src_spec, dst_spec):
    """(gx, gy Columns in dst CRS) → (Columns in src CRS) for raster
    warps (``raster.model.warp``): dst-inverse to lon/lat, then
    src-forward — one vectorized pandas UDF (Catalyst dedups the two
    field accesses into a single ArrowEvalPython)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    d_inv = inverse(dst_spec)
    s_fwd = forward(src_spec)
    schema = T.StructType(
        [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
    )

    @F.pandas_udf(schema)
    def tr(gx: pd.Series, gy: pd.Series) -> pd.DataFrame:
        lon, lat = d_inv(gx.to_numpy(np.float64), gy.to_numpy(np.float64))
        x, y = s_fwd(lon, lat)
        return pd.DataFrame({"x": x, "y": y}, index=gx.index)

    # the transform IS deterministic, but CollapseProject inlines
    # deterministic Python UDFs into every downstream consumer — the
    # warp plan would evaluate the same Arrow batch 4× (plan-audited).
    # Marking it nondeterministic pins exactly one ArrowEvalPython.
    tr = tr.asNondeterministic()

    def inv(gx, gy):
        st = tr(gx, gy)
        return st.getField("x"), st.getField("y")

    # consumers that can materialize the struct in one projection (e.g.
    # raster.model.resample) grab the raw udf here — a nondeterministic
    # udf can't be merged across output columns, so the two-field form
    # above costs two Arrow evals when used directly in a select
    inv.struct_udf = tr
    return inv
