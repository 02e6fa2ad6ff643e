"""Ellipsoidal map projections without pyproj: transverse Mercator /
UTM (Karney–Krüger series, sub-mm), Lambert conformal conic 2SP and
Albers equal-area 2SP (Snyder, "Map Projections — A Working Manual",
USGS PP 1395, ch. 8/14/15).

Reference analog: ``pythongis/vector/manager.py:822-846`` reprojects via
pyproj (arbitrary CRS). This module provides the projection families
that cover the reference's practical usage on WGS84; everything is
numpy-vectorized over coordinate arrays and plugged into
``geometry.projections.reproject_points/geom``.
"""

from __future__ import annotations

import math

import numpy as np

# WGS84
A_ = 6378137.0
F_ = 1 / 298.257223563
E2 = F_ * (2 - F_)
E_ = math.sqrt(E2)
N_ = F_ / (2 - F_)

# Karney series coefficients (to n^4)
_n = N_
ALPHA = [
    _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16 + 41 * _n**4 / 180,
    13 * _n**2 / 48 - 3 * _n**3 / 5 + 557 * _n**4 / 1440,
    61 * _n**3 / 240 - 103 * _n**4 / 140,
    49561 * _n**4 / 161280,
]
BETA = [
    _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96 - _n**4 / 360,
    _n**2 / 48 + _n**3 / 15 - 437 * _n**4 / 1440,
    17 * _n**3 / 480 - 37 * _n**4 / 840,
    4397 * _n**4 / 161280,
]
DELTA = [
    2 * _n - 2 * _n**2 / 3 - 2 * _n**3 + 116 * _n**4 / 45,
    7 * _n**2 / 3 - 8 * _n**3 / 5 - 227 * _n**4 / 45,
    56 * _n**3 / 15 - 136 * _n**4 / 35,
    4279 * _n**4 / 630,
]
A_RECT = A_ / (1 + _n) * (1 + _n**2 / 4 + _n**4 / 64)  # rectifying radius


# ------------------------------------------------- transverse Mercator

def tmerc_forward(lon, lat, lon0: float, k0: float = 0.9996,
                  x0: float = 500_000.0, y0: float = 0.0):
    """Ellipsoidal transverse Mercator, Karney series (numpy arrays in
    degrees → easting/northing in meters)."""
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    sphi = np.sin(phi)
    # conformal latitude tangent
    t = np.sinh(np.arctanh(sphi) - E_ * np.arctanh(E_ * sphi))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(ALPHA, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    return x0 + k0 * A_RECT * eta, y0 + k0 * A_RECT * xi


def tmerc_inverse(x, y, lon0: float, k0: float = 0.9996,
                  x0: float = 500_000.0, y0: float = 0.0):
    xi = (np.asarray(y, dtype=np.float64) - y0) / (k0 * A_RECT)
    eta = (np.asarray(x, dtype=np.float64) - x0) / (k0 * A_RECT)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(BETA, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    tau_p = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    chi = np.arctan(tau_p)
    phi = chi.copy()
    for j, d in enumerate(DELTA, start=1):
        phi += d * np.sin(2 * j * chi)
    return np.degrees(lam) + lon0, np.degrees(phi)


def utm_zone(lon: float, lat: float) -> tuple[int, bool]:
    """(zone number, is_north) — the standard 6° zones."""
    z = int(math.floor((lon + 180) / 6)) % 60 + 1
    return z, lat >= 0


def utm_forward(lon, lat, zone: int, north: bool = True):
    lon0 = -183.0 + 6 * zone
    return tmerc_forward(lon, lat, lon0, 0.9996, 500_000.0, 0.0 if north else 10_000_000.0)


def utm_inverse(x, y, zone: int, north: bool = True):
    lon0 = -183.0 + 6 * zone
    return tmerc_inverse(x, y, lon0, 0.9996, 500_000.0, 0.0 if north else 10_000_000.0)


# ------------------------------------------------- Lambert conformal 2SP

def _m(phi, e2: float = E2):
    return np.cos(phi) / np.sqrt(1 - e2 * np.sin(phi) ** 2)


def _t(phi, e: float = E_):
    sphi = np.sin(phi)
    return np.tan(np.pi / 4 - phi / 2) / (
        (1 - e * sphi) / (1 + e * sphi)
    ) ** (e / 2)


class LambertConformal:
    """Snyder 15-1..15-11 (ellipsoidal, two standard parallels).

    ``k0`` (EPSG 9801 Lambert 1SP, PROJ ``+k_0``) scales F — with
    lat1 == lat2 == lat0 this is exactly the 1SP form (French NTF
    Lambert zones, Belgian Lambert). ``a``/``e`` default to WGS84 (the
    bit-frozen oracle path: k0 = 1.0 multiplies exactly); non-WGS84
    instances (intl, clrk80ign) are constructed by ``proj_parse`` with
    the :mod:`.datum` ellipsoid constants."""

    def __init__(self, lat1: float, lat2: float, lat0: float, lon0: float,
                 x0: float = 0.0, y0: float = 0.0, k0: float = 1.0,
                 a: float = A_, e: float = E_):
        e2 = e * e
        p1, p2, p0 = (math.radians(v) for v in (lat1, lat2, lat0))
        m1, m2 = _m(np.array([p1]), e2)[0], _m(np.array([p2]), e2)[0]
        t1, t2, t0 = (_t(np.array([v]), e)[0] for v in (p1, p2, p0))
        if abs(p1 - p2) < 1e-12:
            self.n = math.sin(p1)
        else:
            self.n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
        self.F = k0 * (m1 / (self.n * t1**self.n))
        self.a, self.e = float(a), float(e)
        self.rho0 = self.a * self.F * t0**self.n
        self.lon0, self.x0, self.y0 = lon0, x0, y0

    def forward(self, lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64) - self.lon0)
        rho = self.a * self.F * _t(phi, self.e) ** self.n
        th = self.n * lam
        return self.x0 + rho * np.sin(th), self.y0 + self.rho0 - rho * np.cos(th)

    def inverse(self, x, y):
        e = self.e
        xs = np.asarray(x, dtype=np.float64) - self.x0
        ys = self.rho0 - (np.asarray(y, dtype=np.float64) - self.y0)
        rho = np.sign(self.n) * np.sqrt(xs * xs + ys * ys)
        th = np.arctan2(np.sign(self.n) * xs, np.sign(self.n) * ys)
        t = (rho / (self.a * self.F)) ** (1 / self.n)
        phi = np.pi / 2 - 2 * np.arctan(t)
        for _ in range(8):
            sphi = np.sin(phi)
            phi = np.pi / 2 - 2 * np.arctan(
                t * ((1 - e * sphi) / (1 + e * sphi)) ** (e / 2)
            )
        return np.degrees(th / self.n) + self.lon0, np.degrees(phi)


# ------------------------------------------------- Albers equal-area 2SP

def _q(phi, e: float = E_, e2: float = E2):
    sphi = np.sin(phi)
    return (1 - e2) * (
        sphi / (1 - e2 * sphi**2)
        - (1 / (2 * e)) * np.log((1 - e * sphi) / (1 + e * sphi))
    )


def _phi_from_q(q, e: float = E_, e2: float = E2):
    """Authalic → geodetic latitude: Newton on q(phi) = q (Snyder 3-16),
    shared by the equal-area inverses (Albers / LAEA / CEA).

    Seeded with the authalic latitude arcsin(q/qp) — the q/2 seed loses
    whole arc-minutes near the pole because dq/dphi → 0 there — and the
    |q| >= qp pole case short-circuits to ±π/2 (Snyder's special case;
    Newton cannot reach the pole through a vanishing derivative)."""
    q = np.asarray(q, dtype=np.float64)
    qp = float(_q(np.array([math.pi / 2]), e, e2)[0])
    pole = np.abs(q) >= qp * (1.0 - 1e-14)
    phi = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    for _ in range(8):
        sphi = np.sin(phi)
        cphi = np.maximum(np.cos(phi), 1e-300)  # pole rows are overridden
        denom = (1 - e2 * sphi**2) ** 2 / ((1 - e2) * cphi)
        phi = np.clip(phi + (q - _q(phi, e, e2)) * denom / 2,
                      -math.pi / 2, math.pi / 2)
    return np.where(pole, np.copysign(math.pi / 2, q), phi)


class AlbersEqualArea:
    """Snyder 14-12..14-21 (ellipsoidal, two standard parallels).
    ``a``/``e`` default to WGS84 (bit-frozen oracle path); non-WGS84
    instances are constructed by ``proj_parse``."""

    def __init__(self, lat1: float, lat2: float, lat0: float, lon0: float,
                 x0: float = 0.0, y0: float = 0.0,
                 a: float = A_, e: float = E_):
        e2 = e * e
        self.a, self.e, self.e2 = float(a), float(e), float(e2)
        p1, p2, p0 = (math.radians(v) for v in (lat1, lat2, lat0))
        m1, m2 = _m(np.array([p1]), e2)[0], _m(np.array([p2]), e2)[0]
        q1, q2, q0 = (_q(np.array([v]), e, e2)[0] for v in (p1, p2, p0))
        if abs(p1 - p2) < 1e-12:
            self.n = math.sin(p1)
        else:
            self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
        self.C = m1 * m1 + self.n * q1
        self.rho0 = self.a * math.sqrt(self.C - self.n * q0) / self.n
        self.lon0, self.x0, self.y0 = lon0, x0, y0

    def forward(self, lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64) - self.lon0)
        rho = self.a * np.sqrt(self.C - self.n * _q(phi, self.e, self.e2)) / self.n
        th = self.n * lam
        return self.x0 + rho * np.sin(th), self.y0 + self.rho0 - rho * np.cos(th)

    def inverse(self, x, y):
        xs = np.asarray(x, dtype=np.float64) - self.x0
        ys = self.rho0 - (np.asarray(y, dtype=np.float64) - self.y0)
        # southern standard parallels give n < 0: rho/theta need the
        # same sign handling as LambertConformal.inverse, else
        # longitudes come back off by 180/n degrees (e.g. EPSG:3577)
        rho = np.sign(self.n) * np.sqrt(xs * xs + ys * ys)
        th = np.arctan2(np.sign(self.n) * xs, np.sign(self.n) * ys)
        q = (self.C - (rho * self.n / self.a) ** 2) / self.n
        phi = _phi_from_q(q, self.e, self.e2)
        return np.degrees(th / self.n) + self.lon0, np.degrees(phi)


# ------------------------------------------------- Mercator (ellipsoidal)

def merc_k0_from_lat_ts(lat_ts: float, e2: float = E2) -> float:
    """EPSG 9805 (Mercator variant B): the scale factor equivalent to a
    standard parallel, k0 = m(lat_ts)."""
    return float(_m(np.array([math.radians(abs(lat_ts))]), e2)[0])


def merc_forward(lon, lat, lon0: float = 0.0, k0: float = 1.0,
                 x0: float = 0.0, y0: float = 0.0,
                 a: float = A_, e: float = E_):
    """Ellipsoidal Mercator (Snyder 7-6/7-7, EPSG 9804/9805; the
    EPSG:3395 family on the WGS84 defaults). y = a*k0*psi with psi the
    isometric latitude (-ln t, sharing ``_t`` with the conic families)."""
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    return x0 + a * k0 * lam, y0 - a * k0 * np.log(_t(phi, e))


def merc_inverse(x, y, lon0: float = 0.0, k0: float = 1.0,
                 x0: float = 0.0, y0: float = 0.0,
                 a: float = A_, e: float = E_):
    t = np.exp(-(np.asarray(y, dtype=np.float64) - y0) / (a * k0))
    lam = (np.asarray(x, dtype=np.float64) - x0) / (a * k0)
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(8):
        sphi = np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(
            t * ((1 - e * sphi) / (1 + e * sphi)) ** (e / 2))
    return np.degrees(lam) + lon0, np.degrees(phi)


# ------------------------------------------------- polar stereographic

# sqrt((1+e)^(1+e) * (1-e)^(1-e)) — Snyder 21-35 denominator
_T_BAR = math.sqrt((1 + E_) ** (1 + E_) * (1 - E_) ** (1 - E_))


class PolarStereographic:
    """Ellipsoidal polar stereographic, north or south aspect
    (Snyder 21-33..21-41; EPSG 9810 variant A with k0 at the pole,
    EPSG 9829 variant B with a standard parallel ``lat_ts``).

    ``lat_ts`` (when given) overrides ``k0`` via the variant-B
    equivalence k0 = m(lat_ts) * T_BAR / (2 * t(lat_ts)). The south
    aspect is the exact mirror (phi, lam) -> (-phi, -lam) with both
    plane axes negated, which reproduces the EPSG south-polar
    E/N = FE + rho*sin(lam), FN + rho*cos(lam) convention."""

    def __init__(self, lon0: float = 0.0, lat_ts: float | None = None,
                 k0: float = 1.0, x0: float = 0.0, y0: float = 0.0,
                 south: bool = False):
        if lat_ts is not None:
            pc = math.radians(abs(float(lat_ts)))
            tc = float(_t(np.array([pc]))[0])
            mc = float(_m(np.array([pc]))[0])
            k0 = mc * _T_BAR / (2 * tc)
        self.k0, self.lon0 = float(k0), float(lon0)
        self.x0, self.y0, self.south = float(x0), float(y0), bool(south)

    def forward(self, lon, lat):
        s = -1.0 if self.south else 1.0
        phi = np.radians(s * np.asarray(lat, dtype=np.float64))
        lam = np.radians(s * (np.asarray(lon, dtype=np.float64) - self.lon0))
        rho = 2 * A_ * self.k0 * _t(phi) / _T_BAR
        return (self.x0 + s * rho * np.sin(lam),
                self.y0 - s * rho * np.cos(lam))

    def inverse(self, x, y):
        s = -1.0 if self.south else 1.0
        xs = s * (np.asarray(x, dtype=np.float64) - self.x0)
        ys = s * (np.asarray(y, dtype=np.float64) - self.y0)
        rho = np.hypot(xs, ys)
        t = rho * _T_BAR / (2 * A_ * self.k0)
        phi = np.pi / 2 - 2 * np.arctan(t)
        for _ in range(8):
            sphi = np.sin(phi)
            phi = np.pi / 2 - 2 * np.arctan(
                t * ((1 - E_ * sphi) / (1 + E_ * sphi)) ** (E_ / 2))
        return s * np.degrees(np.arctan2(xs, -ys)) + self.lon0, s * np.degrees(phi)


# ------------------------------------------------- cylindrical equal-area

def cea_forward(lon, lat, lon0: float = 0.0, lat_ts: float = 0.0,
                x0: float = 0.0, y0: float = 0.0):
    """Ellipsoidal cylindrical equal-area, normal aspect (Snyder
    10-1/10-2, EPSG 9835; EPSG:6933 EASE-Grid 2.0 is lat_ts=30)."""
    k0 = float(_m(np.array([math.radians(lat_ts)]))[0])
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    return x0 + A_ * k0 * lam, y0 + A_ * _q(phi) / (2 * k0)


def cea_inverse(x, y, lon0: float = 0.0, lat_ts: float = 0.0,
                x0: float = 0.0, y0: float = 0.0):
    k0 = float(_m(np.array([math.radians(lat_ts)]))[0])
    q = (np.asarray(y, dtype=np.float64) - y0) * (2 * k0) / A_
    lam = (np.asarray(x, dtype=np.float64) - x0) / (A_ * k0)
    return np.degrees(lam) + lon0, np.degrees(_phi_from_q(q))


# ------------------------------------------- Lambert azimuthal equal-area

class LambertAzimuthalEqualArea:
    """Ellipsoidal oblique LAEA (Snyder 24-2..24-20, EPSG 9820) — the
    EPSG:3035 (ETRS89-LAEA Europe) family. Polar aspects (lat_0 = ±90)
    use different formulas and are not implemented (D degenerates)."""

    def __init__(self, lat0: float, lon0: float,
                 x0: float = 0.0, y0: float = 0.0):
        if abs(lat0) > 90.0 - 1e-9:
            raise NotImplementedError(
                "polar-aspect LAEA (+lat_0=±90) is not implemented; "
                "use polar stereographic or an oblique center")
        p0 = math.radians(lat0)
        self.qp = float(_q(np.array([math.pi / 2]))[0])
        q1 = float(_q(np.array([p0]))[0])
        self.beta1 = math.asin(q1 / self.qp)
        self.Rq = A_ * math.sqrt(self.qp / 2)
        m1 = float(_m(np.array([p0]))[0])
        self.D = A_ * m1 / (self.Rq * math.cos(self.beta1))
        self.lon0, self.x0, self.y0 = lon0, x0, y0

    def forward(self, lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64) - self.lon0)
        beta = np.arcsin(np.clip(_q(phi) / self.qp, -1, 1))
        sb1, cb1 = math.sin(self.beta1), math.cos(self.beta1)
        B = self.Rq * np.sqrt(
            2 / (1 + sb1 * np.sin(beta) + cb1 * np.cos(beta) * np.cos(lam)))
        x = B * self.D * np.cos(beta) * np.sin(lam)
        y = (B / self.D) * (cb1 * np.sin(beta) - sb1 * np.cos(beta) * np.cos(lam))
        return self.x0 + x, self.y0 + y

    def inverse(self, x, y):
        xs = np.asarray(x, dtype=np.float64) - self.x0
        ys = np.asarray(y, dtype=np.float64) - self.y0
        sb1, cb1 = math.sin(self.beta1), math.cos(self.beta1)
        rho = np.hypot(xs / self.D, self.D * ys)
        ce = 2 * np.arcsin(np.clip(rho / (2 * self.Rq), -1, 1))
        at_center = rho == 0
        rho_safe = np.where(at_center, 1.0, rho)
        q = self.qp * (np.cos(ce) * sb1
                       + self.D * ys * np.sin(ce) * cb1 / rho_safe)
        q = np.where(at_center, self.qp * sb1, q)
        lam = np.arctan2(
            xs * np.sin(ce),
            self.D * rho_safe * cb1 * np.cos(ce)
            - self.D * self.D * ys * sb1 * np.sin(ce))
        lam = np.where(at_center, 0.0, lam)
        return np.degrees(lam) + self.lon0, np.degrees(_phi_from_q(q))


# ------------------------------------------------------------ sinusoidal

def sinu_forward(lon, lat, lon0: float = 0.0, R: float = 6371007.181,
                 x0: float = 0.0, y0: float = 0.0):
    """Spherical sinusoidal (Snyder 30-1/30-2) on an authalic sphere —
    the MODIS grid is R=6371007.181 (+proj=sinu +R=6371007.181)."""
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    return x0 + R * lam * np.cos(phi), y0 + R * phi


def sinu_inverse(x, y, lon0: float = 0.0, R: float = 6371007.181,
                 x0: float = 0.0, y0: float = 0.0):
    phi = (np.asarray(y, dtype=np.float64) - y0) / R
    lam = (np.asarray(x, dtype=np.float64) - x0) / (R * np.cos(phi))
    return np.degrees(lam) + lon0, np.degrees(phi)
