"""Geodetic datums without pyproj: non-WGS84 reference ellipsoids, the
ellipsoid-parameterized Karney transverse Mercator, geodetic↔geocentric
conversion and 3/7-parameter Helmert datum shifts (+towgs84).

Reference analog: ``pythongis/vector/manager.py:822-846`` reprojects via
pyproj, which applies these exact datum transformations for CRS pairs on
different datums (e.g. EPSG:4326 → EPSG:27700). pyproj is not installed
in this image; this module implements the standard public formulas:

- Helmert position-vector 7-parameter transformation (EPSG method 9606,
  the convention PROJ's ``+towgs84`` uses): rotations in arc-seconds,
  scale in ppm; the reverse direction uses the exact matrix inverse so
  round trips close to float precision.
- Geodetic → geocentric (EPSG 9602) with h = 0 for 2-D coordinates
  (same convention PROJ applies to 2-D input).
- Geocentric → geodetic via a FIXED 4-step fixed-point latitude
  iteration (error < 1e-12 rad for surface points): deterministic
  operation order, SQL-replayable for the bit-exact oracles.
- Transverse Mercator on an arbitrary ellipsoid: the same Karney–Krüger
  n^4 series as :mod:`.crs` (sub-mm), with the series coefficients
  computed from the ellipsoid's third flattening. ``geometry.crs`` keeps
  the WGS84-constant fast path untouched (its oracles are bit-frozen).

Everything is numpy-vectorized; scalar constants are plain Python floats
so oracle SQL can embed them via ``repr`` and replay the exact op order.
"""

from __future__ import annotations

import math

import numpy as np


class Ellipsoid:
    """Reference ellipsoid (a, 1/f) + the derived Karney TM series."""

    def __init__(self, name: str, a: float, rf: float):
        self.name = name
        self.a = float(a)
        self.f = 1.0 / float(rf)
        self.e2 = self.f * (2 - self.f)
        self.e = math.sqrt(self.e2)
        n = self.f / (2 - self.f)
        self.n = n
        # Karney series (to n^4), same polynomials as geometry.crs
        self.alpha = [
            n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180,
            13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440,
            61 * n**3 / 240 - 103 * n**4 / 140,
            49561 * n**4 / 161280,
        ]
        self.beta = [
            n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360,
            n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440,
            17 * n**3 / 480 - 37 * n**4 / 840,
            4397 * n**4 / 161280,
        ]
        self.delta = [
            2 * n - 2 * n**2 / 3 - 2 * n**3 + 116 * n**4 / 45,
            7 * n**2 / 3 - 8 * n**3 / 5 - 227 * n**4 / 45,
            56 * n**3 / 15 - 136 * n**4 / 35,
            4279 * n**4 / 630,
        ]
        self.a_rect = self.a / (1 + n) * (1 + n**2 / 4 + n**4 / 64)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Ellipsoid({self.name}, a={self.a}, 1/f={1 / self.f})"


# PROJ +ellps= names → (a, 1/f); public constants (EPSG registry /
# PROJ's ellps table).
ELLIPSOIDS = {
    "WGS84": Ellipsoid("WGS84", 6378137.0, 298.257223563),
    "GRS80": Ellipsoid("GRS80", 6378137.0, 298.257222101),
    "airy": Ellipsoid("airy", 6377563.396, 299.3249646),
    "intl": Ellipsoid("intl", 6378388.0, 297.0),
    "bessel": Ellipsoid("bessel", 6377397.155, 299.1528128),
    "krass": Ellipsoid("krass", 6378245.0, 298.3),
    "clrk66": Ellipsoid("clrk66", 6378206.4, 294.978698214),
    "clrk80ign": Ellipsoid("clrk80ign", 6378249.2, 293.466021293627),
    "evrst30": Ellipsoid("evrst30", 6377276.345, 300.8017),
    "evrstSS": Ellipsoid("evrstSS", 6377298.556, 300.8017),
}

WGS84 = ELLIPSOIDS["WGS84"]


def ellipsoid_from_axes(a: float, rf_or_b: float, is_b: bool = False) -> Ellipsoid:
    """Match (a, 1/f) or (a, b) against the registry (1 mm tolerance)."""
    if is_b:
        rf = a / (a - rf_or_b) if a != rf_or_b else float("inf")
    else:
        rf = rf_or_b
    for ell in ELLIPSOIDS.values():
        if abs(ell.a - a) < 1e-3 and abs(1 / ell.f - rf) < 1e-6:
            return ell
    return Ellipsoid(f"a={a}", a, rf)


# --------------------------------------------- geodetic <-> geocentric

def geodetic_to_geocentric(lon, lat, ell: Ellipsoid = WGS84):
    """Degrees (h = 0) → geocentric X, Y, Z meters (EPSG 9602)."""
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    sp = np.sin(phi)
    nu = ell.a / np.sqrt(1.0 - ell.e2 * sp * sp)
    cp = np.cos(phi)
    return nu * cp * np.cos(lam), nu * cp * np.sin(lam), nu * (1.0 - ell.e2) * sp


def geocentric_to_geodetic(X, Y, Z, ell: Ellipsoid = WGS84):
    """Geocentric meters → lon, lat degrees (h discarded).

    Fixed 4-iteration latitude recursion (deterministic op order; error
    < 1e-12 rad for near-surface points — sub-µm)."""
    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.float64)
    Z = np.asarray(Z, dtype=np.float64)
    p = np.sqrt(X * X + Y * Y)
    lam = np.arctan2(Y, X)
    phi = np.arctan2(Z, p * (1.0 - ell.e2))
    for _ in range(4):
        sp = np.sin(phi)
        nu = ell.a / np.sqrt(1.0 - ell.e2 * sp * sp)
        phi = np.arctan2(Z + ell.e2 * nu * sp, p)
    return np.degrees(lam), np.degrees(phi)


# ------------------------------------------------------- Helmert shift

class Helmert:
    """Position-vector 3/7-parameter Helmert transformation (EPSG 9606,
    PROJ ``+towgs84`` convention): ``forward`` maps source-datum
    geocentric coordinates to WGS84; ``inverse`` applies the exact
    matrix inverse (round trips close to float precision, unlike the
    sign-negation approximation).

    Parameters: tx, ty, tz meters; rx, ry, rz arc-seconds; s ppm."""

    _AS2RAD = math.pi / (180.0 * 3600.0)

    def __init__(self, params):
        vals = [float(v) for v in params]
        if len(vals) == 3:
            vals += [0.0, 0.0, 0.0, 0.0]
        if len(vals) != 7:
            raise ValueError(f"towgs84 needs 3 or 7 parameters, got {len(vals)}")
        tx, ty, tz, rx, ry, rz, s = vals
        self.params = tuple(vals)
        self.identity = all(v == 0.0 for v in vals)
        rx *= self._AS2RAD
        ry *= self._AS2RAD
        rz *= self._AS2RAD
        m = 1.0 + s * 1e-6
        M = np.array([
            [m, -m * rz, m * ry],
            [m * rz, m, -m * rx],
            [-m * ry, m * rx, m],
        ], dtype=np.float64)
        Minv = np.linalg.inv(M)
        # plain-float scalar constants: the numpy kernels AND the oracle
        # SQL replay both use exactly these values
        self.M = [[float(v) for v in row] for row in M]
        self.Minv = [[float(v) for v in row] for row in Minv]
        self.T = (tx, ty, tz)

    def forward(self, X, Y, Z):
        """Source datum geocentric → WGS84 geocentric."""
        M, (tx, ty, tz) = self.M, self.T
        Xo = tx + (M[0][0] * X + M[0][1] * Y + M[0][2] * Z)
        Yo = ty + (M[1][0] * X + M[1][1] * Y + M[1][2] * Z)
        Zo = tz + (M[2][0] * X + M[2][1] * Y + M[2][2] * Z)
        return Xo, Yo, Zo

    def inverse(self, X, Y, Z):
        """WGS84 geocentric → source datum geocentric (exact inverse)."""
        Mi, (tx, ty, tz) = self.Minv, self.T
        Xs = X - tx
        Ys = Y - ty
        Zs = Z - tz
        Xo = Mi[0][0] * Xs + Mi[0][1] * Ys + Mi[0][2] * Zs
        Yo = Mi[1][0] * Xs + Mi[1][1] * Ys + Mi[1][2] * Zs
        Zo = Mi[2][0] * Xs + Mi[2][1] * Ys + Mi[2][2] * Zs
        return Xo, Yo, Zo


def datum_to_wgs84(lon, lat, ell: Ellipsoid, helmert: Helmert):
    """Source-datum geodetic degrees → WGS84 geodetic degrees (h = 0)."""
    X, Y, Z = geodetic_to_geocentric(lon, lat, ell)
    X, Y, Z = helmert.forward(X, Y, Z)
    return geocentric_to_geodetic(X, Y, Z, WGS84)


def wgs84_to_datum(lon, lat, ell: Ellipsoid, helmert: Helmert):
    """WGS84 geodetic degrees → source-datum geodetic degrees (h = 0)."""
    X, Y, Z = geodetic_to_geocentric(lon, lat, WGS84)
    X, Y, Z = helmert.inverse(X, Y, Z)
    return geocentric_to_geodetic(X, Y, Z, ell)


# ------------------------------- transverse Mercator, any ellipsoid

class TransverseMercator:
    """Karney–Krüger transverse Mercator on an arbitrary ellipsoid —
    the non-WGS84 counterpart of ``crs.tmerc_forward/inverse`` (same
    series, instance constants). EPSG:27700 (Airy), ED50 UTM (intl) and
    DHDN Gauss-Krüger (bessel) are instances.

    ``lat0`` follows PROJ semantics: northing measured from the meridian
    arc at lat_0 (false northing shifted by the Karney xi at lam=0)."""

    def __init__(self, ell: Ellipsoid, lon0: float, k0: float = 1.0,
                 x0: float = 0.0, y0: float = 0.0, lat0: float = 0.0):
        self.ell = ell
        self.lon0, self.k0 = float(lon0), float(k0)
        self.x0 = float(x0)
        self.y0 = float(y0)
        if lat0 != 0.0:
            _, m0 = self._forward_raw(np.array([lon0]), np.array([lat0]))
            self.y0 = float(y0) - float(m0[0])

    def _forward_raw(self, lon, lat):
        e = self.ell
        lam = np.radians(np.asarray(lon, dtype=np.float64) - self.lon0)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        sphi = np.sin(phi)
        t = np.sinh(np.arctanh(sphi) - e.e * np.arctanh(e.e * sphi))
        xi_p = np.arctan2(t, np.cos(lam))
        eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
        xi = xi_p.copy()
        eta = eta_p.copy()
        for j, a in enumerate(e.alpha, start=1):
            xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
            eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
        return self.k0 * e.a_rect * eta, self.k0 * e.a_rect * xi

    def forward(self, lon, lat):
        x, y = self._forward_raw(lon, lat)
        return self.x0 + x, self.y0 + y

    def inverse(self, x, y):
        e = self.ell
        xi = (np.asarray(y, dtype=np.float64) - self.y0) / (self.k0 * e.a_rect)
        eta = (np.asarray(x, dtype=np.float64) - self.x0) / (self.k0 * e.a_rect)
        xi_p = xi.copy()
        eta_p = eta.copy()
        for j, b in enumerate(e.beta, start=1):
            xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        tau_p = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
        lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        chi = np.arctan(tau_p)
        phi = chi.copy()
        for j, d in enumerate(e.delta, start=1):
            phi += d * np.sin(2 * j * chi)
        return np.degrees(lam) + self.lon0, np.degrees(phi)


# ------------------------- oblique stereographic (EPSG method 9809)

class ObliqueStereographic:
    """Oblique (double) stereographic projection, EPSG method 9809 —
    the RD New (Amersfoort / EPSG:28992) projection. Formulas follow
    the public EPSG Guidance Note 7 part 2: ellipsoid → conformal
    sphere (Gaussian radius at the origin) → stereographic on the
    sphere. Reference analog: pyproj ``+proj=sterea``
    (``pythongis/vector/manager.py:822-846`` reprojects via pyproj).

    All derived constants are plain Python floats so oracle SQL can
    embed them and replay the exact numpy operation order."""

    def __init__(self, ell: Ellipsoid, lat0: float, lon0: float,
                 k0: float = 1.0, x0: float = 0.0, y0: float = 0.0):
        self.ell = ell
        e2, e = ell.e2, ell.e
        p0 = math.radians(lat0)
        self.lam0 = math.radians(lon0)
        self.k0, self.x0, self.y0 = float(k0), float(x0), float(y0)
        sp0 = math.sin(p0)
        rho0 = ell.a * (1 - e2) / (1 - e2 * sp0 * sp0) ** 1.5
        nu0 = ell.a / math.sqrt(1 - e2 * sp0 * sp0)
        self.R = math.sqrt(rho0 * nu0)
        cp0 = math.cos(p0)
        self.n = math.sqrt(1 + e2 * cp0 ** 4 / (1 - e2))
        S1 = (1 + sp0) / (1 - sp0)
        S2 = (1 - e * sp0) / (1 + e * sp0)
        w1 = (S1 * S2 ** e) ** self.n
        sin_chi00 = (w1 - 1) / (w1 + 1)
        self.c = ((self.n + sp0) * (1 - sin_chi00)
                  / ((self.n - sp0) * (1 + sin_chi00)))
        w2 = self.c * w1
        self.chi0 = math.asin((w2 - 1) / (w2 + 1))
        self.sin_chi0 = math.sin(self.chi0)
        self.cos_chi0 = math.cos(self.chi0)
        self.two_R_k0 = 2.0 * self.R * self.k0

    def forward(self, lon, lat):
        e = self.ell.e
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        sp = np.sin(phi)
        Lam = self.n * (lam - self.lam0)  # Λ - Λ0
        Sa = (1 + sp) / (1 - sp)
        Sb = (1 - e * sp) / (1 + e * sp)
        w = self.c * (Sa * Sb ** e) ** self.n
        schi = (w - 1) / (w + 1)          # sin χ
        cchi = np.sqrt(1.0 - schi * schi)
        B = 1 + schi * self.sin_chi0 + cchi * self.cos_chi0 * np.cos(Lam)
        x = self.x0 + self.two_R_k0 * cchi * np.sin(Lam) / B
        y = self.y0 + self.two_R_k0 * (
            schi * self.cos_chi0 - cchi * self.sin_chi0 * np.cos(Lam)) / B
        return x, y

    def inverse(self, x, y):
        e, e2 = self.ell.e, self.ell.e2
        Ep = np.asarray(x, dtype=np.float64) - self.x0
        Np = np.asarray(y, dtype=np.float64) - self.y0
        g = self.two_R_k0 * math.tan(math.pi / 4 - self.chi0 / 2)
        h = 2.0 * self.two_R_k0 * math.tan(self.chi0) + g
        i = np.arctan2(Ep, h + Np)
        j = np.arctan2(Ep, g - Np) - i
        chi = self.chi0 + 2 * np.arctan2(Np - Ep * np.tan(j / 2),
                                         self.two_R_k0)
        Lam = j + 2 * i
        lam = Lam / self.n + self.lam0
        schi = np.sin(chi)
        psi = 0.5 * np.log((1 + schi) / (self.c * (1 - schi))) / self.n
        phi = 2 * np.arctan(np.exp(psi)) - math.pi / 2
        for _ in range(5):
            sp = np.sin(phi)
            psi_i = np.log(np.tan(phi / 2 + math.pi / 4)
                           * ((1 - e * sp) / (1 + e * sp)) ** (e / 2))
            phi = phi - (psi_i - psi) * np.cos(phi) * (1 - e2 * sp * sp) / (1 - e2)
        return np.degrees(lam), np.degrees(phi)


# --------------------- Swiss oblique cylindrical (PROJ +proj=somerc)

class SwissObliqueMercator:
    """Swiss oblique cylindrical projection (EPSG method 9814, PROJ
    ``+proj=somerc``) — CH1903 / LV03 (EPSG:21781) and CH1903+ / LV95
    (EPSG:2056). Formulas follow swisstopo's public reference
    "Formulas and constants for the calculation of the Swiss conformal
    cylindrical projection": ellipsoid → conformal sphere → oblique
    Mercator with the origin rotated onto the pseudo-equator. The
    projection center maps exactly to (x0, y0) by construction."""

    def __init__(self, ell: Ellipsoid, lat0: float, lon0: float,
                 k0: float = 1.0, x0: float = 0.0, y0: float = 0.0):
        self.ell = ell
        e2, e = ell.e2, ell.e
        p0 = math.radians(lat0)
        self.lam0 = math.radians(lon0)
        self.x0, self.y0 = float(x0), float(y0)
        sp0 = math.sin(p0)
        self.alpha = math.sqrt(1 + e2 * math.cos(p0) ** 4 / (1 - e2))
        self.Rk = (k0 * ell.a * math.sqrt(1 - e2)
                   / (1 - e2 * sp0 * sp0))
        self.b0 = math.asin(sp0 / self.alpha)
        self.K = (math.log(math.tan(math.pi / 4 + self.b0 / 2))
                  - self.alpha * math.log(
                      math.tan(math.pi / 4 + p0 / 2)
                      * ((1 - e * sp0) / (1 + e * sp0)) ** (e / 2)))
        self.sin_b0 = math.sin(self.b0)
        self.cos_b0 = math.cos(self.b0)

    def forward(self, lon, lat):
        e = self.ell.e
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        sp = np.sin(phi)
        S = (self.alpha * np.log(np.tan(math.pi / 4 + phi / 2)
                                 * ((1 - e * sp) / (1 + e * sp)) ** (e / 2))
             + self.K)
        b = 2 * np.arctan(np.exp(S)) - math.pi / 2
        ell_ = self.alpha * (lam - self.lam0)
        sb, cb = np.sin(b), np.cos(b)
        # rotation onto the pseudo-equator (swisstopo eq. set):
        #   b̄ = asin(cos(b0) sin(b) − sin(b0) cos(b) cos(l))
        #   l̄ = atan2(sin(l) cos(b), cos(b0) cos(b) cos(l) + sin(b0) sin(b))
        bbar_s = self.cos_b0 * sb - self.sin_b0 * cb * np.cos(ell_)
        lbar = np.arctan2(np.sin(ell_) * cb,
                          self.cos_b0 * cb * np.cos(ell_) + self.sin_b0 * sb)
        x = self.x0 + self.Rk * lbar
        y = self.y0 + self.Rk * (0.5 * np.log((1 + bbar_s) / (1 - bbar_s)))
        return x, y

    def inverse(self, x, y):
        e, e2 = self.ell.e, self.ell.e2
        Y = (np.asarray(x, dtype=np.float64) - self.x0) / self.Rk   # l̄
        X = (np.asarray(y, dtype=np.float64) - self.y0) / self.Rk
        bbar = 2 * np.arctan(np.exp(X)) - math.pi / 2
        sbb, cbb = np.sin(bbar), np.cos(bbar)
        b = np.arcsin(self.cos_b0 * sbb + self.sin_b0 * cbb * np.cos(Y))
        ell_ = np.arctan2(np.sin(Y) * cbb,
                          self.cos_b0 * cbb * np.cos(Y) - self.sin_b0 * sbb)
        lam = ell_ / self.alpha + self.lam0
        # conformal sphere latitude -> ellipsoidal latitude (fixed-point)
        S = np.log(np.tan(math.pi / 4 + b / 2))
        phi = b.copy()
        for _ in range(6):
            sp = np.sin(phi)
            Si = (self.alpha * np.log(np.tan(math.pi / 4 + phi / 2)
                                      * ((1 - e * sp) / (1 + e * sp)) ** (e / 2))
                  + self.K)
            # Newton step on S(phi) = S with dS/dphi = alpha (1-e2) /
            # ((1 - e2 sin^2 phi) cos phi)
            dS = self.alpha * (1 - e2) / ((1 - e2 * sp * sp) * np.cos(phi))
            phi = phi - (Si - S) / dS
        return np.degrees(lam), np.degrees(phi)


# ----------------------------------- Krovak (EPSG method 9819)

class Krovak:
    """Krovak oblique conformal conic (EPSG method 9819) — S-JTSK,
    the Czech/Slovak national projection on Bessel 1841. Formulas
    follow the public EPSG Guidance Note 7 part 2: Gaussian conformal
    sphere at the center latitude, pole rotated by the azimuth
    ``alpha``, conic with pseudo-standard parallel ``lat_ps`` and
    scale ``k0`` on it.

    ``forward`` returns the modern east-north orientation
    (EPSG:5514 / PROJ ``+proj=krovak`` default): x = -westing,
    y = -southing (both negative over the Czech Republic)."""

    def __init__(self, ell: Ellipsoid, lat0: float, lon0: float,
                 alpha: float, lat_ps: float = 78.5, k0: float = 0.9999,
                 x0: float = 0.0, y0: float = 0.0):
        self.ell = ell
        e2, e = ell.e2, ell.e
        pC = math.radians(lat0)
        self.lam0 = math.radians(lon0)
        self.x0, self.y0 = float(x0), float(y0)
        spC = math.sin(pC)
        self.A = ell.a * math.sqrt(1 - e2) / (1 - e2 * spC * spC)
        self.B = math.sqrt(1 + e2 * math.cos(pC) ** 4 / (1 - e2))
        self.gamma0 = math.asin(spC / self.B)
        self.t0 = (math.tan(math.pi / 4 + self.gamma0 / 2)
                   * ((1 + e * spC) / (1 - e * spC)) ** (e * self.B / 2)
                   / math.tan(math.pi / 4 + pC / 2) ** self.B)
        pP = math.radians(lat_ps)
        self.n = math.sin(pP)
        self.r0 = float(k0) * self.A / math.tan(pP)
        self.tanP = math.tan(math.pi / 4 + pP / 2)
        self.alphaC = math.radians(alpha)
        self.sin_a = math.sin(self.alphaC)
        self.cos_a = math.cos(self.alphaC)

    def forward(self, lon, lat):
        e = self.ell.e
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        sp = np.sin(phi)
        U = 2 * (np.arctan(
            self.t0 * np.tan(phi / 2 + math.pi / 4) ** self.B
            / ((1 + e * sp) / (1 - e * sp)) ** (e * self.B / 2))
            - math.pi / 4)
        V = self.B * (self.lam0 - lam)
        sU, cU = np.sin(U), np.cos(U)
        T = np.arcsin(self.cos_a * sU + self.sin_a * cU * np.cos(V))
        D = np.arcsin(cU * np.sin(V) / np.cos(T))
        theta = self.n * D
        r = self.r0 * self.tanP ** self.n / np.tan(T / 2 + math.pi / 4) ** self.n
        Xp = r * np.cos(theta)   # southing
        Yp = r * np.sin(theta)   # westing
        return self.x0 - Yp, self.y0 - Xp

    def inverse(self, x, y):
        e, e2 = self.ell.e, self.ell.e2
        Yp = -(np.asarray(x, dtype=np.float64) - self.x0)
        Xp = -(np.asarray(y, dtype=np.float64) - self.y0)
        r = np.sqrt(Xp * Xp + Yp * Yp)
        theta = np.arctan2(Yp, Xp)
        D = theta / self.n
        T = 2 * (np.arctan((self.r0 / r) ** (1.0 / self.n) * self.tanP)
                 - math.pi / 4)
        sT, cT = np.sin(T), np.cos(T)
        U = np.arcsin(self.cos_a * sT - self.sin_a * cT * np.cos(D))
        V = np.arcsin(cT * np.sin(D) / np.cos(U))
        lam = self.lam0 - V / self.B
        # ellipsoidal latitude: fixed-point on the conformal mapping
        phi = U.copy()
        for _ in range(5):
            sp = np.sin(phi)
            phi = 2 * (np.arctan(
                self.t0 ** (-1.0 / self.B)
                * np.tan(U / 2 + math.pi / 4) ** (1.0 / self.B)
                * ((1 + e * sp) / (1 - e * sp)) ** (e / 2))
                - math.pi / 4)
        return np.degrees(lam), np.degrees(phi)


# ------------------- Hotine oblique Mercator (EPSG 9812 / 9815)

class HotineObliqueMercator:
    """Hotine oblique Mercator, EPSG method 9812 (variant A, PROJ
    ``+proj=omerc +no_uoff`` — false coordinates at the natural origin)
    and 9815 (variant B, PROJ default ``+proj=omerc`` — false
    coordinates at the projection center). Formulas follow the public
    EPSG Guidance Note 7 part 2 (aposphere construction: B, A, t0, D,
    F, H, G, gamma0, lambda0). Canonical instances: Timbalai 1948 /
    RSO Borneo (EPSG:29873, variant B on Everest SS), GDM2000
    Peninsular RSO (EPSG:3375, variant A on GRS80), NAD83 / Alaska
    zone 1 (EPSG:26931, variant A on GRS80). Reference analog: pyproj
    ``+proj=omerc`` (``pythongis/vector/manager.py:822-846``).

    ``alpha`` is the azimuth of the initial line at the center;
    ``gamma`` the rectified-grid (skew) angle, defaulting to ``alpha``
    (both degrees, east of north — values > 180 are west-of-north
    lines, e.g. 323° for the Alaska/Peninsular RSO instances).
    ``no_rot`` skips the (u, v) → (E, N) rectification (PROJ flag).
    ``alpha = ±90°`` degenerates the variant-B center-offset formula —
    use :class:`SwissObliqueMercator` for that geometry.

    All derived constants are plain Python floats so oracle SQL can
    embed them and replay the exact numpy operation order."""

    def __init__(self, ell: Ellipsoid, lat0: float, lonc: float,
                 alpha: float, gamma: float | None = None,
                 k0: float = 1.0, x0: float = 0.0, y0: float = 0.0,
                 no_uoff: bool = False, no_rot: bool = False):
        self.ell = ell
        e2, e = ell.e2, ell.e
        pC = math.radians(lat0)
        lamC = math.radians(lonc)
        spC = math.sin(pC)
        cpC = math.cos(pC)
        self.k0, self.x0, self.y0 = float(k0), float(x0), float(y0)
        self.no_rot = bool(no_rot)
        self.B = math.sqrt(1 + e2 * cpC ** 4 / (1 - e2))
        self.A = (ell.a * self.B * self.k0 * math.sqrt(1 - e2)
                  / (1 - e2 * spC * spC))
        t0 = (math.tan(math.pi / 4 - pC / 2)
              / ((1 - e * spC) / (1 + e * spC)) ** (e / 2))
        Dv = (self.B * math.sqrt(1 - e2)
              / (cpC * math.sqrt(1 - e2 * spC * spC)))
        D2 = max(Dv * Dv, 1.0)
        Fv = Dv + math.copysign(math.sqrt(D2 - 1.0), pC if pC != 0 else 1.0)
        self.H = Fv * t0 ** self.B
        G = (Fv - 1.0 / Fv) / 2.0
        aC = math.radians(alpha)
        self.gamma0 = math.asin(math.sin(aC) / Dv)
        self.lam0 = lamC - math.asin(G * math.tan(self.gamma0)) / self.B
        gC = math.radians(alpha if gamma is None else gamma)
        self.sin_gc, self.cos_gc = math.sin(gC), math.cos(gC)
        self.sin_g0, self.cos_g0 = math.sin(self.gamma0), math.cos(self.gamma0)
        self.AoB = self.A / self.B
        self.twoB = 2.0 * self.B
        if no_uoff:
            self.uc = 0.0  # variant A: u measured from the natural origin
        else:
            caC = math.cos(aC)
            if abs(caC) < 1e-12:
                raise NotImplementedError(
                    "omerc variant B with alpha = ±90° (the center-offset "
                    "uc formula degenerates); use somerc / pass +no_uoff")
            # EPSG GN7-2: uc = (A/B) atan(sqrt(D^2-1)/cos(alpha_c)) sign(phi_c)
            self.uc = math.copysign(
                abs(self.AoB * math.atan(math.sqrt(D2 - 1.0) / caC)),
                pC if pC != 0 else 1.0)

    def forward(self, lon, lat):
        e = self.ell.e
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        sp = np.sin(phi)
        t = (np.tan(math.pi / 4 - phi / 2)
             / ((1 - e * sp) / (1 + e * sp)) ** (e / 2))
        Q = self.H / t ** self.B
        S = (Q - 1.0 / Q) / 2.0
        Tb = (Q + 1.0 / Q) / 2.0
        w = self.B * (lam - self.lam0)
        V = np.sin(w)
        U = (-V * self.cos_g0 + S * self.sin_g0) / Tb
        v = self.A * np.log((1.0 - U) / (1.0 + U)) / self.twoB
        u = self.AoB * np.arctan2(
            S * self.cos_g0 + V * self.sin_g0, np.cos(w)) - self.uc
        if self.no_rot:
            return self.x0 + v, self.y0 + u
        return (self.x0 + v * self.cos_gc + u * self.sin_gc,
                self.y0 + u * self.cos_gc - v * self.sin_gc)

    def inverse(self, x, y):
        e, e2 = self.ell.e, self.ell.e2
        xs = np.asarray(x, dtype=np.float64) - self.x0
        ys = np.asarray(y, dtype=np.float64) - self.y0
        if self.no_rot:
            v, u = xs, ys
        else:
            v = xs * self.cos_gc - ys * self.sin_gc
            u = ys * self.cos_gc + xs * self.sin_gc
        u = u + self.uc
        Q = np.exp(-self.B * v / self.A)
        S = (Q - 1.0 / Q) / 2.0
        Tb = (Q + 1.0 / Q) / 2.0
        w = self.B * u / self.A
        V = np.sin(w)
        U = (V * self.cos_g0 + S * self.sin_g0) / Tb
        t = (self.H / np.sqrt((1.0 + U) / (1.0 - U))) ** (1.0 / self.B)
        phi = math.pi / 2 - 2 * np.arctan(t)
        for _ in range(8):
            sp = np.sin(phi)
            phi = math.pi / 2 - 2 * np.arctan(
                t * ((1 - e * sp) / (1 + e * sp)) ** (e / 2))
        lam = self.lam0 - np.arctan2(
            S * self.cos_g0 - V * self.sin_g0, np.cos(w)) / self.B
        return np.degrees(lam), np.degrees(phi)
