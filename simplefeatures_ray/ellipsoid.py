"""Ellipsoidal (WGS84) projections: true EPSG semantics for Mercator and
UTM, closing the round-2 fidelity gap vs the reference's PROJ wrapper
(reference proj/proj.go:56-108 wraps C-PROJ; this module implements the
standard public series instead — no CGO, pure numpy).

- EPSG:3395 World Mercator: closed-form isometric latitude
  psi = atanh(sin phi) - e*atanh(e*sin phi); reverse by fixed-point
  iteration on sin phi = tanh(psi + e*atanh(e*sin phi)).
- EPSG:326xx/327xx UTM: Karney-style ellipsoidal transverse Mercator
  (Krueger alpha/beta series in the third flattening n, to n^6 —
  nanometer-level accuracy within UTM extents; see C.F.F. Karney,
  "Transverse Mercator with an accuracy of a few nanometers", 2011,
  public formulas).

All kernels are vectorized over numpy arrays (map_batches-friendly).
"""
from __future__ import annotations

import math

import numpy as np

# WGS84 defining parameters
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_E = math.sqrt(WGS84_F * (2.0 - WGS84_F))  # first eccentricity
WGS84_N = WGS84_F / (2.0 - WGS84_F)             # third flattening


def _rad(v):
    return np.radians(np.asarray(v, dtype=np.float64))


def _deg(v):
    return np.degrees(np.asarray(v, dtype=np.float64))


def isometric_latitude(phi: np.ndarray, e: float = WGS84_E) -> np.ndarray:
    """psi(phi) = atanh(sin phi) - e*atanh(e*sin phi)."""
    s = np.sin(phi)
    return np.arctanh(s) - e * np.arctanh(e * s)


def phi_from_isometric(psi: np.ndarray, e: float = WGS84_E,
                       iters: int = 10) -> np.ndarray:
    """Invert the isometric latitude by fixed-point iteration on
    sin(phi) = tanh(psi + e*atanh(e*sin phi)) — contraction factor ~e^2
    per step, so 10 iterations reach float64 roundoff."""
    s = np.tanh(psi)
    for _ in range(iters):
        s = np.tanh(psi + e * np.arctanh(e * s))
    return np.arcsin(np.clip(s, -1.0, 1.0))


def _krueger_alpha(n: float) -> np.ndarray:
    """Forward series coefficients alpha_1..alpha_6 (Karney 2011 eq. 35)."""
    n2, n3, n4, n5, n6 = n * n, n**3, n**4, n**5, n**6
    return np.array([
        n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288
        + 7891 * n6 / 37800,
        13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630
        - 1983433 * n6 / 1935360,
        61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880
        + 167603 * n6 / 181440,
        49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
        34729 * n5 / 80640 - 3418889 * n6 / 1995840,
        212378941 * n6 / 319334400,
    ])


def _krueger_beta(n: float) -> np.ndarray:
    """Reverse series coefficients beta_1..beta_6 (Karney 2011 eq. 36)."""
    n2, n3, n4, n5, n6 = n * n, n**3, n**4, n**5, n**6
    return np.array([
        n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512
        + 96199 * n6 / 604800,
        n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105
        - 1118711 * n6 / 3870720,
        17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480 + 5569 * n6 / 90720,
        4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
        4583 * n5 / 161280 - 108847 * n6 / 3991680,
        20648693 * n6 / 638668800,
    ])


def rectifying_radius(a: float = WGS84_A, n: float = WGS84_N) -> float:
    """A = a/(1+n) * (1 + n^2/4 + n^4/64 + n^6/256)."""
    return a / (1 + n) * (1 + n * n / 4 + n**4 / 64 + n**6 / 256)


class MercatorEllipsoidal:
    """EPSG:3395 World Mercator (WGS84, k0 = 1, meters)."""

    def __init__(self, a: float = WGS84_A, e: float = WGS84_E):
        self.a = a
        self.e = e

    def forward(self, lon, lat):
        lam = _rad(lon)
        phi = _rad(lat)
        return self.a * lam, self.a * isometric_latitude(phi, self.e)

    def reverse(self, x, y):
        lam = np.asarray(x, dtype=np.float64) / self.a
        phi = phi_from_isometric(np.asarray(y, dtype=np.float64) / self.a, self.e)
        return _deg(lam), _deg(phi)


class TransverseMercatorEllipsoidal:
    """Ellipsoidal transverse Mercator (Krueger series). UTM zones via
    the UTMEllipsoidal wrapper; raw use takes an arbitrary central
    meridian, scale and false origin."""

    def __init__(self, lon0_deg: float, k0: float = 1.0,
                 false_easting: float = 0.0, false_northing: float = 0.0,
                 a: float = WGS84_A, f: float = WGS84_F):
        self.lam0 = math.radians(lon0_deg)
        self.k0 = k0
        self.fe = false_easting
        self.fn = false_northing
        self.e = math.sqrt(f * (2 - f))
        n = f / (2 - f)
        self.A = rectifying_radius(a, n)
        self.alpha = _krueger_alpha(n)
        self.beta = _krueger_beta(n)
        self.j2 = 2 * np.arange(1, 7, dtype=np.float64)  # 2j for j=1..6

    def forward(self, lon, lat):
        lam = _rad(lon) - self.lam0
        phi = _rad(lat)
        # Gauss-Schreiber coordinates from the conformal sphere
        t = np.sinh(isometric_latitude(phi, self.e))
        xi_p = np.arctan2(t, np.cos(lam))
        eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
        # Krueger series: (xi', eta') -> (xi, eta)
        jxi = np.multiply.outer(self.j2, xi_p)    # (6, N)
        jeta = np.multiply.outer(self.j2, eta_p)
        xi = xi_p + np.einsum("j,jn->n", self.alpha, np.sin(jxi) * np.cosh(jeta))
        eta = eta_p + np.einsum("j,jn->n", self.alpha, np.cos(jxi) * np.sinh(jeta))
        x = self.fe + self.k0 * self.A * eta
        y = self.fn + self.k0 * self.A * xi
        return x, y

    def reverse(self, x, y):
        eta = (np.asarray(x, dtype=np.float64) - self.fe) / (self.k0 * self.A)
        xi = (np.asarray(y, dtype=np.float64) - self.fn) / (self.k0 * self.A)
        jxi = np.multiply.outer(self.j2, xi)
        jeta = np.multiply.outer(self.j2, eta)
        xi_p = xi - np.einsum("j,jn->n", self.beta, np.sin(jxi) * np.cosh(jeta))
        eta_p = eta - np.einsum("j,jn->n", self.beta, np.cos(jxi) * np.sinh(jeta))
        tau_p = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
        lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        phi = phi_from_isometric(np.arcsinh(tau_p), self.e)
        return _deg(lam + self.lam0), _deg(phi)


class UTMEllipsoidal:
    """EPSG:326zz (north) / 327zz (south) — UTM on WGS84."""

    K0 = 0.9996
    FALSE_EASTING = 500000.0
    FALSE_NORTHING_SOUTH = 10000000.0

    def __init__(self, zone: int, south: bool = False):
        if not 1 <= zone <= 60:
            raise ValueError("UTM zone must be 1..60")
        self.zone = zone
        self.south = south
        self.tm = TransverseMercatorEllipsoidal(
            lon0_deg=-183.0 + 6.0 * zone,
            k0=self.K0,
            false_easting=self.FALSE_EASTING,
            false_northing=self.FALSE_NORTHING_SOUTH if south else 0.0,
        )

    def forward(self, lon, lat):
        return self.tm.forward(lon, lat)

    def reverse(self, x, y):
        return self.tm.reverse(x, y)


def meridian_arc_numeric(phi_deg: float, a: float = WGS84_A,
                         f: float = WGS84_F, steps: int = 200001) -> float:
    """Meridian arc length from the equator by direct numerical
    quadrature of a(1-e^2)/(1-e^2 sin^2 t)^(3/2) — an INDEPENDENT
    recomputation used by tests to pin the series implementation."""
    e2 = f * (2 - f)
    t = np.linspace(0.0, math.radians(phi_deg), steps)
    integrand = a * (1 - e2) / np.power(1 - e2 * np.sin(t) ** 2, 1.5)
    return float(np.trapz(integrand, t))


def haversine_distance(lon1, lat1, lon2, lat2, radius: float = 6371000.0):
    """Great-circle distance on a sphere (haversine form — stable for
    small separations where the spherical law of cosines loses bits).
    Degrees in, metres out; fully vectorized.
    """
    p1, p2 = _rad(np.asarray(lat1)), _rad(np.asarray(lat2))
    dphi = p2 - p1
    dlmb = _rad(np.asarray(lon2)) - _rad(np.asarray(lon1))
    h = (np.sin(dphi / 2.0) ** 2
         + np.cos(p1) * np.cos(p2) * np.sin(dlmb / 2.0) ** 2)
    return 2.0 * radius * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


def geodesic_inverse_wgs84(lon1, lat1, lon2, lat2,
                           max_iter: int = 64, tol: float = 1e-12):
    """Ellipsoidal geodesic distance (Vincenty inverse, WGS84),
    vectorized over arrays. Converges everywhere except a thin
    near-antipodal band, where the iteration stalls; those rows fall
    back to the haversine scaled by the mean WGS84 radius (documented
    ~0.5% worst-case there — the classical Vincenty limitation; use a
    Karney-style solver if the antipodal band ever matters).
    Degrees in, metres out.
    """
    a, f = WGS84_A, WGS84_F
    b = a * (1.0 - f)
    phi1, phi2 = _rad(np.asarray(lat1, float)), _rad(np.asarray(lat2, float))
    L = _rad(np.asarray(lon2, float) - np.asarray(lon1, float))
    U1, U2 = np.arctan((1 - f) * np.tan(phi1)), np.arctan((1 - f) * np.tan(phi2))
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)

    lam = L.copy()
    converged = np.zeros(lam.shape, dtype=bool)
    sin_sigma = np.zeros_like(lam)
    cos_sigma = np.ones_like(lam)
    sigma = np.zeros_like(lam)
    cos_sq_alpha = np.ones_like(lam)
    cos2sm = np.ones_like(lam)
    for _ in range(max_iter):
        sin_lam, cos_lam = np.sin(lam), np.cos(lam)
        t1 = cosU2 * sin_lam
        t2 = cosU1 * sinU2 - sinU1 * cosU2 * cos_lam
        sin_sigma = np.sqrt(t1 * t1 + t2 * t2)
        cos_sigma = sinU1 * sinU2 + cosU1 * cosU2 * cos_lam
        sigma = np.arctan2(sin_sigma, cos_sigma)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alpha = np.where(sin_sigma > 0,
                                 cosU1 * cosU2 * sin_lam / np.maximum(sin_sigma, 1e-300),
                                 0.0)
        cos_sq_alpha = 1.0 - sin_alpha * sin_alpha
        with np.errstate(divide="ignore", invalid="ignore"):
            cos2sm = np.where(cos_sq_alpha > 0,
                              cos_sigma - 2.0 * sinU1 * sinU2
                              / np.maximum(cos_sq_alpha, 1e-300),
                              0.0)
        C = f / 16.0 * cos_sq_alpha * (4.0 + f * (4.0 - 3.0 * cos_sq_alpha))
        lam_new = L + (1.0 - C) * f * sin_alpha * (
            sigma + C * sin_sigma * (
                cos2sm + C * cos_sigma * (-1.0 + 2.0 * cos2sm * cos2sm)))
        step_conv = np.abs(lam_new - lam) < tol
        lam = lam_new
        converged |= step_conv
        if converged.all():
            break

    u_sq = cos_sq_alpha * (a * a - b * b) / (b * b)
    A = 1.0 + u_sq / 16384.0 * (
        4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq)))
    B = u_sq / 1024.0 * (256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq)))
    dsig = B * sin_sigma * (
        cos2sm + B / 4.0 * (
            cos_sigma * (-1.0 + 2.0 * cos2sm * cos2sm)
            - B / 6.0 * cos2sm * (-3.0 + 4.0 * sin_sigma * sin_sigma)
            * (-3.0 + 4.0 * cos2sm * cos2sm)))
    dist = b * A * (sigma - dsig)

    mean_r = (2.0 * a + b) / 3.0
    fallback = haversine_distance(lon1, lat1, lon2, lat2, radius=mean_r)
    dist = np.where(converged, dist, fallback)
    # coincident points: sigma == 0 exactly
    return np.where(sin_sigma == 0.0, 0.0, dist)


# Other reference ellipsoids (for non-WGS84 national grids; the datum
# shift itself is identity-approximated — RGF93/NAD83/ETRS89 agree with
# WGS84 at the decimeter level, OSGB36 is wired with its own ellipsoid
# but no Helmert shift, documented per-code in crs.py)
GRS80_A = 6378137.0
GRS80_F = 1.0 / 298.257222101
AIRY1830_A = 6377563.396
AIRY1830_F = 1.0 / 299.3249646
CLARKE1866_A = 6378206.4
CLARKE1866_B = 6356583.8
CLARKE1866_F = 1.0 - CLARKE1866_B / CLARKE1866_A


def _conf_t(phi: np.ndarray, e: float) -> np.ndarray:
    """Snyder's t(phi) = tan(pi/4 - phi/2) / ((1-e sin)/(1+e sin))^(e/2)."""
    es = e * np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / ((1.0 - es) / (1.0 + es)) ** (e / 2.0)


def _snyder_m(phi: np.ndarray, e: float) -> np.ndarray:
    """m(phi) = cos phi / sqrt(1 - e^2 sin^2 phi)."""
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - (e * s) ** 2)


def _authalic_q(phi: np.ndarray, e: float) -> np.ndarray:
    """Snyder's q(phi) for the equal-area conics."""
    s = np.sin(phi)
    es = e * s
    return (1.0 - e * e) * (s / (1.0 - es * es)
                            - (1.0 / (2.0 * e)) * np.log((1.0 - es) / (1.0 + es)))


class LambertConformalConicEllipsoidal:
    """Ellipsoidal Lambert Conformal Conic, 2 standard parallels
    (EPSG method 9802; Snyder, "Map Projections — A Working Manual",
    USGS PP 1395, pp. 107-109, public formulas). The reference reaches
    this projection through C-PROJ (proj/proj.go:56-108)."""

    def __init__(self, lon0: float, lat0: float, sp1: float, sp2: float,
                 false_easting: float = 0.0, false_northing: float = 0.0,
                 a: float = WGS84_A, f: float = WGS84_F):
        self.a = a
        self.e = math.sqrt(f * (2.0 - f))
        self.lam0 = math.radians(lon0)
        self.fe = false_easting
        self.fn = false_northing
        phi0, phi1, phi2 = (math.radians(v) for v in (lat0, sp1, sp2))
        m1 = float(_snyder_m(np.float64(phi1), self.e))
        m2 = float(_snyder_m(np.float64(phi2), self.e))
        t0 = float(_conf_t(np.float64(phi0), self.e))
        t1 = float(_conf_t(np.float64(phi1), self.e))
        t2 = float(_conf_t(np.float64(phi2), self.e))
        if abs(phi1 - phi2) < 1e-12:
            self.n = math.sin(phi1)
        else:
            self.n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
        self.F = m1 / (self.n * t1 ** self.n)
        self.rho0 = self.a * self.F * t0 ** self.n

    def forward(self, lon, lat):
        lam = _rad(lon)
        phi = _rad(lat)
        t = _conf_t(phi, self.e)
        rho = self.a * self.F * t ** self.n
        th = self.n * (lam - self.lam0)
        return (self.fe + rho * np.sin(th),
                self.fn + self.rho0 - rho * np.cos(th))

    def reverse(self, x, y):
        dx = np.asarray(x, dtype=np.float64) - self.fe
        dy = self.rho0 - (np.asarray(y, dtype=np.float64) - self.fn)
        rho = np.sign(self.n) * np.sqrt(dx * dx + dy * dy)
        th = np.arctan2(np.sign(self.n) * dx, np.sign(self.n) * dy)
        t = (rho / (self.a * self.F)) ** (1.0 / self.n)
        # phi from t by fixed-point iteration (Snyder 7-9), ~1e-12 in 5
        phi = np.pi / 2.0 - 2.0 * np.arctan(t)
        for _ in range(8):
            es = self.e * np.sin(phi)
            phi = np.pi / 2.0 - 2.0 * np.arctan(
                t * ((1.0 - es) / (1.0 + es)) ** (self.e / 2.0))
        return _deg(self.lam0 + th / self.n), _deg(phi)


class AlbersEqualAreaEllipsoidal:
    """Ellipsoidal Albers Equal-Area Conic (EPSG method 9822; Snyder
    pp. 101-102). Exactly area-preserving on the ellipsoid."""

    def __init__(self, lon0: float, lat0: float, sp1: float, sp2: float,
                 false_easting: float = 0.0, false_northing: float = 0.0,
                 a: float = WGS84_A, f: float = WGS84_F):
        self.a = a
        self.e = math.sqrt(f * (2.0 - f))
        self.lam0 = math.radians(lon0)
        self.fe = false_easting
        self.fn = false_northing
        phi0, phi1, phi2 = (math.radians(v) for v in (lat0, sp1, sp2))
        m1 = float(_snyder_m(np.float64(phi1), self.e))
        m2 = float(_snyder_m(np.float64(phi2), self.e))
        q0 = float(_authalic_q(np.float64(phi0), self.e))
        q1 = float(_authalic_q(np.float64(phi1), self.e))
        q2 = float(_authalic_q(np.float64(phi2), self.e))
        self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
        self.C = m1 * m1 + self.n * q1
        self.rho0 = self.a * math.sqrt(self.C - self.n * q0) / self.n

    def forward(self, lon, lat):
        lam = _rad(lon)
        phi = _rad(lat)
        q = _authalic_q(phi, self.e)
        rho = self.a * np.sqrt(self.C - self.n * q) / self.n
        th = self.n * (lam - self.lam0)
        return (self.fe + rho * np.sin(th),
                self.fn + self.rho0 - rho * np.cos(th))

    def reverse(self, x, y):
        dx = np.asarray(x, dtype=np.float64) - self.fe
        dy = self.rho0 - (np.asarray(y, dtype=np.float64) - self.fn)
        rho = np.sqrt(dx * dx + dy * dy)
        th = np.arctan2(np.sign(self.n) * dx, np.sign(self.n) * dy)
        q = (self.C - (rho * self.n / self.a) ** 2) / self.n
        e, e2 = self.e, self.e * self.e
        # Snyder 3-16 iteration from the authalic latitude seed
        qp = float(_authalic_q(np.float64(np.pi / 2.0), e))
        phi = np.arcsin(np.clip(q / qp, -1.0, 1.0))
        for _ in range(8):
            s = np.sin(phi)
            es = e * s
            one = 1.0 - es * es
            phi = phi + one * one / (2.0 * np.cos(phi)) * (
                q / (1.0 - e2) - s / one
                + (1.0 / (2.0 * e)) * np.log((1.0 - es) / (1.0 + es)))
        return _deg(self.lam0 + th / self.n), _deg(phi)


class PolarStereographicEllipsoidal:
    """Ellipsoidal Polar Stereographic (EPSG methods 9810 variant A /
    9829 variant B; Snyder USGS PP 1395 pp. 160-161). north=True for
    the north-pole aspect. Exactly one of k0 (variant A) or
    std_parallel (variant B) is given; variant B derives its scale from
    true scale at the standard parallel."""

    def __init__(self, lon0: float, north: bool = True,
                 k0: float | None = None, std_parallel: float | None = None,
                 false_easting: float = 0.0, false_northing: float = 0.0,
                 a: float = WGS84_A, f: float = WGS84_F):
        if (k0 is None) == (std_parallel is None):
            raise ValueError("give exactly one of k0 / std_parallel")
        self.a = a
        e = self.e = math.sqrt(f * (2.0 - f))
        self.lam0 = math.radians(lon0)
        self.north = north
        self.fe = false_easting
        self.fn = false_northing
        root = math.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
        if k0 is not None:
            # rho = 2 a k0 t / root
            self.rho_scale = 2.0 * a * k0 / root
        else:
            phi_f = math.radians(abs(std_parallel))
            m_f = float(_snyder_m(np.float64(phi_f), e))
            t_f = float(_conf_t(np.float64(phi_f), e))
            self.rho_scale = a * m_f / t_f

    def forward(self, lon, lat):
        lam = _rad(lon)
        phi = _rad(lat)
        if not self.north:
            phi = -phi
            lam = -lam
            lam0 = -self.lam0
        else:
            lam0 = self.lam0
        t = _conf_t(phi, self.e)
        rho = self.rho_scale * t
        dl = lam - lam0
        x = rho * np.sin(dl)
        y = -rho * np.cos(dl)
        if not self.north:
            x, y = -x, -y
        return self.fe + x, self.fn + y

    def reverse(self, x, y):
        dx = np.asarray(x, dtype=np.float64) - self.fe
        dy = np.asarray(y, dtype=np.float64) - self.fn
        if not self.north:
            dx, dy = -dx, -dy
        rho = np.hypot(dx, dy)
        t = rho / self.rho_scale
        phi = np.pi / 2.0 - 2.0 * np.arctan(t)
        for _ in range(8):
            es = self.e * np.sin(phi)
            phi = np.pi / 2.0 - 2.0 * np.arctan(
                t * ((1.0 - es) / (1.0 + es)) ** (self.e / 2.0))
        lam0 = self.lam0 if self.north else -self.lam0
        lam = lam0 + np.arctan2(dx, -dy)
        if not self.north:
            phi = -phi
            lam = -lam
        return _deg(lam), _deg(phi)


class LambertAzimuthalEqualAreaEllipsoidal:
    """Ellipsoidal Lambert Azimuthal Equal-Area (EPSG method 9820;
    Snyder pp. 187-190), oblique aspect — EPSG:3035's method."""

    def __init__(self, lon0: float, lat0: float,
                 false_easting: float = 0.0, false_northing: float = 0.0,
                 a: float = WGS84_A, f: float = WGS84_F):
        self.a = a
        e = self.e = math.sqrt(f * (2.0 - f))
        self.lam0 = math.radians(lon0)
        self.fe = false_easting
        self.fn = false_northing
        phi0 = math.radians(lat0)
        self.qp = float(_authalic_q(np.float64(np.pi / 2.0), e))
        q0 = float(_authalic_q(np.float64(phi0), e))
        self.beta0 = math.asin(q0 / self.qp)
        self.Rq = a * math.sqrt(self.qp / 2.0)
        m0 = float(_snyder_m(np.float64(phi0), e))
        self.D = a * m0 / (self.Rq * math.cos(self.beta0))
        self.sb0 = math.sin(self.beta0)
        self.cb0 = math.cos(self.beta0)

    def forward(self, lon, lat):
        lam = _rad(lon)
        phi = _rad(lat)
        q = _authalic_q(phi, self.e)
        beta = np.arcsin(np.clip(q / self.qp, -1.0, 1.0))
        sb, cb = np.sin(beta), np.cos(beta)
        dl = lam - self.lam0
        denom = 1.0 + self.sb0 * sb + self.cb0 * cb * np.cos(dl)
        B = self.Rq * np.sqrt(2.0 / denom)
        x = B * self.D * cb * np.sin(dl)
        y = (B / self.D) * (self.cb0 * sb - self.sb0 * cb * np.cos(dl))
        return self.fe + x, self.fn + y

    def reverse(self, x, y):
        dx = (np.asarray(x, dtype=np.float64) - self.fe) / self.D
        dy = (np.asarray(y, dtype=np.float64) - self.fn) * self.D
        rho = np.hypot(dx, dy)
        with np.errstate(invalid="ignore"):
            ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * self.Rq), -1.0, 1.0))
        sc, cc = np.sin(ce), np.cos(ce)
        safe_rho = np.where(rho == 0.0, 1.0, rho)
        beta = np.arcsin(np.clip(
            cc * self.sb0 + dy * sc * self.cb0 / safe_rho, -1.0, 1.0))
        beta = np.where(rho == 0.0, self.beta0, beta)
        lam = self.lam0 + np.arctan2(
            dx * sc, safe_rho * self.cb0 * cc - dy * self.sb0 * sc)
        lam = np.where(rho == 0.0, self.lam0, lam)
        # authalic -> geodetic latitude (Snyder 3-18 series would do;
        # the fixed-point on q is exact to fp precision)
        q = self.qp * np.sin(beta)
        e, e2 = self.e, self.e * self.e
        phi = beta.copy()
        for _ in range(8):
            s = np.sin(phi)
            es = e * s
            one = 1.0 - es * es
            phi = phi + one * one / (2.0 * np.cos(phi)) * (
                q / (1.0 - e2) - s / one
                + (1.0 / (2.0 * e)) * np.log((1.0 - es) / (1.0 + es)))
        return _deg(lam), _deg(phi)


class SwissObliqueMercatorEllipsoidal:
    """Swiss Oblique Mercator (EPSG method 9814): the Gaussian double
    projection behind CH1903+/LV95 (EPSG:2056) and CH1903/LV03
    (EPSG:21781). Ellipsoid -> conformal (Gauss) sphere tangent at the
    projection centre -> rotation of the centre onto the pseudo-equator
    -> equatorial Mercator. Public formulas (swisstopo, "Formulas and
    constants for the calculation of the Swiss conformal cylindrical
    projection"; EPSG Guidance Note 7-2 method 9814). The reference
    reaches Swiss grids through C-PROJ (proj/proj.go:56-108, +proj=somerc).

    The sphere is conformal AND tangent at (lat0, lon0): point scale
    there is exactly 1, and the centre maps to (false_easting,
    false_northing) by construction — both pinned in tests.
    """

    def __init__(self, lon0: float, lat0: float,
                 false_easting: float, false_northing: float,
                 a: float = 6377397.155, f: float = 1.0 / 299.1528128128):
        # Bessel 1841 defaults: the ellipsoid of both Swiss CRSs
        self.a = a
        e2 = f * (2.0 - f)
        self.e = math.sqrt(e2)
        self.lam0 = math.radians(lon0)
        self.fe = false_easting
        self.fn = false_northing
        phi0 = math.radians(lat0)
        s0, c0 = math.sin(phi0), math.cos(phi0)
        # Gauss sphere constants (GN7-2 9814: alpha, R, b0, K)
        self.alpha = math.sqrt(1.0 + e2 / (1.0 - e2) * c0 ** 4)
        self.R = a * math.sqrt(1.0 - e2) / (1.0 - e2 * s0 * s0)
        self.b0 = math.asin(s0 / self.alpha)
        self.K = (math.log(math.tan(math.pi / 4.0 + self.b0 / 2.0))
                  - self.alpha * math.log(math.tan(math.pi / 4.0 + phi0 / 2.0))
                  + self.alpha * self.e / 2.0
                  * math.log((1.0 + self.e * s0) / (1.0 - self.e * s0)))
        self.sb0, self.cb0 = math.sin(self.b0), math.cos(self.b0)

    def _sphere_lat(self, phi: np.ndarray) -> np.ndarray:
        """Geodetic -> conformal-sphere latitude b."""
        s = np.sin(phi)
        S = (self.alpha * np.log(np.tan(np.pi / 4.0 + phi / 2.0))
             - self.alpha * self.e / 2.0
             * np.log((1.0 + self.e * s) / (1.0 - self.e * s)) + self.K)
        return 2.0 * (np.arctan(np.exp(S)) - np.pi / 4.0)

    def forward(self, lon, lat):
        lam = _rad(lon)
        phi = _rad(lat)
        b = self._sphere_lat(phi)
        l = self.alpha * (lam - self.lam0)
        sb, cb = np.sin(b), np.cos(b)
        sl, cl = np.sin(l), np.cos(l)
        # rotate the centre onto the pseudo-equator
        sbb = np.clip(self.cb0 * sb - self.sb0 * cb * cl, -1.0, 1.0)
        lbb = np.arctan2(cb * sl, self.sb0 * sb + self.cb0 * cb * cl)
        x = self.R * lbb
        y = self.R / 2.0 * np.log((1.0 + sbb) / (1.0 - sbb))
        return self.fe + x, self.fn + y

    def reverse(self, x, y):
        xs = (np.asarray(x, dtype=np.float64) - self.fe) / self.R
        ys = (np.asarray(y, dtype=np.float64) - self.fn) / self.R
        bb = 2.0 * (np.arctan(np.exp(ys)) - np.pi / 4.0)
        sbb, cbb = np.sin(bb), np.cos(bb)
        sl, cl = np.sin(xs), np.cos(xs)
        b = np.arcsin(np.clip(self.cb0 * sbb + self.sb0 * cbb * cl, -1.0, 1.0))
        l = np.arctan2(cbb * sl, self.cb0 * cbb * cl - self.sb0 * sbb)
        lam = self.lam0 + l / self.alpha
        # sphere -> geodetic latitude: fixed point on the conformal
        # relation (contraction ~e^2 per step)
        Sb = np.log(np.tan(np.pi / 4.0 + b / 2.0))
        phi = b.copy()
        for _ in range(12):
            s = np.sin(phi)
            phi = 2.0 * (np.arctan(np.exp(
                (Sb - self.K) / self.alpha
                + self.e / 2.0 * np.log((1.0 + self.e * s) / (1.0 - self.e * s))
            )) - np.pi / 4.0)
        return _deg(lam), _deg(phi)
