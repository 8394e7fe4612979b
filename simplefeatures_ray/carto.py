"""Map projections (reference carto/ package: one config object per
projection with pure Forward(lonlat)->xy / Reverse(xy)->lonlat pairs,
e.g. carto/proj_web_mercator.go:24-57, proj_lambert_conformal_conic.go).

All formulas are the standard spherical forms (Snyder, "Map Projections
— A Working Manual", public domain) vectorized over numpy arrays of
degrees. Each projection is a small config class — usable directly
inside map_batches kernels (pure trig over coordinate columns).
"""
from __future__ import annotations

import math

import numpy as np

R_EARTH = 6371000.0


def _rad(a):
    return np.radians(np.asarray(a, dtype=np.float64))


def _deg(a):
    return np.degrees(a)


class WebMercator:
    """Zoom-scaled Web-Mercator to pixel-ish coords (reference
    carto/proj_web_mercator.go:24-57): world spans 2^zoom units."""

    def __init__(self, zoom: int = 0):
        self.scale = float(1 << zoom)

    def forward(self, lon, lat):
        lam = _rad(lon)
        phi = _rad(lat)
        x = self.scale * (lam + np.pi) / (2 * np.pi)
        y = self.scale * (np.pi - np.log(np.tan(np.pi / 4 + phi / 2))) / (2 * np.pi)
        return x, y

    def reverse(self, x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        lon = _deg(2 * np.pi * x / self.scale - np.pi)
        lat = _deg(2 * np.arctan(np.exp(np.pi - 2 * np.pi * y / self.scale)) - np.pi / 2)
        return lon, lat


class Equirectangular:
    """Plate carrée about a standard parallel (carto/proj_equirectangular.go)."""

    def __init__(self, radius: float = R_EARTH, std_parallel: float = 0.0):
        self.r = radius
        self.cos_p1 = math.cos(math.radians(std_parallel))

    def forward(self, lon, lat):
        return self.r * _rad(lon) * self.cos_p1, self.r * _rad(lat)

    def reverse(self, x, y):
        return _deg(np.asarray(x) / (self.r * self.cos_p1)), _deg(np.asarray(y) / self.r)


class LambertCylindricalEqualArea:
    def __init__(self, radius: float = R_EARTH):
        self.r = radius

    def forward(self, lon, lat):
        return self.r * _rad(lon), self.r * np.sin(_rad(lat))

    def reverse(self, x, y):
        return _deg(np.asarray(x) / self.r), _deg(np.arcsin(np.asarray(y) / self.r))


class Sinusoidal:
    def __init__(self, radius: float = R_EARTH):
        self.r = radius

    def forward(self, lon, lat):
        phi = _rad(lat)
        return self.r * _rad(lon) * np.cos(phi), self.r * phi

    def reverse(self, x, y):
        phi = np.asarray(y) / self.r
        return _deg(np.asarray(x) / (self.r * np.cos(phi))), _deg(phi)


class Orthographic:
    """View-from-infinity about a center (carto/proj_orthographic.go)."""

    def __init__(self, center_lon: float, center_lat: float, radius: float = R_EARTH):
        self.r = radius
        self.lam0 = math.radians(center_lon)
        self.phi0 = math.radians(center_lat)

    def forward(self, lon, lat):
        lam = _rad(lon)
        phi = _rad(lat)
        x = self.r * np.cos(phi) * np.sin(lam - self.lam0)
        y = self.r * (
            np.cos(self.phi0) * np.sin(phi)
            - np.sin(self.phi0) * np.cos(phi) * np.cos(lam - self.lam0)
        )
        return x, y

    def reverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) / self.r
        y = np.asarray(y, dtype=np.float64) / self.r
        rho = np.sqrt(x * x + y * y)
        c = np.arcsin(np.clip(rho, 0, 1))
        with np.errstate(invalid="ignore", divide="ignore"):
            phi = np.where(
                rho == 0,
                self.phi0,
                np.arcsin(np.cos(c) * np.sin(self.phi0) + y * np.sin(c) * np.cos(self.phi0) / np.where(rho == 0, 1, rho)),
            )
            lam = self.lam0 + np.arctan2(
                x * np.sin(c),
                rho * np.cos(self.phi0) * np.cos(c) - y * np.sin(self.phi0) * np.sin(c),
            )
        return _deg(lam), _deg(phi)


class AzimuthalEquidistant:
    def __init__(self, center_lon: float, center_lat: float, radius: float = R_EARTH):
        self.r = radius
        self.lam0 = math.radians(center_lon)
        self.phi0 = math.radians(center_lat)

    def forward(self, lon, lat):
        lam = _rad(lon)
        phi = _rad(lat)
        c = np.arccos(
            np.clip(
                np.sin(self.phi0) * np.sin(phi)
                + np.cos(self.phi0) * np.cos(phi) * np.cos(lam - self.lam0),
                -1, 1,
            )
        )
        with np.errstate(invalid="ignore", divide="ignore"):
            k = np.where(c == 0, 1.0, c / np.sin(c))
        x = self.r * k * np.cos(phi) * np.sin(lam - self.lam0)
        y = self.r * k * (
            np.cos(self.phi0) * np.sin(phi)
            - np.sin(self.phi0) * np.cos(phi) * np.cos(lam - self.lam0)
        )
        return x, y

    def reverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) / self.r
        y = np.asarray(y, dtype=np.float64) / self.r
        c = np.sqrt(x * x + y * y)
        with np.errstate(invalid="ignore", divide="ignore"):
            phi = np.where(
                c == 0,
                self.phi0,
                np.arcsin(np.cos(c) * np.sin(self.phi0) + y * np.sin(c) * np.cos(self.phi0) / np.where(c == 0, 1, c)),
            )
            lam = self.lam0 + np.arctan2(
                x * np.sin(c),
                c * np.cos(self.phi0) * np.cos(c) - y * np.sin(self.phi0) * np.sin(c),
            )
        return _deg(lam), _deg(phi)


class LambertConformalConic:
    """Two standard parallels (carto/proj_lambert_conformal_conic.go)."""

    def __init__(self, lon0: float, lat0: float, sp1: float, sp2: float,
                 radius: float = R_EARTH):
        self.r = radius
        self.lam0 = math.radians(lon0)
        phi0 = math.radians(lat0)
        phi1 = math.radians(sp1)
        phi2 = math.radians(sp2)
        if abs(phi1 - phi2) < 1e-12:
            self.n = math.sin(phi1)
        else:
            self.n = math.log(math.cos(phi1) / math.cos(phi2)) / math.log(
                math.tan(math.pi / 4 + phi2 / 2) / math.tan(math.pi / 4 + phi1 / 2)
            )
        self.F = math.cos(phi1) * math.tan(math.pi / 4 + phi1 / 2) ** self.n / self.n
        self.rho0 = self.r * self.F / math.tan(math.pi / 4 + phi0 / 2) ** self.n

    def forward(self, lon, lat):
        lam = _rad(lon)
        phi = _rad(lat)
        rho = self.r * self.F / np.tan(np.pi / 4 + phi / 2) ** self.n
        th = self.n * (lam - self.lam0)
        return rho * np.sin(th), self.rho0 - rho * np.cos(th)

    def reverse(self, x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        rho = np.sign(self.n) * np.sqrt(x * x + (self.rho0 - y) ** 2)
        th = np.arctan2(x, self.rho0 - y)
        phi = 2 * np.arctan((self.r * self.F / rho) ** (1 / self.n)) - np.pi / 2
        return _deg(self.lam0 + th / self.n), _deg(phi)


class AlbersEqualAreaConic:
    """(carto/proj_albers_equal_area_conic.go)"""

    def __init__(self, lon0: float, lat0: float, sp1: float, sp2: float,
                 radius: float = R_EARTH):
        self.r = radius
        self.lam0 = math.radians(lon0)
        phi0 = math.radians(lat0)
        phi1 = math.radians(sp1)
        phi2 = math.radians(sp2)
        self.n = (math.sin(phi1) + math.sin(phi2)) / 2
        self.C = math.cos(phi1) ** 2 + 2 * self.n * math.sin(phi1)
        self.rho0 = self.r * math.sqrt(self.C - 2 * self.n * math.sin(phi0)) / self.n

    def forward(self, lon, lat):
        lam = _rad(lon)
        phi = _rad(lat)
        rho = self.r * np.sqrt(self.C - 2 * self.n * np.sin(phi)) / self.n
        th = self.n * (lam - self.lam0)
        return rho * np.sin(th), self.rho0 - rho * np.cos(th)

    def reverse(self, x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        rho = np.sqrt(x * x + (self.rho0 - y) ** 2)
        th = np.arctan2(x, self.rho0 - y)
        phi = np.arcsin((self.C - (rho * self.n / self.r) ** 2) / (2 * self.n))
        return _deg(self.lam0 + th / self.n), _deg(phi)


class EquidistantConic:
    """(carto/proj_equidistant_conic.go)"""

    def __init__(self, lon0: float, lat0: float, sp1: float, sp2: float,
                 radius: float = R_EARTH):
        self.r = radius
        self.lam0 = math.radians(lon0)
        phi0 = math.radians(lat0)
        phi1 = math.radians(sp1)
        phi2 = math.radians(sp2)
        if abs(phi1 - phi2) < 1e-12:
            self.n = math.sin(phi1)
        else:
            self.n = (math.cos(phi1) - math.cos(phi2)) / (phi2 - phi1)
        self.G = math.cos(phi1) / self.n + phi1
        self.rho0 = self.r * (self.G - phi0)

    def forward(self, lon, lat):
        lam = _rad(lon)
        phi = _rad(lat)
        rho = self.r * (self.G - phi)
        th = self.n * (lam - self.lam0)
        return rho * np.sin(th), self.rho0 - rho * np.cos(th)

    def reverse(self, x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        rho = np.sign(self.n) * np.sqrt(x * x + (self.rho0 - y) ** 2)
        th = np.arctan2(x, self.rho0 - y)
        phi = self.G - rho / self.r
        return _deg(self.lam0 + th / self.n), _deg(phi)


class UTM:
    """Universal Transverse Mercator, spherical form, zones 1-60
    (reference carto/proj_utm.go:50-255 incl. zone-from-location)."""

    K0 = 0.9996
    FALSE_EASTING = 500000.0
    FALSE_NORTHING_SOUTH = 10000000.0

    def __init__(self, zone: int, south: bool = False, radius: float = R_EARTH):
        if not 1 <= zone <= 60:
            raise ValueError("UTM zone must be 1..60")
        self.zone = zone
        self.south = south
        self.r = radius
        self.lam0 = math.radians(self.central_meridian(zone))

    @staticmethod
    def zone_for(lon: float, lat: float) -> int:
        """Zone from location (simplified: no Norway/Svalbard exceptions)."""
        return int((lon + 180.0) // 6.0) % 60 + 1

    @staticmethod
    def central_meridian(zone: int) -> float:
        return -183.0 + 6.0 * zone

    def forward(self, lon, lat):
        lam = _rad(lon)
        phi = _rad(lat)
        B = np.cos(phi) * np.sin(lam - self.lam0)
        x = self.K0 * self.r * np.arctanh(B) + self.FALSE_EASTING
        y = self.K0 * self.r * (np.arctan2(np.tan(phi), np.cos(lam - self.lam0)) - (0 if not self.south else 0))
        if self.south:
            y = y + self.FALSE_NORTHING_SOUTH
        return x, y

    def reverse(self, x, y):
        x = (np.asarray(x, dtype=np.float64) - self.FALSE_EASTING) / (self.K0 * self.r)
        y = np.asarray(y, dtype=np.float64)
        if self.south:
            y = y - self.FALSE_NORTHING_SOUTH
        y = y / (self.K0 * self.r)
        D = y
        phi = np.arcsin(np.sin(D) / np.cosh(x))
        lam = self.lam0 + np.arctan2(np.sinh(x), np.cos(D))
        return _deg(lam), _deg(phi)


ALL_PROJECTIONS = {
    "web_mercator": lambda: WebMercator(zoom=0),
    "equirectangular": lambda: Equirectangular(std_parallel=30.0),
    "lambert_cylindrical": lambda: LambertCylindricalEqualArea(),
    "sinusoidal": lambda: Sinusoidal(),
    "orthographic": lambda: Orthographic(10.0, 45.0),
    "azimuthal_equidistant": lambda: AzimuthalEquidistant(10.0, 45.0),
    "lambert_conformal_conic": lambda: LambertConformalConic(0.0, 40.0, 33.0, 45.0),
    "albers_equal_area": lambda: AlbersEqualAreaConic(0.0, 40.0, 29.5, 45.5),
    "equidistant_conic": lambda: EquidistantConic(0.0, 40.0, 30.0, 50.0),
    "utm_zone31": lambda: UTM(31),
}


def project_batch(proj, x_col="lon", y_col="lat", out_x="x", out_y="y"):
    """map_batches kernel factory: project lon/lat columns."""
    import pyarrow as pa

    def kernel(batch: pa.Table) -> pa.Table:
        lon = np.asarray(batch[x_col], dtype=np.float64)
        lat = np.asarray(batch[y_col], dtype=np.float64)
        x, y = proj.forward(lon, lat)
        return batch.append_column(out_x, pa.array(x)).append_column(out_y, pa.array(y))

    return kernel
