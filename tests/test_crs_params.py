"""Arbitrary-CRS parameter path (round 5): crs_from_params /
register_crs / state-plane registrations, plus the full-lattice
decimeter-gate margin enumeration proj_state_plane's docstring cites.

The reference reaches arbitrary parameter sets through C-PROJ
(/root/reference/proj/proj.go:56-108); this engine exposes the same
breadth through EPSG-method constructors over named ellipsoids.
"""
import math

import numpy as np
import pytest

from simplefeatures_ray import crs
from simplefeatures_ray.crs import (TransformCRS, crs_for, crs_from_params,
                                    register_crs, transformer, unregister_crs)
from simplefeatures_ray.pipelines.corpus import (events_xy_california,
                                                 events_xy_texas)


def _roundtrip(proj, lon, lat, tol_m=1e-6):
    x, y = proj.forward(np.asarray(lon), np.asarray(lat))
    lo, la = proj.reverse(x, y)
    # metric tolerance: a degree is <= ~111.7 km on these ellipsoids
    assert np.max(np.abs(lo - lon)) * 111_700.0 < tol_m * 10
    assert np.max(np.abs(la - lat)) * 111_700.0 < tol_m * 10


class TestStatePlaneRegistry:
    def test_california_zones_resolve(self):
        for code in [f"EPSG:2694{z}" for z in range(1, 7)]:
            p = crs_for(code)
            assert hasattr(p, "forward") and hasattr(p, "reverse")

    def test_ca3_known_point(self):
        """CA zone 3 origin invariants: on the central meridian the
        easting is exactly the false easting; at lat0 on the central
        meridian the northing is exactly the false northing."""
        p = crs_for("EPSG:26943")
        x, y = p.forward(np.float64(-120.5), np.float64(36.5))
        assert abs(float(np.ravel(x)[0]) - 2_000_000.0) < 1e-6
        assert abs(float(y) - 500_000.0) < 1e-6

    def test_texas_central_origin(self):
        p = crs_for("EPSG:32139")
        lon0 = -(100.0 + 20.0 / 60.0)
        lat0 = 29.0 + 40.0 / 60.0
        x, y = p.forward(np.float64(lon0), np.float64(lat0))
        assert abs(float(x) - 700_000.0) < 1e-6
        assert abs(float(y) - 3_000_000.0) < 1e-6

    def test_ny_east_tm_scale(self):
        """TM zone: k0=0.9999 means a point on the central meridian one
        degree north of lat0 sits ~k0 * meridian-arc north of FN."""
        p = crs_for("EPSG:32115")
        x0, y0 = p.forward(np.array([-74.5]), np.array([38.0 + 50.0 / 60.0]))
        x1, y1 = p.forward(np.array([-74.5]), np.array([39.0 + 50.0 / 60.0]))
        assert abs(np.ravel(x1)[0] - np.ravel(x0)[0]) < 1e-9  # stays on the CM
        arc = np.ravel(y1)[0] - np.ravel(y0)[0]
        assert 110_900.0 < arc < 111_100.0             # ~one ellipsoidal deg

    def test_roundtrips(self):
        rng = np.random.default_rng(7)
        lon = rng.uniform(-121.9, -119.2, 64)
        lat = rng.uniform(35.3, 38.2, 64)
        _roundtrip(crs_for("EPSG:26943"), lon, lat)
        lon = rng.uniform(-102.5, -98.0, 64)
        lat = rng.uniform(28.3, 31.8, 64)
        _roundtrip(crs_for("EPSG:32139"), lon, lat)
        lon = rng.uniform(-75.5, -73.6, 64)
        lat = rng.uniform(40.0, 44.5, 64)
        _roundtrip(crs_for("EPSG:32115"), lon, lat)


class TestUserRegistry:
    def test_register_resolve_unregister(self):
        register_crs("LOCAL:T1", "lcc", lon0=-100.0, lat0=30.0,
                     sp1=31.5, sp2=28.5, ellps="GRS80",
                     false_easting=500000.0, false_northing=100000.0)
        try:
            p = crs_for("LOCAL:T1")
            q = crs_from_params("lcc", lon0=-100.0, lat0=30.0, sp1=31.5,
                                sp2=28.5, ellps="GRS80",
                                false_easting=500000.0,
                                false_northing=100000.0)
            lon = np.linspace(-102.0, -98.0, 17)
            lat = np.linspace(28.5, 31.5, 17)
            for (a, b) in zip(p.forward(lon, lat), q.forward(lon, lat)):
                assert np.array_equal(a, b)
        finally:
            unregister_crs("LOCAL:T1")
        with pytest.raises(KeyError):
            crs_for("LOCAL:T1")

    def test_user_precedence_over_builtin(self):
        """A user registration shadows the builtin for the same code and
        the builtin comes back after unregister."""
        builtin = crs_for("EPSG:3035")
        register_crs("EPSG:3035", "laea", lon0=0.0, lat0=0.0, ellps="WGS84")
        try:
            x, _ = crs_for("EPSG:3035").forward(np.float64(0.0),
                                                np.float64(0.0))
            assert abs(float(x)) < 1e-9          # no false easting => 0
        finally:
            unregister_crs("EPSG:3035")
        x, _ = builtin.forward(np.float64(10.0), np.float64(52.0))
        bx, _ = crs_for("EPSG:3035").forward(np.float64(10.0),
                                             np.float64(52.0))
        assert float(x) == float(bx)

    def test_validates_eagerly(self):
        with pytest.raises(KeyError):
            register_crs("LOCAL:BAD", "nosuchmethod", lon0=0.0)
        with pytest.raises(KeyError):
            crs_from_params("lcc", ellps="NOSUCH", lon0=0, lat0=0,
                            sp1=1, sp2=2)

    def test_transformer_composes_user_code(self):
        register_crs("LOCAL:T2", "tm", lon0=-74.5,
                     lat0=38.0 + 50.0 / 60.0, k0=0.9999, ellps="GRS80",
                     false_easting=150000.0)
        try:
            fn = transformer("EPSG:4326", "LOCAL:T2")
            builtin = transformer("EPSG:4326", "EPSG:32115")
            lon = np.linspace(-75.4, -73.7, 33)
            lat = np.linspace(40.1, 44.4, 33)
            for (a, b) in zip(fn(lon, lat), builtin(lon, lat)):
                assert np.array_equal(a, b)
        finally:
            unregister_crs("LOCAL:T2")

    def test_methods_cover_all_constructors(self):
        """Every advertised method builds and round-trips a point."""
        cases = {
            "tm": dict(lon0=9.0, lat0=0.0, k0=0.9996,
                       false_easting=500000.0),
            "lcc": dict(lon0=3.0, lat0=46.5, sp1=49.0, sp2=44.0),
            "albers": dict(lon0=-96.0, lat0=23.0, sp1=29.5, sp2=45.5),
            "laea": dict(lon0=10.0, lat0=52.0),
            "merc": dict(k0=0.997, false_easting=1000.0),
            "polar_stereo_a": dict(lon0=0.0, north=True, k0=0.994),
            "polar_stereo_b": dict(lon0=-45.0, north=True,
                                   std_parallel=70.0),
            "omerc_swiss": dict(lon0=7.439583333333333,
                                lat0=46.95240555555556,
                                false_easting=2600000.0,
                                false_northing=1200000.0),
        }
        pts = {"polar_stereo_a": (12.0, 80.0), "polar_stereo_b": (12.0, 80.0),
               "omerc_swiss": (8.0, 47.0)}
        for method, params in cases.items():
            p = crs_from_params(method, ellps="GRS80", **params)
            lon, lat = pts.get(method, (5.0, 45.0))
            x, y = p.forward(np.array([lon]), np.array([lat]))
            lo, la = p.reverse(x, y)
            assert abs(np.ravel(lo)[0] - lon) < 1e-9, method
            assert abs(np.ravel(la)[0] - lat) < 1e-9, method


def _lcc_duckdb_expr(lat0, sp1, sp2, lon0, fe, fn):
    """Independent recomputation of the LCC-2SP forward as DuckDB SQL —
    the same construction _proj_state_plane_oracle_sql uses (math-module
    conic constants, POW/TAN replay per point)."""
    a = 6378137.0
    f = 1.0 / 298.257222101
    e = math.sqrt(f * (2.0 - f))

    def m_of(phi):
        return math.cos(phi) / math.sqrt(1.0 - (e * math.sin(phi)) ** 2)

    def t_of(phi):
        es = e * math.sin(phi)
        return (math.tan(math.pi / 4.0 - phi / 2.0)
                / ((1.0 - es) / (1.0 + es)) ** (e / 2.0))

    p0, p1, p2 = (math.radians(v) for v in (lat0, sp1, sp2))
    n = ((math.log(m_of(p1)) - math.log(m_of(p2)))
         / (math.log(t_of(p1)) - math.log(t_of(p2))))
    F = m_of(p1) / (n * t_of(p1) ** n)
    rho0 = a * F * t_of(p0) ** n
    t_expr = (f"(tan(pi()/4.0 - radians(y)/2.0)"
              f" / POW((1.0-{e!r}*sin(radians(y)))"
              f"/(1.0+{e!r}*sin(radians(y))), {e / 2.0!r}))")
    return (
        f"ROUND({fe!r} + {a * F!r} * POW({t_expr}, {n!r})"
        f" * sin({n!r} * (radians(x) - radians({lon0!r}))), 1) + 0.0 AS px,"
        f"ROUND({fn + rho0!r} - {a * F!r} * POW({t_expr}, {n!r})"
        f" * cos({n!r} * (radians(x) - radians({lon0!r}))), 1) + 0.0 AS py")


class TestStatePlaneGateMargin:
    """proj_state_plane rounds projected meters to 0.1 m and compares
    hash-exact against DuckDB. Two layers over the FULL lattice period
    of each synthetic point set: (a) every projected coordinate keeps a
    nonzero distance from a 0.05 m rounding boundary, and (b) the
    decisive check — the engine's rounded values match a DuckDB replay
    of the oracle formula bit-for-bit on every lattice point."""

    def _margin(self, vals):
        frac = np.abs(vals * 10.0 - np.floor(vals * 10.0) - 0.5)
        return float(frac.min()) / 10.0     # back to meters

    def _parity(self, x, y, proj, lcc_params):
        import duckdb
        import pandas as pd

        px = np.round(np.asarray(proj.forward(x, y)[0]), 1) + 0.0
        py = np.round(np.asarray(proj.forward(x, y)[1]), 1) + 0.0
        pts = pd.DataFrame({"x": x, "y": y})
        con = duckdb.connect()
        con.register("pts", pts)
        got = con.execute(
            f"SELECT {_lcc_duckdb_expr(**lcc_params)} FROM pts").df()
        con.close()
        assert np.array_equal(px, got["px"].to_numpy())
        assert np.array_equal(py, got["py"].to_numpy())

    def test_california_lattice(self):
        # x period 4000, y period 3500 => pair period lcm = 56000
        e = np.arange(56000, dtype=np.int64)
        x, y = events_xy_california(e)
        p = crs_for("EPSG:26943")
        px, py = p.forward(x, y)
        assert self._margin(px) > 2e-8
        assert self._margin(py) > 2e-8
        self._parity(x, y, p, dict(
            lat0=36.5, sp1=38.0 + 26.0 / 60.0, sp2=37.0 + 4.0 / 60.0,
            lon0=-120.5, fe=2000000.0, fn=500000.0))

    def test_texas_lattice(self):
        # x period 5500, y period 4000 => lcm = 44000
        e = np.arange(44000, dtype=np.int64)
        x, y = events_xy_texas(e)
        cases = [
            (crs_for("EPSG:32139"),
             dict(lat0=29.0 + 40.0 / 60.0, sp1=31.0 + 53.0 / 60.0,
                  sp2=30.0 + 7.0 / 60.0, lon0=-(100.0 + 20.0 / 60.0),
                  fe=700000.0, fn=3000000.0)),
            (crs_from_params("lcc", lon0=-100.0, lat0=30.0, sp1=31.5,
                             sp2=28.5, ellps="GRS80",
                             false_easting=500000.0,
                             false_northing=100000.0),
             dict(lat0=30.0, sp1=31.5, sp2=28.5, lon0=-100.0,
                  fe=500000.0, fn=100000.0)),
        ]
        for proj, params in cases:
            px, py = proj.forward(x, y)
            assert self._margin(px) > 2e-8, params
            assert self._margin(py) > 2e-8, params
            self._parity(x, y, proj, params)
