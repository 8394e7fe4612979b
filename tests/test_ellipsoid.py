"""Ellipsoidal (WGS84) projection tests — every pin is an INDEPENDENT
recomputation: Snyder's classic TM series (a different derivation than
the Krueger series the engine uses), direct numerical quadrature of the
meridian-arc integral, and closed-form isometric latitude."""
import math

import numpy as np
import pytest

from simplefeatures_ray.ellipsoid import (
    WGS84_A,
    WGS84_E,
    WGS84_F,
    MercatorEllipsoidal,
    TransverseMercatorEllipsoidal,
    UTMEllipsoidal,
    isometric_latitude,
    meridian_arc_numeric,
    phi_from_isometric,
)


def snyder_tm_forward(lon, lat, lon0, k0=0.9996, fe=500000.0, fn=0.0):
    """Snyder (Map Projections: A Working Manual, 1987) eq. 8-9..8-13 —
    an independent 6th-order TM series used only as a test oracle."""
    a, f = WGS84_A, WGS84_F
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    phi = math.radians(lat)
    N = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
    T = math.tan(phi) ** 2
    C = ep2 * math.cos(phi) ** 2
    A = math.radians(lon - lon0) * math.cos(phi)
    M = meridian_arc_numeric(lat)
    x = fe + k0 * N * (A + (1 - T + C) * A**3 / 6
                       + (5 - 18 * T + T * T + 72 * C - 58 * ep2) * A**5 / 120)
    y = fn + k0 * (M + N * math.tan(phi) * (
        A * A / 2 + (5 - T + 9 * C + 4 * C * C) * A**4 / 24
        + (61 - 58 * T + T * T + 600 * C - 330 * ep2) * A**6 / 720))
    return x, y


SAMPLE_POINTS = [  # (lon, lat) spread across a zone and both hemispheres
    (3.0, 50.0), (2.2945, 48.8584), (5.9, 58.0), (0.5, -0.5),
    (3.0, 0.0), (4.5, -35.2), (0.01, 72.0), (5.99, -69.9),
]


def test_utm_matches_snyder_series():
    utm_n = UTMEllipsoidal(31)
    utm_s = UTMEllipsoidal(31, south=True)
    for lon, lat in SAMPLE_POINTS:
        utm = utm_s if lat < 0 else utm_n
        fn = UTMEllipsoidal.FALSE_NORTHING_SOUTH if lat < 0 else 0.0
        x, y = utm.forward(np.array([lon]), np.array([lat]))
        xs, ys = snyder_tm_forward(lon, lat, 3.0, fn=fn)
        assert abs(x[0] - xs) < 1e-3, (lon, lat, x[0], xs)
        assert abs(y[0] - ys) < 1e-3, (lon, lat, y[0], ys)


def test_utm_central_meridian_pins():
    """At the central meridian: easting exactly 500000, northing equals
    k0 x the numerically integrated meridian arc."""
    utm = UTMEllipsoidal(31)
    for lat in (0.0, 12.5, 50.0, 79.9):
        x, y = utm.forward(np.array([3.0]), np.array([lat]))
        assert x[0] == pytest.approx(500000.0, abs=1e-9)
        assert y[0] == pytest.approx(0.9996 * meridian_arc_numeric(lat), abs=1e-5)


def test_utm_round_trip():
    rng = np.random.default_rng(5)
    lon = 3.0 + rng.uniform(-3, 3, 500)
    lat = rng.uniform(-80, 84, 500)
    for south in (False, True):
        utm = UTMEllipsoidal(31, south=south)
        x, y = utm.forward(lon, lat)
        lon2, lat2 = utm.reverse(x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-11)
        np.testing.assert_allclose(lat2, lat, atol=1e-11)


def test_mercator_3395_closed_form_and_round_trip():
    m = MercatorEllipsoidal()
    lon = np.array([10.0, -120.0, 0.0, 179.0])
    lat = np.array([50.0, -33.0, 0.0, 83.0])
    x, y = m.forward(lon, lat)
    for i in range(len(lon)):
        phi = math.radians(lat[i])
        psi = math.atanh(math.sin(phi)) - WGS84_E * math.atanh(WGS84_E * math.sin(phi))
        assert x[i] == pytest.approx(WGS84_A * math.radians(lon[i]), abs=1e-6)
        assert y[i] == pytest.approx(WGS84_A * psi, abs=1e-6)
    lon2, lat2 = m.reverse(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-12)
    np.testing.assert_allclose(lat2, lat, atol=1e-12)


def test_isometric_latitude_inverse():
    phi = np.radians(np.linspace(-89, 89, 359))
    psi = isometric_latitude(phi)
    np.testing.assert_allclose(phi_from_isometric(psi), phi, atol=1e-13)


def test_ellipsoidal_differs_from_spherical_sanely():
    """The ellipsoid correction at mid-latitudes is O(f * arc) — tens of
    km of northing — and zero at the equator for easting on the CM."""
    from simplefeatures_ray.carto import UTM

    ell = UTMEllipsoidal(31)
    sph = UTM(31)
    x_e, y_e = ell.forward(np.array([3.0]), np.array([50.0]))
    x_s, y_s = sph.forward(np.array([3.0]), np.array([50.0]))
    assert x_e[0] == pytest.approx(x_s[0], abs=1e-6)  # both 500000 on CM
    assert 1000 < abs(y_e[0] - y_s[0]) < 60000


def test_crs_registry_ellipsoidal_codes(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from simplefeatures_ray.crs import NaturalUTM, TransformCRS, crs_for

    assert type(crs_for("EPSG:32631")).__name__ == "UTMEllipsoidal"
    assert type(crs_for("EPSG:3395")).__name__ == "MercatorEllipsoidal"
    assert type(crs_for("SPHERE:UTM:31")).__name__ == "UTM"
    # NaturalUTM kernel: zone per point, values match direct projection
    t = pa.table({"x": pa.array([2.2945, -120.0, 177.5]),
                  "y": pa.array([48.8584, -33.0, 60.0])})
    out = rd.from_arrow(t).map_batches(NaturalUTM(), batch_format="pyarrow").to_pandas()
    # -120 sits ON the zone 10/11 edge and belongs to zone 11
    assert out["utm_zone"].tolist() == [31, 11, 60]
    x0, y0 = UTMEllipsoidal(31).forward(np.array([2.2945]), np.array([48.8584]))
    assert out["utm_x"][0] == pytest.approx(x0[0], abs=1e-9)
    assert out["utm_y"][0] == pytest.approx(y0[0], abs=1e-9)
    # chained TransformCRS through the hub with an ellipsoidal leg
    out2 = rd.from_arrow(t).map_batches(
        TransformCRS("EPSG:4326", "EPSG:3395", out_x="mx", out_y="my"),
        batch_format="pyarrow").map_batches(
        TransformCRS("EPSG:3395", "EPSG:4326", x_col="mx", y_col="my",
                     out_x="lon2", out_y="lat2"),
        batch_format="pyarrow").to_pandas()
    np.testing.assert_allclose(out2["lon2"], out2["x"], atol=1e-11)
    np.testing.assert_allclose(out2["lat2"], out2["y"], atol=1e-11)


def test_haversine_known_values():
    import numpy as np

    from simplefeatures_ray.ellipsoid import haversine_distance

    # quarter equator on the engine's sphere radius
    d = haversine_distance(np.array([0.0]), np.array([0.0]),
                           np.array([90.0]), np.array([0.0]))
    assert abs(d[0] - np.pi / 2 * 6371000.0) < 1e-6
    # coincident and symmetric
    assert haversine_distance(np.array([5.0]), np.array([5.0]),
                              np.array([5.0]), np.array([5.0]))[0] == 0.0
    a = haversine_distance(np.array([10.0]), np.array([20.0]),
                           np.array([-40.0]), np.array([55.0]))[0]
    b = haversine_distance(np.array([-40.0]), np.array([55.0]),
                           np.array([10.0]), np.array([20.0]))[0]
    assert a == b


def test_vincenty_inverse_wgs84():
    import math

    import numpy as np

    from simplefeatures_ray.ellipsoid import (
        geodesic_inverse_wgs84,
        haversine_distance,
        meridian_arc_numeric,
    )

    # Geoscience Australia's classic Vincenty pair (Flinders Peak ->
    # Buninyong), decimal-degree inputs; value cross-checked against an
    # independently coded scalar Vincenty (agreement < 1e-8 m)
    d = geodesic_inverse_wgs84(np.array([144.424868]), np.array([-37.951033]),
                               np.array([143.926496]), np.array([-37.652821]))
    assert abs(d[0] - 54972.2273147) < 1e-3

    # meridian geodesic equals the meridian-arc quadrature
    q = geodesic_inverse_wgs84(np.array([10.0]), np.array([0.0]),
                               np.array([10.0]), np.array([89.999999]))
    assert abs(q[0] - meridian_arc_numeric(89.999999)) < 1e-4

    # ellipsoidal vs spherical stays within the flattening envelope
    rng = np.random.default_rng(3)
    lon1 = rng.uniform(-180, 180, 64); lat1 = rng.uniform(-70, 70, 64)
    lon2 = rng.uniform(-180, 180, 64); lat2 = rng.uniform(-70, 70, 64)
    dv = geodesic_inverse_wgs84(lon1, lat1, lon2, lat2)
    dh = haversine_distance(lon1, lat1, lon2, lat2)
    ratio = dv / np.maximum(dh, 1.0)
    assert (ratio > 0.99).all() and (ratio < 1.01).all()
    # zero distance exact
    z = geodesic_inverse_wgs84(np.array([7.0]), np.array([-3.0]),
                               np.array([7.0]), np.array([-3.0]))
    assert z[0] == 0.0


class TestNationalGrids:
    """Ellipsoidal LCC/Albers + national TM grids vs PUBLISHED
    conformance points (Snyder USGS PP 1395 numerical examples; EPSG
    Guidance Note 7-2 OSGB example)."""

    def test_lcc_snyder_example(self):
        from simplefeatures_ray.ellipsoid import (
            CLARKE1866_A, CLARKE1866_F, LambertConformalConicEllipsoidal)

        p = LambertConformalConicEllipsoidal(lon0=-96, lat0=23, sp1=33,
                                             sp2=45, a=CLARKE1866_A,
                                             f=CLARKE1866_F)
        x, y = p.forward(np.array([-75.0]), np.array([35.0]))
        assert abs(float(x[0]) - 1894410.9) < 0.05
        assert abs(float(y[0]) - 1564649.5) < 0.05
        lon, lat = p.reverse(x, y)
        assert abs(float(lon[0]) + 75.0) < 1e-9
        assert abs(float(lat[0]) - 35.0) < 1e-9

    def test_albers_snyder_example(self):
        from simplefeatures_ray.ellipsoid import (
            CLARKE1866_A, CLARKE1866_F, AlbersEqualAreaEllipsoidal)

        p = AlbersEqualAreaEllipsoidal(lon0=-96, lat0=23, sp1=29.5,
                                       sp2=45.5, a=CLARKE1866_A,
                                       f=CLARKE1866_F)
        x, y = p.forward(np.array([-75.0]), np.array([35.0]))
        assert abs(float(x[0]) - 1885472.7) < 0.05
        assert abs(float(y[0]) - 1535925.0) < 0.05
        lon, lat = p.reverse(x, y)
        assert abs(float(lon[0]) + 75.0) < 1e-9
        assert abs(float(lat[0]) - 35.0) < 1e-9

    def test_osgb_epsg_example(self):
        """EPSG GN7-2 worked example: 50d30'N 0d30'E ->
        E 577274.99, N 69740.50 (British National Grid)."""
        from simplefeatures_ray.crs import crs_for

        p = crs_for("EPSG:27700")
        x, y = p.forward(np.array([0.5]), np.array([50.5]))
        assert abs(float(x[0]) - 577274.99) < 0.02
        assert abs(float(y[0]) - 69740.50) < 0.02

    def test_lambert93_origin_and_paris(self):
        from simplefeatures_ray.crs import crs_for

        p = crs_for("EPSG:2154")
        x, y = p.forward(np.array([3.0]), np.array([46.5]))
        assert abs(float(x[0]) - 700000.0) < 1e-6
        assert abs(float(y[0]) - 6600000.0) < 1e-6
        # Paris Notre-Dame, known Lambert-93 coordinate (~decimeter)
        x, y = p.forward(np.array([2.3522]), np.array([48.8566]))
        assert abs(float(x[0]) - 652469.02) < 0.5
        assert abs(float(y[0]) - 6862035.26) < 0.5

    def test_conus_albers_preserves_area(self):
        """The equal-area property, checked against the ellipsoid's
        authalic area of a 0.2-degree quad over Kansas."""
        from simplefeatures_ray.crs import crs_for
        from simplefeatures_ray.ellipsoid import (GRS80_A, GRS80_F,
                                                  _authalic_q)

        p = crs_for("EPSG:5070")
        lo0, la0, d = -98.0, 38.0, 0.2
        lons = np.array([lo0, lo0 + d, lo0 + d, lo0])
        lats = np.array([la0, la0, la0 + d, la0 + d])
        x, y = p.forward(lons, lats)
        planar = 0.5 * abs(float(
            np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))
        e = np.sqrt(GRS80_F * (2 - GRS80_F))
        q1 = float(_authalic_q(np.radians(la0), e))
        q2 = float(_authalic_q(np.radians(la0 + d), e))
        truth = GRS80_A ** 2 / 2.0 * (q2 - q1) * np.radians(d)
        assert abs(planar / truth - 1.0) < 1e-6

    def test_roundtrips_all_new_codes(self):
        from simplefeatures_ray.crs import crs_for

        pts = {
            "EPSG:2154": (2.35, 48.85), "EPSG:5070": (-98.0, 39.0),
            "EPSG:27700": (-1.5, 52.5), "EPSG:2180": (21.0, 52.2),
            "EPSG:2193": (174.8, -36.9), "EPSG:25832": (9.0, 51.0),
        }
        for code, (lon, lat) in pts.items():
            p = crs_for(code)
            x, y = p.forward(np.array([lon]), np.array([lat]))
            lo, la = p.reverse(x, y)
            assert abs(float(lo[0]) - lon) < 1e-9, code
            assert abs(float(la[0]) - lat) < 1e-9, code


class TestPolarAndLAEA:
    """Polar Stereographic (variants A and B) + ellipsoidal LAEA vs the
    EPSG Guidance Note 7-2 worked examples."""

    def test_ups_north_epsg_example(self):
        """GN7-2 variant A example: 73N 44E -> 3320416.75 E, 632668.43 N
        (WGS84/UPS North, k0=0.994, FE=FN=2000000)."""
        from simplefeatures_ray.crs import crs_for

        p = crs_for("EPSG:5041")
        x, y = p.forward(np.array([44.0]), np.array([73.0]))
        assert abs(float(x[0]) - 3320416.75) < 0.02
        assert abs(float(y[0]) - 632668.43) < 0.02
        lon, lat = p.reverse(x, y)
        assert abs(float(lon[0]) - 44.0) < 1e-9
        assert abs(float(lat[0]) - 73.0) < 1e-9

    def test_variant_b_epsg_example(self):
        """GN7-2 variant B example (Australian Antarctic, sp 71S,
        lon0 70E, FE=FN=6000000): 75S 120E -> 7255380.79, 7053389.56."""
        from simplefeatures_ray.crs import crs_for

        p = crs_for("EPSG:3032")
        x, y = p.forward(np.array([120.0]), np.array([-75.0]))
        assert abs(float(x[0]) - 7255380.79) < 0.02
        assert abs(float(y[0]) - 7053389.56) < 0.02
        lon, lat = p.reverse(x, y)
        assert abs(float(lon[0]) - 120.0) < 1e-9
        assert abs(float(lat[0]) + 75.0) < 1e-9

    def test_laea_epsg_example(self):
        """GN7-2 LAEA example (ETRS89-LAEA Europe): 50N 5E ->
        3962799.45 E, 2999718.85 N."""
        from simplefeatures_ray.crs import crs_for

        p = crs_for("EPSG:3035")
        x, y = p.forward(np.array([5.0]), np.array([50.0]))
        assert abs(float(x[0]) - 3962799.45) < 0.02
        assert abs(float(y[0]) - 2999718.85) < 0.02
        x0, y0 = p.forward(np.array([10.0]), np.array([52.0]))
        assert abs(float(x0[0]) - 4321000.0) < 1e-6
        assert abs(float(y0[0]) - 3210000.0) < 1e-6

    def test_laea_preserves_area(self):
        from simplefeatures_ray.crs import crs_for
        from simplefeatures_ray.ellipsoid import (GRS80_A, GRS80_F,
                                                  _authalic_q)

        p = crs_for("EPSG:3035")
        lo0, la0, d = 14.0, 48.0, 0.2
        lons = np.array([lo0, lo0 + d, lo0 + d, lo0])
        lats = np.array([la0, la0, la0 + d, la0 + d])
        x, y = p.forward(lons, lats)
        planar = 0.5 * abs(float(
            np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))
        e = np.sqrt(GRS80_F * (2 - GRS80_F))
        q1 = float(_authalic_q(np.radians(la0), e))
        q2 = float(_authalic_q(np.radians(la0 + d), e))
        truth = GRS80_A ** 2 / 2.0 * (q2 - q1) * np.radians(d)
        # 1e-5: the straight-edged projected quad only approximates the
        # curved image of the lat/lon quad (error ~ d^2 of the 0.2 deg
        # cell under LAEA's oblique-aspect distortion)
        assert abs(planar / truth - 1.0) < 1e-5

    def test_polar_roundtrips(self):
        from simplefeatures_ray.crs import crs_for

        pts = {"EPSG:5041": (30.0, 80.0), "EPSG:5042": (-130.0, -80.0),
               "EPSG:3413": (-60.0, 75.0), "EPSG:3031": (45.0, -77.0),
               "EPSG:3035": (24.0, 61.0)}
        for code, (lon, lat) in pts.items():
            p = crs_for(code)
            x, y = p.forward(np.array([lon]), np.array([lat]))
            lo, la = p.reverse(x, y)
            assert abs(float(lo[0]) - lon) < 1e-9, code
            assert abs(float(la[0]) - lat) < 1e-9, code

    def test_variant_b_true_scale_at_standard_parallel(self):
        """Variant B: scale along the standard parallel is exactly 1 —
        projected arc length along 70N equals the ellipsoidal parallel
        arc (r = a*m(phi))."""
        from simplefeatures_ray.crs import crs_for
        from simplefeatures_ray.ellipsoid import WGS84_A, WGS84_E, _snyder_m

        p = crs_for("EPSG:3413")
        dlon = 0.01
        x, y = p.forward(np.array([10.0, 10.0 + dlon]),
                         np.array([70.0, 70.0]))
        planar = float(np.hypot(x[1] - x[0], y[1] - y[0]))
        truth = WGS84_A * float(_snyder_m(np.radians(70.0), WGS84_E)) \
            * np.radians(dlon)
        assert abs(planar / truth - 1.0) < 1e-6


class TestSwissObliqueMercator:
    """CH1903(+) Swiss Oblique Mercator (EPSG method 9814, Bessel 1841):
    the Gaussian double projection, pinned against swisstopo's published
    'Rigi' worked example and the definitional centre anchor."""

    def _lv95(self):
        from simplefeatures_ray.crs import crs_for
        return crs_for("EPSG:2056")

    def test_rigi_worked_example_lv03(self):
        """swisstopo reference point Rigi:
        47°03'28.95659233"N 8°29'11.11127154"E ->
        LV03 y=679520.05, x=212273.44 (published worked example)."""
        from simplefeatures_ray.crs import crs_for

        p = crs_for("EPSG:21781")
        lat = 47 + 3 / 60 + 28.95659233 / 3600
        lon = 8 + 29 / 60 + 11.11127154 / 3600
        e, n = p.forward(np.array([lon]), np.array([lat]))
        assert abs(float(e[0]) - 679520.05) < 5e-3
        assert abs(float(n[0]) - 212273.44) < 5e-3

    def test_centre_anchor_and_lv95_offset(self):
        """The projection centre (old Bern observatory) maps to the
        false origin EXACTLY (definitional), and LV95 = LV03 +
        (2_000_000, 1_000_000) everywhere."""
        from simplefeatures_ray.crs import crs_for

        lon0 = 7 + 26 / 60 + 22.50 / 3600
        lat0 = 46 + 57 / 60 + 8.66 / 3600
        e, n = self._lv95().forward(np.array([lon0]), np.array([lat0]))
        assert abs(float(e[0]) - 2600000.0) < 1e-6
        assert abs(float(n[0]) - 1200000.0) < 1e-6
        lv03 = crs_for("EPSG:21781")
        lon = np.array([6.6, 8.5, 9.8])
        lat = np.array([46.2, 47.4, 46.5])
        e95, n95 = self._lv95().forward(lon, lat)
        e03, n03 = lv03.forward(lon, lat)
        assert np.allclose(e95 - e03, 2000000.0, atol=1e-9)
        assert np.allclose(n95 - n03, 1000000.0, atol=1e-9)

    def test_roundtrip_and_conformal_scale(self):
        """Round trip < 1e-11 deg over the Swiss domain; the tangent
        conformal sphere makes point scale exactly 1 at the centre
        (checked against the Bessel ellipsoid's local metric)."""
        import math

        p = self._lv95()
        rng = np.random.default_rng(7)
        lon = rng.uniform(5.9, 10.5, 5000)
        lat = rng.uniform(45.8, 47.9, 5000)
        E, N = p.forward(lon, lat)
        lo, la = p.reverse(E, N)
        assert np.abs(lo - lon).max() < 1e-11
        assert np.abs(la - lat).max() < 1e-11
        lon0 = 7 + 26 / 60 + 22.50 / 3600
        lat0 = 46 + 57 / 60 + 8.66 / 3600
        a, f = 6377397.155, 1 / 299.1528128128
        e2 = f * (2 - f)
        phi = math.radians(lat0)
        M = a * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5
        Nr = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
        d = 1e-4
        for dlon, dlat in ((d, 0.0), (0.0, d)):
            e1, n1 = p.forward(np.array([lon0 + dlon]),
                               np.array([lat0 + dlat]))
            ell = math.hypot(math.radians(dlon) * Nr * math.cos(phi),
                             math.radians(dlat) * M)
            pl = math.hypot(float(e1[0]) - 2600000.0,
                            float(n1[0]) - 1200000.0)
            assert abs(pl / ell - 1.0) < 1e-6
