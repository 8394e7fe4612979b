"""Projection round-trip + known-value tests (reference carto/*_test.go
style: Forward/Reverse inverses, spot values)."""
import numpy as np
import pytest

from simplefeatures_ray.carto import (
    ALL_PROJECTIONS,
    R_EARTH,
    UTM,
    Equirectangular,
    WebMercator,
)


@pytest.mark.parametrize("name", sorted(ALL_PROJECTIONS))
def test_round_trip(name):
    proj = ALL_PROJECTIONS[name]()
    rng = np.random.default_rng(3)
    lon = rng.uniform(-30, 50, 50)  # stay near projection centers
    lat = rng.uniform(10, 70, 50)
    x, y = proj.forward(lon, lat)
    lon2, lat2 = proj.reverse(x, y)
    assert np.allclose(lon, lon2, atol=1e-8), name
    assert np.allclose(lat, lat2, atol=1e-8), name


def test_web_mercator_known_values():
    p = WebMercator(zoom=0)
    x, y = p.forward(np.array([0.0]), np.array([0.0]))
    assert x[0] == pytest.approx(0.5)
    assert y[0] == pytest.approx(0.5)
    x, y = p.forward(np.array([-180.0]), np.array([0.0]))
    assert x[0] == pytest.approx(0.0)
    # zoom scales linearly
    p2 = WebMercator(zoom=3)
    x2, _ = p2.forward(np.array([0.0]), np.array([0.0]))
    assert x2[0] == pytest.approx(4.0)


def test_equirectangular_known_values():
    p = Equirectangular(radius=1.0, std_parallel=0.0)
    x, y = p.forward(np.array([90.0]), np.array([45.0]))
    assert x[0] == pytest.approx(np.pi / 2)
    assert y[0] == pytest.approx(np.pi / 4)


def test_utm_zone_selection():
    assert UTM.zone_for(3.0, 50.0) == 31
    assert UTM.zone_for(-180.0, 0.0) == 1
    assert UTM.zone_for(179.9, 0.0) == 60
    assert UTM.central_meridian(31) == 3.0


def test_utm_central_meridian_maps_to_false_easting():
    p = UTM(31)
    x, y = p.forward(np.array([3.0]), np.array([0.0]))
    assert x[0] == pytest.approx(500000.0)
    assert y[0] == pytest.approx(0.0)


def test_area_preservation_albers():
    """Equal-area property: projected area of a small cell ~ sphere area."""
    from simplefeatures_ray.carto import AlbersEqualAreaConic

    p = AlbersEqualAreaConic(0.0, 40.0, 29.5, 45.5, radius=1.0)
    # small quad near (10E, 40N)
    lons = np.array([10.0, 10.1, 10.1, 10.0])
    lats = np.array([40.0, 40.0, 40.1, 40.1])
    x, y = p.forward(lons, lats)
    # shoelace
    area = 0.5 * abs(
        np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)
    )
    d = np.radians(0.1)
    sphere_area = d * d * np.cos(np.radians(40.05))
    assert area == pytest.approx(sphere_area, rel=1e-3)


def test_map_render_golden():
    """cartodemo-style golden render: project the polygon corpus through
    WebMercator and rasterize — pinned array hash (reference pins PNGs,
    internal/cartodemo/cartodemo_test.go)."""
    import hashlib

    import numpy as np

    from simplefeatures_ray.carto import WebMercator
    from simplefeatures_ray.pipelines.corpus import polygon_corpus
    from simplefeatures_ray.raster import rasterize

    proj = WebMercator(zoom=0)
    img = np.zeros((128, 128), dtype=np.uint8)
    for _cid, g in polygon_corpus():
        pg = g.map_coords(lambda a: np.stack(proj.forward(a[:, 0], a[:, 1]), axis=1))
        img = np.maximum(img, rasterize(pg, 128, 128, (0.2, 0.2, 0.8, 0.8)))
    digest = hashlib.sha256(img.tobytes()).hexdigest()
    assert (img > 0).sum() > 50  # something rendered
    # determinism pin
    img2 = np.zeros((128, 128), dtype=np.uint8)
    for _cid, g in polygon_corpus():
        pg = g.map_coords(lambda a: np.stack(proj.forward(a[:, 0], a[:, 1]), axis=1))
        img2 = np.maximum(img2, rasterize(pg, 128, 128, (0.2, 0.2, 0.8, 0.8)))
    assert hashlib.sha256(img2.tobytes()).hexdigest() == digest


def test_crs_registry_and_chains():
    """EPSG registry round-trips and hub composition (crs.py)."""
    import numpy as np

    from simplefeatures_ray.crs import crs_for, transformer, utm_code_for

    lon = np.array([2.35, -74.0, 139.7, 31.2])
    lat = np.array([48.85, 40.7, 35.7, 30.0])
    for code in ("EPSG:4326", "EPSG:3857", "EPSG:4087", "EPSG:32631", "EPSG:32733"):
        p = crs_for(code)
        x, y = p.forward(lon, lat)
        lon2, lat2 = p.reverse(x, y)
        assert np.allclose(lon2, lon, atol=1e-9)
        assert np.allclose(lat2, lat, atol=1e-9)
    # chained 4326 -> 3857 -> 4087 == direct 4326 -> 4087
    t1 = transformer("EPSG:4326", "EPSG:3857")
    t2 = transformer("EPSG:3857", "EPSG:4087")
    td = transformer("EPSG:4326", "EPSG:4087")
    mx, my = t1(lon, lat)
    ex, ey = t2(mx, my)
    dx, dy = td(lon, lat)
    assert np.allclose(ex, dx, atol=1e-6)
    assert np.allclose(ey, dy, atol=1e-6)
    # EPSG:3857 true-meter sanity: x at lon=180 is pi*R
    x180, _ = crs_for("EPSG:3857").forward(np.array([180.0]), np.array([0.0]))
    assert abs(x180[0] - 3.14159265 * 6371000.0) < 100
    assert utm_code_for(2.35, 48.85) == "EPSG:32631"
    assert utm_code_for(2.35, -48.85) == "EPSG:32731"
    import pytest

    with pytest.raises(KeyError):
        crs_for("EPSG:9999")


def test_transform_crs_stage(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from simplefeatures_ray.crs import TransformCRS, transformer

    lon = np.linspace(-170, 170, 50)
    lat = np.linspace(-60, 60, 50)
    ds = rd.from_arrow(pa.table({"x": pa.array(lon), "y": pa.array(lat)}))
    out = ds.map_batches(TransformCRS("EPSG:4326", "EPSG:3857"),
                         batch_format="pyarrow").to_pandas()
    ex, ey = transformer("EPSG:4326", "EPSG:3857")(lon, lat)
    assert np.allclose(np.sort(out["x"].to_numpy()), np.sort(ex))
    assert np.allclose(np.sort(out["y"].to_numpy()), np.sort(ey))


def test_nad83_utm_and_australian_albers():
    """EPSG:269zz (NAD83 UTM, GRS80) + EPSG:3577 (GDA94 Australian
    Albers): natural-origin identities, inverse roundtrip, and the
    GRS80-vs-WGS84 relationship (same a, flattening differs only in
    the 9th decimal -> coordinates agree to sub-mm but the objects are
    genuinely distinct registrations)."""
    import numpy as np

    from simplefeatures_ray.crs import crs_for, transformer

    utm = crs_for("EPSG:26915")
    x, y = utm.forward(np.array([-93.0]), np.array([0.0]))
    assert abs(x[0] - 500000.0) < 1e-6 and abs(y[0]) < 1e-6
    lon, lat = utm.reverse(*utm.forward(np.array([-95.3]), np.array([38.6])))
    assert abs(lon[0] + 95.3) < 1e-9 and abs(lat[0] - 38.6) < 1e-9
    w84 = crs_for("EPSG:32615")
    xw, yw = w84.forward(np.array([-95.3]), np.array([38.6]))
    xn, yn = utm.forward(np.array([-95.3]), np.array([38.6]))
    assert abs(xw[0] - xn[0]) < 5e-3 and abs(yw[0] - yn[0]) < 5e-3

    alb = crs_for("EPSG:3577")
    x, y = alb.forward(np.array([132.0]), np.array([0.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    lon, lat = alb.reverse(*alb.forward(np.array([147.25]), np.array([-32.5])))
    assert abs(lon[0] - 147.25) < 1e-9 and abs(lat[0] + 32.5) < 1e-9
    # southern-hemisphere point projects south of the origin plane
    _, ys = alb.forward(np.array([147.0]), np.array([-25.0]))
    assert ys[0] < -2_000_000

    import pytest

    with pytest.raises(KeyError):
        crs_for("EPSG:26930")  # zone out of the NAD83 range
    fn = transformer("EPSG:26915", "EPSG:4326")
    lon, lat = fn(np.array([500000.0]), np.array([0.0]))
    assert abs(lon[0] + 93.0) < 1e-9 and abs(lat[0]) < 1e-9
