"""Cell index (Web-Mercator quadtree Morton codes) tests."""
import numpy as np
import pytest

from simplefeatures_ray.cells import (
    cell_bounds_xy,
    cell_center_lonlat,
    cell_children,
    cell_parent,
    cell_res,
    cell_token,
    lonlat_to_cell,
    mercator_xy,
    token_to_cell,
)


def test_mercator_center():
    x, y = mercator_xy(np.array([0.0]), np.array([0.0]))
    assert x[0] == pytest.approx(0.5)
    assert y[0] == pytest.approx(0.5)


def test_res_and_parent():
    lon = np.array([-122.4, 2.35, 151.2])
    lat = np.array([37.77, 48.85, -33.86])
    for res in [0, 1, 5, 12, 20, 30]:
        c = lonlat_to_cell(lon, lat, res)
        assert list(cell_res(c)) == [res] * 3
    c12 = lonlat_to_cell(lon, lat, 12)
    c11 = lonlat_to_cell(lon, lat, 11)
    assert np.array_equal(cell_parent(c12), c11)
    assert np.array_equal(cell_parent(c12, 12), lonlat_to_cell(lon, lat, 0))


def test_children_cover_parent():
    c = lonlat_to_cell(np.array([10.0]), np.array([20.0]), 8)[0]
    kids = cell_children(c)
    assert len(set(kids)) == 4
    assert all(cell_parent(np.array([k], dtype=np.uint64))[0] == c for k in kids)


def test_bounds_contain_point():
    lon = np.array([-122.4194, 2.3522, 151.2093])
    lat = np.array([37.7749, 48.8566, -33.8688])
    c = lonlat_to_cell(lon, lat, 15)
    x, y = mercator_xy(lon, lat)
    x0, y0, x1, y1 = cell_bounds_xy(c)
    assert np.all((x >= x0) & (x < x1))
    assert np.all((y >= y0) & (y < y1))


def test_center_round_trip():
    lon = np.linspace(-179, 179, 37)
    lat = np.linspace(-80, 80, 37)
    c = lonlat_to_cell(lon, lat, 14)
    clon, clat = cell_center_lonlat(c)
    c2 = lonlat_to_cell(clon, clat, 14)
    assert np.array_equal(c, c2)


def test_tokens():
    c = lonlat_to_cell(np.array([5.0]), np.array([5.0]), 10)[0]
    assert token_to_cell(cell_token(c)) == int(c)


def test_determinism_and_locality():
    # nearby points at high res share a low-res ancestor
    lon = np.array([2.3522, 2.3525])
    lat = np.array([48.8566, 48.8568])
    c = lonlat_to_cell(lon, lat, 10)
    assert c[0] == c[1]
    far = lonlat_to_cell(np.array([100.0]), np.array([-40.0]), 10)
    assert far[0] != c[0]
