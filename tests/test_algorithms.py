"""Unary algorithm tests (reference style: geom/attr_test.go — WKT in,
scalar/WKT out)."""
import math

import numpy as np
import pytest

from simplefeatures_ray.geometry import from_wkt, to_wkt
from simplefeatures_ray.geometry.algorithms import (
    area,
    centroid,
    convex_hull,
    densify,
    dump,
    envelope,
    force_orientation,
    interpolate_evenly_spaced_points,
    interpolate_point,
    length,
    ring_signed_area,
    rotated_minimum_area_bounding_rectangle,
    simplify,
    snap_to_grid,
)


AREA_CASES = [
    ("POLYGON((0 0,4 0,4 4,0 4,0 0))", 16.0),
    ("POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))", 15.0),
    ("MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)),((2 0,3 0,3 1,2 1,2 0)))", 2.0),
    ("POINT(1 2)", 0.0),
    ("LINESTRING(0 0,5 0)", 0.0),
    ("POLYGON EMPTY", 0.0),
    ("GEOMETRYCOLLECTION(POLYGON((0 0,1 0,1 1,0 1,0 0)),POINT(9 9))", 1.0),
]


@pytest.mark.parametrize("wkt,expected", AREA_CASES)
def test_area(wkt, expected):
    assert area(from_wkt(wkt)) == pytest.approx(expected)


LENGTH_CASES = [
    ("LINESTRING(0 0,3 4)", 5.0),
    ("LINESTRING(0 0,1 0,1 1)", 2.0),
    ("MULTILINESTRING((0 0,1 0),(0 0,0 2))", 3.0),
    ("POLYGON((0 0,4 0,4 4,0 4,0 0))", 16.0),
    ("POINT(1 1)", 0.0),
]


@pytest.mark.parametrize("wkt,expected", LENGTH_CASES)
def test_length(wkt, expected):
    assert length(from_wkt(wkt)) == pytest.approx(expected)


CENTROID_CASES = [
    ("POINT(3 7)", (3, 7)),
    ("MULTIPOINT((0 0),(2 0))", (1, 0)),
    ("LINESTRING(0 0,10 0)", (5, 0)),
    ("LINESTRING(0 0,1 0,1 1)", (0.75, 0.25)),
    ("POLYGON((0 0,2 0,2 2,0 2,0 0))", (1, 1)),
    # square with centered hole: centroid unchanged
    ("POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,3 1,3 3,1 3,1 1))", (2, 2)),
    # off-center hole shifts centroid away from the hole
    # mixed-dimension collection: highest dimension (area) wins
    ("GEOMETRYCOLLECTION(POLYGON((0 0,2 0,2 2,0 2,0 0)),POINT(50 50))", (1, 1)),
]


@pytest.mark.parametrize("wkt,expected", CENTROID_CASES)
def test_centroid(wkt, expected):
    c = centroid(from_wkt(wkt))
    assert c == pytest.approx(expected)


def test_centroid_empty():
    assert centroid(from_wkt("POLYGON EMPTY")) is None
    assert centroid(from_wkt("GEOMETRYCOLLECTION EMPTY")) is None


def test_centroid_offcenter_hole():
    g = from_wkt("POLYGON((0 0,4 0,4 4,0 4,0 0),(2 1,4 1,4 3,2 3,2 1))")
    cx, cy = centroid(g)
    assert cx < 2.0 and cy == pytest.approx(2.0)


def test_envelope():
    assert envelope(from_wkt("LINESTRING(1 5,-2 3,4 0)")) == (-2, 0, 4, 5)
    assert envelope(from_wkt("POINT(3 3)")) == (3, 3, 3, 3)
    assert envelope(from_wkt("POLYGON EMPTY")) is None


def test_ring_orientation():
    ccw = from_wkt("POLYGON((0 0,2 0,2 2,0 2,0 0))")
    assert ring_signed_area(ccw.rings[0]) > 0
    cw = force_orientation(ccw, cw_shell=True)
    assert ring_signed_area(cw.rings[0]) < 0
    back = force_orientation(cw, cw_shell=False)
    assert ring_signed_area(back.rings[0]) > 0
    # holes get opposite orientation of shell
    g = from_wkt("POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))")
    g_ccw = force_orientation(g, cw_shell=False)
    assert ring_signed_area(g_ccw.rings[0]) > 0
    assert ring_signed_area(g_ccw.rings[1]) < 0


HULL_CASES = [
    ("MULTIPOINT((0 0),(1 0),(1 1),(0 1),(0.5 0.5))", "POLYGON((0 0,1 0,1 1,0 1,0 0))"),
    ("MULTIPOINT((0 0),(1 1),(2 2))", "LINESTRING(0 0,2 2)"),
    ("MULTIPOINT((5 5),(5 5))", "POINT(5 5)"),
    ("LINESTRING(0 0,1 0,1 1)", "POLYGON((0 0,1 0,1 1,0 0))"),
]


@pytest.mark.parametrize("wkt,expected", HULL_CASES)
def test_convex_hull(wkt, expected):
    assert to_wkt(convex_hull(from_wkt(wkt))) == expected


def test_simplify():
    assert (
        to_wkt(simplify(from_wkt("LINESTRING(0 0,1 0.01,2 0)"), 0.1)) == "LINESTRING(0 0,2 0)"
    )
    assert (
        to_wkt(simplify(from_wkt("LINESTRING(0 0,1 1,2 0)"), 0.1))
        == "LINESTRING(0 0,1 1,2 0)"
    )
    # polygon collapsing below a ring vanishes
    g = simplify(from_wkt("POLYGON((0 0,1 0.001,2 0,1 -0.001,0 0))"), 0.1)
    assert g.is_empty()


def test_densify():
    g = densify(from_wkt("LINESTRING(0 0,10 0)"), 2.5)
    assert to_wkt(g) == "LINESTRING(0 0,2.5 0,5 0,7.5 0,10 0)"
    assert length(g) == pytest.approx(10)


def test_snap_to_grid():
    g = snap_to_grid(from_wkt("LINESTRING(0.1234 0.5678,1.1111 2.2222)"), 2)
    assert to_wkt(g) == "LINESTRING(0.12 0.57,1.11 2.22)"


def test_interpolate():
    line = from_wkt("LINESTRING(0 0,10 0)")
    assert to_wkt(interpolate_point(line, 0.5)) == "POINT(5 0)"
    assert to_wkt(interpolate_point(line, -1)) == "POINT(0 0)"
    assert to_wkt(interpolate_point(line, 2)) == "POINT(10 0)"
    mp = interpolate_evenly_spaced_points(line, 3)
    assert to_wkt(mp) == "MULTIPOINT((0 0),(5 0),(10 0))"
    bent = from_wkt("LINESTRING(0 0,1 0,1 1)")
    assert to_wkt(interpolate_point(bent, 0.75)) == "POINT(1 0.5)"


def test_dump():
    parts = dump(from_wkt("GEOMETRYCOLLECTION(MULTIPOINT((1 2),(3 4)),LINESTRING(0 0,1 1))"))
    assert [to_wkt(p) for p in parts] == ["POINT(1 2)", "POINT(3 4)", "LINESTRING(0 0,1 1)"]


def test_reverse_and_force2d():
    g = from_wkt("LINESTRING Z (0 0 1,1 1 2)")
    assert to_wkt(g.reverse()) == "LINESTRING Z (1 1 2,0 0 1)"
    assert to_wkt(g.force_2d()) == "LINESTRING(0 0,1 1)"


def test_min_area_rect():
    # a tilted 2x1 rectangle's own min bounding rect is itself (area 2)
    g = from_wkt("POLYGON((0 0,2 2,1 3,-1 1,0 0))")
    r = rotated_minimum_area_bounding_rectangle(g)
    assert area(r) == pytest.approx(4.0)  # side lengths 2*sqrt2 and sqrt2


def test_min_width_rect():
    from simplefeatures_ray.geometry.algorithms import (
        rotated_minimum_width_bounding_rectangle,
    )

    # long thin diagonal strip: min-width rect hugs the strip direction
    g = from_wkt("POLYGON((0 0,10 10,10.5 10,0.5 0,0 0))")
    r = rotated_minimum_width_bounding_rectangle(g)
    ring = r.rings[0]
    sides = np.hypot(np.diff(ring[:, 0]), np.diff(ring[:, 1]))
    assert min(sides[:2].min(), sides[1:3].min()) < 0.6  # narrow side ~0.35


def test_summary():
    from simplefeatures_ray.geometry.algorithms import summary

    assert summary(from_wkt("POINT(1 2)")) == "Point[XY] with 1 point"
    assert summary(from_wkt("POINT EMPTY")) == "Point[XY] EMPTY"
    assert summary(from_wkt("POINT Z (1 2 3)")) == "Point[Z] with 1 point"
    assert (summary(from_wkt("POLYGON((0 0,4 0,4 4,0 4,0 0))"))
            == "Polygon[XY] with 1 ring(s) consisting of 5 total coordinate(s)")
    assert "2 linestring(s)" in summary(from_wkt("MULTILINESTRING((0 0,1 1),(2 2,3 3))"))
    assert "child geometries" in summary(from_wkt("GEOMETRYCOLLECTION(POINT(1 2))"))


def test_concave_hull():
    from simplefeatures_ray.geometry.algorithms import concave_hull
    from simplefeatures_ray.geometry.core import Geometry, MULTIPOINT
    from simplefeatures_ray.geometry.predicates import points_in_polygon
    from simplefeatures_ray.geometry.validate import is_valid

    # L-shaped grid: concave hull recovers the true outline (area 64),
    # far below the convex hull's 82
    pts = np.array([(i, j) for i in range(11) for j in range(11)
                    if i <= 4 or j <= 4], float)
    mp = Geometry(MULTIPOINT, 0, geoms=[Geometry.point(x, y) for x, y in pts])
    ch = concave_hull(mp, k=3)
    assert is_valid(ch)
    assert area(ch) == pytest.approx(64.0)
    assert (points_in_polygon(pts[:, 0], pts[:, 1], ch.rings) >= 0).all()
    # degenerate inputs fall back to convex-hull behavior
    assert to_wkt(concave_hull(from_wkt("MULTIPOINT((0 0),(1 1))"))) == "LINESTRING(0 0,1 1)"
    assert to_wkt(concave_hull(from_wkt("POINT(5 5)"))) == "POINT(5 5)"
    # deterministic
    assert to_wkt(concave_hull(mp, k=3)) == to_wkt(concave_hull(mp, k=3))
