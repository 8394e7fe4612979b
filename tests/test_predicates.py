"""Binary predicate tests (reference style: geom/alg_intersects_test.go,
alg_distance_test.go)."""
import numpy as np
import pytest

from simplefeatures_ray.geometry import from_wkt
from simplefeatures_ray.geometry.predicates import (
    BOUNDARY,
    EXTERIOR,
    INTERIOR,
    distance,
    intersects,
    locate_point,
    point_in_polygon,
    points_in_polygon,
    segment_intersection,
)

INTERSECTS_CASES = [
    # point/point
    ("POINT(1 2)", "POINT(1 2)", True),
    ("POINT(1 2)", "POINT(1 3)", False),
    ("MULTIPOINT((1 2),(3 4))", "POINT(3 4)", True),
    # point/line
    ("POINT(5 0)", "LINESTRING(0 0,10 0)", True),
    ("POINT(5 1)", "LINESTRING(0 0,10 0)", False),
    ("POINT(0 0)", "LINESTRING(0 0,10 0)", True),  # endpoint counts
    # point/polygon
    ("POINT(2 2)", "POLYGON((0 0,4 0,4 4,0 4,0 0))", True),
    ("POINT(5 5)", "POLYGON((0 0,4 0,4 4,0 4,0 0))", False),
    ("POINT(0 2)", "POLYGON((0 0,4 0,4 4,0 4,0 0))", True),  # boundary
    ("POINT(1.5 1.5)", "POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))", False),  # hole
    # line/line
    ("LINESTRING(0 0,2 2)", "LINESTRING(0 2,2 0)", True),
    ("LINESTRING(0 0,1 1)", "LINESTRING(2 2,3 3)", False),
    ("LINESTRING(0 0,2 0)", "LINESTRING(1 0,3 0)", True),  # collinear overlap
    ("LINESTRING(0 0,1 0)", "LINESTRING(1 0,2 0)", True),  # endpoint touch
    # line/polygon
    ("LINESTRING(-1 2,5 2)", "POLYGON((0 0,4 0,4 4,0 4,0 0))", True),  # crosses
    ("LINESTRING(1 1,3 3)", "POLYGON((0 0,4 0,4 4,0 4,0 0))", True),  # inside
    ("LINESTRING(5 5,6 6)", "POLYGON((0 0,4 0,4 4,0 4,0 0))", False),
    # polygon/polygon
    ("POLYGON((0 0,2 0,2 2,0 2,0 0))", "POLYGON((1 1,3 1,3 3,1 3,1 1))", True),
    ("POLYGON((0 0,2 0,2 2,0 2,0 0))", "POLYGON((5 5,6 5,6 6,5 6,5 5))", False),
    ("POLYGON((0 0,2 0,2 2,0 2,0 0))", "POLYGON((2 0,4 0,4 2,2 2,2 0))", True),  # shared edge
    # containment without boundary contact
    ("POLYGON((0 0,10 0,10 10,0 10,0 0))", "POLYGON((1 1,2 1,2 2,1 2,1 1))", True),
    # polygon inside the hole of another: disjoint
    (
        "POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,8 2,8 8,2 8,2 2))",
        "POLYGON((4 4,6 4,6 6,4 6,4 4))",
        False,
    ),
    # empties never intersect
    ("POINT EMPTY", "POINT EMPTY", False),
    ("POLYGON EMPTY", "POLYGON((0 0,1 0,1 1,0 1,0 0))", False),
    # collections
    ("GEOMETRYCOLLECTION(POINT(5 5))", "POLYGON((4 4,6 4,6 6,4 6,4 4))", True),
]


@pytest.mark.parametrize("wa,wb,expected", INTERSECTS_CASES)
def test_intersects(wa, wb, expected):
    a = from_wkt(wa)
    b = from_wkt(wb)
    assert intersects(a, b) is expected
    assert intersects(b, a) is expected  # symmetric


DISTANCE_CASES = [
    ("POINT(0 0)", "POINT(3 4)", 5.0),
    ("POINT(0 5)", "LINESTRING(0 0,10 0)", 5.0),
    ("POINT(-3 -4)", "LINESTRING(0 0,10 0)", 5.0),  # clamps to endpoint
    ("LINESTRING(0 0,1 0)", "LINESTRING(0 2,1 2)", 2.0),
    ("POLYGON((0 0,2 0,2 2,0 2,0 0))", "POLYGON((5 0,7 0,7 2,5 2,5 0))", 3.0),
    ("POLYGON((0 0,2 0,2 2,0 2,0 0))", "POLYGON((1 1,3 1,3 3,1 3,1 1))", 0.0),
    ("POINT(1 1)", "POLYGON((0 0,4 0,4 4,0 4,0 0))", 0.0),  # inside
]


@pytest.mark.parametrize("wa,wb,expected", DISTANCE_CASES)
def test_distance(wa, wb, expected):
    assert distance(from_wkt(wa), from_wkt(wb)) == pytest.approx(expected)
    assert distance(from_wkt(wb), from_wkt(wa)) == pytest.approx(expected)


def test_distance_empty():
    assert distance(from_wkt("POINT EMPTY"), from_wkt("POINT(1 1)")) is None


def test_points_in_polygon_vectorized():
    rings = from_wkt("POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))").rings
    px = np.array([2.0, 1.5, 0.0, 5.0, 1.0, 3.9])
    py = np.array([3.0, 1.5, 2.0, 5.0, 1.5, 0.1])
    out = points_in_polygon(px, py, rings)
    assert list(out) == [INTERIOR, EXTERIOR, BOUNDARY, EXTERIOR, BOUNDARY, INTERIOR]


def test_locate_point_linework():
    line = from_wkt("LINESTRING(0 0,10 0)")
    assert locate_point(0, 0, line) == BOUNDARY  # endpoint = boundary
    assert locate_point(5, 0, line) == INTERIOR
    assert locate_point(5, 1, line) == EXTERIOR
    ring = from_wkt("LINESTRING(0 0,1 0,1 1,0 0)")
    assert locate_point(0, 0, ring) == INTERIOR  # closed: no boundary
    # mod-2 rule: shared endpoint of two parts is interior
    ml = from_wkt("MULTILINESTRING((0 0,1 0),(1 0,2 0))")
    assert locate_point(1, 0, ml) == INTERIOR
    assert locate_point(0, 0, ml) == BOUNDARY


def test_segment_intersection():
    k, p = segment_intersection((0, 0), (2, 2), (0, 2), (2, 0))
    assert k == "point" and p == (1.0, 1.0)
    k, p = segment_intersection((0, 0), (2, 0), (1, 0), (3, 0))
    assert k == "overlap" and p == ((1.0, 0.0), (2.0, 0.0))
    k, _ = segment_intersection((0, 0), (1, 0), (0, 1), (1, 1))
    assert k == "none"
    k, p = segment_intersection((0, 0), (1, 0), (1, 0), (1, 5))
    assert k == "point" and p == (1.0, 0.0)


def test_point_in_polygon_degenerate_ray():
    # ray passes exactly through vertices — classic crossing-number trap
    rings = from_wkt("POLYGON((0 0,2 1,4 0,4 4,0 4,0 0))").rings
    assert point_in_polygon(2, 1, rings) == BOUNDARY
    assert point_in_polygon(3, 1, rings) == INTERIOR
    assert point_in_polygon(5, 1, rings) == EXTERIOR
    assert point_in_polygon(2, 0.5, rings) == EXTERIOR
