"""Validation / IsSimple / Boundary / ExactEquals tests (reference:
geom/validation_test.go, type_line_string IsSimple tests,
alg_exact_equals_test.go)."""
import pytest

from simplefeatures_ray.geometry import from_wkt, to_wkt
from simplefeatures_ray.geometry.ops import boundary, exact_equals, is_simple
from simplefeatures_ray.geometry.validate import is_valid, validate

VALID = [
    "POINT(1 2)",
    "POINT EMPTY",
    "LINESTRING(0 0,1 1)",
    "LINESTRING EMPTY",
    "POLYGON((0 0,4 0,4 4,0 4,0 0))",
    "POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))",
    "POLYGON EMPTY",
    # hole touching shell at exactly one point is valid (type_polygon.go:47)
    "POLYGON((0 0,4 0,4 4,0 4,0 0),(0 0,1 1,2 1,0 0))",
    "MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)),((2 0,3 0,3 1,2 1,2 0)))",
    # multipolygon elements touching at a point is valid
    "MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)),((1 1,2 1,2 2,1 2,1 1)))",
    "MULTIPOINT((1 1),(2 2),EMPTY)",
    "GEOMETRYCOLLECTION(POINT(1 1),LINESTRING(0 0,1 1))",
]

INVALID = [
    ("POINT(1 NaN)", "non-finite"),
    ("LINESTRING(1 1,1 1)", "distinct"),
    ("POLYGON((0 0,2 0,2 2,0 2))", "closed"),      # not closed
    ("POLYGON((0 0,1 0,0 0))", "4 points"),        # too few
    ("POLYGON((0 0,2 2,2 0,0 2,0 0))", "self-intersection"),  # bowtie
    # hole outside shell
    ("POLYGON((0 0,1 0,1 1,0 1,0 0),(5 5,6 5,6 6,5 6,5 5))", "outside"),
    # nested holes
    ("POLYGON((0 0,10 0,10 10,0 10,0 0),(1 1,8 1,8 8,1 8,1 1),(2 2,3 2,3 3,2 3,2 2))",
     "nested"),
    # hole touching shell at two points -> interior disconnected
    ("POLYGON((0 0,4 0,4 4,0 4,0 0),(0 2,2 1,4 2,2 3,0 2))", "disconnected"),
    # overlapping multipolygon elements
    ("MULTIPOLYGON(((0 0,2 0,2 2,0 2,0 0)),((1 1,3 1,3 3,1 3,1 1)))", ""),
    # element nested inside another
    ("MULTIPOLYGON(((0 0,4 0,4 4,0 4,0 0)),((1 1,2 1,2 2,1 2,1 1)))", ""),
]


@pytest.mark.parametrize("wkt", VALID)
def test_valid(wkt):
    ok, reason = validate(from_wkt(wkt))
    assert ok, reason


@pytest.mark.parametrize("wkt,hint", INVALID)
def test_invalid(wkt, hint):
    import math

    import numpy as np

    # "POINT(1 NaN)" is not parseable WKT; build it directly
    if "NaN" in wkt:
        from simplefeatures_ray.geometry import Geometry

        g = Geometry.point(1.0, math.nan)
    else:
        g = from_wkt(wkt)
    ok, reason = validate(g)
    assert not ok
    if hint:
        assert hint in (reason or ""), reason


SIMPLE = [
    ("POINT(1 1)", True),
    ("MULTIPOINT((1 1),(2 2))", True),
    ("MULTIPOINT((1 1),(1 1))", False),
    ("LINESTRING(0 0,1 1,2 0)", True),
    ("LINESTRING(0 0,2 2,2 0,0 2)", False),     # self-crossing
    ("LINESTRING(0 0,1 0,1 1,0 0)", True),      # closed ring is simple
    ("MULTILINESTRING((0 0,1 0),(1 0,2 0))", True),   # touch at endpoints
    ("MULTILINESTRING((0 0,2 0),(1 -1,1 1))", False),  # interior crossing
    ("POLYGON((0 0,1 0,1 1,0 1,0 0))", True),
]


@pytest.mark.parametrize("wkt,expected", SIMPLE)
def test_is_simple(wkt, expected):
    assert is_simple(from_wkt(wkt)) is expected


BOUNDARY = [
    ("POINT(1 1)", "GEOMETRYCOLLECTION EMPTY"),
    ("LINESTRING(0 0,1 1)", "MULTIPOINT((0 0),(1 1))"),
    ("LINESTRING(0 0,1 0,1 1,0 0)", "MULTIPOINT EMPTY"),  # closed: no boundary
    ("MULTILINESTRING((0 0,1 0),(1 0,2 0))", "MULTIPOINT((0 0),(2 0))"),  # mod-2
    ("POLYGON((0 0,1 0,1 1,0 1,0 0))", "LINESTRING(0 0,1 0,1 1,0 1,0 0)"),
    (
        "POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))",
        "MULTILINESTRING((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))",
    ),
]


@pytest.mark.parametrize("wkt,expected", BOUNDARY)
def test_boundary(wkt, expected):
    assert to_wkt(boundary(from_wkt(wkt))) == expected


def test_exact_equals():
    a = from_wkt("LINESTRING(0 0,1 1)")
    assert exact_equals(a, from_wkt("LINESTRING(0 0,1 1)"))
    assert not exact_equals(a, from_wkt("LINESTRING(1 1,0 0)"))
    # tolerance
    assert exact_equals(a, from_wkt("LINESTRING(0 0.0000001,1 1)"), tolerance=1e-6)
    assert not exact_equals(a, from_wkt("LINESTRING(0 0.1,1 1)"), tolerance=1e-6)
    # ignore order: multipoint permutation
    mp1 = from_wkt("MULTIPOINT((1 1),(2 2))")
    mp2 = from_wkt("MULTIPOINT((2 2),(1 1))")
    assert not exact_equals(mp1, mp2)
    assert exact_equals(mp1, mp2, ignore_order=True)
    # ring rotation
    p1 = from_wkt("POLYGON((0 0,1 0,1 1,0 1,0 0))")
    p2 = from_wkt("POLYGON((1 0,1 1,0 1,0 0,1 0))")
    assert not exact_equals(p1, p2)
    assert exact_equals(p1, p2, ignore_order=True)
    # type/ctype mismatch
    assert not exact_equals(from_wkt("POINT(1 2)"), from_wkt("POINT Z (1 2 3)"))
