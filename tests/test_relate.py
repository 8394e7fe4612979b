"""DE-9IM relate truth table + named predicates (reference:
geom/alg_relate_test.go, internal/jtsport/xmltest TestRelate*.xml)."""
import pytest

from simplefeatures_ray.geometry import from_wkt
from simplefeatures_ray.geometry.predicates import intersects
from simplefeatures_ray.geometry.relate import (
    contains,
    covered_by,
    covers,
    crosses,
    disjoint,
    equals,
    overlaps,
    relate,
    relate_matches,
    touches,
    within,
)

MATRIX_CASES = [
    # area / area
    ("POLYGON((0 0,2 0,2 2,0 2,0 0))", "POLYGON((1 1,3 1,3 3,1 3,1 1))", "212101212"),
    ("POLYGON((0 0,2 0,2 2,0 2,0 0))", "POLYGON((0 0,2 0,2 2,0 2,0 0))", "2FFF1FFF2"),
    ("POLYGON((0 0,5 0,5 5,0 5,0 0))", "POLYGON((1 1,2 1,2 2,1 2,1 1))", "212FF1FF2"),
    ("POLYGON((1 1,2 1,2 2,1 2,1 1))", "POLYGON((0 0,5 0,5 5,0 5,0 0))", "2FF1FF212"),
    ("POLYGON((0 0,1 0,1 1,0 1,0 0))", "POLYGON((5 5,6 5,6 6,5 6,5 5))", "FF2FF1212"),
    ("POLYGON((0 0,2 0,2 2,0 2,0 0))", "POLYGON((2 0,4 0,4 2,2 2,2 0))", "FF2F11212"),
    ("POLYGON((0 0,2 0,2 2,0 2,0 0))", "POLYGON((2 2,4 2,4 4,2 4,2 2))", "FF2F01212"),
    # hole cases
    (
        "POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,8 2,8 8,2 8,2 2))",
        "POLYGON((4 4,6 4,6 6,4 6,4 4))",
        "FF2FF1212",
    ),
    (
        "POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,8 2,8 8,2 8,2 2))",
        "POLYGON((2 2,8 2,8 8,2 8,2 2))",
        "FF2F112F2",  # B exactly fills the hole: boundaries coincide on the ring
    ),
    # point / area
    ("POINT(1 1)", "POLYGON((0 0,2 0,2 2,0 2,0 0))", "0FFFFF212"),
    ("POINT(0 1)", "POLYGON((0 0,2 0,2 2,0 2,0 0))", "F0FFFF212"),
    ("POINT(9 9)", "POLYGON((0 0,2 0,2 2,0 2,0 0))", "FF0FFF212"),
    ("MULTIPOINT((1 1),(9 9))", "POLYGON((0 0,2 0,2 2,0 2,0 0))", "0F0FFF212"),
    # line / area
    ("LINESTRING(-1 1,3 1)", "POLYGON((0 0,2 0,2 2,0 2,0 0))", "101FF0212"),
    ("LINESTRING(1 1,3 3)", "POLYGON((0 0,4 0,4 4,0 4,0 0))", "1FF0FF212"),
    ("LINESTRING(0 0,2 0)", "POLYGON((0 0,2 0,2 2,0 2,0 0))", "F1FF0F212"),
    ("LINESTRING(1 1,5 1)", "POLYGON((0 0,2 0,2 2,0 2,0 0))", "1010F0212"),
    # line / line
    ("LINESTRING(0 0,2 2)", "LINESTRING(0 2,2 0)", "0F1FF0102"),
    ("LINESTRING(0 0,2 0)", "LINESTRING(1 0,3 0)", "1010F0102"),
    ("LINESTRING(0 0,1 0)", "LINESTRING(1 0,2 0)", "FF1F00102"),
    ("LINESTRING(0 0,1 1)", "LINESTRING(0 0,1 1)", "1FFF0FFF2"),
    # point / point
    ("POINT(1 1)", "POINT(1 1)", "0FFFFFFF2"),
    ("POINT(1 1)", "POINT(2 2)", "FF0FFF0F2"),
    ("MULTIPOINT((0 0),(1 1))", "MULTIPOINT((1 1),(2 2))", "0F0FFF0F2"),
    # point / line
    ("POINT(1 0)", "LINESTRING(0 0,2 0)", "0FFFFF102"),
    ("POINT(0 0)", "LINESTRING(0 0,2 0)", "F0FFFF102"),
    # empties (reference alg_relate.go:33-63)
    ("POINT EMPTY", "POINT(1 1)", "FFFFFF0F2"),
    ("POINT EMPTY", "POINT EMPTY", "FFFFFFFF2"),
    ("POLYGON EMPTY", "POLYGON((0 0,1 0,1 1,0 1,0 0))", "FFFFFF212"),
    ("LINESTRING(0 0,1 1)", "POLYGON EMPTY", "FF1FF0FF2"),
]


@pytest.mark.parametrize("wa,wb,expected", MATRIX_CASES)
def test_relate_matrix(wa, wb, expected):
    assert relate(from_wkt(wa), from_wkt(wb)) == expected


def _transpose(m: str) -> str:
    return "".join(m[i] for i in (0, 3, 6, 1, 4, 7, 2, 5, 8))


@pytest.mark.parametrize("wa,wb,expected", MATRIX_CASES)
def test_relate_symmetry(wa, wb, expected):
    a = from_wkt(wa)
    b = from_wkt(wb)
    assert relate(b, a) == _transpose(relate(a, b))


CORPUS = [
    "POINT(1 1)",
    "POINT(5 5)",
    "MULTIPOINT((0 0),(2 2))",
    "LINESTRING(0 0,4 4)",
    "LINESTRING(0 4,4 0)",
    "LINESTRING(10 10,12 12)",
    "POLYGON((0 0,4 0,4 4,0 4,0 0))",
    "POLYGON((2 2,6 2,6 6,2 6,2 2))",
    "POLYGON((8 8,9 8,9 9,8 9,8 8))",
    "POLYGON((0 0,10 0,10 10,0 10,0 0),(3 3,7 3,7 7,3 7,3 3))",
]


def test_relate_consistent_with_intersects():
    for wa in CORPUS:
        for wb in CORPUS:
            a = from_wkt(wa)
            b = from_wkt(wb)
            assert (not disjoint(a, b)) == intersects(a, b), (wa, wb)


def test_named_predicate_relationships():
    for wa in CORPUS:
        for wb in CORPUS:
            a = from_wkt(wa)
            b = from_wkt(wb)
            assert contains(a, b) == within(b, a), (wa, wb)
            assert covers(a, b) == covered_by(b, a), (wa, wb)
            if contains(a, b):
                assert covers(a, b), (wa, wb)
            if equals(a, b):
                assert covers(a, b) and covered_by(a, b)
            # touches and overlaps are mutually exclusive
            assert not (touches(a, b) and overlaps(a, b)), (wa, wb)


def test_self_relate():
    for w in CORPUS:
        g = from_wkt(w)
        assert equals(g, g)
        assert contains(g, g)
        assert within(g, g)
        assert not crosses(g, g)


def test_specific_predicates():
    sq1 = from_wkt("POLYGON((0 0,2 0,2 2,0 2,0 0))")
    sq2 = from_wkt("POLYGON((2 0,4 0,4 2,2 2,2 0))")
    sq3 = from_wkt("POLYGON((1 1,3 1,3 3,1 3,1 1))")
    assert touches(sq1, sq2) and not overlaps(sq1, sq2)
    assert overlaps(sq1, sq3) and not touches(sq1, sq3)
    line = from_wkt("LINESTRING(-1 1,5 1)")
    assert crosses(line, sq1)
    assert crosses(sq1, line)
    # boundary-point containment: covers but not contains
    pt_on_edge = from_wkt("POINT(0 1)")
    assert covers(sq1, pt_on_edge)
    assert not contains(sq1, pt_on_edge)
    assert relate_matches(relate(sq1, sq3), "T*T***T**")
