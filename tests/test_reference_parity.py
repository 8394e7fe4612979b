"""Behavioral parity with the reference's own relate test corpus.

Inputs and expected predicate outcomes transcribed from
/root/reference/geom/alg_relate_test.go (TestRelate) — the reference's
published truth table for the named predicates, including the Z/M-
ignoring XY semantics and empty-geometry rules. Implementation is ours;
only the WHAT (inputs -> expected booleans) comes from the reference.
"""
import pytest

from simplefeatures_ray.geometry import from_wkt
from simplefeatures_ray.geometry.relate import (
    contains,
    covered_by,
    covers,
    disjoint,
    equals,
    touches,
    within,
)

# (wkt1, wkt2, equals, disjoint, touches, contains, covers, within, covered_by)
REFERENCE_CASES = [
    ("POINT EMPTY", "POINT EMPTY", True, True, False, False, False, False, False),
    ("POINT EMPTY", "POINT(1 2)", False, True, False, False, False, False, False),
    ("POINT(1 2)", "POINT(1 2)", True, False, False, True, True, True, True),
    ("POINT(1 2)", "POINT(1 3)", False, True, False, False, False, False, False),
    ("POINT Z (1 2 3)", "POINT(1 2)", True, False, False, True, True, True, True),
    ("POINT M (1 2 3)", "POINT(1 2)", True, False, False, True, True, True, True),
    ("POINT Z (1 2 3)", "POINT M (1 2 3)", True, False, False, True, True, True, True),
    ("LINESTRING EMPTY", "LINESTRING EMPTY", True, True, False, False, False, False, False),
    ("LINESTRING(0 0,2 2)", "LINESTRING(0 0,1 1,2 2)", True, False, False, True, True, True, True),
    ("LINESTRING(0 0,3 3)", "LINESTRING(0 0,1 1,2 2)", False, False, False, True, True, False, False),
    ("LINESTRING(1 0,1 1)", "LINESTRING(2 1,2 2)", False, True, False, False, False, False, False),
    ("LINESTRING(0 0,1 1)", "LINESTRING(2 2,1 1)", False, False, True, False, False, False, False),
    ("POLYGON EMPTY", "POLYGON EMPTY", True, True, False, False, False, False, False),
    ("POLYGON EMPTY", "POLYGON((0 0,0 1,1 0,0 0))", False, True, False, False, False, False, False),
    ("POLYGON((1 0,0 1,0 0,1 0))", "POLYGON((0 0,0 1,1 0,0 0))", True, False, False, True, True, True, True),
    ("POLYGON((0 0,0 1,1 1,1 0,0 0))", "POLYGON((2 2,2 3,3 3,3 2,2 2))", False, True, False, False, False, False, False),
    ("POLYGON((0 0,0 2,2 2,2 0,0 0))", "POLYGON((1 1,1 3,3 3,3 1,1 1))", False, False, False, False, False, False, False),
    ("POLYGON((0 0,0 1,1 1,1 0,0 0))", "POLYGON((0 1,0 2,1 2,1 1,0 1))", False, False, True, False, False, False, False),
    ("POLYGON((0 0,0 3,3 3,3 0,0 0))", "POLYGON((1 1,1 2,2 2,2 1,1 1))", False, False, False, True, True, False, False),
    ("POLYGON((1 1,1 2,2 2,2 1,1 1))", "POLYGON((0 0,0 3,3 3,3 0,0 0))", False, False, False, False, False, True, True),
    ("MULTILINESTRING((0 0,1 1))", "LINESTRING(0 0,1 1)", True, False, False, True, True, True, True),
    ("MULTILINESTRING((0 0,1 1),(1 1,2 2))", "LINESTRING(0 0,1 1,2 2)", True, False, False, True, True, True, True),
]


@pytest.mark.parametrize("case", REFERENCE_CASES,
                         ids=[f"{c[0][:24]}|{c[1][:24]}" for c in REFERENCE_CASES])
def test_reference_relate_truth_table(case):
    wkt1, wkt2, eq, dj, tc, ct, cv, wi, cb = case
    a = from_wkt(wkt1)
    b = from_wkt(wkt2)
    assert equals(a, b) is eq, "equals"
    assert disjoint(a, b) is dj, "disjoint"
    assert touches(a, b) is tc, "touches"
    assert contains(a, b) is ct, "contains"
    assert covers(a, b) is cv, "covers"
    assert within(a, b) is wi, "within"
    assert covered_by(a, b) is cb, "coveredBy"
