"""PreparedGeometry tests (reference alg_prepared.go: same answers as
the unprepared predicates, index built once)."""
import numpy as np
import pytest

from simplefeatures_ray.geometry import from_wkt
from simplefeatures_ray.geometry.predicates import locate_point
from simplefeatures_ray.geometry.prepared import prepare


def test_point_probes_match_locate():
    g = from_wkt("POLYGON((0 0,10 0,10 10,0 10,0 0),(3 3,7 3,7 7,3 7,3 3))")
    prep = prepare(g)
    rng = np.random.default_rng(2)
    px = rng.uniform(-2, 12, 300)
    py = rng.uniform(-2, 12, 300)
    loc = prep.locate_points(px, py)
    for i in range(0, 300, 17):
        assert loc[i] == locate_point(px[i], py[i], g)
    assert prep.contains_points(np.array([1.0]), np.array([1.0]))[0]
    assert not prep.contains_points(np.array([5.0]), np.array([5.0]))[0]  # hole
    assert prep.covers_points(np.array([0.0]), np.array([5.0]))[0]  # boundary
    assert not prep.contains_points(np.array([0.0]), np.array([5.0]))[0]


def test_pairwise_predicates():
    prep = prepare(from_wkt("POLYGON((0 0,4 0,4 4,0 4,0 0))"))
    assert prep.intersects(from_wkt("POLYGON((2 2,6 2,6 6,2 6,2 2))"))
    assert prep.contains(from_wkt("POINT(1 1)"))
    assert not prep.contains(from_wkt("POINT(0 1)"))
    assert prep.covers(from_wkt("POINT(0 1)"))
    assert prep.within(from_wkt("POLYGON((-1 -1,5 -1,5 5,-1 5,-1 -1))"))
    assert prep.disjoint(from_wkt("POINT(9 9)"))
    assert prep.relate(from_wkt("POLYGON((0 0,4 0,4 4,0 4,0 0))")) == "2FFF1FFF2"


def test_prepared_linework():
    prep = prepare(from_wkt("MULTILINESTRING((0 0,10 0),(10 0,20 0))"))
    loc = prep.locate_points(np.array([5.0, 10.0, 0.0, 5.0]),
                             np.array([0.0, 0.0, 0.0, 1.0]))
    # interior, shared endpoint (mod-2: interior), boundary, exterior
    assert list(loc) == [1, 1, 0, -1]
