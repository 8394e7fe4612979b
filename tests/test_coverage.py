"""Coverage ops: union / validity / VW simplify + TopologyPreserveSimplify
(reference geos/entrypoints.go:239,281,294,311 — own edge-graph design)."""
import numpy as np
import pytest

from simplefeatures_ray.geometry import from_wkt, to_wkt
from simplefeatures_ray.geometry.algorithms import area, simplify
from simplefeatures_ray.geometry.core import GEOMETRYCOLLECTION, Geometry, GeometryError
from simplefeatures_ray.geometry.coverage import (
    coverage_is_valid,
    coverage_simplify_vw,
    coverage_union,
    topology_preserve_simplify,
)
from simplefeatures_ray.geometry.validate import validate


def box(x0, y0, x1, y1):
    return from_wkt(f"POLYGON(({x0} {y0},{x1} {y0},{x1} {y1},{x0} {y1},{x0} {y0}))")


def gc(*polys):
    return Geometry(GEOMETRYCOLLECTION, 0, geoms=list(polys))


def test_coverage_union_grid():
    tiles = [box(i, j, i + 1, j + 1) for i in range(2) for j in range(2)]
    u = coverage_union(gc(*tiles))
    assert abs(area(u) - 4.0) < 1e-12
    # single polygon, one ring (no interior edges survive)
    assert u.tag == 3 and len(u.rings) == 1
    # L-shape when one tile is missing
    u3 = coverage_union(gc(*tiles[:3]))
    assert abs(area(u3) - 3.0) < 1e-12


def test_coverage_union_with_hole():
    # ring of 8 tiles around a missing center -> union has a hole
    tiles = [box(i, j, i + 1, j + 1) for i in range(3) for j in range(3)
             if not (i == 1 and j == 1)]
    u = coverage_union(gc(*tiles))
    assert abs(area(u) - 8.0) < 1e-12
    assert len(u.rings) == 2  # shell + hole


def test_coverage_is_valid_good_and_bad():
    ok, edges = coverage_is_valid(gc(box(0, 0, 1, 1), box(1, 0, 2, 1)))
    assert ok and edges.is_empty()
    # overlapping interiors
    ok, edges = coverage_is_valid(gc(box(0, 0, 1, 1), box(0.5, 0, 1.5, 1)))
    assert not ok and not edges.is_empty()
    # T-junction: right tile spans two left tiles -> collinear partial
    # overlap with mismatched vertices
    ok, edges = coverage_is_valid(
        gc(box(0, 0, 1, 1), box(0, 1, 1, 2), box(1, 0, 2, 2)))
    assert not ok
    with pytest.raises(GeometryError):
        coverage_is_valid(gc(from_wkt("LINESTRING(0 0,1 1)")))


def test_coverage_is_valid_gap_width():
    # two tiles separated by a thin 0.01-wide sliver: valid at gap 0,
    # flagged at gap_width=0.1
    a, b = box(0, 0, 1, 1), box(1.01, 0, 2, 1)
    ok0, _ = coverage_is_valid(gc(a, b))
    assert ok0
    # a thin hole INSIDE the coverage: frame of tiles around a sliver
    tiles = [box(0, 0, 3, 1), box(0, 1, 1.49, 2), box(1.51, 1, 3, 2),
             box(0, 2, 3, 3)]
    # note: the two middle tiles do not meet -> 0.02-wide gap column
    ok, edges = coverage_is_valid(gc(*tiles), gap_width=0.1)
    assert not ok and not edges.is_empty()


def test_coverage_simplify_vw_consistent_neighbors():
    # two tiles sharing a wiggly vertical edge; VW should straighten it
    # IDENTICALLY on both sides
    wig = [(1 + (0.02 if k % 2 else -0.02), y / 8.0)
           for k, y in enumerate(range(1, 8))]
    left_pts = [(0, 0), (1, 0)] + wig + [(1, 1), (0, 1), (0, 0)]
    right_pts = [(2, 0), (2, 1), (1, 1)] + wig[::-1] + [(1, 0), (2, 0)]
    left = Geometry(3, 0, rings=[np.array(left_pts, dtype=np.float64)])
    right = Geometry(3, 0, rings=[np.array(right_pts, dtype=np.float64)])
    ok, _ = coverage_is_valid(gc(left, right))
    assert ok
    out = coverage_simplify_vw(gc(left, right), tolerance=0.1)
    assert len(out.geoms) == 2
    # simplified coverage still a valid coverage (shared chain identical)
    ok2, _ = coverage_is_valid(out)
    assert ok2
    # the wiggle (13 extra vertices) is gone from both sides
    assert sum(len(r) for r in out.geoms[0].rings) < len(left_pts)
    # area is conserved up to the removed wiggle area
    assert abs(area(coverage_union(out)) - 2.0) < 0.1
    # preserve_boundary keeps the OUTER frame vertices intact
    out2 = coverage_simplify_vw(gc(left, right), tolerance=0.1,
                                preserve_boundary=True)
    ok3, _ = coverage_is_valid(out2)
    assert ok3


def test_topology_preserve_simplify_backoff():
    # plain RDP at huge tolerance collapses the shell -> empty; the
    # topology-preserving variant must keep a valid polygon
    p = from_wkt("POLYGON((0 0,4 0,4 4,0 4,0 0))")
    assert simplify(p, 100.0).is_empty()
    out = topology_preserve_simplify(p, 100.0)
    assert not out.is_empty() and validate(out)[0]
    # a ring whose naive simplification drops the hole
    holed = from_wkt(
        "POLYGON((0 0,10 0,10 10,0 10,0 0),(4 4,4 6,6 6,6 4,4 4))")
    out2 = topology_preserve_simplify(holed, 50.0)
    assert len(out2.rings) == 2 and validate(out2)[0]
    # linestrings stay simple
    ls = from_wkt("LINESTRING(0 0,1 0.01,2 0,3 0.01,4 0)")
    out3 = topology_preserve_simplify(ls, 0.5)
    assert len(out3.coords) >= 2


def test_coverage_fuzz_tensor_grids():
    """Randomized (seeded) tensor-product grids (random x-cuts x y-cuts
    over the whole square) are valid coverages with vertex-matched
    edges: union must recover the square exactly, VW-simplify must
    preserve coverage validity. Guillotine-style partitions, whose cuts
    do NOT propagate vertices to neighbours, are T-junction-invalid —
    the validator must flag them."""
    import numpy as np

    from simplefeatures_ray.geometry.algorithms import area

    for seed in range(8):
        rng = np.random.default_rng(seed)
        xs = np.unique(np.round(np.concatenate(
            [[0.0, 8.0], rng.uniform(0.5, 7.5, rng.integers(1, 5))]), 2))
        ys = np.unique(np.round(np.concatenate(
            [[0.0, 8.0], rng.uniform(0.5, 7.5, rng.integers(1, 5))]), 2))
        tiles = [box(xs[i], ys[j], xs[i + 1], ys[j + 1])
                 for i in range(len(xs) - 1) for j in range(len(ys) - 1)]
        cov = gc(*tiles)
        ok, edges = coverage_is_valid(cov)
        assert ok, (seed, to_wkt(edges)[:120])
        u = coverage_union(cov)
        assert abs(area(u) - 64.0) < 1e-9, (seed, area(u), len(tiles))
        s = coverage_simplify_vw(cov, tolerance=0.01)
        ok2, _ = coverage_is_valid(s)
        assert ok2, seed
        assert abs(area(coverage_union(s)) - 64.0) < 1.0

    # guillotine counter-example: the right tile spans both left tiles'
    # shared x=4 edge without their y=4 vertex -> T-junction, invalid
    tj = gc(box(0, 0, 4, 4), box(0, 4, 4, 8), box(4, 0, 8, 8))
    ok, edges = coverage_is_valid(tj)
    assert not ok and not edges.is_empty()
