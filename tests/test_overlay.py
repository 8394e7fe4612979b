"""Overlay set-op tests (reference style: geom/alg_overlay_test.go;
expected results checked by area/structure, ExactEquals-style where
geometry is pinned)."""
import numpy as np
import pytest

from simplefeatures_ray.geometry import from_wkt, to_wkt
from simplefeatures_ray.geometry.algorithms import area, length
from simplefeatures_ray.geometry.overlay import (
    difference,
    intersection,
    overlay,
    symmetric_difference,
    union,
    union_many,
)

SQ1 = "POLYGON((0 0,2 0,2 2,0 2,0 0))"
SQ2 = "POLYGON((1 1,3 1,3 3,1 3,1 1))"


AREA_CASES = [
    # (wkt_a, wkt_b, op, expected_area)
    (SQ1, SQ2, "intersection", 1.0),
    (SQ1, SQ2, "union", 7.0),
    (SQ1, SQ2, "difference", 3.0),
    (SQ1, SQ2, "symmetric_difference", 6.0),
    (SQ1, "POLYGON((5 5,6 5,6 6,5 6,5 5))", "union", 5.0),
    (SQ1, "POLYGON((5 5,6 5,6 6,5 6,5 5))", "intersection", 0.0),
    (SQ1, SQ1, "difference", 0.0),
    (SQ1, SQ1, "union", 4.0),
    (SQ1, SQ1, "intersection", 4.0),
    (SQ1, SQ1, "symmetric_difference", 0.0),
    # nested
    ("POLYGON((0 0,10 0,10 10,0 10,0 0))", "POLYGON((4 4,6 4,6 6,4 6,4 4))",
     "difference", 96.0),
    ("POLYGON((0 0,10 0,10 10,0 10,0 0))", "POLYGON((4 4,6 4,6 6,4 6,4 4))",
     "symmetric_difference", 96.0),
    ("POLYGON((0 0,10 0,10 10,0 10,0 0))", "POLYGON((4 4,6 4,6 6,4 6,4 4))",
     "union", 100.0),
    # adjacent (edge touch)
    (SQ1, "POLYGON((2 0,4 0,4 2,2 2,2 0))", "union", 8.0),
    # with holes
    ("POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,8 2,8 8,2 8,2 2))",
     "POLYGON((4 4,6 4,6 6,4 6,4 4))", "union", 68.0),
    ("POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,8 2,8 8,2 8,2 2))",
     "POLYGON((4 4,6 4,6 6,4 6,4 4))", "intersection", 0.0),
    ("POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,8 2,8 8,2 8,2 2))",
     "POLYGON((1 1,9 1,9 9,1 9,1 1))", "intersection", 64.0 - 36.0),  # B minus A's hole
]


@pytest.mark.parametrize("wa,wb,op,expected", AREA_CASES)
def test_overlay_area(wa, wb, op, expected):
    g = overlay(from_wkt(wa), from_wkt(wb), op)
    assert area(g) == pytest.approx(expected, abs=1e-9)


def test_inclusion_exclusion():
    pairs = [(SQ1, SQ2), (SQ1, "POLYGON((0.5 0.5,1.5 0.5,1.5 2.5,0.5 2.5,0.5 0.5))")]
    for wa, wb in pairs:
        a = from_wkt(wa)
        b = from_wkt(wb)
        ia = area(intersection(a, b))
        ua = area(union(a, b))
        assert ua == pytest.approx(area(a) + area(b) - ia, abs=1e-9)
        assert area(symmetric_difference(a, b)) == pytest.approx(ua - ia, abs=1e-9)
        assert area(difference(a, b)) == pytest.approx(area(a) - ia, abs=1e-9)


def test_lower_dim_results():
    sq_adj = from_wkt("POLYGON((2 0,4 0,4 2,2 2,2 0))")
    g = intersection(from_wkt(SQ1), sq_adj)
    assert to_wkt(g) == "LINESTRING(2 0,2 2)"
    sq_corner = from_wkt("POLYGON((2 2,4 2,4 4,2 4,2 2))")
    g = intersection(from_wkt(SQ1), sq_corner)
    assert to_wkt(g) == "POINT(2 2)"


def test_typed_empty_results():
    sq = from_wkt(SQ1)
    assert to_wkt(difference(sq, sq)) == "POLYGON EMPTY"
    far = from_wkt("POLYGON((9 9,10 9,10 10,9 10,9 9))")
    assert to_wkt(intersection(sq, far)) == "POLYGON EMPTY"
    l1 = from_wkt("LINESTRING(0 0,1 0)")
    l2 = from_wkt("LINESTRING(5 5,6 6)")
    assert to_wkt(intersection(l1, l2)) == "LINESTRING EMPTY"


def test_difference_creates_hole():
    big = from_wkt("POLYGON((0 0,10 0,10 10,0 10,0 0))")
    small = from_wkt("POLYGON((4 4,6 4,6 6,4 6,4 4))")
    d = difference(big, small)
    assert d.tag == 3 and len(d.rings) == 2
    assert area(d) == pytest.approx(96.0)


def test_line_polygon_ops():
    line = from_wkt("LINESTRING(-1 1,5 1)")
    sq = from_wkt(SQ1)
    clipped = intersection(line, sq)
    assert to_wkt(clipped) == "LINESTRING(0 1,2 1)"
    outside = difference(line, sq)
    assert length(outside) == pytest.approx(4.0)
    assert outside.tag == 5 and len(outside.geoms) == 2


def test_line_line_ops():
    x1 = from_wkt("LINESTRING(0 0,2 2)")
    x2 = from_wkt("LINESTRING(0 2,2 0)")
    assert to_wkt(intersection(x1, x2)) == "POINT(1 1)"
    c1 = from_wkt("LINESTRING(0 0,2 0)")
    c2 = from_wkt("LINESTRING(1 0,3 0)")
    assert length(intersection(c1, c2)) == pytest.approx(1.0)
    assert length(union(c1, c2)) == pytest.approx(3.0)
    assert length(difference(c1, c2)) == pytest.approx(1.0)


def test_point_ops():
    sq = from_wkt(SQ1)
    assert to_wkt(intersection(from_wkt("POINT(1 1)"), sq)) == "POINT(1 1)"
    assert to_wkt(intersection(from_wkt("POINT(5 5)"), sq)) == "POLYGON EMPTY" or \
        intersection(from_wkt("POINT(5 5)"), sq).is_empty()
    u = union(from_wkt("POINT(5 5)"), sq)
    assert u.tag == 7  # GC(point, polygon)


def test_empty_inputs():
    sq = from_wkt(SQ1)
    empty = from_wkt("POLYGON EMPTY")
    assert to_wkt(union(sq, empty)) == to_wkt(sq)
    assert to_wkt(union(empty, sq)) == to_wkt(sq)
    assert intersection(sq, empty).is_empty()
    assert to_wkt(difference(sq, empty)) == to_wkt(sq)
    assert difference(empty, sq).is_empty()


def test_union_many():
    row = [from_wkt(f"POLYGON(({i} 0,{i+1} 0,{i+1} 1,{i} 1,{i} 0))") for i in range(5)]
    u = union_many(row)
    assert area(u) == pytest.approx(5.0)
    assert u.tag == 3  # dissolves into one polygon
    # disjoint unions stay multi
    spread = [from_wkt(f"POLYGON(({3*i} 0,{3*i+1} 0,{3*i+1} 1,{3*i} 1,{3*i} 0))") for i in range(3)]
    u2 = union_many(spread)
    assert area(u2) == pytest.approx(3.0)
    assert u2.tag == 6


def test_overlay_deterministic():
    a = from_wkt(SQ1)
    b = from_wkt(SQ2)
    assert to_wkt(union(a, b)) == to_wkt(union(a, b))


def test_make_valid():
    from simplefeatures_ray.geometry.overlay import make_valid
    from simplefeatures_ray.geometry.validate import is_valid

    # bowtie resolves to two triangles
    b = from_wkt("POLYGON((0 0,2 2,2 0,0 2,0 0))")
    v = make_valid(b)
    assert is_valid(v)
    assert area(v) == pytest.approx(2.0)
    assert v.tag == 6 and len(v.geoms) == 2
    # valid input returned unchanged (same object)
    sq = from_wkt("POLYGON((0 0,1 0,1 1,0 1,0 0))")
    assert make_valid(sq) is sq
    # hole sticking out of the shell gets re-noded
    g = from_wkt("POLYGON((0 0,4 0,4 4,0 4,0 0),(2 2,6 2,6 3,2 3,2 2))")
    v2 = make_valid(g)
    assert is_valid(v2)
    # shell minus in-shell hole part, plus the outside part is NOT kept
    # (even-odd: the outside hole part has parity 1 -> kept as area)
    assert area(v2) == pytest.approx(16 - 2 + 2)
    # non-areal passthrough
    line = from_wkt("LINESTRING(0 0,1 1)")
    assert make_valid(line) is line


def test_flip_and_force_ctype():
    from simplefeatures_ray.geometry.algorithms import flip_coordinates, force_coordinates_type

    assert to_wkt(flip_coordinates(from_wkt("POLYGON((0 0,4 0,4 4,0 4,0 0))"))) == \
        "POLYGON((0 0,0 4,4 4,4 0,0 0))"
    assert to_wkt(force_coordinates_type(from_wkt("POINT ZM (1 2 3 4)"), 0b01)) == \
        "POINT Z (1 2 3)"
    assert to_wkt(force_coordinates_type(from_wkt("POINT(1 2)"), 0b11)) == \
        "POINT ZM (1 2 0 0)"
    assert to_wkt(force_coordinates_type(from_wkt("POINT Z (1 2 3)"), 0b10)) == \
        "POINT M (1 2 0)"


def test_subepsilon_hairline_inputs_keep_regions():
    """Regression (round-3 fuzz): polygons whose boundary carries
    near-collinear zigzags separated by ~1e-8..1e-7 used to lose their
    ENTIRE region in any overlay (side probes jumped the hairline).
    The robustness net must keep the bulk area correct to the 1e-6
    preconditioning grid."""
    from simplefeatures_ray.geometry.algorithms import area
    from simplefeatures_ray.geometry.overlay import (
        difference,
        intersection,
        make_valid,
        union,
    )
    from simplefeatures_ray.geometry.wkt import from_wkt

    CASES = [
        # (A with a 1e-8 hairline tongue on its top edge)
        "POLYGON((7.475214461078702 6.7946560262653914,"
        "2.4694879675454984 6.794656044823489,2.140812738929122 6.794656024461848,"
        "3.522454058758584 6.794655985337993,1.9088383676375464 1.2962128716835186,"
        "6.956080062009535 4.996540827945281,7.475214461078702 6.7946560262653914))",
        # (spacing ~1.3e-7: above the 9-decimal snap, below the probe eps)
        "POLYGON((5.219780354150992 8.717186766956594,"
        "2.9313283529616276 8.717186794598785,5.453527280522854 8.717186665672045,"
        "2.8973728186926175 8.717186775181691,7.382662823325136 1.464771345238427,"
        "0.69352058111944 9.267614124358127,5.219780354150992 8.717186766956594))",
    ]
    b = from_wkt("POLYGON((9 9,9.5 9,9 9.5,9 9))")  # disjoint from both
    for wkt in CASES:
        a = make_valid(from_wkt(wkt))
        aa = area(a)
        assert aa > 1.0
        tol = 1e-3  # the preconditioning grid's area drift bound here
        assert abs(area(difference(a, b)) - aa) < tol
        assert abs(area(union(a, b)) - (aa + area(b))) < tol
        assert area(intersection(a, b)) < tol


def test_overlay_output_validity_guard():
    """Normal-path outputs that trace touching-ring cycles are repaired
    before returning (round-3 fuzz t=6)."""
    import numpy as np

    from simplefeatures_ray.geometry.overlay import make_valid, union
    from simplefeatures_ray.geometry.validate import validate
    from simplefeatures_ray.geometry.wkt import from_wkt

    rng = np.random.default_rng(99)

    def rand_poly(mode):
        if mode == 0:
            pts = rng.uniform(0, 10, size=(int(rng.integers(3, 10)), 2))
        elif mode == 1:
            n = int(rng.integers(3, 7))
            xs = rng.uniform(0, 10, n)
            ys = rng.uniform(0, 10, 1)[0] + rng.uniform(-1e-7, 1e-7, n)
            pts = np.stack([xs, ys], axis=1)
            pts = np.vstack([pts, rng.uniform(0, 10, size=(2, 2))])
        else:
            c = rng.uniform(0, 10, 2)
            pts = c + rng.uniform(-1e-4, 1e-4, size=(int(rng.integers(3, 8)), 2))
        ring = np.vstack([pts, pts[:1]])
        wkt = "POLYGON((" + ",".join(f"{x!r} {y!r}" for x, y in ring) + "))"
        return make_valid(from_wkt(wkt))

    for t in range(40):
        a = rand_poly(t % 3)
        b = rand_poly((t + 1) % 3)
        ok, reason = validate(union(a, b))
        assert ok, (t, reason)


def test_needle_polygon_buffer_regression():
    """Regression (round-3 buffer fuzz): buffering a needle-thin triangle
    collapsed to EMPTY — offset-curve unions produce staircase-step
    boundaries whose 1e-7 side probes land within epsilon of the
    adjacent rail and classify indeterminate; the multi-scale probe
    escalation must resolve them."""
    from simplefeatures_ray.geometry.algorithms import area
    from simplefeatures_ray.geometry.buffer import buffer
    from simplefeatures_ray.geometry.wkt import from_wkt

    tri = from_wkt("POLYGON((6.570750104 4.681791396,"
                   "6.601441271 4.590813677,7.290523 4.335035,"
                   "6.570750104 4.681791396))")
    a = area(buffer(tri, 0.0986))
    # capsule lower bound: 2*r*length of the long side alone
    assert a > 0.15
    # buffers grow monotonically
    assert area(buffer(tri, 0.3)) > a


class TestNestedMixedPrecision:
    """Round-4 regression: nested ops mixing full- and degraded-
    precision operands previously emitted sub-epsilon-crossing rings
    (the documented residual). Closed by (1) exact-rational side
    classification of probe-indeterminate edges, (2) the escalating
    result-side snap repair in _repair_result, and (3) exact-rational
    confirmation of the validator's 'elements cross' verdict."""

    @staticmethod
    def _box(x0, y0, x1, y1):
        from simplefeatures_ray.geometry.core import Geometry

        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
        return Geometry(3, 0, rings=[ring])

    @staticmethod
    def _sliver(rng):
        from simplefeatures_ray.geometry.core import Geometry

        x0 = rng.uniform(-5, 5)
        y0 = rng.uniform(-5, 5)
        L = rng.uniform(1, 6)
        w = 10 ** rng.uniform(-9, -6.5)
        ang = rng.uniform(0, 2 * np.pi)
        c, s = np.cos(ang), np.sin(ang)
        pts = np.array([[0, 0], [L, 0], [L, w], [0, w], [0, 0]], dtype=float)
        pts[:, :2] = pts @ np.array([[c, s], [-s, c]]) + [x0, y0]
        jit = rng.uniform(-1e-7, 1e-7, pts.shape)
        jit[-1] = jit[0]
        return Geometry(3, 0, rings=[pts + jit])

    @pytest.mark.parametrize("seed", [2024, 7, 99])
    def test_nested_sliver_ops_stay_valid(self, seed):
        from simplefeatures_ray.geometry.validate import validate

        rng = np.random.default_rng(seed)
        ops = ["union", "intersection", "difference",
               "symmetric_difference"]
        for t in range(40):
            xs = np.sort(rng.uniform(-6, 6, 2))
            ys = np.sort(rng.uniform(-6, 6, 2))
            A = self._box(xs[0], ys[0], xs[1] + 0.5, ys[1] + 0.5)
            S = self._sliver(rng)
            op1, op2 = rng.choice(ops, 2)
            D = overlay(A, S, op1)
            xs2 = np.sort(rng.uniform(-6, 6, 2))
            ys2 = np.sort(rng.uniform(-6, 6, 2))
            B = self._box(xs2[0], ys2[0], xs2[1] + 0.5, ys2[1] + 0.5)
            R = overlay(D, B, op2)
            for name, g in (("D", D), ("R", R)):
                if g.tag in (3, 6):
                    ok, reason = validate(g)
                    assert ok, (seed, t, name, op1, op2, reason)
