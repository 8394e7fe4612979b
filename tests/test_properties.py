"""Property-based differential tests (hypothesis) — the engine's analog
of the reference's cmprefimpl differential fuzzing (SURVEY §5.3): with
no external geometry oracle in this environment, we cross-check the
engine's OWN independent implementations against each other (overlay vs
inclusion-exclusion, relate vs intersects, PIP vs prepared, codecs
round-trip) over randomized inputs.
"""
import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from simplefeatures_ray.geometry import from_wkb, from_wkt, to_wkb, to_wkt
from simplefeatures_ray.geometry.algorithms import area, centroid, envelope
from simplefeatures_ray.geometry.core import Geometry
from simplefeatures_ray.geometry.overlay import difference, intersection, union
from simplefeatures_ray.geometry.predicates import intersects
from simplefeatures_ray.geometry.relate import disjoint, relate


# coordinate strategy: grid-ish values keep intersections well-conditioned
coord = st.integers(min_value=-20, max_value=20).map(float)


@st.composite
def boxes(draw):
    x0 = draw(coord)
    y0 = draw(coord)
    w = draw(st.integers(min_value=1, max_value=15))
    h = draw(st.integers(min_value=1, max_value=15))
    ring = np.array(
        [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]],
        dtype=np.float64,
    )
    return Geometry(3, 0, rings=[ring])


@st.composite
def convex_polys(draw):
    cx = draw(coord)
    cy = draw(coord)
    r = draw(st.integers(min_value=1, max_value=8))
    n = draw(st.integers(min_value=3, max_value=8))
    phase = draw(st.integers(min_value=0, max_value=359)) * math.pi / 180.0
    ang = phase + np.arange(n) * (2 * math.pi / n)
    ring = np.round(np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1), 3)
    ring = np.concatenate([ring, ring[:1]], axis=0)
    return Geometry(3, 0, rings=[ring])


ANY_POLY = st.one_of(boxes(), convex_polys())


@settings(max_examples=60, deadline=None)
@given(a=ANY_POLY, b=ANY_POLY)
def test_inclusion_exclusion_random(a, b):
    ia = area(intersection(a, b))
    ua = area(union(a, b))
    da = area(difference(a, b))
    assert ua == pytest.approx(area(a) + area(b) - ia, abs=1e-6)
    assert da == pytest.approx(area(a) - ia, abs=1e-6)


@settings(max_examples=60, deadline=None)
@given(a=ANY_POLY, b=ANY_POLY)
def test_relate_vs_intersects_random(a, b):
    assert (not disjoint(a, b)) == intersects(a, b)


@settings(max_examples=60, deadline=None)
@given(a=ANY_POLY, b=ANY_POLY)
def test_relate_transpose_random(a, b):
    m = relate(a, b)
    mt = relate(b, a)
    assert mt == "".join(m[i] for i in (0, 3, 6, 1, 4, 7, 2, 5, 8))


@settings(max_examples=80, deadline=None)
@given(g=ANY_POLY)
def test_codec_round_trips_random(g):
    assert from_wkb(to_wkb(g)) == g
    assert to_wkt(from_wkt(to_wkt(g))) == to_wkt(g)
    from simplefeatures_ray.geometry.geojson import from_geojson, to_geojson

    assert to_wkt(from_geojson(to_geojson(g))) == to_wkt(g)


@settings(max_examples=60, deadline=None)
@given(g=ANY_POLY)
def test_pip_vs_prepared_random(g):
    from simplefeatures_ray.geometry.predicates import locate_point
    from simplefeatures_ray.geometry.prepared import prepare

    prep = prepare(g)
    rng = np.random.default_rng(0)
    px = rng.uniform(-25, 25, 40)
    py = rng.uniform(-25, 25, 40)
    loc = prep.locate_points(px, py)
    for i in range(0, 40, 7):
        assert loc[i] == locate_point(px[i], py[i], g)


@settings(max_examples=60, deadline=None)
@given(g=ANY_POLY)
def test_centroid_inside_hull_random(g):
    """A convex polygon's centroid lies strictly inside it."""
    from simplefeatures_ray.geometry.predicates import point_in_polygon

    c = centroid(g)
    assert point_in_polygon(c[0], c[1], g.rings) >= 0


@settings(max_examples=40, deadline=None)
@given(a=ANY_POLY, b=ANY_POLY)
def test_union_bounds_random(a, b):
    """Union envelope is the envelope union; intersection area bounded."""
    ea = envelope(a)
    eb = envelope(b)
    u = union(a, b)
    eu = envelope(u)
    assert eu[0] == pytest.approx(min(ea[0], eb[0]), abs=1e-9)
    assert eu[2] == pytest.approx(max(ea[2], eb[2]), abs=1e-9)
    assert area(intersection(a, b)) <= min(area(a), area(b)) + 1e-6
