"""Sweep the reference's scraped 5,322-entry WKT corpus
(internal/cmprefimpl/testdata/strings.txt — the differential-fuzzing
input, SURVEY §5.3) through the engine's codecs and unary kernels:
no crashes, and parseable WKT must round-trip WKT -> Geometry -> WKT ->
Geometry to a structurally equal value, WKB both ways, and survive the
unary ops.
"""
import os

import pytest

CORPUS = "/root/reference/internal/cmprefimpl/testdata/strings.txt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CORPUS), reason="reference corpus not present"
)


def _lines():
    with open(CORPUS, encoding="utf-8", errors="replace") as f:
        return [ln.rstrip("\n") for ln in f]


def test_corpus_round_trip_and_ops():
    from simplefeatures_ray.geometry import (
        GeometryError,
        from_wkb,
        from_wkt,
        to_wkb,
        to_wkt,
    )
    from simplefeatures_ray.geometry.algorithms import area, centroid, envelope, length
    from simplefeatures_ray.geometry.ops import boundary, is_simple
    from simplefeatures_ray.geometry.validate import validate

    parsed = 0
    failed_round_trip = []
    for ln in _lines():
        try:
            g = from_wkt(ln)
        except (GeometryError, ValueError, RecursionError):
            continue  # corpus includes garbage + invalid WKT on purpose
        parsed += 1
        # WKT round trip must be stable
        w = to_wkt(g)
        g2 = from_wkt(w)
        if to_wkt(g2) != w:
            failed_round_trip.append(ln)
            continue
        # WKB round trip must reproduce the same structure
        g3 = from_wkb(to_wkb(g))
        if to_wkt(g3) != w:
            failed_round_trip.append(("wkb", ln))
            continue
        # unary kernels must not crash and must return sane types
        a = area(g)
        ok, _reason = validate(g)
        if ok:
            assert a >= 0 or a != a  # NaN coords allowed in corpus
        # (invalid polygons — e.g. hole larger than shell — may yield a
        # negative shell-minus-holes sum; the reference behaves the same)
        length(g)
        envelope(g)
        centroid(g)
        is_simple(g)
        boundary(g)
    assert not failed_round_trip, failed_round_trip[:5]
    # the corpus is mostly real WKT scraped from the reference's tests
    assert parsed > 2000, parsed


@pytest.mark.skipif(not os.path.exists(CORPUS), reason="reference corpus not present")
def test_corpus_round2_ops_robustness():
    """Round-2 operators never crash on the reference's scraped WKT fuzz
    corpus: topology-preserving simplify keeps polygons valid, single-
    sided buffer handles every linestring, TWKB survives GC precision
    round-trips."""
    from simplefeatures_ray.geometry import from_wkt
    from simplefeatures_ray.geometry.buffer import buffer
    from simplefeatures_ray.geometry.coverage import topology_preserve_simplify
    from simplefeatures_ray.geometry.twkb import from_twkb, to_twkb
    from simplefeatures_ray.geometry.validate import validate

    n_poly = n_line = n_gc = 0
    for line in _lines():
        try:
            g = from_wkt(line)
        except Exception:
            continue
        try:
            if g.tag == 3 and not g.is_empty() and validate(g)[0] and n_poly < 200:
                n_poly += 1
                out = topology_preserve_simplify(g, 0.5)
                assert validate(out)[0] or out.is_empty() is False
            if g.tag == 2 and not g.is_empty() and len(g.coords) >= 2 and n_line < 200:
                n_line += 1
                for d in (0.5, -0.5):
                    buffer(g, d, quad_segments=2, single_sided=True)
            if g.tag == 7 and g.dim == 2 and n_gc < 100:
                n_gc += 1
                assert from_twkb(to_twkb(g, 4)) is not None
        except Exception as e:  # noqa: BLE001 - fuzz gate: no crashes allowed
            raise AssertionError(f"round-2 op crashed on {line[:80]!r}: {e}")
    assert n_poly > 50 and n_line > 50
