"""Conformance against the reference's own overlay test corpus
(fixtures in data_overlay_cases.py, transcribed from
/root/reference/geom/alg_overlay_test.go).

DE-9IM strings are compared exactly. Overlay results are compared by a
robust geometric fingerprint — area, length, envelope, and counts per
dimension — rather than exact WKT, because valid overlay outputs have
structural freedom (ring rotation/orientation, extra collinear noding
vertices, multi-part composition of touching pieces).
"""
import numpy as np
import pytest

from simplefeatures_ray.geometry import from_wkt
from simplefeatures_ray.geometry.algorithms import area, envelope, length
from simplefeatures_ray.geometry.overlay import overlay
from simplefeatures_ray.geometry.relate import relate

from data_overlay_cases import CASES


def _fingerprint(g):
    e = envelope(g)
    n_pts = sum(1 for leaf in g.flatten() if leaf.tag == 1 and not leaf.is_empty())
    n_lines = sum(1 for leaf in g.flatten() if leaf.tag == 2 and not leaf.is_empty())
    return {
        "area": round(area(g), 6),
        "length": round(length(g), 6),
        "env": None if e is None else tuple(round(v, 6) for v in e),
        "n_point_parts": n_pts,
        "has_lines": n_lines > 0,
    }


def _ids():
    return [f"{c[0][:20]}|{c[1][:20]}" for c in CASES]


@pytest.mark.parametrize("case", CASES, ids=_ids())
def test_reference_relate_matrix(case):
    a = from_wkt(case[0])
    b = from_wkt(case[1])
    assert relate(a, b) == case[7]


OPS = [("union", 2), ("intersection", 3), ("difference", 4),
       ("symmetric_difference", 6)]


@pytest.mark.parametrize("case", CASES, ids=_ids())
@pytest.mark.parametrize("op,idx", OPS)
def test_reference_overlay_fingerprint(case, op, idx):
    a = from_wkt(case[0])
    b = from_wkt(case[1])
    want = from_wkt(case[idx])
    got = overlay(a, b, op)
    fw = _fingerprint(want)
    fg = _fingerprint(got)
    assert fg["area"] == pytest.approx(fw["area"], abs=1e-5), (fg, fw)
    assert fg["length"] == pytest.approx(fw["length"], abs=1e-5), (fg, fw)
    if fw["env"] is not None:
        assert fg["env"] is not None
        assert np.allclose(fg["env"], fw["env"], atol=1e-6), (fg, fw)
    else:
        assert fg["env"] is None or fg["area"] == 0
