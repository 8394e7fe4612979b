"""JTS XML conformance runner for the DE-9IM relate truth tables
(reference: internal/jtsport/xmltest/testdata/validate/TestRelate*.xml,
runner_test.go:17-60 — the north star names these suites explicitly).

The suites are JTS's published test format; we parse the XML directly
from the read-only reference checkout (skipped if absent) and assert
every relate matrix + named predicate.
"""
import glob
import os
import xml.etree.ElementTree as ET

import pytest

SUITE_DIR = "/root/reference/internal/jtsport/xmltest/testdata/validate"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SUITE_DIR), reason="reference XML suites not present"
)

_PRED_MAP = {
    "contains": "contains",
    "coveredBy": "covered_by",
    "covers": "covers",
    "crosses": "crosses",
    "disjoint": "disjoint",
    "equalsTopo": "equals",
    "intersects": None,  # handled via not disjoint
    "overlaps": "overlaps",
    "touches": "touches",
    "within": "within",
}


GENERAL_DIR = "/root/reference/internal/jtsport/xmltest/testdata/general"


def _load_cases():
    cases = []
    paths = sorted(glob.glob(os.path.join(SUITE_DIR, "TestRelate*.xml")))
    paths += sorted(glob.glob(os.path.join(GENERAL_DIR, "TestRelate*.xml")))
    for path in paths:
        suite = os.path.basename(path)
        if "big" in suite:
            continue  # the -big suite duplicates AA at larger coordinates
        root = ET.parse(path).getroot()
        for ci, case in enumerate(root.iter("case")):
            a_wkt = case.findtext("a").strip()
            b_wkt = case.findtext("b").strip()
            checks = []
            for test in case.iter("test"):
                op = test.find("op")
                name = op.get("name")
                expected = op.text.strip().lower() == "true"
                if name == "relate":
                    checks.append(("relate", op.get("arg3"), expected))
                elif name in _PRED_MAP:
                    checks.append((name, None, expected))
            desc = (case.findtext("desc") or "").strip()[:48]
            cases.append(pytest.param(a_wkt, b_wkt, checks,
                                      id=f"{suite[10:-4]}-{ci}:{desc[:28]}"))
    return cases


CASES = _load_cases() if os.path.isdir(SUITE_DIR) else []


@pytest.mark.parametrize("a_wkt,b_wkt,checks", CASES)
def test_jts_relate_suite(a_wkt, b_wkt, checks):
    import importlib

    # the package re-exports the relate FUNCTION under the same name, so a
    # plain `import ...geometry.relate as relmod` binds the function
    relmod = importlib.import_module("simplefeatures_ray.geometry.relate")
    from simplefeatures_ray.geometry import from_wkt
    from simplefeatures_ray.geometry.relate import relate

    a = from_wkt(a_wkt)
    b = from_wkt(b_wkt)
    for name, arg, expected in checks:
        if name == "relate":
            got = relate(a, b)
            assert (got == arg) is expected, f"relate: got {got}, want {arg}"
        elif name == "intersects":
            from simplefeatures_ray.geometry.relate import disjoint

            assert (not disjoint(a, b)) is expected, "intersects"
        else:
            fn = getattr(relmod, _PRED_MAP[name])
            assert fn(a, b) is expected, name
