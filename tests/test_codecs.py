"""WKT/WKB codec tests, modeled on the reference's table-driven WKT style
(reference geom/wkt_parser_test.go, wkb_parser_test.go)."""
import numpy as np
import pytest

from simplefeatures_ray.geometry import Geometry, GeometryError, from_wkb, from_wkt, to_wkb, to_wkt

ROUND_TRIP = [
    "POINT(1 2)",
    "POINT(-1.5 2.25)",
    "POINT EMPTY",
    "POINT Z (1 2 3)",
    "POINT M (1 2 3)",
    "POINT ZM (1 2 3 4)",
    "POINT Z EMPTY",
    "LINESTRING(0 0,1 1,2 0)",
    "LINESTRING EMPTY",
    "LINESTRING Z (0 0 1,1 1 2)",
    "POLYGON((0 0,4 0,4 4,0 4,0 0))",
    "POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))",
    "POLYGON EMPTY",
    "MULTIPOINT((1 2),(3 4))",
    "MULTIPOINT((1 2),EMPTY)",
    "MULTIPOINT EMPTY",
    "MULTILINESTRING((0 0,1 1),(2 2,3 3))",
    "MULTILINESTRING EMPTY",
    "MULTIPOLYGON(((0 0,1 0,1 1,0 0)))",
    "MULTIPOLYGON(((0 0,1 0,1 1,0 0)),EMPTY)",
    "MULTIPOLYGON EMPTY",
    "GEOMETRYCOLLECTION(POINT(1 2),LINESTRING(0 0,1 1))",
    "GEOMETRYCOLLECTION(GEOMETRYCOLLECTION(POINT(1 2)))",
    "GEOMETRYCOLLECTION EMPTY",
]


@pytest.mark.parametrize("wkt", ROUND_TRIP)
def test_wkt_round_trip(wkt):
    assert to_wkt(from_wkt(wkt)) == wkt


@pytest.mark.parametrize("wkt", ROUND_TRIP)
def test_wkb_round_trip(wkt):
    g = from_wkt(wkt)
    g2 = from_wkb(to_wkb(g))
    assert to_wkt(g2) == wkt


def test_wkt_flexible_input():
    # no-paren multipoint form, whitespace, lowercase, scientific notation
    assert to_wkt(from_wkt("multipoint(1 2, 3 4)")) == "MULTIPOINT((1 2),(3 4))"
    assert to_wkt(from_wkt("  POINT ( 1   2 ) ")) == "POINT(1 2)"
    assert to_wkt(from_wkt("POINT(1e2 -2.5e-1)")) == "POINT(100 -0.25)"


def test_wkt_errors():
    for bad in ["", "POINT", "POINT()", "POINT(1)", "POINT(1 2", "BOGUS(1 2)",
                "POINT(1 2) trailing", "LINESTRING(1 2,)"]:
        with pytest.raises(GeometryError):
            from_wkt(bad)


def test_wkb_big_endian():
    # big-endian POINT(1 2): 00 00000001 3ff0.. 4000..
    import struct

    buf = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 1.0, 2.0)
    assert to_wkt(from_wkb(buf)) == "POINT(1 2)"


def test_wkb_empty_point_nan():
    g = from_wkb(to_wkb(from_wkt("POINT EMPTY")))
    assert g.coords is None and g.is_empty()


def test_structural_equality():
    assert from_wkt("POINT(1 2)") == from_wkt("POINT(1 2)")
    assert from_wkt("POINT(1 2)") != from_wkt("POINT(2 1)")
    assert from_wkt("LINESTRING(0 0,1 1)") != from_wkt("LINESTRING(1 1,0 0)")


def test_float_formatting():
    assert to_wkt(Geometry.point(0.1, 1e15)) == "POINT(0.1 1000000000000000)"
    assert to_wkt(Geometry.point(-0.0, 2.0)) == "POINT(-0 2)"
