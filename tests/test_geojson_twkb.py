"""GeoJSON + TWKB codec tests (reference geojson_*_test.go, twkb_test.go)."""
import json

import numpy as np
import pytest

from simplefeatures_ray.geometry import from_wkt, to_wkt
from simplefeatures_ray.geometry.geojson import (
    feature_to_dict,
    from_geojson,
    parse_feature,
    parse_feature_collection,
    to_geojson,
    to_geojson_dict,
)
from simplefeatures_ray.geometry.twkb import (
    from_twkb,
    to_twkb,
    twkb_envelope,
    twkb_id_list,
    twkb_size,
)

GJ_ROUND_TRIP = [
    "POINT(1 2)",
    "POINT Z (1 2 3)",
    "LINESTRING(0 0,1 1,2 0)",
    "POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))",
    "MULTIPOINT((1 2),(3 4))",
    "MULTILINESTRING((0 0,1 1),(2 2,3 3))",
    "MULTIPOLYGON(((0 0,1 0,1 1,0 0)))",
    "GEOMETRYCOLLECTION(POINT(1 2),LINESTRING(0 0,1 1))",
    "POINT EMPTY",
    "POLYGON EMPTY",
    "GEOMETRYCOLLECTION EMPTY",
]


@pytest.mark.parametrize("wkt", GJ_ROUND_TRIP)
def test_geojson_round_trip(wkt):
    g = from_wkt(wkt)
    g2 = from_geojson(to_geojson(g))
    assert to_wkt(g2) == wkt


def test_geojson_known_forms():
    assert to_geojson(from_wkt("POINT(1 2)")) == '{"type":"Point","coordinates":[1,2]}'
    g = from_geojson('{"type":"LineString","coordinates":[[0,0],[1,1]]}')
    assert to_wkt(g) == "LINESTRING(0 0,1 1)"
    # dimension inference: 3 ordinates -> Z
    g = from_geojson('{"type":"Point","coordinates":[1,2,3]}')
    assert to_wkt(g) == "POINT Z (1 2 3)"


def test_geojson_m_dropped():
    g = from_wkt("POINT ZM (1 2 3 4)")
    d = to_geojson_dict(g)
    assert d["coordinates"] == [1, 2, 3]  # M dropped, Z kept
    g = from_wkt("POINT M (1 2 3)")
    assert to_geojson_dict(g)["coordinates"] == [1, 2]


def test_geojson_features():
    g = from_wkt("POINT(5 6)")
    f = feature_to_dict(g, {"name": "x"}, fid=7)
    geom, fid, props = parse_feature(json.dumps(f))
    assert to_wkt(geom) == "POINT(5 6)" and fid == 7 and props == {"name": "x"}
    fc = {"type": "FeatureCollection", "features": [f, f]}
    feats = parse_feature_collection(json.dumps(fc))
    assert len(feats) == 2


TWKB_ROUND_TRIP = [
    ("POINT(1 2)", 0),
    ("POINT(1.25 2.5)", 2),
    ("POINT(-3.1 -4.9)", 1),
    ("LINESTRING(0 0,1 1,2 0)", 0),
    ("POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))", 0),
    ("MULTIPOINT((1 2),(3 4))", 0),
    ("MULTILINESTRING((0 0,1 1),(2 2,3 3))", 0),
    ("MULTIPOLYGON(((0 0,1 0,1 1,0 0)))", 0),
    ("GEOMETRYCOLLECTION(POINT(1 2),LINESTRING(0 0,1 1))", 0),
    ("POINT EMPTY", 0),
    ("LINESTRING EMPTY", 0),
    ("POLYGON EMPTY", 0),
    ("MULTIPOINT EMPTY", 0),
]


@pytest.mark.parametrize("wkt,prec", TWKB_ROUND_TRIP)
def test_twkb_round_trip(wkt, prec):
    g = from_wkt(wkt)
    buf = to_twkb(g, prec)
    g2 = from_twkb(buf)
    assert to_wkt(g2) == wkt


def test_twkb_precision_quantizes():
    g = from_wkt("POINT(1.2345 6.789)")
    g2 = from_twkb(to_twkb(g, 1))
    assert to_wkt(g2) == "POINT(1.2 6.8)"
    g3 = from_twkb(to_twkb(g, 3))
    assert to_wkt(g3) == "POINT(1.234 6.789)"  # round-half-even at 1.2345
    # negative precision rounds to tens
    g4 = from_twkb(to_twkb(from_wkt("POINT(123 456)"), -1))
    assert to_wkt(g4) == "POINT(120 460)"


def test_twkb_zm():
    g = from_wkt("POINT ZM (1.5 2.5 3.25 4)")
    g2 = from_twkb(to_twkb(g, 2, prec_z=2, prec_m=0))
    assert to_wkt(g2) == "POINT ZM (1.5 2.5 3.25 4)"
    g = from_wkt("LINESTRING Z (0 0 1,1 1 2)")
    assert to_wkt(from_twkb(to_twkb(g, 0, prec_z=0))) == "LINESTRING Z (0 0 1,1 1 2)"


def test_twkb_headers():
    g = from_wkt("LINESTRING(0 0,10 5)")
    buf = to_twkb(g, 0, with_size=True, with_bbox=True)
    assert from_twkb(buf) == g
    assert twkb_envelope(buf) == (0.0, 0.0, 10.0, 5.0)
    assert twkb_size(buf) is not None and twkb_size(buf) > 0
    # no headers -> probes return None/[]
    buf2 = to_twkb(g, 0)
    assert twkb_envelope(buf2) is None
    assert twkb_size(buf2) is None
    assert twkb_id_list(buf2) == []


def test_twkb_ring_closing():
    g = from_wkt("POLYGON((0 0,4 0,4 4,0 4,0 0))")
    # default: closing point omitted on wire, restored on read
    b_open = to_twkb(g, 0)
    b_closed = to_twkb(g, 0, close_rings=True)
    assert len(b_open) < len(b_closed)
    assert from_twkb(b_open) == g
    assert from_twkb(b_closed) == g


def test_twkb_id_list_write():
    from simplefeatures_ray.geometry import GeometryError

    g = from_wkt("MULTIPOINT((1 2),(3 4),(5 6))")
    buf = to_twkb(g, 0, id_list=[10, -5, 42])
    assert twkb_id_list(buf) == [10, -5, 42]
    assert to_wkt(from_twkb(buf)) == "MULTIPOINT((1 2),(3 4),(5 6))"
    # with size + bbox headers too
    buf2 = to_twkb(from_wkt("MULTIPOLYGON(((0 0,2 0,2 2,0 0)))"), 0,
                   id_list=[7], with_size=True, with_bbox=True)
    assert twkb_id_list(buf2) == [7]
    assert from_twkb(buf2) == from_wkt("MULTIPOLYGON(((0 0,2 0,2 2,0 0)))")
    with pytest.raises(GeometryError):
        to_twkb(from_wkt("POINT(1 2)"), 0, id_list=[1])
    with pytest.raises(GeometryError):
        to_twkb(g, 0, id_list=[1, 2])


def test_twkb_gc_inherits_parent_precision():
    # Reference twkb_write.go copytwkbWriter: nested GC elements encode at
    # the SAME precision as the parent — prec 0 would truncate to integers.
    g = from_wkt("GEOMETRYCOLLECTION(POINT(1.2345 2.3456),LINESTRING(0.5 0.5,1.25 1.75))")
    buf = to_twkb(g, 4)
    assert to_wkt(from_twkb(buf)) == (
        "GEOMETRYCOLLECTION(POINT(1.2345 2.3456),LINESTRING(0.5 0.5,1.25 1.75))"
    )
    # Z/M precisions inherit too
    gz = from_wkt("GEOMETRYCOLLECTION(POINT Z (1.25 2.5 3.125))")
    bufz = to_twkb(gz, 2, prec_z=3)
    assert to_wkt(from_twkb(bufz)) == "GEOMETRYCOLLECTION(POINT Z (1.25 2.5 3.125))"


def test_twkb_multipoint_id_list_with_empty_elements():
    # Empty points are dropped on the wire; ids must be dropped in lockstep
    # so the id stream stays aligned with the written element count.
    g = from_wkt("MULTIPOINT((1 2),EMPTY,(3 4))")
    buf = to_twkb(g, 0, id_list=[10, 20, 30])
    assert twkb_id_list(buf) == [10, 30]
    assert to_wkt(from_twkb(buf)) == "MULTIPOINT((1 2),(3 4))"
