"""GeoJSON Dataset source/sink: NDJSON (GeoJSONSeq) and FeatureCollection
layouts round-trip through the WKB-column convention."""
import json
import os

import numpy as np
import pytest

from simplefeatures_ray.geometry.geojson import to_geojson_dict
from simplefeatures_ray.geometry.wkb import from_wkb
from simplefeatures_ray.geometry.wkt import from_wkt, to_wkt

WKTS = [
    "POINT(1 2)",
    "LINESTRING(0 0,1 1,2 0)",
    "POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))",
    "MULTIPOINT(1 1,2 2)",
    "GEOMETRYCOLLECTION(POINT(5 5),LINESTRING(0 0,1 1))",
]


def _features():
    return [
        {"type": "Feature", "id": i, "geometry": to_geojson_dict(from_wkt(w)),
         "properties": {"name": f"f{i}", "rank": i * 10}}
        for i, w in enumerate(WKTS)
    ]


def test_read_seq_and_collection(ray_session, tmp_path):
    from simplefeatures_ray.sources.geojson import read_geojson

    feats = _features()
    seq = tmp_path / "data.ndjson"
    seq.write_text("\n".join(json.dumps(f) for f in feats) + "\n")
    coll = tmp_path / "fc.geojson"
    coll.write_text(json.dumps({"type": "FeatureCollection", "features": feats},
                               indent=1))

    for path, want_layout in ((str(seq), "seq"), (str(coll), "collection")):
        ds = read_geojson(path)  # auto-sniff
        df = ds.to_pandas().sort_values("fid").reset_index(drop=True)
        assert len(df) == len(WKTS)
        for i, row in df.iterrows():
            g = from_wkb(row["wkb"])
            want = from_wkt(WKTS[int(row["fid"])])
            assert to_wkt(g) == to_wkt(want)
            props = json.loads(row["properties"])
            assert props["name"] == f"f{row['fid']}"


def test_read_seq_bare_geometries_and_rs(ray_session, tmp_path):
    from simplefeatures_ray.sources.geojson import read_geojson

    seq = tmp_path / "geoms.ndjson"
    lines = ["\x1e" + json.dumps(to_geojson_dict(from_wkt(w))) for w in WKTS]
    seq.write_text("\n".join(lines) + "\n\n")
    df = read_geojson(str(seq), layout="seq").to_pandas()
    assert len(df) == len(WKTS)
    assert set(df["fid"]) == {""}


def test_round_trip_write_seq(ray_session, tmp_path):
    from simplefeatures_ray.sources.geojson import read_geojson, write_geojson_seq

    feats = _features()
    seq = tmp_path / "in.ndjson"
    seq.write_text("\n".join(json.dumps(f) for f in feats) + "\n")
    ds = read_geojson(str(seq))
    out_dir = str(tmp_path / "out")
    write_geojson_seq(ds, out_dir)
    files = [f for f in os.listdir(out_dir) if f.endswith(".ndjson")]
    assert files
    back = read_geojson([os.path.join(out_dir, f) for f in files], layout="seq")
    a = ds.to_pandas().sort_values("fid").reset_index(drop=True)
    b = back.to_pandas().sort_values("fid").reset_index(drop=True)
    assert list(a["wkb"]) == list(b["wkb"])
    assert list(a["properties"]) == list(b["properties"])
