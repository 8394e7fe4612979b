"""JSONL source/sink (sources/jsonl.py)."""
import numpy as np
import pyarrow as pa
import pytest


def test_jsonl_roundtrip_types_and_unicode(ray_session, tmp_path):
    import ray.data as rd

    from simplefeatures_ray.sources.jsonl import read_jsonl, write_jsonl

    t = pa.table({
        "i": pa.array([1, -2, 3], pa.int64()),
        "f": pa.array([1.5, 0.1, float(np.float64(1) / 3)], pa.float64()),
        "s": pa.array(["plain", "unié中文", "line\nbreak\ttab\"q"]),
        "b": pa.array([True, False, None]),
    })
    out = write_jsonl(rd.from_arrow(t).repartition(2), str(tmp_path / "j"))
    back = read_jsonl(out).to_pandas().sort_values("i").reset_index(drop=True)
    orig = t.to_pandas().sort_values("i").reset_index(drop=True)
    assert back["s"].tolist() == orig["s"].tolist()
    # floats round-trip exactly (repr shortest-digits)
    assert back["f"].tolist() == orig["f"].tolist()
    assert back["i"].tolist() == orig["i"].tolist()


def test_jsonl_rejects_binary(ray_session, tmp_path):
    import ray.data as rd

    from simplefeatures_ray.sources.jsonl import write_jsonl

    t = pa.table({"x": pa.array([b"raw"], pa.binary())})
    with pytest.raises(Exception):
        write_jsonl(rd.from_arrow(t), str(tmp_path / "bad"))


def test_jsonl_atomic_shards(ray_session, tmp_path):
    import os

    import ray.data as rd

    from simplefeatures_ray.sources.jsonl import write_jsonl

    t = pa.table({"v": pa.array(range(100))})
    out = write_jsonl(rd.from_arrow(t).repartition(4), str(tmp_path / "s"))
    names = sorted(os.listdir(out))
    assert all(n.endswith(".jsonl") for n in names)  # no tmp litter
    total = sum(int(n.rsplit("-", 1)[1].split(".")[0]) for n in names)
    assert total == 100


def test_jsonl_roundtrip_unicode_escapes_signed_zero(ray_session, tmp_path):
    """Escapes, CJK/emoji, 1e-300 and -0.0 survive the JSONL sink ->
    source round trip bit-exactly; an empty dataset writes cleanly."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from simplefeatures_ray.sources.jsonl import read_jsonl, write_jsonl

    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "s": pa.array(['a"b\\c', "北京\n🌍", "tab\there"],
                                pa.string()),
                  "x": pa.array([0.1, 1e-300, -0.0])})
    out = str(tmp_path / "u")
    write_jsonl(rd.from_arrow(t), out)
    back = read_jsonl(out).to_pandas().sort_values("id").reset_index(drop=True)
    ref = t.to_pandas()
    assert back["s"].tolist() == ref["s"].tolist()
    for a, b in zip(back["x"], ref["x"]):
        assert a == b and math.copysign(1, a) == math.copysign(1, b)
    write_jsonl(rd.from_arrow(pa.table({"id": pa.array([], pa.int64())})),
                str(tmp_path / "empty"))
