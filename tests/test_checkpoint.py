"""Checkpoint/lineage tests: idempotent resume, per-partition manifest."""
import json
import os
import shutil

import pytest


@pytest.fixture
def tmp_out(tmp_path):
    return str(tmp_path / "ckpt")


def _make_ds(n=2000):
    import numpy as np
    import ray.data as rd

    ds = rd.range(n)
    return ds.map_batches(
        lambda b: {
            "key": b["id"] % 37,
            "value": b["id"].astype(float) * 1.5,
            "id": b["id"],
        },
        batch_format="numpy",
    )


def test_write_and_manifest(ray_session, tmp_out):
    from simplefeatures_ray.state.checkpoint import (
        checkpointed_write,
        load_manifest,
        read_checkpointed,
        verify_manifest,
    )

    doc = checkpointed_write(_make_ds(), tmp_out, partition_col="key", n_buckets=8)
    assert doc["total_rows"] == 2000
    manifest = load_manifest(tmp_out)
    assert len(manifest) >= 1
    assert all(v["rows"] > 0 and v["content_hash"] for v in manifest.values())
    # every partition verifies
    assert set(verify_manifest(tmp_out).values()) == {"ok"}
    # read back the full dataset
    back = read_checkpointed(tmp_out)
    assert back.count() == 2000


def test_resume_skips_completed(ray_session, tmp_out):
    from simplefeatures_ray.state.checkpoint import checkpointed_write, load_manifest

    checkpointed_write(_make_ds(), tmp_out, partition_col="key", n_buckets=8)
    m1 = load_manifest(tmp_out)
    # delete one partition and its manifest entry -> only that one rewrites
    victim = sorted(m1)[0]
    path = os.path.join(tmp_out, f"part={victim}")
    shutil.rmtree(path)
    mpath = os.path.join(tmp_out, "_manifest.json")
    doc = json.load(open(mpath))
    del doc["partitions"][str(victim)]
    json.dump(doc, open(mpath, "w"))

    before_mtimes = {
        b: os.path.getmtime(os.path.join(tmp_out, f"part={b}", "data.parquet"))
        for b in m1
        if b != victim
    }
    checkpointed_write(_make_ds(), tmp_out, partition_col="key", n_buckets=8)
    m2 = load_manifest(tmp_out)
    assert set(m2) == set(m1)
    assert m2[victim]["content_hash"] == m1[victim]["content_hash"]
    # untouched partitions were NOT rewritten
    for b, mt in before_mtimes.items():
        assert os.path.getmtime(os.path.join(tmp_out, f"part={b}", "data.parquet")) == mt


def test_deterministic_hashes_across_runs(ray_session, tmp_path):
    from simplefeatures_ray.state.checkpoint import checkpointed_write, load_manifest

    d1 = str(tmp_path / "a")
    d2 = str(tmp_path / "b")
    checkpointed_write(_make_ds(), d1, partition_col="key", n_buckets=8)
    checkpointed_write(_make_ds(), d2, partition_col="key", n_buckets=8)
    m1 = load_manifest(d1)
    m2 = load_manifest(d2)
    assert {k: v["content_hash"] for k, v in m1.items()} == {
        k: v["content_hash"] for k, v in m2.items()
    }


def test_spatial_sink_bbox_pruning(ray_session, tmp_path):
    """write_spatial partitions by Morton cell; read_spatial opens only
    bbox-intersecting buckets and row-filters exactly."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from simplefeatures_ray.state.spatial_sink import (
        pruned_fraction,
        read_spatial,
        write_spatial,
    )

    rng = np.random.default_rng(11)
    lon = rng.uniform(-170, 170, 5000)
    lat = rng.uniform(-60, 60, 5000)
    ds = rd.from_arrow(pa.table({
        "pid": pa.array(np.arange(5000)),
        "lon": pa.array(lon), "lat": pa.array(lat),
    })).repartition(8)
    out = str(tmp_path / "spatial")
    doc = write_spatial(ds, out, res=3)
    assert doc["total_rows"] == 5000
    assert len(doc["partitions"]) > 10

    bbox = (-10.0, -10.0, 30.0, 25.0)
    got = read_spatial(out, bbox).to_pandas()
    keep = (lon >= bbox[0]) & (lon <= bbox[2]) & (lat >= bbox[1]) & (lat <= bbox[3])
    assert sorted(got["pid"]) == sorted(np.arange(5000)[keep])
    # pruning actually skips most rows before any read
    assert pruned_fraction(out, bbox) > 0.5
    # full read round-trips
    assert read_spatial(out).count() == 5000


def test_resume_ignores_stale_tmp_from_crash(ray_session, tmp_out):
    """A crash between write and atomic rename leaves part=N/data.parquet
    .tmp.<pid> litter and no manifest entry; the rerun must rewrite the
    bucket correctly and never read the stale tmp."""
    from simplefeatures_ray.state.checkpoint import checkpointed_write, load_manifest

    checkpointed_write(_make_ds(), tmp_out, partition_col="key", n_buckets=8)
    m1 = load_manifest(tmp_out)
    victim = sorted(m1)[0]
    pdir = os.path.join(tmp_out, f"part={victim}")
    # simulate the crash: final file gone, stale tmp with garbage bytes
    os.remove(os.path.join(pdir, "data.parquet"))
    with open(os.path.join(pdir, "data.parquet.tmp.99999"), "wb") as fh:
        fh.write(b"\x00garbage not parquet")
    doc = json.load(open(os.path.join(tmp_out, "_manifest.json")))
    del doc["partitions"][str(victim)]
    json.dump(doc, open(os.path.join(tmp_out, "_manifest.json"), "w"))

    checkpointed_write(_make_ds(), tmp_out, partition_col="key", n_buckets=8)
    m2 = load_manifest(tmp_out)
    assert m2[victim]["content_hash"] == m1[victim]["content_hash"]
    # the rewritten final file parses
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(pdir, "data.parquet"))
    assert t.num_rows == m2[victim]["rows"]
