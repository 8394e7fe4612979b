"""stages/exchange.py: the task-based co-partition primitive.

Contracts pinned here:
  * group-completeness — every row of a partition reaches exactly one
    reduce call, none are dropped or duplicated, at any block structure;
  * empty partitions produce typed empty outputs (schema-stable result);
  * zero-row/schema-less blocks (Ray map operators emit zero-COLUMN
    empty blocks) pass through without poisoning the exchange;
  * parity with groupby().map_groups on a shared kernel.
"""
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from simplefeatures_ray.stages.exchange import hash_exchange


def _mk(n, parts, seed=0, n_blocks=4):
    rng = np.random.default_rng(seed)
    t = pa.table({
        "k": rng.integers(0, 1000, n).astype(np.int64),
        "v": rng.random(n),
        "__bucket": rng.integers(0, parts, n).astype(np.int32),
    })
    ds = rd.from_arrow(t)
    if n_blocks > 1:
        ds = ds.repartition(n_blocks)
    return t, ds


def test_group_complete_and_exact(ray_session):
    P = 8
    t, ds = _mk(5000, P, seed=1)

    def per_part(g: pa.Table) -> pa.Table:
        b = np.asarray(g["__bucket"], dtype=np.int32)
        assert len(np.unique(b)) <= 1
        return pa.table({
            "part": pa.array([int(b[0]) if len(b) else -1], pa.int32()),
            "n": pa.array([g.num_rows], pa.int64()),
            "s": pa.array([float(np.asarray(g["v"]).sum())], pa.float64()),
        })

    out = hash_exchange(ds, P, per_part,
                        empty=t.slice(0, 0)).to_pandas()
    assert len(out) == P
    assert out["n"].sum() == 5000
    b = np.asarray(t["__bucket"])
    v = np.asarray(t["v"])
    for p in range(P):
        got = out[out["part"] == p]["s"]
        if len(got):
            assert np.isclose(float(got.iloc[0]), float(v[b == p].sum()))


def test_empty_partitions_typed(ray_session):
    # only bucket 3 has rows out of 6 partitions
    t = pa.table({"x": pa.array([1, 2], pa.int64()),
                  "__bucket": pa.array([3, 3], pa.int32())})
    ds = rd.from_arrow(t)

    def f(g: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([g.num_rows], pa.int64())})

    out = hash_exchange(ds, 6, f, empty=t.slice(0, 0)).to_pandas()
    assert list(out["n"]) == [0, 0, 0, 2, 0, 0]


def test_empty_out_skips_fn(ray_session):
    t = pa.table({"x": pa.array([5], pa.int64()),
                  "__bucket": pa.array([0], pa.int32())})
    ds = rd.from_arrow(t)

    def brittle(g: pa.Table) -> pa.Table:
        # kernel that CRASHES on empty input (like many pandas kernels)
        x = np.asarray(g["x"], dtype=np.int64)
        return pa.table({"m": pa.array([int(x.max())], pa.int64())})

    out = hash_exchange(
        ds, 4, brittle, empty=None,
        empty_out=pa.table({"m": pa.array([], pa.int64())})).to_pandas()
    assert list(out["m"]) == [5]


def test_schemaless_empty_blocks_tolerated(ray_session):
    # chain two exchanges: the first emits typed-empty blocks that Ray's
    # map operators degrade to zero-column blocks before the second
    t = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                  "__bucket": pa.array([0, 0, 1, 1], pa.int32())})
    e = t.slice(0, 0)
    first = hash_exchange(rd.from_arrow(t), 4, None, empty=e)

    def rebucket(g: pa.Table) -> pa.Table:
        k = np.asarray(g["k"], dtype=np.int64)
        return pa.table({"k": g["k"],
                         "__bucket": pa.array((k % 3).astype(np.int32))})

    second = hash_exchange(first.map_batches(rebucket, batch_format="pyarrow"),
                           3, None, empty=e)
    got = sorted(r["k"] for r in second.take_all())
    assert got == [1, 2, 3, 4]


def test_parity_with_groupby(ray_session):
    P = 5
    t, ds = _mk(2000, P, seed=7, n_blocks=3)

    def agg(g: pa.Table) -> pa.Table:
        out = g.group_by("k").aggregate([("v", "sum")])
        return out.rename_columns(["k", "vs"])

    a = hash_exchange(ds, P, agg, empty=t.slice(0, 0)).to_pandas()
    b = (ds.groupby("__bucket").map_groups(agg, batch_format="pyarrow")
         .to_pandas())
    a = a.sort_values(["k", "vs"]).reset_index(drop=True)
    b = b.sort_values(["k", "vs"]).reset_index(drop=True)
    # per-bucket k-groups are identical; sums may differ in float order
    assert (a["k"] == b["k"]).all()
    assert np.allclose(a["vs"], b["vs"])


def test_zero_input_blocks(ray_session):
    t = pa.table({"k": pa.array([], pa.int64()),
                  "__bucket": pa.array([], pa.int32())})
    ds = rd.from_arrow(t).map_batches(lambda g: g, batch_format="pyarrow")

    def f(g: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([g.num_rows], pa.int64())})

    out = hash_exchange(ds, 3, f, empty=t.slice(0, 0)).to_pandas()
    assert list(out["n"]) == [0, 0, 0]


def test_resilient_exchange_recovers_lost_reduce(ray_session):
    """VERDICT r4 #6: kill a reduce output object; the ExchangeHandle
    relaunches it from the still-held split shards and the co-partition
    result is unchanged."""
    import ray
    import ray.data as rd

    from simplefeatures_ray.stages.exchange import hash_exchange

    n = 5000
    t = pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64) % 37),
        "v": pa.array(np.arange(n, dtype=np.int64)),
        "__bucket": pa.array((np.arange(n, dtype=np.int64) * 2654435761)
                             % 8),
    })

    def per_part(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas().groupby("k", as_index=False)["v"].sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    ds = rd.from_arrow(t).repartition(6)
    handle = hash_exchange(ds, 8, per_part, empty=t.slice(0, 0),
                           resilient=True)
    ref_df = (handle.dataset().to_pandas()
              .sort_values(["k", "v"]).reset_index(drop=True))

    # simulate loss of two reduce outputs
    ray.get(handle.outs[1])  # ensure materialized before freeing
    ray.get(handle.outs[4])
    from ray._private.internal_api import free

    free([handle.outs[1], handle.outs[4]])
    import time

    time.sleep(0.5)
    got = (handle.dataset(recover=True).to_pandas()
           .sort_values(["k", "v"]).reset_index(drop=True))
    assert got.equals(ref_df)
    # brute-force expected
    exp = (t.to_pandas().groupby("k", as_index=False)["v"].sum()
           .sort_values(["k", "v"]).reset_index(drop=True))
    g2 = (got.groupby("k", as_index=False)["v"].sum()
          .sort_values(["k", "v"]).reset_index(drop=True))
    assert g2.equals(exp)
