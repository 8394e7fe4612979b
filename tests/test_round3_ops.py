"""Round-3 late additions: funnel analysis, outer joins, rollup,
posting lists, fuzzy pairs, case folding, CSV source — all through
real Ray Data pipelines against hand-computed expectations."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_funnel_counts(ray_session):
    import ray.data as rd

    from simplefeatures_ray.functions.windows import funnel_counts

    # user 1: view(10) click(20) purchase(30)  -> reaches all 3
    # user 2: click(5) view(10) click(9)       -> view only (no click AFTER)
    # user 3: view(10) click(10) purchase(40)  -> click at SAME us excluded
    # user 4: purchase(1) view(2) click(3)     -> view, click (no purchase after)
    # user 5: click(1) purchase(2)             -> nothing (never viewed)
    rows = [
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        (2, 5, "click"), (2, 10, "view"), (2, 9, "click"),
        (3, 10, "view"), (3, 10, "click"), (3, 40, "purchase"),
        (4, 1, "purchase"), (4, 2, "view"), (4, 3, "click"),
        (5, 1, "click"), (5, 2, "purchase"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    out = funnel_counts(rd.from_arrow(t), "user_id", "ts", "event_type",
                        ["view", "click", "purchase"])
    df = (out.to_pandas() if hasattr(out, "to_pandas") else out) \
        if isinstance(out, (pa.Table, pd.DataFrame)) else out.to_pandas()
    if isinstance(df, pa.Table):
        df = df.to_pandas()
    df = df.sort_values("stage_idx").reset_index(drop=True)
    assert df["stage"].tolist() == ["view", "click", "purchase"]
    assert df["n_users"].tolist() == [4, 2, 1]
    assert df["n_users"].dtype == np.int64


def test_dedup_exact_null_keys_and_dtype(ray_session):
    """Null-bearing int64 keys: (1) the key's dtype survives the pandas
    round trip (no silent int64 -> float64 block-schema change), (2) a
    key value present in BOTH a null-bearing and a null-free block
    still dedups to one row (hash canonicalization across batches),
    (3) all null keys collapse to one row (DISTINCT semantics)."""
    import pyarrow as pa
    import ray.data as rd

    from simplefeatures_ray.functions.relational import dedup_exact

    t1 = pa.table({"k": pa.array([1, None, 7], pa.int64()),
                   "v": pa.array([5, 9, 1], pa.int64())})
    t2 = pa.table({"k": pa.array([1, 7, None], pa.int64()),
                   "v": pa.array([3, 2, 8], pa.int64())})
    ds = rd.from_arrow(t1).union(rd.from_arrow(t2))
    out = dedup_exact(ds, "k", keep_col="v")
    blocks = [b for b in out.iter_batches(batch_format="pyarrow") if b.num_rows]
    for b in blocks:
        assert b.schema.field("k").type == pa.int64()
    tbl = pa.concat_tables(blocks)
    got = {(None if k is None else int(k)): int(v)
           for k, v in zip(tbl["k"].to_pylist(), tbl["v"].to_pylist())}
    assert got == {1: 3, 7: 1, None: 8}
