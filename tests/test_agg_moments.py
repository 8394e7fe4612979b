"""grouped_agg var/std kinds vs pandas population moments."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from simplefeatures_ray.functions.agg import grouped_agg


@pytest.fixture()
def frame():
    rng = np.random.default_rng(7)
    n = 5000
    return pd.DataFrame({
        "k": rng.integers(0, 13, n),
        "x": np.rint(rng.normal(50, 20, n) * 100),  # integer-valued
    })


@pytest.mark.parametrize("combine", ["driver", "shuffle"])
def test_var_std_match_pandas(ray_session, frame, combine):
    ds = rd.from_pandas(frame).repartition(9)
    out = grouped_agg(ds, "k", {
        "n": (None, "count"),
        "v": ("x", "var"),
        "s": ("x", "std"),
        "m": ("x", "mean"),
    }, combine=combine)
    got = (out.to_pandas() if hasattr(out, "to_pandas") else out
           ).sort_values("k").reset_index(drop=True)
    if isinstance(got, pa.Table):
        got = got.to_pandas()
    g = frame.groupby("k")["x"]
    want = pd.DataFrame({
        "k": sorted(frame["k"].unique()),
        "n": g.size().sort_index().to_numpy(),
        "v": g.var(ddof=0).sort_index().to_numpy(),
        "s": g.std(ddof=0).sort_index().to_numpy(),
        "m": g.mean().sort_index().to_numpy(),
    })
    got = got.sort_values("k").reset_index(drop=True)[["k", "n", "v", "s", "m"]]
    np.testing.assert_allclose(got["v"], want["v"], rtol=1e-9)
    np.testing.assert_allclose(got["s"], want["s"], rtol=1e-9)
    np.testing.assert_allclose(got["m"], want["m"], rtol=1e-12)
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()


def test_var_zero_for_constant_group(ray_session):
    df = pd.DataFrame({"k": [1, 1, 2], "x": [5.0, 5.0, 3.0]})
    out = grouped_agg(rd.from_pandas(df), "k", {"v": ("x", "var")})
    got = out.to_pandas().sort_values("k")
    assert got["v"].to_numpy() == pytest.approx([0.0, 0.0])


@pytest.mark.parametrize("combine", ["driver", "shuffle"])
def test_grouped_agg_null_int_keys_across_blocks(ray_session, combine):
    """A key value present in both a null-bearing and a null-free block
    must combine into ONE group (the pandas int64->float64 widening
    would otherwise hash 1 and 1.0 to different partitions), nulls form
    their own group, and the key column stays int64."""
    t1 = pa.table({"k": pa.array([1, None, 7], pa.int64()),
                   "x": pa.array([10.0, 5.0, 1.0])})
    t2 = pa.table({"k": pa.array([1, 7, None], pa.int64()),
                   "x": pa.array([20.0, 2.0, 7.0])})
    ds = rd.from_arrow(t1).union(rd.from_arrow(t2))
    out = grouped_agg(ds, "k", {"n": (None, "count"), "s": ("x", "sum")},
                      combine=combine)
    tbl = out if isinstance(out, pa.Table) else pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow") if b.num_rows])
    assert tbl.schema.field("k").type == pa.int64()  # both combine paths
    got = {(None if k is None else int(k)): (int(n), float(s))
           for k, n, s in zip(tbl["k"].to_pylist(), tbl["n"].to_pylist(),
                              tbl["s"].to_pylist())}
    assert got == {1: (2, 30.0), 7: (2, 3.0), None: (2, 12.0)}


def test_count_kind_respects_source_column(ray_session):
    """(col, 'count') counts NON-missing values of that column;
    (None, 'count') counts rows — previously both were row counts."""
    t = pa.table({"g": pa.array([1, 1, 2], pa.int64()),
                  "x": pa.array([np.inf, np.nan, None], pa.float64())})
    for combine in ("driver", "shuffle"):
        out = grouped_agg(rd.from_arrow(t).repartition(2), "g",
                          {"rows": (None, "count"), "vals": ("x", "count")},
                          combine=combine)
        tbl = out if isinstance(out, pa.Table) else pa.concat_tables(
            [b for b in out.iter_batches(batch_format="pyarrow")
             if b.num_rows])
        got = {g: (r, v) for g, r, v in zip(tbl["g"].to_pylist(),
                                            tbl["rows"].to_pylist(),
                                            tbl["vals"].to_pylist())}
        assert got == {1: (2, 1), 2: (1, 0)}


@pytest.mark.parametrize("combine", ["driver", "shuffle"])
def test_var_std_large_mean_small_spread(ray_session, combine):
    """Chan/Welford merge regression: float data with |mean| >> spread
    (values ~1e8, true var ~1). The old single-pass E[x^2]-E[x]^2
    combine catastrophically cancelled here and returned 0/garbage."""
    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame({"k": rng.integers(0, 4, n),
                       "x": 1e8 + rng.normal(0.0, 1.0, n)})
    out = grouped_agg(rd.from_pandas(df).repartition(8), "k",
                      {"v": ("x", "var"), "s": ("x", "std")},
                      combine=combine)
    tbl = out if isinstance(out, pa.Table) else pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow") if b.num_rows])
    ref = df.groupby("k")["x"].agg(
        v=lambda s: s.var(ddof=0), s=lambda s: s.std(ddof=0)).reset_index()
    got = {int(k): (v, s) for k, v, s in zip(
        tbl["k"].to_pylist(), tbl["v"].to_pylist(), tbl["s"].to_pylist())}
    for _, row in ref.iterrows():
        gv, gs = got[int(row["k"])]
        assert abs(gv - row["v"]) < 1e-6 * row["v"]
        assert abs(gs - row["s"]) < 1e-6 * row["s"]


def test_exact_quantiles_continuous_vs_duckdb(ray_session):
    """Iterative-refinement quantiles of raw doubles: byte-exact match
    with DuckDB quantile_disc across distributions, duplicates, single
    rows and 1e300 outliers."""
    import duckdb

    from simplefeatures_ray.functions.agg import exact_quantiles_continuous

    rng = np.random.default_rng(0)
    cases = [
        np.concatenate([rng.normal(0, 1, 20000), np.full(2000, 3.25),
                        rng.uniform(-100, 100, 8000)]),
        np.array([3.25] * 500),
        np.array([1.0]),
        np.concatenate([rng.normal(0, 1, 50), [1e300, -1e300]]),
        np.repeat([1.5, 2.5], 10000).astype(np.float64),
        np.round(rng.normal(0, 1e-6, 5000), 2),
    ]
    for ci, vals in enumerate(cases):
        t = pa.table({"value": vals})
        out = exact_quantiles_continuous(
            rd.from_arrow(t).repartition(4), "value",
            [0.25, 0.5, 0.99], collect_threshold=40)
        con = duckdb.connect()
        con.register("t", t.to_pandas())
        ref = con.execute(
            "SELECT quantile_disc(value, 0.25), quantile_disc(value, 0.5),"
            " quantile_disc(value, 0.99) FROM t").fetchone()
        got = [out[c][0].as_py() for c in ("q25", "q50", "q99")]
        assert got == list(ref), (ci, got, ref)
