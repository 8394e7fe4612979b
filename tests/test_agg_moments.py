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
