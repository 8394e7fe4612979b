"""rollup_agg (GROUP BY ROLLUP / CUBE, one-pass combiner) vs DuckDB."""
from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from simplefeatures_ray.functions.agg import rollup_agg


def make_data(with_nulls: bool):
    rng = np.random.default_rng(77)
    n = 500
    lang = rng.choice(["en", "de", "fr"], n).astype(object)
    src = rng.choice(["a", "b"], n).astype(object)
    if with_nulls:
        lang[rng.random(n) < 0.15] = None  # data-NULLs, distinct from rollup-NULLs
    return pa.table({
        "lang": pa.array(lang.tolist(), pa.string()),
        "src": pa.array(src.tolist(), pa.string()),
        "v": pa.array(rng.integers(0, 1000, n), pa.int64()),
    })


def duck(tbl: pa.Table, grouping: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", tbl)
    kw = "ROLLUP" if grouping == "rollup" else "CUBE"
    return con.execute(f"""
        SELECT lang, src,
               GROUPING(lang, src)::BIGINT AS grouping_id,
               COUNT(*)::BIGINT AS n_rows,
               SUM(v)::BIGINT AS sum_v,
               MIN(v)::BIGINT AS min_v,
               MAX(v)::BIGINT AS max_v
        FROM t GROUP BY {kw}(lang, src)
    """).fetchdf()


SPEC = {"n_rows": (None, "count"), "sum_v": ("v", "sum"),
        "min_v": ("v", "min"), "max_v": ("v", "max")}
SORT = ["grouping_id", "lang", "src"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[["lang", "src", "grouping_id", "n_rows", "sum_v", "min_v", "max_v"]]
    df = df.astype({c: "Int64" for c in ["n_rows", "sum_v", "min_v", "max_v"]})
    return df.sort_values(SORT, na_position="first").reset_index(drop=True)


@pytest.mark.parametrize("grouping", ["rollup", "cube"])
@pytest.mark.parametrize("with_nulls", [False, True])
@pytest.mark.parametrize("combine", ["driver", "shuffle"])
def test_vs_duckdb(ray_session, grouping, with_nulls, combine):
    tbl = make_data(with_nulls)
    ds = rd.from_arrow(tbl).repartition(4)
    got = rollup_agg(ds, ["lang", "src"], SPEC, grouping=grouping,
                     combine=combine).to_pandas()
    want = duck(tbl, grouping)
    a, b = norm(got), norm(want)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_rollup_levels(ray_session):
    tbl = make_data(False)
    got = rollup_agg(rd.from_arrow(tbl), ["lang", "src"], SPEC,
                     grouping="rollup").to_pandas()
    # rollup of 2 keys -> gids {0,1,3}; cube adds gid 2
    assert set(got["grouping_id"]) == {0, 1, 3}
    grand = got[got.grouping_id == 3]
    assert len(grand) == 1 and int(grand.n_rows.iloc[0]) == 500
    cube = rollup_agg(rd.from_arrow(tbl), ["lang", "src"], SPEC,
                      grouping="cube").to_pandas()
    assert set(cube["grouping_id"]) == {0, 1, 2, 3}


def test_mean_and_var_merge(ray_session):
    tbl = make_data(False)
    got = rollup_agg(rd.from_arrow(tbl).repartition(5), ["lang"],
                     {"avg_v": ("v", "mean"), "var_v": ("v", "var")},
                     grouping="rollup").to_pandas()
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute("""
        SELECT lang, GROUPING(lang)::BIGINT AS grouping_id,
               AVG(v) AS avg_v, VAR_POP(v) AS var_v
        FROM t GROUP BY ROLLUP(lang)""").fetchdf()
    a = got.sort_values(["grouping_id", "lang"], na_position="first").reset_index(drop=True)
    b = want.sort_values(["grouping_id", "lang"], na_position="first").reset_index(drop=True)
    assert list(a.lang.fillna("~")) == list(b.lang.fillna("~"))
    np.testing.assert_allclose(a.avg_v, b.avg_v, rtol=1e-12)
    np.testing.assert_allclose(a.var_v, b.var_v, rtol=1e-9)


def test_int_key_rollup_null_type(ray_session):
    # integer key: rolled-up rows must come back as int64-with-null, not float
    tbl = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                    "v": pa.array([10, 20, 30], pa.int64())})
    out = rollup_agg(rd.from_arrow(tbl), ["k"], {"s": ("v", "sum")},
                     grouping="rollup")
    assert out.schema.field("k").type == pa.int64()
    df = out.to_pandas().sort_values(["grouping_id", "k"]).reset_index(drop=True)
    assert df.s.tolist() == [30, 30, 60]


def test_grouping_sets_explicit(ray_session):
    tbl = make_data(True)
    ds = rd.from_arrow(tbl).repartition(3)
    got = rollup_agg(ds, ["lang", "src"], SPEC,
                     grouping=[["lang", "src"], ["src"], []]).to_pandas()
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute("""
        SELECT lang, src,
               GROUPING(lang, src)::BIGINT AS grouping_id,
               COUNT(*)::BIGINT AS n_rows,
               SUM(v)::BIGINT AS sum_v,
               MIN(v)::BIGINT AS min_v,
               MAX(v)::BIGINT AS max_v
        FROM t GROUP BY GROUPING SETS ((lang, src), (src), ())
    """).fetchdf()
    pd.testing.assert_frame_equal(norm(got), norm(want), check_dtype=False)
    assert set(got["grouping_id"]) == {0, 2, 3}


def test_grouping_sets_validation(ray_session):
    tbl = make_data(False)
    ds = rd.from_arrow(tbl)
    with pytest.raises(ValueError, match="duplicate"):
        rollup_agg(ds, ["lang", "src"], SPEC, grouping=[["lang"], ["lang"]])
    with pytest.raises(ValueError, match="not in keys"):
        rollup_agg(ds, ["lang", "src"], SPEC, grouping=[["nope"]])
    with pytest.raises(ValueError, match="rollup"):
        rollup_agg(ds, ["lang"], SPEC, grouping="bogus")


def test_parallelism_invariance(ray_session):
    tbl = make_data(True)
    outs = []
    for parts in (1, 3, 8):
        got = rollup_agg(rd.from_arrow(tbl).repartition(parts),
                         ["lang", "src"], SPEC, grouping="cube").to_pandas()
        outs.append(norm(got))
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])
