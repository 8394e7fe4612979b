"""transition_counts NULL semantics vs a DuckDB LEAD replay.

Regression for two silent divergences: (1) pandas' default dropna=True
dropped any transition whose prev or next event_type was NULL; (2) the
partition hash crashed on NULL keys and NaN != NaN broke null-key
sequences apart instead of grouping them like SQL PARTITION BY does.
"""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from simplefeatures_ray.functions.windows import transition_counts


def _collect(out):
    if isinstance(out, pa.Table):
        return out
    return pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow") if b.num_rows])


@pytest.mark.parametrize("seed", [3, 17])
def test_transitions_null_keys_and_types(ray_session, seed):
    rng = np.random.default_rng(seed)
    n = 400
    key = rng.integers(0, 12, n).astype(object)
    key[rng.random(n) < 0.15] = None
    typ = rng.choice(["a", "b", "c"], n).astype(object)
    typ[rng.random(n) < 0.1] = None
    df = pd.DataFrame({
        "user_id": pd.array([k if k is None else int(k) for k in key],
                            dtype="Int64"),
        "ts": rng.integers(0, 10_000, n),
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": typ,
    })
    out = transition_counts(rd.from_pandas(df).repartition(7),
                            key="user_id", ts_col="ts",
                            type_col="event_type", tie_col="event_id")
    got = _collect(out).to_pandas()

    con = duckdb.connect()
    con.register("t", df)
    # LEAD returns NULL past the end of a partition; those are not
    # transitions — filter on a never-null LEAD column (nts):
    ref2 = con.execute("""
        WITH seq AS (
          SELECT user_id, event_type AS prev_type, ts, event_id,
                 LEAD(event_type) OVER w AS next_type,
                 LEAD(ts) OVER w AS nts
          FROM t
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT prev_type, next_type, COUNT(*)::BIGINT AS n
        FROM seq WHERE nts IS NOT NULL
        GROUP BY 1, 2
    """).df()
    key_of = lambda f: {(r.prev_type, r.next_type): int(r.n)
                        for r in f.itertuples()}
    gk, rk = key_of(got), key_of(ref2)
    # normalize NaN/None representations
    norm = lambda d: {(None if pd.isna(a) else a,
                       None if pd.isna(b) else b): v
                      for (a, b), v in d.items()}
    assert norm(gk) == norm(rk)
