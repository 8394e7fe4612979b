"""End-to-end product-surface verification (the /verify recipe).

Drives the driver contract exactly like the round gate does: ray.init,
import __ray_entry__, run entry() plus a sample of queries(), and diff
each against its oracle_sql() via DuckDB on the same parquet views
(row count + column names + order-insensitive values).

Usage: python scripts/verify_e2e.py [query ...]   (default: a spread
covering flagship, text kernels, joins, aggregates)
"""
import sys

import numpy as np

DEFAULT = [
    "flagship_tiles", "q1_pricing_summary", "docs_quality",
    "docs_term_stats", "docs_dsir_select", "spatial_cell_join",
    "docs_token_counts", "docs_langid_pred", "docs_fingerprint",
]


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).setLevel(logging.ERROR)

    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import duckdb

    import __ray_entry__ as E

    qs, sql = E.queries(), E.oracle_sql()
    names = sys.argv[1:] or [n for n in DEFAULT if n in qs]
    sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")

    ds = E.entry()
    n = ds.count() if hasattr(ds, "count") else len(ds)
    print(f"entry(): {n} rows")
    assert n >= 0

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns),
                              kind="mergesort").reset_index(drop=True)

    failures = []
    for name in names:
        res = qs[name](sf)
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        if name not in sql:
            print(f"{name}: {len(df)} rows (no oracle)")
            continue
        odf = con.execute(sql[name]).df()
        a, b = canon(df), canon(odf)
        ok = len(a) == len(b) and list(a.columns) == list(b.columns)
        if ok:
            for c in a.columns:
                x, y = a[c].values, b[c].values
                if np.issubdtype(a[c].dtype, np.floating):
                    ok &= bool(np.allclose(x.astype(float), y.astype(float),
                                           rtol=1e-9, atol=1e-12,
                                           equal_nan=True))
                else:
                    ok &= bool((x == y).all())
        status = "MATCH" if ok else "MISMATCH"
        print(f"{name}: {len(a)} rows vs oracle {len(b)} -> {status}")
        if not ok:
            failures.append(name)
    ray.shutdown()
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
