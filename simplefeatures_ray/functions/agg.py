"""Combiner-style grouped aggregation.

For LOW-CARDINALITY keys (aggregate fan-in), a full groupby exchange
moves every row; the combiner pattern moves |keys| x |blocks| partial
rows instead: map_batches computes per-batch partials (vectorized pandas
groupby), and the final combine runs over that tiny set — on the driver
(combine="driver") or as a Ray groupby when the key space is large
(combine="shuffle"). Mean decomposes into sum+count.

At 100 TB this is the difference between an all-to-all of 10^12 rows
and |keys| x |blocks| partial rows (e.g. 6 x 100k for TPC-H Q1).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._pdarrow import (arrow_groups, canon_int_keys, from_pandas_clean,
                       restore_types)

_KINDS = {"sum", "count", "min", "max", "mean", "var", "std"}


def _partial_kernel(keys, spec):
    # decompose: mean -> (sum, count); var/std -> (sum, M2, count) with
    # M2 = per-batch centered sum of squares (Chan/Welford partial —
    # E[x^2]-E[x]^2 catastrophically cancels when |mean| >> spread);
    # count -> count of rows
    plan = {}  # partial_col -> (src, op)
    for out, (src, kind) in spec.items():
        if kind == "mean":
            plan[f"__{out}_sum"] = (src, "sum")
            plan[f"__{out}_cnt"] = (src, "count")
        elif kind in ("var", "std"):
            plan[f"__{out}_sum"] = (src, "sum")
            plan[f"__{out}_m2"] = (src, "m2")
            plan[f"__{out}_cnt"] = (src, "count")
        elif kind == "count":
            # (None, "count") = row count; (col, "count") = that
            # column's NON-NULL/non-NaN count (pandas semantics — the
            # src was previously discarded, silently making both the
            # same)
            plan[f"__{out}_cnt"] = (src, "count")
        else:
            plan[f"__{out}_{kind}"] = (src, kind)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, dropna=False)
        cols = {}
        for pcol, (src, op) in plan.items():
            if op == "count":
                cols[pcol] = g.size() if src is None else g[src].count()
            elif op == "m2":
                # centered per-batch: n * var_pop, 0 for empty/1-element
                # groups (NaN would poison the combine sums)
                cols[pcol] = (g[src].var(ddof=0) * g[src].count()).fillna(0.0)
            else:
                cols[pcol] = getattr(g[src], op)()
        out = pd.DataFrame(cols).reset_index()
        return out

    return kernel, plan


def _combine_frame(df: pd.DataFrame, keys, spec, plan) -> pd.DataFrame:
    m2_cols = [p for p, (_, op) in plan.items() if op == "m2"]
    if m2_cols:
        # Chan parallel merge: M2_total = sum(M2_i) + sum(n_i*(mu_i-mu)^2).
        # Fold the between-partial term into the M2 column BEFORE the
        # final sum — mu_i - mu is an actual elementwise subtraction,
        # so no large-square cancellation at any mean magnitude.
        df = df.copy()
        gt = df.groupby(keys, sort=False, dropna=False)
        for pcol in m2_cols:
            base = pcol[: -len("_m2")]
            ni = df[f"{base}_cnt"].to_numpy(dtype=np.float64)
            si = df[f"{base}_sum"].to_numpy(dtype=np.float64)
            N = gt[f"{base}_cnt"].transform("sum").to_numpy(dtype=np.float64)
            S = gt[f"{base}_sum"].transform("sum").to_numpy(dtype=np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                d = np.where(ni > 0, si / np.where(ni > 0, ni, 1.0)
                             - S / np.where(N > 0, N, 1.0), 0.0)
            df[pcol] = df[pcol].to_numpy(dtype=np.float64) + ni * d * d
    g = df.groupby(keys, sort=False, dropna=False)
    partial = {}
    for pcol, (_, op) in plan.items():
        if op in ("sum", "count", "m2"):
            partial[pcol] = g[pcol].sum()
        else:
            partial[pcol] = getattr(g[pcol], op)()
    combined = pd.DataFrame(partial).reset_index()
    out = combined[list(keys)].copy()
    for name, (src, kind) in spec.items():
        if kind == "mean":
            out[name] = combined[f"__{name}_sum"] / combined[f"__{name}_cnt"]
        elif kind in ("var", "std"):
            # population variance = merged M2 / n (Chan/Welford — stable
            # for float data whose mean dwarfs its spread)
            n = combined[f"__{name}_cnt"].to_numpy(dtype=np.float64)
            v = np.maximum(
                combined[f"__{name}_m2"].to_numpy(dtype=np.float64), 0.0) / n
            out[name] = np.sqrt(v) if kind == "std" else v
        elif kind == "count":
            out[name] = combined[f"__{name}_cnt"].astype(np.int64)
        else:
            out[name] = combined[f"__{name}_{kind}"]
    return out


def grouped_agg(ds, keys, spec: dict, combine: str = "driver"):
    """ds.groupby(keys) with spec {out_col: (src_col, kind)}.

    combine="driver": partials stream to the driver (correct when
    |keys| x |blocks| is small); returns a pyarrow Table.
    combine="shuffle": final combine via Ray groupby; returns a Dataset.

    Missing-value semantics are pandas' (skipna): NULL and float NaN
    are both treated as missing by sum/min/max/mean/var/std and by
    (col, "count"); (None, "count") counts rows. SQL differs on NaN
    (a value there) — the oracle-gated queries never feed NaN, and
    callers comparing against SQL should pre-filter NaN if it can
    occur.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    kernel, plan = _partial_kernel(keys, spec)

    def typed_partial(t: pa.Table) -> pa.Table:
        # null-stable integer keys (see _pdarrow.canon_int_keys): a
        # null-bearing block must emit the SAME arrow key type (int64)
        # and group the same values as a null-free one
        return from_pandas_clean(kernel(canon_int_keys(t, keys)))

    partial = ds.map_batches(typed_partial, batch_format="pyarrow")
    if combine == "driver":
        from .relational import collect_table

        tbl = collect_table(partial)
        df = _combine_frame(canon_int_keys(tbl, keys), keys, spec, plan)
        return restore_types(df, tbl.schema, only=keys)
    # shuffle combine on a COARSE partition of the key hash: the final
    # vectorized pandas groupby runs once per partition, not once per
    # group (Ray's map_groups pays per GROUP — ruinous at 10^5+ groups)
    n_parts = 64

    def add_part(t: pa.Table) -> pa.Table:
        df = canon_int_keys(t, keys)
        h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
        df["__part"] = (h % n_parts).astype(np.int32)
        return restore_types(df, t.schema, only=keys)

    def final(t: pa.Table) -> pa.Table:
        df = _combine_frame(canon_int_keys(t, keys).drop(columns="__part"),
                            keys, spec, plan)
        return restore_types(df, t.schema, only=keys)

    parted = partial.map_batches(add_part, batch_format="pyarrow")
    return parted.groupby("__part").map_groups(final, batch_format="pyarrow")


def exact_quantiles(ds, col: str, qs, group_keys=None):
    """EXACT distributed quantiles of an integer-valued (or low-
    cardinality) column: per-batch value histograms combine through one
    small groupby, the driver merges cumulative counts and reads
    quantiles off the sorted histogram — no global sort, shuffle volume
    bounded by the number of DISTINCT values, never by row count.

    Quantile semantics match DuckDB's quantile_disc: index =
    max(0, ceil(q*n) - 1) into the sorted multiset. Returns a pyarrow
    Table with one row per group (or a single row) and one column per
    requested quantile (q50, q90, ...).
    """
    import pandas as pd

    group_keys = ([group_keys] if isinstance(group_keys, str)
                  else list(group_keys or []))

    def hist(t: pa.Table) -> pa.Table:
        df = t.select(group_keys + [col]).to_pandas()
        out = (df.groupby(group_keys + [col], sort=False, dropna=False)
               .size().reset_index(name="__n"))
        return pa.Table.from_pandas(out, preserve_index=False)

    partial = ds.map_batches(hist, batch_format="pyarrow")
    from .relational import collect_table

    merged = collect_table(partial).to_pandas()
    merged = (merged.groupby(group_keys + [col], sort=False)["__n"]
              .sum().reset_index())

    def q_of(sub: pd.DataFrame) -> dict:
        sub = sub.sort_values(col, kind="mergesort")
        counts = sub["__n"].to_numpy()
        vals = sub[col].to_numpy()
        cum = np.cumsum(counts)
        n = int(cum[-1])
        row = {}
        for q in qs:
            idx = max(0, int(np.ceil(q * n)) - 1)
            row[f"q{int(round(q * 100))}"] = vals[np.searchsorted(cum, idx + 1)]
        return row

    if group_keys:
        rows = []
        for key, sub in merged.groupby(group_keys, sort=True):
            key = key if isinstance(key, tuple) else (key,)
            rows.append({**dict(zip(group_keys, key)), **q_of(sub)})
        return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)
    return pa.Table.from_pandas(pd.DataFrame([q_of(merged)]), preserve_index=False)
