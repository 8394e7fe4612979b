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

from ._pdarrow import arrow_groups

_KINDS = {"sum", "count", "min", "max", "mean", "var", "std"}


def _partial_kernel(keys, spec):
    # decompose: mean -> (sum, count); var/std -> (sum, sumsq, count);
    # count -> count of rows
    plan = {}  # partial_col -> (src, op)
    for out, (src, kind) in spec.items():
        if kind == "mean":
            plan[f"__{out}_sum"] = (src, "sum")
            plan[f"__{out}_cnt"] = (src, "count")
        elif kind in ("var", "std"):
            plan[f"__{out}_sum"] = (src, "sum")
            plan[f"__{out}_sqs"] = (src, "sumsq")
            plan[f"__{out}_cnt"] = (src, "count")
        elif kind == "count":
            plan[f"__{out}_cnt"] = (None, "count")
        else:
            plan[f"__{out}_{kind}"] = (src, kind)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        sq = {p: df[src].to_numpy(dtype=np.float64) ** 2
              for p, (src, op) in plan.items() if op == "sumsq"}
        if sq:
            df = df.assign(**sq)
        g = df.groupby(keys, sort=False, dropna=False)
        cols = {}
        for pcol, (src, op) in plan.items():
            if op == "count":
                cols[pcol] = g.size() if src is None else g[src].count()
            elif op == "sumsq":
                cols[pcol] = g[pcol].sum()
            else:
                cols[pcol] = getattr(g[src], op)()
        out = pd.DataFrame(cols).reset_index()
        return out

    return kernel, plan


def _combine_frame(df: pd.DataFrame, keys, spec, plan) -> pd.DataFrame:
    g = df.groupby(keys, sort=False, dropna=False)
    partial = {}
    for pcol, (_, op) in plan.items():
        if op in ("sum", "count", "sumsq"):
            partial[pcol] = g[pcol].sum()
        else:
            partial[pcol] = getattr(g[pcol], op)()
    combined = pd.DataFrame(partial).reset_index()
    out = combined[list(keys)].copy()
    for name, (src, kind) in spec.items():
        if kind == "mean":
            out[name] = combined[f"__{name}_sum"] / combined[f"__{name}_cnt"]
        elif kind in ("var", "std"):
            # population moments: E[x^2] - E[x]^2. One pass + exact
            # integer inputs keep this stable; callers gate at a shared
            # rounding precision (see __ray_entry__ canonicalization).
            n = combined[f"__{name}_cnt"].to_numpy(dtype=np.float64)
            mu = combined[f"__{name}_sum"].to_numpy(dtype=np.float64) / n
            v = combined[f"__{name}_sqs"].to_numpy(dtype=np.float64) / n - mu * mu
            v = np.maximum(v, 0.0)
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
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    kernel, plan = _partial_kernel(keys, spec)

    def typed_partial(t: pa.Table) -> pa.Table:
        # integer keys -> pandas Int64 before grouping so null-bearing
        # blocks emit the SAME arrow key type (int64) as null-free ones
        df = t.to_pandas()
        for c in keys:
            j = t.schema.get_field_index(c)
            if j >= 0 and pa.types.is_integer(t.schema.field(j).type) \
                    and not pd.api.types.is_integer_dtype(df[c].dtype):
                # only when pandas actually widened (nulls present):
                # int64 and Int64 hash/sort identically, so null-free
                # blocks skip the copy
                df[c] = df[c].astype("Int64")
        return pa.Table.from_pandas(kernel(df), preserve_index=False
                                    ).replace_schema_metadata(None)

    partial = ds.map_batches(typed_partial, batch_format="pyarrow")
    if combine == "driver":
        from .relational import collect_table

        tbl = collect_table(partial)
        df = _combine_frame(tbl.to_pandas(), keys, spec, plan)
        return pa.Table.from_pandas(df, preserve_index=False)
    # shuffle combine on a COARSE partition of the key hash: the final
    # vectorized pandas groupby runs once per partition, not once per
    # group (Ray's map_groups pays per GROUP — ruinous at 10^5+ groups)
    n_parts = 64

    def _canon_keys(t: pa.Table) -> pd.DataFrame:
        # same null-stability contract as relational.dedup_exact: pandas
        # widens int64-with-nulls to float64, so the partition hash
        # would see 1.0 in a null-bearing block and 1 in a null-free one
        # — the same group split across partitions. Canonicalize integer
        # keys to pandas Int64 from the ARROW schema.
        df = t.to_pandas()
        for c in keys:
            j = t.schema.get_field_index(c)
            if j >= 0 and pa.types.is_integer(t.schema.field(j).type) \
                    and not pd.api.types.is_integer_dtype(df[c].dtype):
                df[c] = df[c].astype("Int64")  # widened -> null-stable
        return df

    def _restore(df: pd.DataFrame, in_sch: pa.Schema) -> pa.Table:
        out = pa.Table.from_pandas(df, preserve_index=False)
        for i, name in enumerate(out.column_names):
            j = in_sch.get_field_index(name)
            if j >= 0 and name in keys \
                    and out.schema.field(i).type != in_sch.field(j).type:
                out = out.set_column(
                    i, name, out.column(i).cast(in_sch.field(j).type))
        return out.replace_schema_metadata(None)

    def add_part(t: pa.Table) -> pa.Table:
        df = _canon_keys(t)
        h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
        df["__part"] = (h % n_parts).astype(np.int32)
        return _restore(df, t.schema)

    def final(t: pa.Table) -> pa.Table:
        df = _combine_frame(_canon_keys(t).drop(columns="__part"),
                            keys, spec, plan)
        return _restore(df, t.schema)

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
