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
    from ..stages.exchange import hash_exchange

    return hash_exchange(parted, n_parts, final, part_col="__part")


def rollup_agg(ds, keys, spec: dict, grouping: str = "rollup",
               combine: str = "driver", grouping_col: str = "grouping_id"):
    """SQL GROUP BY ROLLUP / CUBE in ONE corpus pass.

    Per-batch combiner emits partial rows for EVERY grouping set at once
    (rolled-up keys as typed NULLs), tagged with the ANSI GROUPING
    bitmask (leftmost key = most significant bit, 1 = rolled up —
    DuckDB ``GROUPING(k1, ..., kn)`` semantics, which also keeps a
    rollup-NULL distinct from a data-NULL key value). One combine merges
    the partials grouped by (keys..., bitmask): the corpus is read once
    and the exchange volume is sum over grouping sets of their partial
    rows — for ROLLUP a ~2x combiner overhead vs plain grouped_agg, for
    CUBE 2^n x, both independent of row count. The naive alternative
    (one grouped_agg per level, union) reads the corpus L times.

    grouping: 'rollup' (prefix hierarchy: (k1..kn), (k1..kn-1), ...,
    grand total), 'cube' (all 2^n subsets), or an explicit list of key
    subsets — ANSI GROUPING SETS, e.g. [["a","b"], ["a"], []]; duplicate
    sets are rejected (they would double-merge into one output group).
    spec / missing-value semantics are grouped_agg's. combine: 'driver'
    -> pyarrow Table, 'shuffle' -> Dataset (same trade-off as
    grouped_agg).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    n = len(keys)
    if grouping == "rollup":
        included = [keys[:i] for i in range(n, -1, -1)]
    elif grouping == "cube":
        from itertools import combinations

        included = [list(c) for r in range(n, -1, -1)
                    for c in combinations(keys, r)]
    elif isinstance(grouping, (list, tuple)):
        included = []
        for s in grouping:
            s = [s] if isinstance(s, str) else list(s)
            bad = [k for k in s if k not in keys]
            if bad:
                raise ValueError(f"grouping set key(s) {bad} not in keys")
            included.append([k for k in keys if k in s])  # canonical order
        if len({tuple(s) for s in included}) != len(included):
            raise ValueError("duplicate grouping sets")
    else:
        raise ValueError(
            f"grouping must be rollup|cube|list of sets, got {grouping!r}")
    gsets = []
    for gkeys in included:
        gid = sum(1 << (n - 1 - i) for i, k in enumerate(keys)
                  if k not in gkeys)
        kern, plan = _partial_kernel(gkeys + ["__gid"], spec)
        gsets.append((gid, gkeys, kern))

    def _null_like(field_type: pa.DataType, index) -> pd.Series:
        if pa.types.is_integer(field_type):
            return pd.Series(pd.NA, index=index, dtype="Int64")
        if pa.types.is_floating(field_type):
            return pd.Series(np.nan, index=index, dtype="float64")
        return pd.Series([None] * len(index), index=index, dtype=object)

    def typed_partial(t: pa.Table) -> pa.Table:
        df = canon_int_keys(t, keys)
        df["__gid"] = np.int64(0)
        outs = []
        for gid, gkeys, kern in gsets:
            df["__gid"] = np.int64(gid)
            sub = kern(df)
            for k in keys:
                if k not in gkeys:
                    sub[k] = _null_like(
                        t.schema.field(t.schema.get_field_index(k)).type,
                        sub.index)
            outs.append(sub[[*keys, "__gid",
                             *[c for c in sub.columns
                               if c not in keys and c != "__gid"]]])
        return restore_types(pd.concat(outs, ignore_index=True),
                             t.schema, only=keys)

    _, plan = _partial_kernel(keys + ["__gid"], spec)
    gkeys_all = keys + ["__gid"]
    partial = ds.map_batches(typed_partial, batch_format="pyarrow")

    def _finish(df: pd.DataFrame, in_sch: pa.Schema) -> pa.Table:
        out = _combine_frame(df, gkeys_all, spec, plan)
        out = out.rename(columns={"__gid": grouping_col})
        out[grouping_col] = out[grouping_col].astype(np.int64)
        return restore_types(out, in_sch, only=keys)

    if combine == "driver":
        from .relational import collect_table

        tbl = collect_table(partial)
        return _finish(canon_int_keys(tbl, gkeys_all), tbl.schema)

    n_parts = 64

    def add_part(t: pa.Table) -> pa.Table:
        df = canon_int_keys(t, gkeys_all)
        h = pd.util.hash_pandas_object(df[gkeys_all], index=False).to_numpy()
        df["__part"] = (h % n_parts).astype(np.int32)
        return restore_types(df, t.schema, only=keys)

    def final(t: pa.Table) -> pa.Table:
        return _finish(canon_int_keys(t, gkeys_all).drop(columns="__part"),
                       t.schema)

    parted = partial.map_batches(add_part, batch_format="pyarrow")
    from ..stages.exchange import hash_exchange

    return hash_exchange(parted, n_parts, final, part_col="__part")


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


def exact_quantiles_continuous(ds, col: str, qs, n_bins: int = 4096,
                               collect_threshold: int = 200_000,
                               max_rounds: int = 12):
    """EXACT quantiles of a CONTINUOUS double column at streaming scale.

    exact_quantiles above bounds its shuffle by the number of DISTINCT
    values — the right tool for integers/cents, ruinous for raw
    doubles. This variant never ships the value multiset. Iterative
    histogram refinement, driver-coordinated:

      round 0: one streaming pass -> global [min, max] + row count;
      round k: one streaming pass computing, for every still-active
        quantile target, an n_bins histogram of its current candidate
        interval (all targets share the pass); the driver locates the
        bin holding each target rank and narrows the interval — a
        ~n_bins-fold narrowing per round;
      finish: when a target's interval holds <= collect_threshold rows,
        one final filtered pass collects JUST those rows and picks the
        rank element exactly.

    Rank semantics match DuckDB quantile_disc: 0-based index
    max(0, ceil(q*n) - 1) into the sorted multiset — the result is an
    actual data value, so an oracle compare is exact with no rounding.
    Returns a pyarrow Table with one column per quantile (q50, q90...).

    At 100 TB: each round is a streaming map + a tiny (targets x n_bins)
    reduction; rounds needed ~ log_{n_bins}(n / collect_threshold) — 2
    or 3 in practice. Nothing row-sized ever reaches the driver except
    the final <= collect_threshold candidate slice per target.
    """
    import math

    from .relational import collect_table

    qs = list(qs)

    def stats_pass(t: pa.Table) -> pa.Table:
        v = np.asarray(t[col], dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return pa.table({"n": pa.array([0], pa.int64()),
                             "lo": pa.array([np.inf]),
                             "hi": pa.array([-np.inf])})
        return pa.table({"n": pa.array([len(v)], pa.int64()),
                         "lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())])})

    st = collect_table(ds.map_batches(stats_pass, batch_format="pyarrow"))
    n = int(np.asarray(st["n"]).sum())
    if n == 0:
        return pa.table({f"q{int(round(q * 100))}":
                         pa.array([None], pa.float64()) for q in qs})
    glo = float(np.asarray(st["lo"]).min())
    ghi = float(np.asarray(st["hi"]).max())
    # per-target state: candidate interval [lo, hi] guaranteed to hold
    # the rank element; rank stays GLOBAL — every pass recounts v < lo
    # exactly, so boundary fuzz can widen the interval but never corrupt
    # the rank bookkeeping
    targets = [{"lo": glo, "hi": ghi,
                "rank": max(0, int(math.ceil(q * n)) - 1), "count": n}
               for q in qs]

    for _ in range(max_rounds):
        active = [i for i, tg in enumerate(targets)
                  if tg["count"] > collect_threshold
                  and tg["hi"] > tg["lo"]]
        if not active:
            break
        spans = [(targets[i]["lo"], targets[i]["hi"]) for i in active]

        def hist_pass(t: pa.Table, spans=tuple(spans)) -> pa.Table:
            v = np.asarray(t[col], dtype=np.float64)
            v = v[~np.isnan(v)]
            rows = {}
            for si, (lo, hi) in enumerate(spans):
                width = (hi - lo) / n_bins
                sel = v[(v >= lo) & (v <= hi)]
                if width <= 0:
                    h = np.zeros(n_bins, dtype=np.int64)
                    h[0] = len(sel)
                else:
                    idx = np.clip(((sel - lo) / width).astype(np.int64),
                                  0, n_bins - 1)
                    h = np.bincount(idx, minlength=n_bins)
                rows[f"h{si}"] = h.astype(np.int64)
                rows[f"b{si}"] = np.zeros(n_bins, dtype=np.int64)
                rows[f"b{si}"][0] = int((v < lo).sum())
            return pa.table(rows)

        ht = collect_table(ds.map_batches(hist_pass, batch_format="pyarrow"))
        progressed = False
        for si, i in enumerate(active):
            tg = targets[i]
            h = np.asarray(ht[f"h{si}"]).reshape(-1, n_bins).sum(axis=0)
            n_below = int(np.asarray(ht[f"b{si}"]).sum())
            rank_in = tg["rank"] - n_below
            cum = np.cumsum(h)
            if rank_in < 0 or rank_in >= cum[-1]:
                # interval drifted off the rank element (should not
                # happen; nudge guards below) — stop narrowing, the
                # final collect still recounts exactly
                continue
            b = int(np.searchsorted(cum, rank_in + 1))
            lo, hi = tg["lo"], tg["hi"]
            width = (hi - lo) / n_bins
            in_bin = int(h[b])
            # nudge: a value whose float bin index wobbled onto b can
            # sit up to ~1e-12 bins outside the exact bounds
            pad = width * 1e-9
            new_lo = max(lo, lo + b * width - pad)
            new_hi = min(hi, lo + (b + 1) * width + pad)
            if in_bin >= tg["count"] and new_lo <= lo and new_hi >= hi:
                tg["count"] = in_bin
                continue  # mass concentrated: no further narrowing
            progressed = True
            tg.update({"lo": new_lo, "hi": new_hi, "count": in_bin})
        if not progressed:
            break

    # final exact collection per target (shared pass): the candidate
    # slice plus an exact recount of values below it
    spans = [(tg["lo"], tg["hi"]) for tg in targets]

    def collect_pass(t: pa.Table, spans=tuple(spans)) -> pa.Table:
        v = np.asarray(t[col], dtype=np.float64)
        v = v[~np.isnan(v)]
        rows = {}
        for si, (lo, hi) in enumerate(spans):
            sel = v[(v >= lo) & (v <= hi)]
            rows[f"v{si}"] = pa.array([sel.tolist()],
                                      pa.list_(pa.float64()))
            rows[f"b{si}"] = pa.array([int((v < lo).sum())], pa.int64())
        return pa.table(rows)

    ct = collect_table(ds.map_batches(collect_pass, batch_format="pyarrow"))
    out = {}
    for si, (q, tg) in enumerate(zip(qs, targets)):
        vals = np.concatenate([np.asarray(chunk, dtype=np.float64)
                               for chunk in ct[f"v{si}"].to_pylist()])
        n_below = int(np.asarray(ct[f"b{si}"]).sum())
        vals.sort(kind="mergesort")
        out[f"q{int(round(q * 100))}"] = pa.array(
            [float(vals[tg["rank"] - n_below])], pa.float64())
    return pa.table(out)
