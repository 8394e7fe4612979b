"""Windowed aggregates + as-of joins over event streams.

Streaming-only concepts per SURVEY §2.10: the reference has none;
engine-side, 'streaming' is Ray Data's pipelined block execution, and
event-time semantics are expressed as deterministic window keys:

  * tumbling windows: window key = epoch // width (pure map, combiner
    aggregation — no per-event shuffle);
  * sliding windows: each event flat-maps into the windows covering it,
    then the same combiner aggregation;
  * as-of join: bucket both sides by key, per-bucket pandas merge_asof
    (sort-merge within co-located buckets — the guide's portable
    pattern).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._pdarrow import arrow_groups, cents_half_away
from ..stages.exchange import hash_exchange
import pyarrow.compute as pc


def _epoch_us(col: pa.ChunkedArray) -> np.ndarray:
    return np.asarray(pc.cast(col, pa.int64()))


def align_union_schema(ds_a, ds_b):
    """Pad both Datasets with typed null columns so their schemas match
    (same names, same order) before a union — mismatched block schemas
    trigger per-bundle warnings and pandas dtype upcasts downstream."""
    sa, sb = ds_a.schema(), ds_b.schema()
    # a pipeline over zero input rows reports schema None — there is
    # nothing to pad on that side, so align to whichever side has one
    # (both None: the union of two empties needs no alignment)
    if sa is None and sb is None:
        return ds_a, ds_b
    if sa is None:
        sa = sb
    if sb is None:
        sb = sa
    names = list(sa.names) + [n for n in sb.names if n not in sa.names]
    types = {}
    for s in (sa, sb):
        for n, t in zip(s.names, s.types):
            types.setdefault(n, t)

    def pad(t: pa.Table) -> pa.Table:
        cols = []
        for n in names:
            if n in t.column_names:
                cols.append(pc.cast(t[n], types[n]))
            else:
                cols.append(pa.nulls(len(t), types[n]))
        return pa.table(dict(zip(names, cols)))

    return ds_a.map_batches(pad, batch_format="pyarrow"), \
        ds_b.map_batches(pad, batch_format="pyarrow")


def tumbling_window_agg(ds, ts_col: str, width_s: float, keys, spec,
                        combine: str = "shuffle"):
    """Aggregate per (window, *keys). spec as in functions.agg.grouped_agg.
    Adds window_start (epoch seconds, int64).

    combine defaults to "shuffle": the (window x key) partial space grows
    without bound over long time ranges, so streaming partials to the
    driver (combine="driver") is only safe for short interactive
    windows — pass it explicitly when that is known."""
    from .agg import grouped_agg

    width_us = int(width_s * 1_000_000)

    def add_window(t: pa.Table) -> pa.Table:
        us = _epoch_us(t[ts_col])
        start = (us // width_us) * width_us // 1_000_000
        return t.append_column("window_start", pa.array(start, pa.int64()))

    keyed = ds.map_batches(add_window, batch_format="pyarrow")
    keys = [keys] if isinstance(keys, str) else list(keys)
    return grouped_agg(keyed, ["window_start"] + keys, spec, combine=combine)


def sliding_window_agg(ds, ts_col: str, width_s: float, slide_s: float, keys, spec,
                       combine: str = "shuffle"):
    """Overlapping windows: event at t belongs to every window
    [k*slide, k*slide + width) containing t — flat-map into window rows,
    then combiner aggregation."""
    from .agg import grouped_agg

    width_us = int(width_s * 1_000_000)
    slide_us = int(slide_s * 1_000_000)
    n_windows = int(np.ceil(width_us / slide_us))

    def explode(t: pa.Table) -> pa.Table:
        us = _epoch_us(t[ts_col])
        parts = []
        for k in range(n_windows):
            start = ((us - k * slide_us) // slide_us) * slide_us
            ok = (us >= start) & (us < start + width_us)
            sub = t.filter(pa.array(ok))
            if len(sub):
                parts.append(sub.append_column(
                    "window_start",
                    pa.array((start[ok] // 1_000_000).astype(np.int64), pa.int64()),
                ))
        if not parts:
            return t.slice(0, 0).append_column("window_start", pa.array([], pa.int64()))
        return pa.concat_tables(parts)

    keyed = ds.map_batches(explode, batch_format="pyarrow")
    keys = [keys] if isinstance(keys, str) else list(keys)
    return grouped_agg(keyed, ["window_start"] + keys, spec, combine=combine)


def asof_join(left_ds, right_ds, key: str, ts_left: str, ts_right: str,
              right_cols, n_buckets: int = 32, direction: str = "backward",
              tie_break: str | None = None):
    """For each left row, the latest right row with ts_right <= ts_left
    (direction='backward') or the earliest with ts_right >= ts_left
    (direction='forward') sharing `key`. Bucketed sort-merge: both sides
    shuffle once on key%%B; merge_asof runs per bucket.

    right_cols: columns of the right side to carry (suffixed _right if
    clashing).

    tie_break: column used to pick ONE right row when several share the
    same (key, ts_right) — the row with the maximum tie_break value wins.
    Without it, merge_asof's pick among tied timestamps depends on block
    arrival order and is nondeterministic across runs. Defaults to the
    first entry of right_cols."""
    if tie_break is None and right_cols:
        tie_break = right_cols[0]

    def add_bucket(col):
        def kernel(t: pa.Table) -> pa.Table:
            b = (np.asarray(t[col], dtype=np.int64) % n_buckets).astype(np.int32)
            return t.append_column("__bucket", pa.array(b, pa.int32()))

        return kernel

    lt = left_ds.map_batches(add_bucket(key), batch_format="pyarrow")
    lt = lt.map_batches(
        lambda t: t.append_column("__side", pa.array(np.zeros(len(t), np.int8))),
        batch_format="pyarrow",
    )
    rt = right_ds.map_batches(add_bucket(key), batch_format="pyarrow")
    rt = rt.map_batches(
        lambda t: t.append_column("__side", pa.array(np.ones(len(t), np.int8))),
        batch_format="pyarrow",
    )

    lcols = list(left_ds.schema().names)
    rhs_cols = [key, ts_right] + [c for c in right_cols if c not in (key, ts_right)]

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # explicit column lists — never infer sides via dropna(how="all"),
        # which drops EVERY column of a zero-row side and breaks buckets
        # where one side is empty
        lhs = df[df["__side"] == 0][lcols]
        lhs = lhs.sort_values(ts_left, kind="mergesort")
        rhs = df[df["__side"] == 1][rhs_cols]
        if tie_break is not None and tie_break in rhs.columns:
            # Deterministic tie-break: keep the max-tie_break row per
            # (key, ts_right). Sorting by [ts_right, tie_break] keeps the
            # ts ordering merge_asof requires while making keep="last"
            # pick the maximum.
            rhs = rhs.sort_values([ts_right, tie_break], kind="mergesort")
            rhs = rhs.drop_duplicates(subset=[key, ts_right], keep="last")
        else:
            rhs = rhs.sort_values(ts_right, kind="mergesort")
        if len(lhs) == 0:
            return lhs
        if len(rhs) == 0:
            for c in [ts_right] + list(right_cols):
                lhs[c] = None
            return lhs
        return pd.merge_asof(
            lhs, rhs, left_on=ts_left, right_on=ts_right, by=key,
            direction=direction, suffixes=("", "_right"),
        )

    # static union pad from the INPUT schemas: a zero-row side reports
    # schema None after the bucket-tag maps, and aligning to only the
    # non-empty side would drop its columns (KeyError in merge_bucket's
    # explicit column selects)
    sl, sr = left_ds.schema(), right_ds.schema()
    if sl is None:
        return left_ds  # no left rows -> no output rows
    if sr is None:
        # no right rows: every left row stands alone with null right
        # columns (same shape merge_bucket's empty-rhs branch emits)
        extra = [ts_right] + [c for c in right_cols
                              if c not in (key, ts_right)]

        def left_only(t: pa.Table) -> pa.Table:
            for c in extra:
                name = c if c not in t.column_names else c + "_right"
                t = t.append_column(name, pa.nulls(len(t)))
            return t

        return left_ds.map_batches(left_only, batch_format="pyarrow")
    fields: dict = {}
    for s in (sl, sr):
        if s is not None:
            for n, ty in zip(s.names, s.types):
                fields.setdefault(n, ty)
    fields["__bucket"] = pa.int32()
    fields["__side"] = pa.int8()

    def pad(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {}
        for n, ty in fields.items():
            cols[n] = (pc.cast(t[n], ty) if n in t.column_names
                       else pa.nulls(len(t), ty))
        return pa.table(cols)

    lt = lt.map_batches(pad, batch_format="pyarrow")
    rt = rt.map_batches(pad, batch_format="pyarrow")
    both = lt.union(rt)
    empty = pa.table({n: pa.nulls(0, ty) for n, ty in fields.items()})
    return hash_exchange(both, n_buckets, arrow_groups(merge_bucket),
                         part_col="__bucket", empty=empty)


def sessionize(ds, key: str, ts_col: str, gap_s: float, id_cols=(),
               tie_col: str | None = None, n_parts: int = 64):
    """Gap-based sessionization: within each key, events sorted by
    (ts, tie_col) start a new session whenever the gap to the previous
    event exceeds gap_s. Emits session_seq (0-based per key).

    Shuffle shape: ONE groupby on a COARSE partition of the key
    (key %% n_parts) — same co-location guarantee as groupby(key), but
    the per-group map_groups overhead is paid n_parts times instead of
    once per key (Ray's per-group cost dominates with many small
    groups). Inside a partition all keys are sessionized in one
    vectorized pass: sort by (key, ts, tie), new-session flags where
    the gap exceeds gap_s or the key changes, per-key cumsum via
    a grouped cumulative sum."""
    gap_us = int(gap_s * 1_000_000)
    id_cols = list(id_cols)

    def add_part(t: pa.Table) -> pa.Table:
        p = (np.asarray(t[key], dtype=np.int64) % n_parts).astype(np.int32)
        return t.append_column("__part", pa.array(p, pa.int32()))

    parted = ds.map_batches(add_part, batch_format="pyarrow")

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        order = [key, ts_col] + ([tie_col] if tie_col else [])
        df = df.sort_values(order, kind="mergesort").reset_index(drop=True)
        ts = df[ts_col].to_numpy()
        if np.issubdtype(ts.dtype, np.datetime64):
            us = ts.astype("datetime64[us]").astype(np.int64)
        else:
            us = ts.astype(np.int64)
        keys = df[key].to_numpy()
        n = len(df)
        if n == 0:
            return df[[key] + id_cols + [ts_col]].assign(session_seq=[])
        gaps = np.diff(us, prepend=us[0])
        key_change = np.empty(n, dtype=bool)
        key_change[0] = True
        key_change[1:] = keys[1:] != keys[:-1]
        new_sess = ((gaps > gap_us) & ~key_change).astype(np.int64)
        # per-key cumulative count: global cumsum minus the value carried
        # in from before each key's first row
        c = np.cumsum(new_sess)
        carried = np.where(key_change, c - new_sess, 0)
        df["session_seq"] = c - np.maximum.accumulate(
            np.where(key_change, carried, -1))
        return df[[key] + id_cols + [ts_col, "session_seq"]]

    return hash_exchange(parted, n_parts, arrow_groups(per_part),
                         part_col="__part")


def interval_join(left_ds, intervals_ds, t_col: str, start_col: str,
                  end_col: str, bucket: int, n_buckets: int = 32,
                  n_salts: int = 1):
    """Large x large point-in-interval join — the 1-D time-domain analog
    of stages/join.cell_spatial_join: each interval is exploded to the
    integer buckets it covers (vectorized np.repeat, bounded fan-out
    when `bucket` ~ the median interval length), each point carries its
    single bucket, both sides meet through one hash-bucket equi-join
    (relational.bucketed_join), and an exact start <= t <= end refine
    follows. A point lies in exactly one bucket, so every matching
    (point, interval) pair is emitted exactly once — no dedup pass.

    All three of t_col/start_col/end_col must be int64-comparable (e.g.
    epoch microseconds); `bucket` is in the same unit.
    """
    from .relational import bucketed_join

    def tag(t: pa.Table) -> pa.Table:
        v = np.asarray(t[t_col], dtype=np.int64)
        return t.append_column("__b", pa.array(v // int(bucket)))

    def explode(t: pa.Table) -> pa.Table:
        s = np.asarray(t[start_col], dtype=np.int64)
        e = np.asarray(t[end_col], dtype=np.int64)
        b0 = s // int(bucket)
        n = e // int(bucket) - b0 + 1
        rep = np.repeat(np.arange(len(t), dtype=np.int64), n)
        offs = np.zeros(len(t) + 1, dtype=np.int64)
        np.cumsum(n, out=offs[1:])
        local = np.arange(int(offs[-1]), dtype=np.int64) - offs[rep]
        out = t.take(pa.array(rep))
        return out.append_column("__b", pa.array(b0[rep] + local))

    lt = left_ds.map_batches(tag, batch_format="pyarrow")
    it = intervals_ds.map_batches(explode, batch_format="pyarrow")
    joined = bucketed_join(lt, it, key="__b", n_buckets=n_buckets,
                           n_salts=n_salts)

    def refine(t: pa.Table) -> pa.Table:
        v = np.asarray(t[t_col], dtype=np.int64)
        keep = ((v >= np.asarray(t[start_col], dtype=np.int64))
                & (v <= np.asarray(t[end_col], dtype=np.int64)))
        return t.filter(pa.array(keep)).drop_columns(["__b"])

    return joined.map_batches(refine, batch_format="pyarrow")


def rolling_mean(ds, key: str, ts_col: str, value_col: str,
                 window_rows: int, tie_col: str, out_col: str = "roll_mean",
                 n_parts: int = 64):
    """Row-based rolling mean per key: for each row (ordered by
    ts_col, tie_col within its key), the mean of value over the current
    and preceding window_rows-1 rows — the per-entity trailing-window
    signal (fraud velocity, rate smoothing).

    Scale shape: one coarse hash-partition shuffle on the key (all rows
    of a key co-locate, same as sessionize), then a vectorized pandas
    sort + grouped rolling per partition — never a task per key.

    Exactness contract: values are summed as ROUND(value*100) cents
    (int64, order-independent), the mean divides once in float64, and
    the result is ROUNDed — so the SQL window-function twin reproduces
    identical doubles.
    """
    import pandas as pd

    from ._pdarrow import arrow_groups, cents_half_away

    def add_part(t: pa.Table) -> pa.Table:
        h = np.asarray(t[key], dtype=np.int64)
        return t.append_column(
            "__part", pa.array((h % n_parts).astype(np.int32)))

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, tie_col], kind="mergesort")
        cents = cents_half_away(df[value_col].to_numpy(dtype=np.float64))
        df = df.assign(__cents=cents)
        g = df.groupby(key, sort=False)["__cents"]
        s = g.rolling(window_rows, min_periods=1).sum() \
             .reset_index(level=0, drop=True)
        c = g.rolling(window_rows, min_periods=1).count() \
             .reset_index(level=0, drop=True)
        mean = np.round(s.to_numpy() / (100.0 * c.to_numpy()), 6) + 0.0
        out = df[[tie_col]].copy()
        out[out_col] = mean
        return out

    parted = ds.map_batches(add_part, batch_format="pyarrow")
    return hash_exchange(parted, n_parts, arrow_groups(per_part),
                         part_col="__part")


def funnel_counts(ds, user_col: str, ts_col: str, type_col: str,
                  stages, n_parts: int = 64):
    """Ordered funnel analysis: for a sequence of stage event types
    (e.g. view -> click -> purchase), count the users who reached each
    stage IN ORDER — stage k counts a user iff some stage-k event falls
    strictly after the user's chosen stage-(k-1) event, where "chosen"
    is the EARLIEST qualifying event (classic first-touch funnel; the
    product-analytics op a clickstream pipeline runs per release).

    Returns one row per stage: (stage_idx int64, stage string,
    n_users int64).

    Scale shape: project to (user, epoch-us, type) and filter to the
    stage types inside map_batches (everything else never enters the
    exchange), then ONE coarse hash-partition shuffle on the user key —
    all of a user's stage events co-locate, per-partition work is a
    vectorized pandas pass (grouped mins + merges, one per stage, no
    Python per user) — then a tiny combiner sum of per-partition stage
    counts. Timestamps compare as integer microseconds so "strictly
    after" is exact and the SQL twin reproduces it bit-for-bit.
    """
    import pandas as pd

    from ._pdarrow import arrow_groups, cents_half_away

    stages = list(stages)

    def project(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.is_in(t[type_col], value_set=pa.array(stages))
        t = t.filter(keep)
        us = _epoch_us(t[ts_col])
        h = np.asarray(t[user_col], dtype=np.int64)
        return pa.table({
            user_col: t[user_col],
            "__t": pa.array(us, pa.int64()),
            type_col: t[type_col],
            "__part": pa.array((h % n_parts).astype(np.int32)),
        })

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        counts = np.zeros(len(stages), dtype=np.int64)
        if len(df):
            # reached: per-user epoch-us of the chosen event at the
            # current stage; starts as the first stage's per-user min
            cur = (df[df[type_col] == stages[0]]
                   .groupby(user_col)["__t"].min())
            counts[0] = len(cur)
            for k in range(1, len(stages)):
                if cur.empty:
                    break
                nxt = df[df[type_col] == stages[k]].merge(
                    cur.rename("__prev"), left_on=user_col,
                    right_index=True)
                nxt = nxt[nxt["__t"] > nxt["__prev"]]
                cur = nxt.groupby(user_col)["__t"].min()
                counts[k] = len(cur)
        return pd.DataFrame({
            "stage_idx": np.arange(len(stages), dtype=np.int64),
            "stage": stages,
            "n_users": counts,
        })

    parted = ds.map_batches(project, batch_format="pyarrow")
    per = hash_exchange(parted, n_parts, arrow_groups(per_part),
                         part_col="__part")

    from .agg import grouped_agg

    out = grouped_agg(per, ["stage_idx", "stage"],
                      {"n_users": ("n_users", "sum")}, combine="driver")

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "stage_idx": pc.cast(t["stage_idx"], pa.int64()),
            "stage": t["stage"],
            "n_users": pc.cast(t["n_users"], pa.int64()),
        })

    if isinstance(out, pa.Table):
        return finish(out)
    return out.map_batches(finish, batch_format="pyarrow")


def transition_counts(ds, key: str, ts_col: str, type_col: str,
                      tie_col: str, n_parts: int = 64):
    """Markov transition counts over per-key event sequences: for each
    consecutive (by ts, tie_col) pair of events of the same key, count
    (prev_type, next_type) — the clickstream transition-matrix op.

    Shuffle shape: ONE coarse key-hash partition co-locates each key's
    events (same guarantee as sessionize above); inside a partition the
    pairing is a vectorized shift over the (key, ts, tie) sort; the
    (|types|^2-bounded) pair counts then combine through grouped_agg's
    combiner. The transition matrix itself never exceeds |types|^2 rows.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from .agg import grouped_agg

    def add_part(t: pa.Table) -> pa.Table:
        # NULL keys hash to one deterministic partition (SQL PARTITION BY
        # groups all NULLs together — they must co-locate like any key)
        h = pc.fill_null(pc.cast(t[key], pa.int64()), -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        p = (h % n_parts).astype(np.int32)
        return t.append_column("__part", pa.array(p, pa.int32()))

    parted = ds.map_batches(add_part, batch_format="pyarrow")

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, tie_col],
                            kind="mergesort").reset_index(drop=True)
        if len(df) < 2:
            return pd.DataFrame({"prev_type": pd.Series([], dtype=object),
                                 "next_type": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        # factorize keys so NULL forms ONE group (NaN != NaN would
        # silently break every null-key sequence apart)
        codes, _ = pd.factorize(df[key], use_na_sentinel=False)
        same = codes[:-1] == codes[1:]
        types = df[type_col].to_numpy(dtype=object)
        out = pd.DataFrame({"prev_type": types[:-1][same],
                            "next_type": types[1:][same]})
        # dropna=False: transitions to/from a NULL event type are rows,
        # exactly as the LEAD-based SQL GROUP BY keeps them
        g = (out.groupby(["prev_type", "next_type"], sort=False,
                         dropna=False)
             .size().rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    from ._pdarrow import arrow_groups, cents_half_away

    partial = hash_exchange(parted, n_parts, arrow_groups(per_part),
                         part_col="__part")
    return grouped_agg(partial, ["prev_type", "next_type"],
                       {"n": ("n", "sum")}, combine="shuffle")


def running_total(ds, key: str, ts_col: str, value_col: str, tie_col: str,
                  out_col: str = "running_c", n_parts: int = 64):
    """Per-key running cumulative sum (SUM OVER ROWS UNBOUNDED
    PRECEDING) of value in (ts, tie) order — the classic window
    function (account balances, cumulative spend), emitted as exact
    int64 cents so the exchange and the oracle compare carry no float
    summation order.

    Scale shape: the same single coarse key co-location shuffle as
    sessionize/rolling above, vectorized per-partition sort + grouped
    cumsum."""
    import pandas as pd

    from ._pdarrow import arrow_groups, cents_half_away

    def add_part(t: pa.Table) -> pa.Table:
        h = np.asarray(t[key], dtype=np.int64)
        return t.append_column(
            "__part", pa.array((h % n_parts).astype(np.int32)))

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, tie_col], kind="mergesort")
        cents = cents_half_away(df[value_col].to_numpy(dtype=np.float64))
        df = df.assign(__cents=cents)
        run = df.groupby(key, sort=False)["__cents"].cumsum()
        out = df[[key, tie_col]].copy()
        out[out_col] = run.to_numpy(np.int64)
        return out

    parted = ds.map_batches(add_part, batch_format="pyarrow")
    return hash_exchange(parted, n_parts, arrow_groups(per_part),
                         part_col="__part")
