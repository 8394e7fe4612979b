"""Relational building blocks on ray.data.Dataset, scale-first.

Join strategy (SURVEY.md §4 'Broadcast'): the engine broadcasts the
SMALLER side — `ray.put` an Arrow table once, join inside map_batches
with pyarrow's vectorized hash join (acero) per batch. No shuffle of the
big side. For large×large joins use bucketed_join (hash-partition both
sides on the key via groupby, join per bucket) — an explicit partitioned
hash join, the portable Ray Data pattern.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ._pdarrow import arrow_groups


def collect_table(ds_or_table) -> pa.Table:
    """Materialize a SMALL Dataset to one Arrow table (driver side).
    Only for dimension tables / aggregates, never the main input.

    Consumes the pipeline EXACTLY ONCE via iter_internal_ref_bundles +
    driver-side block conversion. Dataset.to_arrow_refs() would execute
    the plan and then call schema(fetch_if_missing=True), which — on a
    non-materialized lineage — executes the ENTIRE plan a second time
    (ray 2.49 dataset.py:5834-5840); that silently doubled the cost of
    every driver-combined aggregate."""
    if isinstance(ds_or_table, pa.Table):
        return ds_or_table
    import ray
    from ray.data.block import BlockAccessor

    refs = [br for bundle in ds_or_table.iter_internal_ref_bundles()
            for br in bundle.block_refs]
    tables = [BlockAccessor.for_block(b).to_arrow() for b in ray.get(refs)]
    parts = [t for t in tables if t.num_rows]
    if not parts:
        if tables:
            # zero rows but typed blocks exist: keep their schema
            return tables[0]
        # zero BLOCKS: schema() may re-execute, but an all-empty plan is
        # the rare cheap case
        sch = ds_or_table.schema() if hasattr(ds_or_table, "schema") else None
        if sch is None:
            return pa.table({})
        sch = getattr(sch, "base_schema", sch)
        return (sch.empty_table() if isinstance(sch, pa.Schema)
                else pa.table({}))
    return pa.concat_tables(parts, promote_options="permissive").combine_chunks()


class JoinSmall:
    """Actor-pool kernel: batch JOIN broadcast small table (pyarrow acero).

    join_type: 'inner' | 'left outer' | 'left semi' | 'left anti'
    """

    def __init__(self, small_ref, keys, right_keys=None, join_type="inner",
                 small_cols=None):
        import ray

        small = ray.get(small_ref) if not isinstance(small_ref, pa.Table) else small_ref
        if small_cols:
            small = small.select(small_cols)
        self.small = small.combine_chunks()
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.right_keys = (
            self.keys if right_keys is None
            else ([right_keys] if isinstance(right_keys, str) else list(right_keys))
        )
        self.join_type = join_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.join(
            self.small, keys=self.keys, right_keys=self.right_keys,
            join_type=self.join_type,
        )


def broadcast_join(big_ds, small, keys, right_keys=None, join_type="inner",
                   small_cols=None, concurrency=None):
    """big Dataset ⋈ small table/Dataset without shuffling the big side.

    Runs as PLAIN-FUNCTION tasks with a per-worker-process cache of the
    broadcast table (stages/worker_cache.py): the table rides ONE
    ray.put, each standing worker fetches it zero-copy once, and — unlike
    an actor-pool stage — no processes spin up per execution (a 32-actor
    pool costs ~4s of startup EVERY run; the task path costs none).
    `concurrency` caps concurrent tasks when set (default: let the
    scheduler use the whole worker pool)."""
    import ray

    from ..stages.worker_cache import get_cached

    small_tbl = collect_table(small)
    if small_cols:
        small_tbl = small_tbl.select(small_cols)
    small_ref = ray.put(small_tbl.combine_chunks())
    keys_l = [keys] if isinstance(keys, str) else list(keys)
    rkeys_l = (keys_l if right_keys is None
               else [right_keys] if isinstance(right_keys, str)
               else list(right_keys))

    def join_small(batch: pa.Table) -> pa.Table:
        s = get_cached(small_ref)
        return batch.join(s, keys=keys_l, right_keys=rkeys_l,
                          join_type=join_type)

    kwargs = {}
    if concurrency is not None and not isinstance(concurrency, tuple):
        kwargs["concurrency"] = concurrency
    return big_ds.map_batches(join_small, batch_format="pyarrow", **kwargs)


def bucketed_join(left_ds, right_ds, key: str, n_buckets: int = 32,
                  join_type: str = "inner", n_salts: int = 1,
                  right_schema: pa.Schema | None = None,
                  left_schema: pa.Schema | None = None,
                  bucket_fn=None):
    """Large×large partitioned hash join: add bucket = hash(key) % B to both
    sides, then join per bucket inside map_groups. The all-to-all cost is
    one groupby shuffle per side; B bounds per-task memory.

    join_type: 'inner' | 'left outer' | 'left semi' | 'left anti' |
    'full outer' (full outer is incompatible with n_salts > 1 — the
    right-side replication would duplicate unmatched right rows).

    n_salts > 1 is the HOT-KEY guard: every left row additionally takes an
    arbitrary salt in [0, n_salts) (salting is pure load-splitting — the
    join result is identical for ANY assignment) and every right row is
    replicated to all n_salts shards of its bucket, so a single dominant
    key (one grid cell holding a city's worth of points) spreads across
    n_salts tasks at the cost of n_salts x |right| exchange volume —
    the classic skew-join trade, same rationale as stages/shuffle.py's
    salted aggregation.

    right_schema / left_schema: TRUSTED schema hints that skip the
    `ds.schema()` probe for that side entirely. Two reasons to pass one:
      1. PERFORMANCE — `schema()` on a side that sits downstream of an
         all-to-all (a grouped_agg, another bucketed_join, a map_groups)
         executes that whole upstream shuffle just to learn the column
         names, and the real execution then runs it AGAIN (Ray does not
         cache non-materialized lineage). A hint makes the chained join
         single-execution. Any call site whose input is post-shuffle and
         whose columns are statically known should pass one.
      2. EMPTY-LAZY CORRECTNESS — a zero-row lazy side reports schema
         None; without a hint a 'left outer' join against it returns the
         left rows with NO right columns, so a downstream select of a
         right column KeyErrors only in the empty-lazy case. WITH the
         hint the right columns are appended as typed nulls (the general
         per-bucket acero path pads them; same contract as asof_join's
         non-lazy empty path).

    bucket_fn: optional Arrow-table kernel applied to each bucket's
    joined table INSIDE the co-partition task. When the join key
    functionally determines the group, a group-by here sees COMPLETE
    groups — the place to fold the post-join aggregation into the same
    all-to-all instead of paying a second shuffle. Must be pure and
    schema-stable (empty bucket in, typed empty out). Note: with
    n_salts > 1 a key's rows SPLIT across salt shards, so group-complete
    aggregation inside bucket_fn is only exact when n_salts == 1."""
    import pyarrow.compute as pc

    # a zero-row LAZY side can report schema None (Ray cannot infer a
    # schema with no blocks to run the maps on): the join result is then
    # fully determined without any shuffle. inner/semi with an unknowable
    # side are empty; anti/left-outer with an unknowable RIGHT return the
    # left rows as-is (left outer pads the right columns as typed nulls
    # when the right_schema hint supplies their types).
    if join_type == "full outer" and n_salts != 1:
        raise ValueError("full outer join cannot be salted")
    sl = left_schema if left_schema is not None else left_ds.schema()
    sr = right_schema if right_schema is not None else right_ds.schema()
    if sl is None:
        # unknowable empty left: full outer degenerates to the right
        # rows (left columns unknowable — same caveat as the left-outer
        # empty-right case below)
        return right_ds if join_type == "full outer" else left_ds
    if sr is None:
        if join_type in ("left anti", "left outer", "full outer"):
            return left_ds
        return left_ds.map_batches(lambda t: t.slice(0, 0),
                                   batch_format="pyarrow")

    def _bucket_of(col: pa.ChunkedArray) -> pa.Array:
        # NULL keys never equi-match, so their bucket only needs to be
        # deterministic (left-outer keeps the row whichever bucket it
        # lands in) — fill_null before bucketing instead of crashing on
        # the null->numpy conversion / garbage NaN->int casts.
        if pa.types.is_integer(col.type):
            h = pc.fill_null(pc.cast(col, pa.int64()), 0)
            if (n_buckets & (n_buckets - 1)) == 0:
                b = pc.bit_wise_and(h, n_buckets - 1)
                return pc.cast(b, pa.int32())
            # this pyarrow has no modulo kernel — numpy for non-pow2 B
            b = (np.asarray(h, dtype=np.int64) % n_buckets).astype(np.int32)
            return pa.array(b, pa.int32())
        # string/binary keys (URLs, doc hashes): stable content hash, seed-
        # independent across processes. Hash unique values only (dictionary
        # encode bounds the Python loop to the batch's distinct keys).
        from .dedup import _hash64

        d = pc.dictionary_encode(col).combine_chunks()
        chunks = d.chunks if isinstance(d, pa.ChunkedArray) else [d]
        out = []
        for ch in chunks:
            dic = ch.dictionary.to_pylist()
            if not dic:  # all-null chunk: empty dictionary
                out.append(np.zeros(len(ch), np.int32))
                continue
            uniq = np.fromiter((_hash64(str(v)) % n_buckets for v in dic),
                               dtype=np.int32, count=len(dic))
            idx = np.asarray(ch.indices.fill_null(0), dtype=np.int64)
            out.append(uniq[idx])
        return pa.array(np.concatenate(out) if out else np.array([], np.int32),
                        pa.int32())

    def add_bucket_left(t: pa.Table) -> pa.Table:
        b = np.asarray(_bucket_of(t[key]), dtype=np.int32)
        if n_salts > 1:
            salt = (np.arange(len(t)) % n_salts).astype(np.int32)
            b = b * np.int32(n_salts) + salt
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    def add_bucket_right(t: pa.Table) -> pa.Table:
        b = np.asarray(_bucket_of(t[key]), dtype=np.int32)
        if n_salts > 1:
            rep = np.repeat(np.arange(len(t), dtype=np.int64), n_salts)
            salt = np.tile(np.arange(n_salts, dtype=np.int32), len(t))
            t = t.take(pa.array(rep))
            b = b[rep] * np.int32(n_salts) + salt
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    lt = left_ds.map_batches(add_bucket_left, batch_format="pyarrow")
    rt = right_ds.map_batches(add_bucket_right, batch_format="pyarrow")

    # tag sides, union, then per-bucket join in map_groups
    lt = lt.map_batches(
        lambda t: t.append_column("__side", pa.array(np.zeros(len(t), dtype=np.int8))),
        batch_format="pyarrow",
    )
    rt = rt.map_batches(
        lambda t: t.append_column("__side", pa.array(np.ones(len(t), dtype=np.int8))),
        batch_format="pyarrow",
    )

    lcols = list(sl.names)
    rcols = list(sr.names)

    # per-bucket join in pure Arrow (acero hash join): keeps exact column
    # types — the union pads each side's missing columns with nulls, and a
    # pandas round-trip would silently promote int64-with-nulls to float64.
    def join_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = pc.equal(t["__side"], 0)
        lhs = t.filter(side).select(lcols).combine_chunks()
        rhs = t.filter(pc.invert(side)).select(rcols).combine_chunks()
        out = lhs.join(rhs, keys=key, join_type=join_type)\
                 .replace_schema_metadata(None)
        return bucket_fn(out) if bucket_fn is not None else out

    # pad both sides to ONE static union schema built from the INPUT
    # schemas (not the post-map executed schemas — a zero-row side
    # reports schema None after map_batches, and aligning to only the
    # non-empty side would drop the empty side's columns and break
    # join_bucket's select)
    fields: dict = {}
    for s in (sl, sr):
        for n, ty in zip(s.names, s.types):
            fields.setdefault(n, ty)
    fields["__bucket"] = pa.int32()
    fields["__side"] = pa.int8()

    def pad(t: pa.Table) -> pa.Table:
        cols = {}
        for n, ty in fields.items():
            cols[n] = (pc.cast(t[n], ty) if n in t.column_names
                       else pa.nulls(len(t), ty))
        return pa.table(cols)

    lt = lt.map_batches(pad, batch_format="pyarrow")
    rt = rt.map_batches(pad, batch_format="pyarrow")
    both = lt.union(rt)
    # co-partition through the task-based exchange (stages/exchange.py)
    # instead of groupby().map_groups — no sampling pass, no comparison
    # sort, and downstream schema probes read a materialized block
    # instead of re-executing this shuffle. Empty buckets flow through
    # join_bucket on a typed empty so the output schema is stable.
    from ..stages.exchange import hash_exchange

    empty = pa.table({n: pa.nulls(0, ty) for n, ty in fields.items()})
    return hash_exchange(both, n_buckets * n_salts, join_bucket,
                         part_col="__bucket", empty=empty)


def dedup_exact(ds, key_cols, keep_col: str | list | None = None,
                n_parts: int = 64, descending: bool = False):
    """Exact dedup: keep the first row per key (lowest keep_col — or a
    multi-column deterministic tie-break when keep_col is a list; with
    keep_col=None, deterministic first by sorting on all columns).
    descending=True keeps the HIGHEST keep_col instead (keep-latest
    snapshot semantics, e.g. newest warc_ts per url).

    Scale path (SURVEY.md §2.6): per-batch local dedup (combiner) bounds
    the shuffle to one row per (key, block); the final selection runs
    vectorized on a COARSE hash partition of the keys — Ray's map_groups
    pays per GROUP, so one task per distinct key is ruinous at 10^5+
    keys, while n_parts partitions keep task count flat."""
    import pandas as pd

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    keep_cols = ([keep_col] if isinstance(keep_col, str)
                 else list(keep_col) if keep_col else None)

    # null-stability + dedup is a pass-through selection, so the output
    # schema must equal the input schema even when null keys appear —
    # see _pdarrow.canon_int_keys / restore_types
    from ._pdarrow import canon_int_keys, restore_types

    def _first(df: pd.DataFrame) -> pd.DataFrame:
        extra = (keep_cols if keep_cols else
                 sorted(c for c in df.columns
                        if c not in key_cols and c != "__part"))
        asc = [True] * len(key_cols) + [not descending] * len(extra)
        df = df.sort_values(key_cols + extra, ascending=asc, kind="mergesort")
        return df.drop_duplicates(subset=key_cols, keep="first")

    def partial(t: pa.Table) -> pa.Table:
        out = _first(canon_int_keys(t, key_cols)).copy()
        h = pd.util.hash_pandas_object(out[key_cols], index=False).to_numpy()
        out["__part"] = (h % n_parts).astype(np.int32)
        return restore_types(out, t.schema)

    def final(t: pa.Table) -> pa.Table:
        out = _first(canon_int_keys(t, key_cols).drop(columns="__part"))
        return restore_types(out, t.schema)

    part = ds.map_batches(partial, batch_format="pyarrow")
    from ..stages.exchange import hash_exchange

    return hash_exchange(part, n_parts, final, part_col="__part")


def topk(ds, key: str, k: int, descending: bool = True, tie_cols=None):
    """Global top-k: per-block partial top-k inside map_batches (combiner),
    then a small sort+limit. Avoids fully sorting the dataset.

    Ties at the k-boundary are broken by tie_cols (default: every other
    ORDERABLE column in schema order, ascending — nested columns like
    embedding lists can't sort) so the result is a TOTAL order — without
    this, which of the tied rows survive depends on block boundaries and
    the output varies with parallelism."""

    def sort_spec(sch: pa.Schema):
        ties = (list(tie_cols) if tie_cols is not None
                else [f.name for f in sch
                      if f.name != key and not pa.types.is_nested(f.type)])
        return ([key] + ties,
                [descending] + [False] * len(ties))

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols, desc = sort_spec(t.schema)
        idx = pc.select_k_unstable(
            t, k=min(k, len(t)),
            sort_keys=[(c, "descending" if d else "ascending")
                       for c, d in zip(cols, desc)])
        return t.take(idx)

    pruned = ds.map_batches(partial, batch_format="pyarrow")
    if tie_cols is not None:
        # explicit ties: the final sort spec needs no schema — never
        # probe (a probe on a lazy post-shuffle input executes the
        # whole upstream once, and the sort then executes it AGAIN)
        cols, desc = [key] + list(tie_cols), \
            [descending] + [False] * len(tie_cols)
        return pruned.sort(cols, descending=desc).limit(k)
    sch = ds.schema()
    if sch is None:
        # zero-row lazy input with no inferable schema: top-k of empty
        # is empty (mirrors bucketed_join's schema-None shortcuts)
        return ds.limit(k)
    cols, desc = sort_spec(getattr(sch, "base_schema", sch))
    return pruned.sort(cols, descending=desc).limit(k)



def _bucket100(keys_col, salt: str) -> "np.ndarray":
    """sha256-derived bucket mod 100 of (salt, key): batched numpy
    SHA-256 for integer keys (one vectorized compression for the whole
    batch), per-row hashlib otherwise — identical digests either way."""
    import hashlib

    import pyarrow as pa_

    if pa_.types.is_integer(keys_col.type) and keys_col.null_count == 0:
        from ._sha256 import sha256_mod100_int_keys

        return sha256_mod100_int_keys(
            salt, np.asarray(keys_col, dtype=np.int64))
    keys = keys_col.to_pylist()
    return np.fromiter(
        (int(hashlib.sha256(f"{salt}:{k}".encode()).hexdigest()[:16], 16)
         % 100 for k in keys), dtype=np.int64, count=len(keys))


def hash_split(ds, key_col: str, splits, salt: str = "split"):
    """Deterministic train/val/test assignment: bucket = sha256-derived
    hash of (salt, key) mod 100, mapped onto cumulative split ranges.

    splits: dict name -> percent, e.g. {"train": 90, "val": 5, "test": 5}
    (must sum to 100). The assignment is a pure per-row map — stable
    across runs, machines and parallelism, and expressible in SQL for
    oracle checks (sha256 hex prefix mod 100).
    """
    import hashlib

    names = list(splits)
    bounds = np.cumsum([int(splits[n]) for n in names])
    if bounds[-1] != 100:
        raise ValueError("split percentages must sum to 100")

    def kernel(t: pa.Table) -> pa.Table:
        h = _bucket100(t[key_col], salt)
        idx = np.searchsorted(bounds, h, side="right")
        out = np.array(names, dtype=object)[idx]
        return t.append_column("split", pa.array([str(s) for s in out], pa.string()))

    return ds.map_batches(kernel, batch_format="pyarrow")


def stratified_sample(ds, group_col: str, key_col: str, fractions,
                      default_pct: int = 0, salt: str = "sample"):
    """Deterministic stratified sampling: keep a row iff its sha256-derived
    bucket of (salt, key) mod 100 falls below its stratum's percentage.

    fractions: dict group-value -> integer percent (0..100); groups not
    listed fall back to default_pct. A pure per-row filter — no shuffle,
    no RNG state, the same rows survive at any parallelism or cluster
    size, and the oracle recomputes the identical hex-prefix hash in SQL.
    This is the scale-safe shape for corpus rebalancing (e.g. downsample
    dominant languages): at 100 TB it's a streaming map_batches filter.
    """
    import hashlib

    fr = {k: int(v) for k, v in fractions.items()}
    for name, pct in fr.items():
        if not 0 <= pct <= 100:
            raise ValueError(f"fraction for {name!r} out of [0,100]")

    def kernel(t: pa.Table) -> pa.Table:
        h = _bucket100(t[key_col], salt)
        groups = t[group_col].to_pylist()
        pct = np.fromiter((fr.get(g, default_pct) for g in groups),
                          dtype=np.int64, count=len(groups))
        return t.filter(pa.array(h < pct))

    return ds.map_batches(kernel, batch_format="pyarrow")


def grouped_topk(ds, keys, order_col: str, k: int, descending: bool = True,
                 tie_col: str | None = None, n_parts: int = 64):
    """Top-k rows per group. Per-batch partial top-k per group (combiner)
    bounds the shuffle to k rows per (group, block); the final per-group
    selection runs vectorized on a COARSE hash partition of the keys
    (never one task per group). Deterministic ties via tie_col."""
    import pandas as pd

    from ._pdarrow import canon_int_keys, restore_types

    keys = [keys] if isinstance(keys, str) else list(keys)

    def _order(sch: pa.Schema):
        # explicit tie_col, else every other orderable column in schema
        # order — without a total order, which tied rows survive depends
        # on shuffle arrival order (parallelism-dependent output)
        ties = ([tie_col] if tie_col else
                [f.name for f in sch
                 if f.name not in keys + [order_col, "__part"]
                 and not pa.types.is_nested(f.type)])
        return [order_col] + ties, [not descending] + [True] * len(ties)

    def _head(df: pd.DataFrame, sch: pa.Schema) -> pd.DataFrame:
        order, asc = _order(sch)
        df = df.sort_values(order, ascending=asc, kind="mergesort")
        return df.groupby(keys, sort=False, dropna=False).head(k)

    def partial(t: pa.Table) -> pa.Table:
        out = _head(canon_int_keys(t, keys), t.schema).copy()
        h = pd.util.hash_pandas_object(out[keys], index=False).to_numpy()
        out["__part"] = (h % n_parts).astype(np.int32)
        return restore_types(out, t.schema)

    def final(t: pa.Table) -> pa.Table:
        df = canon_int_keys(t, keys).drop(columns="__part")
        sch = t.schema.remove(t.schema.get_field_index("__part"))
        return restore_types(_head(df, sch), t.schema)

    part = ds.map_batches(partial, batch_format="pyarrow")
    from ..stages.exchange import hash_exchange

    return hash_exchange(part, n_parts, final, part_col="__part")


def grouped_nunique(ds, keys, value_col: str):
    """Exact distinct-count per group: one dedup shuffle on
    (keys, value) — each distinct pair survives once — then a combiner
    count per group. Never materializes per-group value sets.
    NULL values are ignored (SQL COUNT(DISTINCT v) / pandas nunique
    semantics); groups whose values are all NULL are absent."""
    import pyarrow.compute as pc

    from .agg import grouped_agg

    keys = [keys] if isinstance(keys, str) else list(keys)
    ds = ds.select_columns(keys + [value_col]).map_batches(
        lambda t: t.filter(pc.is_valid(t[value_col])),
        batch_format="pyarrow")
    distinct = dedup_exact(ds, keys + [value_col])
    return grouped_agg(distinct, keys, {"n_distinct": (None, "count")},
                       combine="shuffle")


def exact_stratified_split(ds, group_col: str, key_col: str, splits,
                           salt: str = "exsplit", n_parts: int = 64):
    """EXACT-proportion stratified split: within each group, rows rank
    by a sha256-derived 64-bit hash (key tie-break) and row k of n joins
    split i iff k*100 < n*cum_pct_i. Unlike hash_split's per-row
    threshold (binomial noise around the target percentage), the
    realized proportions are exact per group up to integer rounding —
    the shape used when a benchmark demands an exactly-sized held-out
    set per stratum.

    Scale: ranking needs each group co-located once — ONE coarse
    group-hash shuffle (vectorized in-partition sort + cumcount), the
    same exchange budget as any per-group window. The hash is the pure
    per-row sha map shared with hash_split, so the assignment is stable
    at any parallelism and expressible in SQL."""
    import hashlib

    import pandas as pd

    from .dedup import _hash64

    names = list(splits)
    bounds = np.cumsum([int(splits[n]) for n in names])
    if bounds[-1] != 100:
        raise ValueError("split percentages must sum to 100")

    def add_hash_part(t: pa.Table) -> pa.Table:
        kc = t[key_col]
        if pa.types.is_integer(kc.type) and kc.null_count == 0:
            from ._sha256 import sha256_u64_int_keys

            h = sha256_u64_int_keys(salt, np.asarray(kc, dtype=np.int64))
        else:
            keys = kc.to_pylist()
            h = np.fromiter(
                (int(hashlib.sha256(f"{salt}:{k}".encode())
                     .hexdigest()[:16], 16)
                 for k in keys), dtype=np.uint64, count=len(keys))
        gvals = pd.Series(t[group_col].to_pylist(), dtype=object)
        uniq = pd.unique(gvals)
        gh = np.fromiter((_hash64(str(g)) % n_parts for g in uniq),
                         dtype=np.int64, count=len(uniq))
        part = gvals.map(pd.Series(gh, index=uniq)).to_numpy(dtype=np.int64)
        t = t.append_column("__h", pa.array(h, pa.uint64()))
        return t.append_column("__part", pa.array(part.astype(np.int32)))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_col, "__h", key_col], kind="mergesort")
        g = df.groupby(group_col, sort=False, dropna=False)
        rank = g.cumcount().to_numpy(np.int64)
        n = g[key_col].transform("size").to_numpy(np.int64)
        idx = np.zeros(len(df), dtype=np.int64)
        for cum in bounds[:-1]:
            idx += (rank * 100 >= n * int(cum)).astype(np.int64)
        out = df.drop(columns=["__h", "__part"]).copy()
        out["split"] = np.asarray(names, dtype=object)[idx]
        return out

    from ._pdarrow import arrow_groups

    parted = ds.map_batches(add_hash_part, batch_format="pyarrow")
    from ..stages.exchange import hash_exchange

    return hash_exchange(parted, n_parts, arrow_groups(assign),
                         part_col="__part")


def budget_select(ds, *, score_col: str, cost_col: str, budget: int,
                  id_col: str = "doc_id", out_col: str = "picked",
                  descending: bool = True):
    """Fill a COST BUDGET with the best-ranked rows — the training-data
    curation step "take the highest-quality documents until the token
    budget is spent": rank by (score_col DESC, id_col ASC) [a total
    order], pick every row whose RUNNING cost sum (inclusive, in rank
    order) stays <= budget. A row that would overflow the budget is
    skipped and so is everything ranked below it (prefix semantics =
    SQL `SUM(cost) OVER (ORDER BY ...) <= budget`, not best-fit
    knapsack).

    Scale shape: ONE range-partitioned sort exchange (ds.sort — Ray's
    sample+range shuffle), then a two-phase distributed prefix sum: each
    sorted block contributes its cost total (blocks x 1 ints, collected
    driver-side), the driver's exclusive scan of those totals broadcasts
    back as per-block offsets, and each block finishes its own inclusive
    cumsum locally. No row ever leaves its post-sort block; the only
    driver data is one int per block. Integer costs sum exactly.

    Returns the sorted Dataset with out_col (bool) appended.
    """
    import ray

    sorted_ds = ds.sort([score_col, id_col], descending=[descending, False])
    # phase 1: per-block cost totals, in block order. iter_internal_ref
    # bundles preserves the sorted block order; one remote task per
    # block reads only the cost column sum (no row materialization
    # driver-side).
    refs = [br for bundle in sorted_ds.iter_internal_ref_bundles()
            for br in bundle.block_refs]

    @ray.remote
    def block_total(tbl) -> int:
        from ray.data.block import BlockAccessor

        if not isinstance(tbl, pa.Table):
            tbl = BlockAccessor.for_block(tbl).to_arrow()
        if tbl.num_rows == 0 or cost_col not in tbl.column_names:
            return 0
        return int(np.asarray(tbl[cost_col], dtype=np.int64).sum())

    totals = ray.get([block_total.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(totals[:-1], dtype=np.int64)]) \
        if totals else np.zeros(0, dtype=np.int64)

    # phase 2: per-block inclusive cumsum + broadcast offset
    @ray.remote
    def flag_block(tbl, offset: int):
        from ray.data.block import BlockAccessor

        if not isinstance(tbl, pa.Table):
            tbl = BlockAccessor.for_block(tbl).to_arrow()
        if tbl.num_rows == 0:
            return tbl.append_column(out_col, pa.array([], pa.bool_())) \
                if tbl.num_columns else tbl
        c = np.asarray(tbl[cost_col], dtype=np.int64)
        run = np.cumsum(c, dtype=np.int64) + offset
        return tbl.append_column(out_col, pa.array(run <= budget))

    import ray.data as rd

    out_refs = [flag_block.remote(r, int(offsets[i]))
                for i, r in enumerate(refs)]
    return rd.from_arrow_refs(out_refs)
