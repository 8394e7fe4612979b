"""Task-based hash exchange: the engine's coarse co-partition primitive.

Why not groupby().map_groups: Ray's sort-based shuffle pays a boundary-
sampling pass plus a comparison sort of every block by the partition
column. For a co-partition on a SMALL KNOWN key domain (hash buckets
0..B-1 computed upstream) the boundaries are known a priori, so the
exchange reduces to the classic two-wave shuffle: one SPLIT task per
upstream block (bucket-partitions the block, returning B shard objects)
plus one REDUCE task per bucket (concat its shards, run the per-bucket
kernel). Measured on this box: ~2x faster warm and ~7x faster first-run
than the groupby path on the same input (no sampling pass, no
comparison sort, no aggregator actors); Ray's hash-shuffle strategy was
slower still (7s vs 1s — per-execution aggregator-actor spin-up). On a
multi-node cluster the data movement is identical to Ray's pull-based
shuffle: every shard is a separate object-store object fetched
point-to-point by the reduce task that needs it, so cross-node traffic
is the same one-pass all-to-all and the object store spills under
pressure exactly as it does for the built-in shuffle.

EAGER: calling hash_exchange() streams the upstream through
iter_internal_ref_bundles (exactly ONE execution of the input lineage),
launches the split/reduce task graph WITHOUT waiting for it, and
returns a Dataset over the reduce-output refs. Nothing is fetched to
the driver. A deliberate side benefit: downstream `schema()` probes on
the result read an already-materialized block instead of re-executing
the whole upstream (Ray re-runs non-materialized lineage for schema
probes — see relational.bucketed_join's right_schema docstring), so
chained co-partitions stop paying the double-execution tax. The
trade-off vs the lazy groupby path is lineage: reduce outputs are plain
objects, so lost blocks are not reconstructable — acceptable for a
bounded two-wave exchange whose inputs the driver still holds refs to,
and closable with resilient=True (ExchangeHandle pins the split shards
and relaunches lost reduce outputs on demand).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

# max object args per reduce/concat task (task-spec size bound)
_FANIN = 512


def _split_block(tbl, part_col: str, n_parts: int):
    """Partition one block by its int partition column ∈ [0, n_parts)."""
    from ray.data.block import BlockAccessor

    if not isinstance(tbl, pa.Table):
        tbl = BlockAccessor.for_block(tbl).to_arrow()
    if tbl.num_rows == 0 or part_col not in tbl.column_names:
        # Ray's map operators emit zero-row blocks with an EMPTY schema
        # (observed: a typed 0-row block enters map_batches, a no-column
        # block comes out) — they carry no rows, so every partition gets
        # an empty shard and the reduce's typed `empty` supplies schema.
        z = tbl.slice(0, 0)
        return tuple(z for _ in range(n_parts)) if n_parts > 1 else z
    b = np.asarray(tbl[part_col], dtype=np.int64)
    order = np.argsort(b, kind="stable")
    sb = b[order]
    tbl = tbl.take(pa.array(order))
    bounds = np.searchsorted(sb, np.arange(n_parts + 1))
    return tuple(tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
                 for i in range(n_parts))


def _concat_shards(*shards):
    parts = [s for s in shards if s.num_rows]
    if parts:
        return pa.concat_tables(parts, promote_options="permissive")
    # typed 0-row shard (a slice of a real block) beats a schema-less one
    for s in shards:
        if s.num_columns:
            return s.slice(0, 0)
    return pa.table({})


def _reduce_part(fn, empty, empty_out, drop_cols, *shards):
    parts = [s for s in shards if s.num_rows]
    if not parts and empty_out is not None:
        return empty_out
    if parts:
        t = pa.concat_tables(parts, promote_options="permissive")
        t = t.combine_chunks()
    elif empty is not None:
        t = empty
    else:
        # no typed `empty` given: recover schema from any 0-row shard
        # that kept its columns so `fn` still sees a typed table
        t = _concat_shards(*shards)
    if drop_cols:
        t = t.drop_columns([c for c in drop_cols if c in t.column_names])
    if t.num_columns == 0 and t.num_rows == 0:
        # fully schema-less partition (every upstream block degenerate):
        # calling fn would KeyError on its columns; emit the degenerate
        # empty unchanged — same state the lazy-empty path produces.
        return t
    return fn(t) if fn is not None else t


class ExchangeHandle:
    """Recovery handle for a resilient hash_exchange (VERDICT r4 #6).

    Holds the split-shard refs plus the reduce recipe so a lost reduce
    output can be RE-LAUNCHED from the still-held shards instead of
    failing the job. dataset(recover=True) probes each reduce output
    with a trivial remote task (no driver fetch) and relaunches the
    partitions whose objects are gone.

    Cost of resilience: the handle PINS the split shards (≈ input
    bytes) in the object store until it is dropped — drop it once the
    downstream consumer has produced its own durable output. Recovery
    is one level deep: if a split shard is lost too, Ray's own lineage
    reconstruction must recover it (its task args are the upstream
    block refs)."""

    def __init__(self, splits, fn_ref, empty, empty_out, drop, n_parts):
        self.splits = splits
        self.fn_ref = fn_ref
        self.empty = empty
        self.empty_out = empty_out
        self.drop = drop
        self.n_parts = n_parts
        self.outs = [self._launch(p) for p in range(n_parts)]

    def _launch(self, p):
        import ray

        reduce_task = ray.remote(_reduce_part)
        return reduce_task.remote(self.fn_ref, self.empty, self.empty_out,
                                  self.drop, *[s[p] for s in self.splits])

    def dataset(self, recover: bool = True):
        import ray
        import ray.data as rd

        if recover:
            probe = ray.remote(lambda t: True)
            pending = [(p, probe.remote(r)) for p, r in enumerate(self.outs)]
            for p, pr in pending:
                try:
                    ray.get(pr)
                except Exception:
                    self.outs[p] = self._launch(p)
        return rd.from_arrow_refs(list(self.outs))


def hash_exchange(ds, n_parts: int, fn=None, part_col: str = "__bucket",
                  empty: pa.Table | None = None,
                  empty_out: pa.Table | None = None,
                  drop_part_col: bool = False,
                  resilient: bool = False):
    """Co-partition `ds` on its precomputed int column `part_col` ∈
    [0, n_parts) and run `fn` (an Arrow-table kernel) once per partition
    with that partition's COMPLETE rows. Returns a Dataset of the kernel
    outputs (one block per partition, empty partitions included so the
    output schema is stable — `fn` must be schema-stable on empty input,
    same contract as bucketed_join's bucket_fn).

    `empty`: typed zero-row table matching the post-split schema, fed to
    `fn` for partitions that received no rows (required when the input
    may be empty — a from-refs Dataset can't infer schema otherwise).
    `empty_out`: typed zero-row OUTPUT table returned directly for empty
    partitions — use for kernels that don't tolerate empty input (the
    groupby().map_groups path never called them on empty groups).
    `drop_part_col`: strip `part_col` before calling `fn`. Default False
    for drop-in parity with groupby().map_groups, which keeps the key
    column in the group table.
    `resilient`: return an ExchangeHandle instead of a Dataset — the
    handle pins the split shards and can relaunch lost reduce outputs
    (handle.dataset(recover=True)); see ExchangeHandle.
    """
    import ray
    import ray.data as rd

    split_task = ray.remote(num_returns=n_parts)(_split_block) \
        if n_parts > 1 else ray.remote(_split_block)
    reduce_task = ray.remote(_reduce_part)

    fn_ref = ray.put(fn)
    drop = [part_col] if drop_part_col else []
    refs = [br for bundle in ds.iter_internal_ref_bundles()
            for br in bundle.block_refs]
    splits = [split_task.remote(r, part_col, n_parts) for r in refs]
    if n_parts == 1:
        splits = [[s] for s in splits]
    # fan-in guard: a reduce over 10^5+ upstream blocks (the 100-TB
    # block count) would put every shard ref in ONE task spec. Insert a
    # tree level: concat shard runs of <=_FANIN per partition first, so
    # no task ever takes more than _FANIN object args.
    concat_task = ray.remote(_concat_shards)
    while len(splits) > _FANIN:
        merged = []
        for i in range(0, len(splits), _FANIN):
            run = splits[i:i + _FANIN]
            merged.append([concat_task.remote(*[s[p] for s in run])
                           for p in range(n_parts)])
        splits = merged
    if resilient:
        return ExchangeHandle(splits, fn_ref, empty, empty_out, drop,
                              n_parts)
    outs = [reduce_task.remote(fn_ref, empty, empty_out, drop,
                               *[s[p] for s in splits])
            for p in range(n_parts)]
    return rd.from_arrow_refs(outs)
