"""Sequence packing: greedy budgeted concatenation for training data.

LLM pretraining concatenates documents into fixed-size token windows;
the packing decision (which docs share a sequence) must be deterministic
so shards can be rebuilt idempotently. This implements the standard
greedy sequential rule: stream each group's docs in a fixed order,
accumulate sizes, and start a new sequence whenever adding the next doc
would exceed the budget (a doc larger than the budget gets a sequence of
its own — downstream truncation is the consumer's choice).

Scale shape: packing is sequential WITHIN a group but independent ACROSS
groups, so the Dataset is coarsely hash-partitioned on the group column
(same co-location guarantee as groupby(group), without per-group task
overhead — the pattern shared with sessionize/grouped_topk) and each
partition packs all its groups in one pass. The inner loop iterates per
SEQUENCE, not per row: each step binary-searches the cumulative-size
array for the furthest doc that still fits (np.searchsorted), so a
million-doc group with ~3 docs/sequence costs ~330k searchsorted steps
on a presummed array, not a python loop over rows.

Partitioning assumption (documented per SURVEY custom-operator rule):
one group's rows must fit in a single partition. Groups here are
shards/sources — bounded by construction in a web corpus layout.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .relational import arrow_groups


def _pack_group(sizes: np.ndarray, budget: int, out: np.ndarray) -> None:
    """Write 0-based seq ids for one group's ordered sizes into out."""
    csum = np.concatenate([[0], np.cumsum(sizes, dtype=np.int64)])
    n = len(sizes)
    s = 0
    sid = 0
    while s < n:
        e = int(np.searchsorted(csum, csum[s] + budget, side="right")) - 1
        if e <= s:  # oversized doc: alone in its own sequence
            e = s + 1
        out[s:e] = sid
        sid += 1
        s = e


def pack_sequences(ds, group_col: str, order_col: str, size_col: str,
                   budget: int, n_parts: int = 64):
    """Add seq_id: greedy sequential packing of `size_col` into `budget`
    within each group, rows taken in `order_col` order. Deterministic at
    any parallelism."""
    if budget <= 0:
        raise ValueError("budget must be positive")

    def add_part(t: pa.Table) -> pa.Table:
        from ._pdarrow import canon_int_keys

        col = canon_int_keys(t.select([group_col]), [group_col])[group_col]
        h = pd.util.hash_pandas_object(col, index=False).to_numpy()
        return t.append_column(
            "__part", pa.array((h % n_parts).astype(np.int32), pa.int32()))

    parted = ds.map_batches(add_part, batch_format="pyarrow")

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__part")
        df = df.sort_values([group_col, order_col],
                            kind="mergesort").reset_index(drop=True)
        n = len(df)
        seq = np.zeros(n, dtype=np.int64)
        if n:
            grp = df[group_col].to_numpy()
            sizes = df[size_col].to_numpy().astype(np.int64)
            starts = np.empty(n, dtype=bool)
            starts[0] = True
            starts[1:] = grp[1:] != grp[:-1]
            idx = np.flatnonzero(starts)
            for gs, ge in zip(idx, np.append(idx[1:], n)):
                _pack_group(sizes[gs:ge], budget, seq[gs:ge])
        df["seq_id"] = seq
        return df

    from ..stages.exchange import hash_exchange

    return hash_exchange(parted, n_parts, arrow_groups(per_part),
                         part_col="__part")
