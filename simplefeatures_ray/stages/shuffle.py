"""Skew-aware grouped execution helpers.

The classic two-stage (salt -> partial -> final) pattern for hot keys
(SURVEY.md §4 'Skew'): when per-group work is heavy (map_groups, e.g.
per-cell union or rasterize), a single dense urban cell would serialize
on one task. salted_map_groups splits each hot key into `n_salts`
sub-groups keyed by a content hash (deterministic — NOT random, so
retries and re-runs are stable), applies the per-group function to each
sub-group, then merges per key.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def add_salt(ds, key_col: str, hot_keys, n_salts: int, hash_col: str):
    """Append a deterministic `salt` column: hash(hash_col) % n_salts for
    rows whose key is in hot_keys, else 0. hot_keys is a small set,
    broadcast by closure capture (fine: it is tiny)."""
    from ..functions.dedup import _hash64

    hot = set(int(k) for k in hot_keys)

    def kernel(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col].fill_null(0), dtype=np.uint64)
        # blake2b-based hash: builtin hash() on str is PYTHONHASHSEED-
        # randomized per worker process, which would break the documented
        # deterministic-salt contract.
        hv = np.array(
            [_hash64(str(v)) & 0x7FFFFFFF for v in batch[hash_col].to_pylist()],
            dtype=np.int64,
        )
        is_hot = np.isin(keys.astype(np.int64), np.fromiter(hot, dtype=np.int64))
        salt = np.where(is_hot, hv % n_salts, 0).astype(np.int32)
        return batch.append_column("salt", pa.array(salt, pa.int32()))

    return ds.map_batches(kernel, batch_format="pyarrow")


def detect_hot_keys(hist_table: pa.Table, key_col: str, count_col: str, threshold: int):
    """Keys whose count exceeds threshold (driver-side, small table)."""
    keys = np.asarray(hist_table[key_col])
    counts = np.asarray(hist_table[count_col])
    return keys[counts > threshold].tolist()


def salted_map_groups(ds, key_col: str, fn, merge_fn, hot_keys, n_salts: int,
                      hash_col: str, batch_format: str = "pandas"):
    """groupby(key).map_groups(fn) with hot keys pre-split by salt.

    fn: per-(key, salt) sub-group function (pandas in/out).
    merge_fn: per-key merge of sub-group results (pandas in/out); runs in a
    second, much smaller groupby over fn's outputs.
    """
    salted = add_salt(ds, key_col, hot_keys, n_salts, hash_col)
    partial = salted.groupby([key_col, "salt"]).map_groups(fn, batch_format=batch_format)
    return partial.groupby(key_col).map_groups(merge_fn, batch_format=batch_format)
