"""Edit-distance-1 string similarity join (deletion-neighborhood LSH).

The SymSpell/FastSS banding trick made distributed: a pair of strings
has Levenshtein distance <= 1 iff they share at least one key in
keys(s) = {s} U {s with one char deleted} —
  substitution at i:  d_i(s) == d_i(t)           (same deletion string)
  insert/delete:      the longer one's deletion   == the shorter string
  equality:           the identity key
so bucketing rows by every key has FULL RECALL, and an O(len) verify
per candidate restores precision (different-position deletions can
collide, e.g. 'ab'/'ba'). Never an all-pairs comparison.

Distributed shape:
  map_batches   explode each row to its len+1 keys (bounded fan-out,
                documented: the exchange carries (len+1) x rows)
  coarse shuffle on hash(key) -> within-partition per-key pairing
                (i < j by id; bucket sizes are the alphabet-ish
                collision sets, small by construction)
  verify        exact lev<=1 check per candidate
  dedup         a true pair can share several keys that live in
                different partitions -> one exact dedup on (id_a,id_b)
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _lev_le1(a: str, b: str) -> bool:
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # lb == la + 1: b must equal a with one char inserted
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def _explode_keys(id_col: str, str_col: str):
    def kernel(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col], dtype=np.int64)
        names = t[str_col].to_pylist()
        out_id, out_name, out_key = [], [], []
        for rid, s in zip(ids, names):
            s = s or ""
            ks = [s] + [s[:i] + s[i + 1:] for i in range(len(s))]
            out_id.extend([rid] * len(ks))
            out_name.extend([s] * len(ks))
            out_key.extend(ks)
        return pa.table({
            "key": pa.array(out_key, pa.string()),
            "rid": pa.array(np.asarray(out_id, dtype=np.int64)),
            "name": pa.array(out_name, pa.string()),
        })

    return kernel


def editdist1_pairs(ds, id_col: str, str_col: str, n_parts: int = 64):
    """All unordered pairs (id_a < id_b) whose str_col values are at
    Levenshtein distance <= 1. Exact (full recall via the deletion
    neighborhood, full precision via the verify). Returns a Dataset
    (id_a, id_b)."""
    from .dedup import _hash64
    from .relational import dedup_exact

    exploded = ds.map_batches(_explode_keys(id_col, str_col),
                              batch_format="pyarrow")

    def add_part(t: pa.Table) -> pa.Table:
        # hash each DISTINCT key once, then map (setdefault would
        # evaluate the blake2b eagerly per row)
        keys = pd.Series(t["key"].to_pylist(), dtype=object)
        uniq = pd.unique(keys)
        h = np.fromiter((_hash64(k) % n_parts for k in uniq),
                        dtype=np.int64, count=len(uniq))
        part = keys.map(pd.Series(h, index=uniq)).to_numpy(dtype=np.int64)
        return t.append_column("__part", pa.array(part.astype(np.int32)))

    parted = exploded.map_batches(add_part, batch_format="pyarrow")

    def pair_partition(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized within-partition pairing + verify (VERDICT r4 #8;
        no nested Python pair loop, so a pathological hot name degrades
        to array ops, not quadratic interpreter time).

        Verify structure: a pair can collide on an IDENTITY key (equal
        strings, dist 0) or identity-vs-deletion (one-char insertion,
        dist exactly 1) — both accept WITHOUT any check (a key is an
        identity iff len(key) == len(name)). Only deletion-deletion
        collisions (necessarily equal-length strings) can be false
        positives ('ab'/'ba' share keys 'a','b'), and equal-length
        lev<=1 == hamming<=1, which vectorizes as one flat byte
        compare + reduceat. Multi-byte UTF-8 rows (char-hamming !=
        byte-hamming) take the per-pair reference check."""
        if not len(df):
            return pd.DataFrame({"id_a": np.array([], dtype=np.int64),
                                 "id_b": np.array([], dtype=np.int64)})
        df = (df.drop_duplicates(["key", "rid"])
                .sort_values(["key", "rid"], kind="mergesort"))
        keys = df["key"].to_numpy(dtype=object)
        rids = df["rid"].to_numpy(dtype=np.int64)
        names = df["name"].tolist()
        n = len(df)
        new_grp = np.concatenate([[True], keys[1:] != keys[:-1]])
        grp_start_pos = np.nonzero(new_grp)[0]
        sizes = np.diff(np.concatenate([grp_start_pos, [n]]))
        start = np.repeat(grp_start_pos, sizes)
        rank = np.arange(n) - start              # within-group rank
        # pair expansion: position p (rank r) pairs with the r group
        # members before it -> i < j in rid order automatically
        cnt = rank
        total = int(cnt.sum())
        if not total:
            return pd.DataFrame({"id_a": np.array([], dtype=np.int64),
                                 "id_b": np.array([], dtype=np.int64)})
        j_idx = np.repeat(np.arange(n), cnt)
        firsts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        off = np.arange(total) - np.repeat(firsts, cnt)
        i_idx = np.repeat(start, cnt) + off

        from . import _bytetext as bt

        b = bt.BatchText(pa.array(names, pa.string()))
        buf, offs = b.buf, b.offsets
        name_len = np.diff(offs)
        key_len = np.fromiter((len(k) for k in keys), dtype=np.int64,
                              count=n)
        is_ident = key_len == name_len  # byte-vs-char len only differs
        # for non-ASCII, which routes to the reference check below
        nonascii = np.zeros(n, dtype=bool)
        nonascii[b.nonascii_rows] = True
        pair_na = nonascii[i_idx] | nonascii[j_idx]
        auto = (is_ident[i_idx] | is_ident[j_idx]) & ~pair_na
        need = ~auto & ~pair_na                  # ASCII del-del pairs
        accept = auto.copy()
        if need.any():
            vi, vj = i_idx[need], j_idx[need]
            L = name_len[vi]                     # == name_len[vj]
            sa = np.repeat(offs[vi], L)
            sb = np.repeat(offs[vj], L)
            csum = np.cumsum(L)
            pos = np.arange(int(csum[-1])) - np.repeat(
                np.concatenate([[0], csum[:-1]]), L)
            neq = buf[sa + pos] != buf[sb + pos]
            mism = np.add.reduceat(neq, np.concatenate([[0], csum[:-1]]))
            accept[np.nonzero(need)[0]] = mism <= 1
        if pair_na.any():
            for p in np.nonzero(pair_na)[0]:
                accept[p] = _lev_le1(names[i_idx[p]], names[j_idx[p]])
        return pd.DataFrame({"id_a": rids[i_idx[accept]],
                             "id_b": rids[j_idx[accept]]})

    from ._pdarrow import arrow_groups

    from ..stages.exchange import hash_exchange

    pairs = hash_exchange(parted, n_parts, arrow_groups(pair_partition),
                          part_col="__part")
    return dedup_exact(pairs, ["id_a", "id_b"])
