"""Checkpointed, resumable partitioned output with per-partition lineage.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics ... any partition can resume idempotently".

Design:
  * output is bucketed by a deterministic partition key (hash of a
    column mod n_buckets, or the column value itself);
  * each bucket is written by ONE task (groupby(bucket).map_groups)
    to `<out>/part=<bucket>/data.parquet` via tmp-file + atomic rename —
    task retries are idempotent;
  * each write task returns a lineage row: bucket, rows, bytes, sha256
    content hash (order-insensitive), wall seconds;
  * the driver merges lineage rows into `<out>/_manifest.json`
    (atomic rename). A resumed run loads the manifest, filters already-
    completed buckets out of the stream (broadcast frozenset — no
    shuffle), and only writes the missing buckets.
"""
from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions._pdarrow import arrow_groups
import pyarrow.parquet as pq

MANIFEST = "_manifest.json"


def _bucket_of(values, n_buckets: int) -> np.ndarray:
    """Deterministic bucket from a column (stable across runs/processes)."""
    arr = np.asarray(values)
    if arr.dtype.kind in ("i", "u"):
        return (arr.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) >> np.uint64(40)).astype(
            np.int64
        ) % n_buckets
    # strings/objects: FNV over utf-8
    out = np.zeros(len(arr), dtype=np.int64)
    for i, v in enumerate(arr):
        h = 0xCBF29CE484222325
        for b in str(v).encode():
            h ^= b
            h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        out[i] = h % n_buckets
    return out


def load_manifest(out_dir: str) -> dict:
    path = os.path.join(out_dir, MANIFEST)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        data = json.load(f)
    return {int(k): v for k, v in data.get("partitions", {}).items()}


def _save_manifest(out_dir: str, partitions: dict):
    path = os.path.join(out_dir, MANIFEST)
    tmp = path + ".tmp"
    doc = {
        "version": 1,
        "partitions": {str(k): v for k, v in sorted(partitions.items())},
        "n_partitions": len(partitions),
        "total_rows": int(sum(p["rows"] for p in partitions.values())),
    }
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    return doc


def _content_hash(df: pd.DataFrame) -> str:
    """Order-insensitive content hash: sort rows by all columns, hash csv."""
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="mergesort")
    return hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()[:16]


def checkpointed_write(ds, out_dir: str, partition_col: str,
                       n_buckets: int = 64, resume: bool = True) -> dict:
    """Write `ds` to bucketed parquet under out_dir with lineage manifest.

    Returns the manifest document. Safe to re-run: completed buckets are
    skipped (their rows are filtered out before the shuffle).
    """
    os.makedirs(out_dir, exist_ok=True)
    done = load_manifest(out_dir) if resume else {}
    done_set = frozenset(done.keys())

    def add_bucket(t: pa.Table) -> pa.Table:
        b = _bucket_of(t[partition_col], n_buckets)
        t = t.append_column("__bucket", pa.array(b, pa.int64()))
        if done_set:
            keep = ~np.isin(b, np.fromiter(done_set, dtype=np.int64))
            t = t.filter(pa.array(keep))
        return t

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")

    def write_partition(df: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        bucket = int(df["__bucket"].iloc[0])
        body = df.drop(columns="__bucket")
        # deterministic row order within the partition file
        body = body.sort_values(list(sorted(body.columns)), kind="mergesort")
        part_dir = os.path.join(out_dir, f"part={bucket}")
        os.makedirs(part_dir, exist_ok=True)
        final = os.path.join(part_dir, "data.parquet")
        tmp = final + f".tmp.{os.getpid()}"
        # strip the pandas metadata blob: Ray's block-schema dedup can't
        # hash dict-valued metadata and warns on every read-back
        tbl = pa.Table.from_pandas(body, preserve_index=False)
        tbl = tbl.replace_schema_metadata(None)
        pq.write_table(tbl, tmp)
        os.replace(tmp, final)  # idempotent under retry
        return pd.DataFrame(
            {
                "bucket": [bucket],
                "rows": [len(body)],
                "bytes": [os.path.getsize(final)],
                "content_hash": [_content_hash(body)],
                "seconds": [round(time.time() - t0, 3)],
            }
        )

    lineage = bucketed.groupby("__bucket").map_groups(
        arrow_groups(write_partition), batch_format="pyarrow")
    rows = lineage.to_pandas()
    partitions = dict(done)
    for _, r in rows.iterrows():
        partitions[int(r["bucket"])] = {
            "rows": int(r["rows"]),
            "bytes": int(r["bytes"]),
            "content_hash": r["content_hash"],
            "seconds": float(r["seconds"]),
        }
    return _save_manifest(out_dir, partitions)


def verify_manifest(out_dir: str) -> dict:
    """Re-hash every partition file and compare against the manifest.
    Returns {bucket: 'ok' | 'missing' | 'hash-mismatch'}."""
    manifest = load_manifest(out_dir)
    result = {}
    for bucket, entry in manifest.items():
        path = os.path.join(out_dir, f"part={bucket}", "data.parquet")
        if not os.path.exists(path):
            result[bucket] = "missing"
            continue
        df = pq.read_table(path).to_pandas()
        result[bucket] = (
            "ok" if _content_hash(df) == entry["content_hash"] else "hash-mismatch"
        )
    return result


def read_checkpointed(out_dir: str):
    """Dataset over all completed partitions."""
    import ray.data as rd

    manifest = load_manifest(out_dir)
    paths = [
        os.path.join(out_dir, f"part={b}", "data.parquet") for b in sorted(manifest)
    ]
    # partitioning=None: don't infer a hive 'part' column from the bucket
    # directory names — the data columns are the contract
    return rd.read_parquet(paths, partitioning=None)
