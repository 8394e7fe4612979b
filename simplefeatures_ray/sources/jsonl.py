"""JSONL (NDJSON) source and sink for tabular corpora.

Web-scale text pipelines ingest and emit JSON Lines (Common-Crawl
derivatives, annotation dumps, model-output shards). The READ path is
fully vectorized: `read_jsonl` delegates to `ray.data.read_json`, whose
pyarrow C++ NDJSON parser splits files into blocks and never touches a
Python loop. The WRITE path emits one atomic shard per block (tmp +
rename, the engine's resumable-sink convention, cf. state/checkpoint);
serialization uses Python json.dumps per row — JSONL is inherently
row-framed and pyarrow has no JSON writer; floats round-trip exactly
via repr's shortest-digits form. That loop is the sink's throughput
ceiling; columnar outputs should prefer write_parquet.
"""
from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa


def read_jsonl(paths, **read_kwargs):
    """JSONL file(s)/dir -> Dataset, via Ray's arrow-native JSON reader."""
    import ray.data as rd

    return rd.read_json(paths, **read_kwargs)


def write_jsonl(ds, out_dir: str, columns=None) -> str:
    """Dataset -> JSONL shards under out_dir (one file per block, atomic
    rename, deterministic content-keyed names). Returns out_dir.

    Keys are emitted in column order; binary columns are rejected (JSON
    has no bytes type — encode upstream)."""
    os.makedirs(out_dir, exist_ok=True)
    if columns:
        ds = ds.select_columns(list(columns))

    def write_block(t: pa.Table) -> pa.Table:
        for f in t.schema:
            if pa.types.is_binary(f.type) or pa.types.is_large_binary(f.type):
                raise TypeError(f"binary column {f.name!r} not JSON-serializable")
        cols = t.column_names
        rows = t.to_pylist()
        lines = [json.dumps({c: r[c] for c in cols}, separators=(",", ":"))
                 for r in rows]
        tag = uuid.uuid5(uuid.NAMESPACE_URL,
                         (lines[0] if lines else "empty") + str(len(lines)))
        final = os.path.join(out_dir, f"part-{tag}-{len(lines)}.jsonl")
        tmp = final + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            fh.write("\n".join(lines) + ("\n" if lines else ""))
        os.replace(tmp, final)
        return pa.table({"rows": pa.array([len(t)], pa.int64())})

    for _ in ds.map_batches(write_block, batch_format="pyarrow").iter_batches():
        pass
    return out_dir
