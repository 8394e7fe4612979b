"""GeoJSON Dataset source/sink (reference geom/geojson_feature_collection.go:11-29
round-trips FeatureCollections; here they become streaming Ray Data
sources emitting the engine's WKB-column convention).

Two layouts:
- GeoJSONSeq / NDJSON (one Feature — or bare geometry — per line): the
  SCALE path. ray.data.read_text shards lines across tasks, so a
  billion-feature file parses in parallel with no driver involvement.
- A single FeatureCollection document: necessarily parsed per file
  (JSON has no record boundaries to split on); fine for dimension-table
  sized inputs, documented as the non-scale path.

Output schema: fid (string, "" when absent), wkb (binary),
properties (string, JSON-encoded) — schema-stable regardless of the
per-feature property keys.
"""
from __future__ import annotations

import json

import numpy as np
import pyarrow as pa


def _feature_rows(docs):
    """Iterable of parsed GeoJSON dicts -> column lists."""
    from ..geometry.geojson import from_geojson
    from ..geometry.wkb import to_wkb

    fids, wkbs, props = [], [], []
    for doc in docs:
        if doc.get("type") == "Feature":
            geom = from_geojson(doc["geometry"])
            fid = doc.get("id")
            prop = doc.get("properties") or {}
        elif doc.get("type") == "FeatureCollection":
            raise ValueError("nested FeatureCollection inside a feature stream")
        else:  # bare geometry
            geom = from_geojson(doc)
            fid = None
            prop = {}
        fids.append("" if fid is None else str(fid))
        wkbs.append(to_wkb(geom))
        props.append(json.dumps(prop, sort_keys=True, separators=(",", ":")))
    return fids, wkbs, props


def _rows_table(fids, wkbs, props) -> pa.Table:
    return pa.table({
        "fid": pa.array(fids, pa.string()),
        "wkb": pa.array(wkbs, pa.binary()),
        "properties": pa.array(props, pa.string()),
    })


def read_geojson(paths, *, layout: str = "auto", **read_kwargs):
    """GeoJSON file(s) -> Dataset[(fid, wkb, properties)].

    layout: "seq" (NDJSON, parallel per line), "collection" (whole-file
    FeatureCollection documents), or "auto" (sniff the first line of the
    first file: a parseable JSON document on one line whose type is a
    Feature/geometry means seq).
    """
    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]
    if layout == "auto":
        layout = _sniff_layout(paths[0])

    if layout == "seq":
        lines = rd.read_text(paths, **read_kwargs)

        def parse_lines(t: pa.Table) -> pa.Table:
            docs = []
            for s in t["text"].to_pylist():
                s = (s or "").strip().lstrip("\x1e")  # RFC 8142 RS allowed
                if not s:
                    continue
                docs.append(json.loads(s))
            return _rows_table(*_feature_rows(docs))

        return lines.map_batches(parse_lines, batch_format="pyarrow")

    if layout == "collection":
        files = rd.read_binary_files(paths, **read_kwargs)

        def parse_docs(t: pa.Table) -> pa.Table:
            all_f, all_w, all_p = [], [], []
            for raw in t["bytes"].to_pylist():
                doc = json.loads(raw)
                if doc.get("type") != "FeatureCollection":
                    raise ValueError("not a FeatureCollection document")
                f, w, p = _feature_rows(doc.get("features", []))
                all_f += f
                all_w += w
                all_p += p
            return _rows_table(all_f, all_w, all_p)

        return files.map_batches(parse_docs, batch_format="pyarrow")

    raise ValueError(f"unknown layout {layout!r}")


def _sniff_layout(path: str) -> str:
    with open(path, "rb") as fh:
        first = fh.readline(1 << 20).strip().lstrip(b"\x1e")
    try:
        doc = json.loads(first)
    except ValueError:
        return "collection"  # pretty-printed multi-line document
    return "collection" if doc.get("type") == "FeatureCollection" else "seq"


def write_geojson_seq(ds, out_dir: str, *, wkb_col: str = "wkb",
                      fid_col: str | None = "fid",
                      props_col: str | None = "properties") -> str:
    """Dataset with a WKB column -> GeoJSONSeq shards (one .ndjson file
    per block, atomic rename). Returns out_dir."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        from ..geometry.geojson import feature_to_dict
        from ..geometry.wkb import from_wkb

        lines = []
        fids = t[fid_col].to_pylist() if fid_col and fid_col in t.column_names \
            else [None] * len(t)
        props = t[props_col].to_pylist() if props_col and props_col in t.column_names \
            else [None] * len(t)
        for raw, fid, prop in zip(t[wkb_col].to_pylist(), fids, props):
            g = from_wkb(raw)
            p = json.loads(prop) if isinstance(prop, str) and prop else (prop or {})
            d = feature_to_dict(g, p, fid if fid not in ("", None) else None)
            lines.append(json.dumps(d, sort_keys=True, separators=(",", ":")))
        name = f"part-{uuid.uuid5(uuid.NAMESPACE_URL, lines[0] if lines else 'empty')}-{len(lines)}.ndjson"
        final = os.path.join(out_dir, name)
        tmp = final + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            fh.write("\n".join(lines) + ("\n" if lines else ""))
        os.replace(tmp, final)
        return pa.table({"rows": pa.array([len(t)], pa.int64())})

    n = ds.map_batches(write_block, batch_format="pyarrow").sum("rows")
    del n
    return out_dir
