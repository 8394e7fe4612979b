"""Spatially-partitioned parquet sink with bbox-pruned reads.

The 100-TB read-path lever: output is bucketed by a coarse spatial cell
(cells.py Morton quadtree), each bucket written as its own parquet
directory with its lon/lat bbox recorded in a driver-side manifest.
`read_spatial(path, bbox)` then opens ONLY the buckets whose bbox
intersects the query window — partition pruning before any byte leaves
storage, the spatial analogue of Parquet row-group min/max pruning.

Built on state/checkpoint.py conventions: tmp-file + atomic rename
writes (idempotent under task retries), one JSON manifest, resumable.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from ..cells import cell_bounds_xy, lonlat_to_cell

MANIFEST = "_spatial_manifest.json"


def _cell_lonlat_bounds(cell: int):
    """(lon0, lat0, lon1, lat1) of a cell (inverse Web-Mercator)."""
    x0, y0, x1, y1 = cell_bounds_xy(np.array([cell], dtype=np.uint64))
    lon0 = float(x0[0]) * 360.0 - 180.0
    lon1 = float(x1[0]) * 360.0 - 180.0
    # y grows downward in the unit square
    lat1 = float(np.degrees(2 * np.arctan(np.exp((1 - 2 * y0[0]) * np.pi)) - np.pi / 2))
    lat0 = float(np.degrees(2 * np.arctan(np.exp((1 - 2 * y1[0]) * np.pi)) - np.pi / 2))
    return lon0, lat0, lon1, lat1


def write_spatial(ds, out_dir: str, lon_col: str = "lon", lat_col: str = "lat",
                  res: int = 3) -> dict:
    """Write `ds` partitioned by spatial cell at resolution `res`
    (4^res buckets max). Returns the manifest dict."""
    import pandas as pd
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)

    def add_cell(t: pa.Table) -> pa.Table:
        cells = lonlat_to_cell(np.asarray(t[lon_col], dtype=np.float64),
                               np.asarray(t[lat_col], dtype=np.float64), res)
        return t.append_column("__scell", pa.array(cells, pa.uint64()))

    bucketed = ds.map_batches(add_cell, batch_format="pyarrow")

    def write_partition(df: pd.DataFrame) -> pd.DataFrame:
        cell = int(df["__scell"].iloc[0])
        body = df.drop(columns="__scell")
        body = body.sort_values(sorted(body.columns), kind="mergesort")
        part_dir = os.path.join(out_dir, f"cell={cell:x}")
        os.makedirs(part_dir, exist_ok=True)
        final = os.path.join(part_dir, "data.parquet")
        tmp = final + f".tmp.{os.getpid()}"
        pq.write_table(pa.Table.from_pandas(body, preserve_index=False), tmp)
        os.replace(tmp, final)
        return pd.DataFrame({
            "cell": [cell],
            "rows": [len(body)],
            "lon_min": [float(df[lon_col].min())],
            "lon_max": [float(df[lon_col].max())],
            "lat_min": [float(df[lat_col].min())],
            "lat_max": [float(df[lat_col].max())],
        })

    lineage = bucketed.groupby("__scell").map_groups(
        write_partition, batch_format="pandas").to_pandas()
    partitions = {}
    for _, r in lineage.iterrows():
        cell = int(r["cell"])
        clon0, clat0, clon1, clat1 = _cell_lonlat_bounds(cell)
        partitions[f"{cell:x}"] = {
            "rows": int(r["rows"]),
            # actual data bbox (tighter than the cell bbox)
            "bbox": [r["lon_min"], r["lat_min"], r["lon_max"], r["lat_max"]],
            "cell_bbox": [clon0, clat0, clon1, clat1],
        }
    doc = {"version": 1, "res": res, "lon_col": lon_col, "lat_col": lat_col,
           "partitions": partitions,
           "total_rows": int(sum(p["rows"] for p in partitions.values()))}
    tmp = os.path.join(out_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))
    return doc


def read_spatial(path: str, bbox=None, exact: bool = True):
    """Dataset over a write_spatial() directory, pruned to the buckets
    whose data bbox intersects `bbox` = (lon0, lat0, lon1, lat1).
    exact=True additionally row-filters to the bbox (prune is
    partition-granular otherwise)."""
    import ray.data as rd

    with open(os.path.join(path, MANIFEST)) as f:
        doc = json.load(f)
    dirs = []
    for cell, meta in sorted(doc["partitions"].items()):
        if bbox is not None:
            b = meta["bbox"]
            if b[0] > bbox[2] or bbox[0] > b[2] or b[1] > bbox[3] or bbox[1] > b[3]:
                continue
        dirs.append(os.path.join(path, f"cell={cell}", "data.parquet"))
    if not dirs:
        raise FileNotFoundError("no partitions intersect the bbox")
    ds = rd.read_parquet(dirs)
    if bbox is not None and exact:
        lon_col, lat_col = doc["lon_col"], doc["lat_col"]
        lon0, lat0, lon1, lat1 = bbox

        def filt(t: pa.Table) -> pa.Table:
            lon = np.asarray(t[lon_col], dtype=np.float64)
            lat = np.asarray(t[lat_col], dtype=np.float64)
            keep = (lon >= lon0) & (lon <= lon1) & (lat >= lat0) & (lat <= lat1)
            return t.filter(pa.array(keep))

        ds = ds.map_batches(filt, batch_format="pyarrow")
    return ds


def pruned_fraction(path: str, bbox) -> float:
    """Fraction of total rows whose partitions are skipped for `bbox` —
    the observability hook for how much the spatial layout saves."""
    with open(os.path.join(path, MANIFEST)) as f:
        doc = json.load(f)
    total = doc["total_rows"] or 1
    kept = 0
    for meta in doc["partitions"].values():
        b = meta["bbox"]
        if not (b[0] > bbox[2] or bbox[0] > b[2] or b[1] > bbox[3] or bbox[1] > b[3]):
            kept += meta["rows"]
    return 1.0 - kept / total
