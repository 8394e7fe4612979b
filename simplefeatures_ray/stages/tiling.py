"""Cell encoding + tile assignment stages.

encode_cells: stateless map_batches kernel, lon/lat -> uint64 cell at a
resolution (vectorized Morton/Web-Mercator, simplefeatures_ray.cells).

cell_histogram: two-stage (combiner + final) count per cell — the partial
aggregation inside map_batches keeps hot 'urban' cells from skewing the
groupby shuffle (SURVEY.md §2.6 / FP-Hadoop two-stage pattern): each
block contributes at most one row per distinct cell, so the all-to-all
exchange carries |cells| rows, not |pages|.

assign_tiles: deterministic tile ids from the per-cell histogram —
tile_id is the rank of the cell in (count desc, cell asc) order, so the
assignment is bit-for-bit reproducible at any parallelism (north rule).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def encode_cells(res: int, x_col: str = "lon", y_col: str = "lat",
                 out_col: str = "cell", scheme: str = "morton"):
    """Cell-encode kernel. scheme='morton' (Web-Mercator quadtree,
    simplefeatures_ray.cells — the fast default) or 's2' (standard S2
    bit layout, simplefeatures_ray.s2 — interoperable ids whose Hilbert
    ordering keeps range shards spatially local). Both emit uint64 and
    plug into the same histogram/tile stages downstream."""
    if scheme == "morton":
        from ..cells import lonlat_to_cell

        enc = lambda lon, lat: lonlat_to_cell(lon, lat, res)  # noqa: E731
    elif scheme == "s2":
        from ..s2 import lonlat_to_id

        enc = lambda lon, lat: lonlat_to_id(lon, lat, level=res)  # noqa: E731
    else:
        raise ValueError(f"unknown cell scheme {scheme!r}")

    def kernel(batch: pa.Table) -> pa.Table:
        lon = np.asarray(batch[x_col], dtype=np.float64)
        lat = np.asarray(batch[y_col], dtype=np.float64)
        ok = ~(np.isnan(lon) | np.isnan(lat))
        cells = np.zeros(len(lon), dtype=np.uint64)
        if ok.any():
            cells[ok] = enc(lon[ok], lat[ok])
        arr = pa.array(cells, pa.uint64())
        if not ok.all():
            arr = pa.array([int(c) if k else None for c, k in zip(cells, ok)], pa.uint64())
        return batch.append_column(out_col, arr)

    return kernel


def partial_cell_counts(cell_col: str = "cell"):
    """Combiner: one (cell, partial n) row per distinct cell per batch."""

    def kernel(batch: pa.Table) -> pa.Table:
        cells = np.asarray(batch[cell_col].drop_null(), dtype=np.uint64)
        uniq, counts = np.unique(cells, return_counts=True)
        return pa.table(
            {
                cell_col: pa.array(uniq, pa.uint64()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    return kernel


def cell_histogram(ds, cell_col: str = "cell"):
    """Dataset of rows with `cell` -> pyarrow Table of (cell, n_pages).

    Combiner pattern: per-batch partial counts (np.unique) stream to the
    driver as |cells| x |blocks| rows and combine there — no groupby
    exchange of the page rows (the histogram is bounded by 4^res cells,
    independent of page count)."""
    from ..functions.relational import collect_table

    partial = ds.map_batches(partial_cell_counts(cell_col), batch_format="pyarrow")
    tbl = collect_table(partial)
    cells = np.asarray(tbl[cell_col], dtype=np.uint64)
    counts = np.asarray(tbl["n"], dtype=np.int64)
    uniq, inv = np.unique(cells, return_inverse=True)
    totals = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(totals, inv, counts)
    return pa.table({cell_col: pa.array(uniq, pa.uint64()),
                     "n_pages": pa.array(totals, pa.int64())})


def tile_table(hist) -> pa.Table:
    """Small per-cell histogram -> (cell, n_pages, tile_id) Arrow table.

    hist may be a Dataset (materialized here — it is |distinct cells| rows,
    bounded by 4^res, not by the page count) or a pyarrow Table.
    """
    if hasattr(hist, "to_arrow_refs"):
        import ray

        parts = [t for t in ray.get(hist.to_arrow_refs()) if t.num_rows]
        tbl = pa.concat_tables(parts) if parts else pa.table({"cell": [], "n_pages": []})
    else:
        tbl = hist
    cells = np.asarray(tbl["cell"], dtype=np.uint64)
    counts = np.asarray(tbl["n_pages"], dtype=np.int64)
    order = np.lexsort((cells, -counts))  # count desc, cell asc
    tile_ids = np.empty(len(order), dtype=np.int64)
    tile_ids[order] = np.arange(len(order))
    return pa.table(
        {
            "cell": pa.array(cells, pa.uint64()),
            "n_pages": pa.array(counts, pa.int64()),
            "tile_id": pa.array(tile_ids, pa.int64()),
        }
    )


class AssignTiles:
    """Actor-pool kernel: attach tile_id by cell lookup (broadcast dict)."""

    def __init__(self, tiles_ref=None, cell_col: str = "cell", tiles=None):
        if tiles is None:
            import ray

            tiles = ray.get(tiles_ref)
        tbl = tiles
        cells = np.asarray(tbl["cell"], dtype=np.uint64)
        tids = np.asarray(tbl["tile_id"], dtype=np.int64)
        order = np.argsort(cells)
        self.sorted_cells = cells[order]
        self.sorted_tids = tids[order]
        self.cell_col = cell_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cells = np.asarray(batch[self.cell_col].fill_null(0), dtype=np.uint64)
        pos = np.searchsorted(self.sorted_cells, cells)
        pos = np.clip(pos, 0, max(0, len(self.sorted_cells) - 1))
        ok = len(self.sorted_cells) > 0
        if ok:
            found = self.sorted_cells[pos] == cells
            tids = np.where(found, self.sorted_tids[pos], -1)
        else:
            tids = np.full(len(cells), -1, dtype=np.int64)
        return batch.append_column("tile_id", pa.array(tids, pa.int64()))


def assign_tiles_batch(batch: pa.Table, *, tiles_ref, cell_col: str = "cell") -> pa.Table:
    """Task-function variant of AssignTiles (per-worker cached lookup)."""
    from .worker_cache import get_cached

    def build(tbl):
        return AssignTiles(tiles=tbl, cell_col=cell_col)

    build.__cache_token__ = f"assign-{cell_col}"
    return get_cached(tiles_ref, build)(batch)
