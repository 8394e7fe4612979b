"""Broadcast spatial join: pages (points) x polygons (broadcast R-tree).

The big side streams through map_batches; the small polygon side is
packed into an STRtree + ring arrays, `ray.put` ONCE on the driver, and
fetched ONCE PER ACTOR in __init__ (never per batch). Candidate
generation is the vectorized R-tree descent; refinement is
crossing-number point-in-polygon (reference alg_point_in_ring.go
semantics). This is the engine's analog of the reference's
PreparedGeometry reused against many probes (alg_prepared.go:17-92).

Modes:
  inner — one output row per (point, polygon) hit, poly_id attached
  semi  — points with >= 1 hit, single row, lowest poly_id attached
  anti  — points with no hit
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geometry.predicates import points_in_polygon
from ..geometry.wkb import from_wkb
from ..rtree import STRtree


def build_polygon_index(polygons: pa.Table):
    """Driver-side: polygon table -> (STRtree, rings list, poly_ids, names).

    Uses the precomputed envelope columns when present; otherwise derives
    them from the WKB. Returns a plain tuple, cheap to ray.put.
    """
    wkbs = polygons["wkb"].to_pylist()
    poly_ids = np.asarray(polygons["poly_id"], dtype=np.int64)
    names = polygons["name"].to_pylist() if "name" in polygons.column_names else None
    ring_sets = []
    boxes = np.zeros((len(wkbs), 4))
    have_env = all(c in polygons.column_names for c in ("minx", "miny", "maxx", "maxy"))
    if have_env:
        boxes[:, 0] = np.asarray(polygons["minx"], dtype=np.float64)
        boxes[:, 1] = np.asarray(polygons["miny"], dtype=np.float64)
        boxes[:, 2] = np.asarray(polygons["maxx"], dtype=np.float64)
        boxes[:, 3] = np.asarray(polygons["maxy"], dtype=np.float64)
    for i, w in enumerate(wkbs):
        g = from_wkb(w)
        rings = []
        for leaf in g.flatten():
            rings.extend(leaf.rings)
        ring_sets.append(rings)
        if not have_env:
            xy = g.all_xy()
            boxes[i] = [xy[:, 0].min(), xy[:, 1].min(), xy[:, 0].max(), xy[:, 1].max()]
    return STRtree(boxes), ring_sets, poly_ids, names


class BroadcastSpatialJoin:
    """Actor-pool batch kernel for the pages x polygons join.

    index_ref: ray.ObjectRef of build_polygon_index(...) output.
    x_col/y_col: names of the lon/lat (or x/y) columns in the batch.
    """

    def __init__(self, index_ref=None, mode: str = "inner", x_col: str = "lon",
                 y_col: str = "lat", drop_nan: bool = True, index=None):
        if index is None:
            import ray

            # one object-store fetch per ACTOR (zero-copy for the numpy arrays)
            index = ray.get(index_ref)
        self.tree, self.ring_sets, self.poly_ids, self.names = index
        self.mode = mode
        self.x_col = x_col
        self.y_col = y_col
        self.drop_nan = drop_nan

    def match(self, px: np.ndarray, py: np.ndarray):
        """Return (pt_idx, poly_pos) exact-hit pairs, sorted by (pt, poly_id)."""
        cand_p, cand_i = self.tree.query_many_points(px, py)
        if len(cand_p) == 0:
            return cand_p, cand_i
        keep_p, keep_i = [], []
        order = np.argsort(cand_i, kind="stable")
        cand_p = cand_p[order]
        cand_i = cand_i[order]
        # group candidates by polygon -> one vectorized PIP per polygon
        bounds = np.flatnonzero(np.diff(cand_i)) + 1
        for grp_p, grp_i in zip(np.split(cand_p, bounds), np.split(cand_i, bounds)):
            poly_pos = int(grp_i[0])
            loc = points_in_polygon(px[grp_p], py[grp_p], self.ring_sets[poly_pos])
            hit = loc >= 0  # interior or boundary intersects
            if hit.any():
                keep_p.append(grp_p[hit])
                keep_i.append(grp_i[hit])
        if not keep_p:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
        kp = np.concatenate(keep_p)
        ki = np.concatenate(keep_i)
        # deterministic output order: by (point, poly_id)
        order = np.lexsort((self.poly_ids[ki], kp))
        return kp[order], ki[order]

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = np.asarray(batch[self.x_col], dtype=np.float64)
        py = np.asarray(batch[self.y_col], dtype=np.float64)
        valid = ~(np.isnan(px) | np.isnan(py)) if self.drop_nan else np.ones(len(px), bool)
        vidx = np.flatnonzero(valid)
        kp, ki = self.match(px[vidx], py[vidx])
        kp = vidx[kp] if len(kp) else kp
        if self.mode == "inner":
            out = batch.take(pa.array(kp))
            out = out.append_column("poly_id", pa.array(self.poly_ids[ki], pa.int64()))
            if self.names is not None:
                out = out.append_column(
                    "poly_name", pa.array([self.names[int(i)] for i in ki], pa.string())
                )
            return out
        hit_mask = np.zeros(len(px), dtype=bool)
        hit_mask[kp] = True
        if self.mode == "anti":
            return batch.filter(pa.array(valid & ~hit_mask))
        if self.mode == "semi":
            # lowest poly_id per point (kp sorted by (pt, poly_id) already)
            first = np.zeros(len(kp), dtype=bool)
            if len(kp):
                first[0] = True
                first[1:] = kp[1:] != kp[:-1]
            sel = kp[first]
            out = batch.take(pa.array(sel))
            return out.append_column("poly_id", pa.array(self.poly_ids[ki[first]], pa.int64()))
        raise ValueError(f"unknown join mode {self.mode!r}")


class KNNJoin:
    """k nearest polygons per point (the reference's nearest-neighbour
    query, rtree/nearest.go:12-55, recast as batch kernels), exact
    point-to-polygon distance; 0 inside. flat_map-style: k rows per
    point. Ties broken by lowest poly_id (engine-defined total order)."""

    # polygon counts up to this bound use the fully vectorized
    # all-pairs distance matrix; larger sets use the MBR-lower-bound
    # pruned sweep (_knn_large) — both loop-free over points
    VECTOR_BOUND = 512

    def __init__(self, index_ref=None, k: int = 1, x_col: str = "lon", y_col: str = "lat",
                 index=None):
        if index is None:
            import ray

            index = ray.get(index_ref)
        self.tree, self.ring_sets, self.poly_ids, self.names = index
        self.k = k
        self.x_col = x_col
        self.y_col = y_col
        # flat segment arrays per polygon for exact distance
        self.seg_arrays = []
        for rings in self.ring_sets:
            segs = [np.concatenate([r[:-1, :2], r[1:, :2]], axis=1) for r in rings if len(r) > 1]
            self.seg_arrays.append(np.concatenate(segs, axis=0) if segs else np.zeros((0, 4)))

    def _poly_dist_vec(self, px: np.ndarray, py: np.ndarray, j: int) -> np.ndarray:
        """Exact point-to-polygon-j distances for a point VECTOR (0 when
        inside); one vectorized segment sweep, no per-point Python."""
        from ..geometry.predicates import points_in_polygon

        segs = self.seg_arrays[j]
        if len(segs) == 0:
            return np.full(len(px), np.inf)
        a = segs[:, :2]
        d = segs[:, 2:] - a
        dd = (d * d).sum(axis=1)
        dd[dd == 0] = 1.0
        pts = np.stack([px, py], axis=1)
        ap = pts[:, None, :] - a[None, :, :]
        t = np.clip((ap * d[None, :, :]).sum(axis=2) / dd[None, :], 0.0, 1.0)
        proj = a[None, :, :] + t[:, :, None] * d[None, :, :]
        diff = pts[:, None, :] - proj
        dist = np.sqrt(diff[:, :, 0] ** 2 + diff[:, :, 1] ** 2).min(axis=1)
        inside = points_in_polygon(px, py, self.ring_sets[j]) >= 0
        dist[inside] = 0.0
        return dist

    def _dist_matrix(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """(n_points, n_polys) exact distances, vectorized per polygon."""
        n = len(px)
        out = np.empty((n, len(self.poly_ids)), dtype=np.float64)
        for j in range(len(self.poly_ids)):
            out[:, j] = self._poly_dist_vec(px, py, j)
        return out

    TILE = 2048

    def _knn_large(self, x: np.ndarray, y: np.ndarray, kk: int):
        """Large-corpus path: the batch is SPATIALLY TILED (sorted by a
        coarse grid key, processed in runs of TILE points) and each
        tile runs the MBR-pruned polygon sweep. The tiling is what
        makes the prune bite: a tile's bounding box is small, so once
        its points hold k nearby candidates, the tile-bbox-to-polygon
        lower bound eliminates the rest of the corpus in O(1) per
        polygon. Deterministic: results are per-point and
        order-independent."""
        n = len(x)
        best_d = np.full((n, kk), np.inf)
        best_p = np.full((n, kk), np.iinfo(np.int64).max, dtype=np.int64)
        best_pos = np.full((n, kk), -1, dtype=np.int64)
        if n == 0:
            return best_d, best_p, best_pos
        span = max(x.max() - x.min(), y.max() - y.min(), 1e-9)
        cell = span / 16.0
        gx = np.floor((x - x.min()) / cell).astype(np.int64)
        gy = np.floor((y - y.min()) / cell).astype(np.int64)
        order_pts = np.lexsort((y, x, gy, gx))
        for s in range(0, n, self.TILE):
            sel = order_pts[s:s + self.TILE]
            d_, p_, pos_ = self._knn_tile(x[sel], y[sel], kk)
            best_d[sel] = d_
            best_p[sel] = p_
            best_pos[sel] = pos_
        return best_d, best_p, best_pos

    def _knn_tile(self, x: np.ndarray, y: np.ndarray, kk: int):
        """One tile's MBR-lower-bound pruned polygon sweep,
        nearest-box-first from the tile median, maintaining each
        point's running top-k by a vectorized insertion (kk is small).
        Replaces the old per-point tree-heap Python loop — all work is
        numpy over point vectors; the only Python loop is over POLYGONS
        that survive the box-bound prunes against the current kth-best."""
        n = len(x)
        boxes = self.tree.boxes
        best_d = np.full((n, kk), np.inf)
        best_p = np.full((n, kk), np.iinfo(np.int64).max, dtype=np.int64)
        best_pos = np.full((n, kk), -1, dtype=np.int64)
        if n == 0:
            return best_d, best_p, best_pos
        cx, cy = float(np.median(x)), float(np.median(y))
        ox = np.maximum(0.0, np.maximum(boxes[:, 0] - cx, cx - boxes[:, 2]))
        oy = np.maximum(0.0, np.maximum(boxes[:, 1] - cy, cy - boxes[:, 3]))
        order = np.argsort(np.hypot(ox, oy), kind="stable")
        bx0, by0, bx1, by1 = x.min(), y.min(), x.max(), y.max()
        max_kth = np.inf
        dirty = False
        for j in order:
            # O(1) tile-level skip: polygon-box to tile-bbox distance vs
            # the WORST kth-best in the tile (recomputed lazily; it only
            # tightens when insertions happen)
            bb = np.hypot(
                max(0.0, max(boxes[j, 0] - bx1, bx0 - boxes[j, 2])),
                max(0.0, max(boxes[j, 1] - by1, by0 - boxes[j, 3])))
            if bb > max_kth:
                continue
            if dirty:
                max_kth = float(best_d[:, kk - 1].max())
                dirty = False
                if bb > max_kth:
                    continue
            lbx = np.maximum(0.0, np.maximum(boxes[j, 0] - x, x - boxes[j, 2]))
            lby = np.maximum(0.0, np.maximum(boxes[j, 1] - y, y - boxes[j, 3]))
            lb = np.hypot(lbx, lby)
            # <= : a candidate tying the kth distance can still win on
            # poly_id (the engine's (dist, poly_id) total order)
            live = np.flatnonzero(lb <= best_d[:, kk - 1])
            if len(live) == 0:
                continue
            d = self._poly_dist_vec(x[live], y[live], j)
            pid = int(self.poly_ids[j])
            bd, bp = best_d[live], best_p[live]
            pos = ((bd < d[:, None])
                   | ((bd == d[:, None]) & (bp < pid))).sum(axis=1)
            ins = pos < kk
            if not ins.any():
                continue
            ii, pp, dd2 = live[ins], pos[ins], d[ins]
            for col in range(kk - 1, 0, -1):
                mv = ii[pp <= col - 1]
                best_d[mv, col] = best_d[mv, col - 1]
                best_p[mv, col] = best_p[mv, col - 1]
                best_pos[mv, col] = best_pos[mv, col - 1]
            best_d[ii, pp] = dd2
            best_p[ii, pp] = pid
            best_pos[ii, pp] = j
            dirty = True
        return best_d, best_p, best_pos

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = np.asarray(batch[self.x_col], dtype=np.float64)
        py = np.asarray(batch[self.y_col], dtype=np.float64)
        valid = ~(np.isnan(px) | np.isnan(py))
        vidx = np.flatnonzero(valid)
        k = self.k
        if len(self.poly_ids) <= self.VECTOR_BOUND:
            # fully vectorized all-pairs path (small broadcast side)
            dm = self._dist_matrix(px[vidx], py[vidx])
            # ties -> lowest poly_id: secondary key is poly_id
            order = np.lexsort((np.broadcast_to(self.poly_ids, dm.shape), dm), axis=1)
            kk = min(k, dm.shape[1])
            top = order[:, :kk]
            rows = np.repeat(vidx, kk)
            pids = self.poly_ids[top].reshape(-1)
            dists = np.take_along_axis(dm, top, axis=1).reshape(-1)
            ranks = np.tile(np.arange(kk, dtype=np.int32), len(vidx))
        else:
            kk = min(k, len(self.poly_ids))
            best_d, best_p, _ = self._knn_large(px[vidx], py[vidx], kk)
            rows = np.repeat(vidx, kk)
            pids = best_p.reshape(-1)
            dists = best_d.reshape(-1)
            ranks = np.tile(np.arange(kk, dtype=np.int32), len(vidx))
        out = batch.take(pa.array(rows))
        out = out.append_column("poly_id", pa.array(pids, pa.int64()))
        out = out.append_column("knn_dist", pa.array(dists, pa.float64()))
        out = out.append_column("knn_rank", pa.array(ranks, pa.int32()))
        return out


# --------------------------------------------------------------------------- #
# task-function variants (per-worker cached state, no actor spin-up;
# see stages/worker_cache.py for the tradeoff vs actor pools)
# --------------------------------------------------------------------------- #


def spatial_join_batch(batch: pa.Table, *, index_ref, mode="inner",
                       x_col="lon", y_col="lat") -> pa.Table:
    from .worker_cache import get_cached

    def build(index):
        return BroadcastSpatialJoin(index=index, mode=mode, x_col=x_col, y_col=y_col)

    build.__cache_token__ = f"bsj-{mode}-{x_col}-{y_col}"
    return get_cached(index_ref, build)(batch)


def knn_join_batch(batch: pa.Table, *, index_ref, k=1,
                   x_col="lon", y_col="lat") -> pa.Table:
    from .worker_cache import get_cached

    def build(index):
        return KNNJoin(index=index, k=k, x_col=x_col, y_col=y_col)

    build.__cache_token__ = f"knn-{k}-{x_col}-{y_col}"
    return get_cached(index_ref, build)(batch)


# --------------------------------------------------------------------------- #
# cell-bucketed large x large spatial join (shuffle path)
# --------------------------------------------------------------------------- #


def _pack_cell(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    """(cell_x, cell_y) int32-range pair -> one int64 key (two's complement
    pack: cx in the high 32 bits, cy in the low 32). Collision-free for
    |cell| < 2^31, so the bucket join can key on a single int64 column."""
    return (cx.astype(np.int64) << 32) | (cy.astype(np.int64) & 0xFFFFFFFF)


def cell_spatial_join(points_ds, boxes_ds, cell_size: float,
                      x_col: str = "x", y_col: str = "y",
                      box_cols=("minx", "miny", "maxx", "maxy"),
                      n_buckets: int = 32, n_salts: int = 1):
    """Large x large point-in-box join via grid-cell co-partitioning.

    The broadcast R-tree join (BroadcastSpatialJoin above) requires the
    polygon side to fit in one object; when BOTH sides are large the
    scale shape is instead: cover each box with the grid cells it
    intersects at a fixed resolution (bounded fan-out, vectorized
    np.repeat explosion — no Python loop), tag each point with its single
    cell, then hash-bucket both sides on the packed cell key and join per
    bucket (functions.relational.bucketed_join — one groupby exchange per
    side). Because a point lies in exactly one cell, every surviving
    (point, box) pair is emitted exactly once — no post-join dedup pass.
    An exact vectorized bbox refine follows the equi-join, mirroring the
    reference's filter-then-refine structure (rtree search + exact test,
    /root/reference/rtree/rtree.go RangeSearch + alg_point_in_ring.go).

    cell_size tuning: pick ~ the median box extent so the per-box cell
    fan-out stays O(1); the exchange volume is then |points| + O(|boxes|)
    rows regardless of cluster size.
    """
    from ..functions.relational import bucketed_join

    minx_c, miny_c, maxx_c, maxy_c = box_cols

    def tag_points(t: pa.Table) -> pa.Table:
        x = np.asarray(t[x_col], dtype=np.float64)
        y = np.asarray(t[y_col], dtype=np.float64)
        cx = np.floor(x / cell_size).astype(np.int64)
        cy = np.floor(y / cell_size).astype(np.int64)
        return t.append_column("__cell", pa.array(_pack_cell(cx, cy)))

    def explode_boxes(t: pa.Table) -> pa.Table:
        x0 = np.asarray(t[minx_c], dtype=np.float64)
        y0 = np.asarray(t[miny_c], dtype=np.float64)
        x1 = np.asarray(t[maxx_c], dtype=np.float64)
        y1 = np.asarray(t[maxy_c], dtype=np.float64)
        cx0 = np.floor(x0 / cell_size).astype(np.int64)
        cy0 = np.floor(y0 / cell_size).astype(np.int64)
        nx = np.floor(x1 / cell_size).astype(np.int64) - cx0 + 1
        ny = np.floor(y1 / cell_size).astype(np.int64) - cy0 + 1
        n = nx * ny
        rep = np.repeat(np.arange(len(t), dtype=np.int64), n)
        offs = np.zeros(len(t) + 1, dtype=np.int64)
        np.cumsum(n, out=offs[1:])
        local = np.arange(int(offs[-1]), dtype=np.int64) - offs[rep]
        cellx = cx0[rep] + local // ny[rep]
        celly = cy0[rep] + local % ny[rep]
        out = t.take(pa.array(rep))
        return out.append_column("__cell", pa.array(_pack_cell(cellx, celly)))

    pts = points_ds.map_batches(tag_points, batch_format="pyarrow")
    bxs = boxes_ds.map_batches(explode_boxes, batch_format="pyarrow")
    # n_salts > 1: spread a hot cell (urban point pile-up) across salt
    # shards — results invariant, right side replicated n_salts x
    joined = bucketed_join(pts, bxs, key="__cell", n_buckets=n_buckets,
                           n_salts=n_salts)

    def refine(t: pa.Table) -> pa.Table:
        x = np.asarray(t[x_col], dtype=np.float64)
        y = np.asarray(t[y_col], dtype=np.float64)
        keep = ((x >= np.asarray(t[minx_c], dtype=np.float64))
                & (x <= np.asarray(t[maxx_c], dtype=np.float64))
                & (y >= np.asarray(t[miny_c], dtype=np.float64))
                & (y <= np.asarray(t[maxy_c], dtype=np.float64)))
        return t.filter(pa.array(keep)).drop_columns(["__cell"])

    return joined.map_batches(refine, batch_format="pyarrow")


def cell_overlap_join(left_ds, right_ds, cell_size: float,
                      left_cols=("minx", "miny", "maxx", "maxy"),
                      right_cols=None, suffix: str = "_r",
                      n_buckets: int = 32, n_salts: int = 1):
    """Large x large BOX-OVERLAP join via grid cells with REFERENCE-POINT
    deduplication: both sides explode to their covering cells, meet in a
    hash-bucket equi-join, and a pair is kept only in the single cell
    containing the top-left corner (max of the min corners) of the
    boxes' intersection — so each overlapping pair is emitted EXACTLY
    once with no dedup shuffle (the standard distributed spatial-join
    trick; cf. the partition-dedup discussion in SpatialHadoop/GeoSpark
    literature). Envelope overlap is closed (touching edges join).

    Right-side columns are renamed with `suffix` when they collide with
    left names. Returns the joined rows (all left columns + renamed
    right columns).
    """
    from ..functions.relational import bucketed_join

    right_cols = tuple(right_cols or left_cols)
    lx0, ly0, lx1, ly1 = left_cols

    def explode(cols):
        x0c, y0c, x1c, y1c = cols

        def f(t: pa.Table) -> pa.Table:
            x0 = np.asarray(t[x0c], dtype=np.float64)
            y0 = np.asarray(t[y0c], dtype=np.float64)
            x1 = np.asarray(t[x1c], dtype=np.float64)
            y1 = np.asarray(t[y1c], dtype=np.float64)
            cx0 = np.floor(x0 / cell_size).astype(np.int64)
            cy0 = np.floor(y0 / cell_size).astype(np.int64)
            nx = np.floor(x1 / cell_size).astype(np.int64) - cx0 + 1
            ny = np.floor(y1 / cell_size).astype(np.int64) - cy0 + 1
            n = nx * ny
            rep = np.repeat(np.arange(len(t), dtype=np.int64), n)
            offs = np.zeros(len(t) + 1, dtype=np.int64)
            np.cumsum(n, out=offs[1:])
            local = np.arange(int(offs[-1]), dtype=np.int64) - offs[rep]
            cellx = cx0[rep] + local // ny[rep]
            celly = cy0[rep] + local % ny[rep]
            out = t.take(pa.array(rep))
            return out.append_column("__cell",
                                     pa.array(_pack_cell(cellx, celly)))

        return f

    # rename colliding right columns BEFORE the union-based bucket join
    left_names = set(left_ds.schema().names)
    rename = {c: (c + suffix if c in left_names else c)
              for c in right_ds.schema().names}
    rx0, ry0, rx1, ry1 = (rename[c] for c in right_cols)

    def do_rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([rename[c] for c in t.column_names])

    lt = left_ds.map_batches(explode(left_cols), batch_format="pyarrow")
    rt = right_ds.map_batches(do_rename, batch_format="pyarrow") \
                 .map_batches(explode((rx0, ry0, rx1, ry1)),
                              batch_format="pyarrow")
    joined = bucketed_join(lt, rt, key="__cell", n_buckets=n_buckets,
                           n_salts=n_salts)

    def refine(t: pa.Table) -> pa.Table:
        ax0 = np.asarray(t[lx0], dtype=np.float64)
        ay0 = np.asarray(t[ly0], dtype=np.float64)
        ax1 = np.asarray(t[lx1], dtype=np.float64)
        ay1 = np.asarray(t[ly1], dtype=np.float64)
        bx0 = np.asarray(t[rx0], dtype=np.float64)
        by0 = np.asarray(t[ry0], dtype=np.float64)
        bx1 = np.asarray(t[rx1], dtype=np.float64)
        by1 = np.asarray(t[ry1], dtype=np.float64)
        overlap = (ax0 <= bx1) & (bx0 <= ax1) & (ay0 <= by1) & (by0 <= ay1)
        # reference point: top-left corner of the intersection
        refx = np.maximum(ax0, bx0)
        refy = np.maximum(ay0, by0)
        ref_cell = _pack_cell(np.floor(refx / cell_size).astype(np.int64),
                              np.floor(refy / cell_size).astype(np.int64))
        keep = overlap & (ref_cell == np.asarray(t["__cell"]))
        return t.filter(pa.array(keep)).drop_columns(["__cell"])

    return joined.map_batches(refine, batch_format="pyarrow")


def cell_polygon_join(points_ds, polys_ds, cell_size: float,
                      x_col: str = "x", y_col: str = "y",
                      poly_id_col: str = "poly_id", wkb_col: str = "wkb",
                      n_buckets: int = 32, n_salts: int = 1):
    """Large x large point-in-POLYGON join: envelope cells co-partition
    the sides exactly like cell_spatial_join (a point is in one cell —
    exactly-once pairs, no dedup), but the refine stage decodes each
    candidate polygon's WKB ONCE PER DISTINCT POLYGON PER BATCH and runs
    the vectorized crossing-number test (geometry/predicates
    points_in_polygon, reference alg_point_in_ring.go semantics) over
    all of its candidate points at once. This is the shuffle-path
    complement to BroadcastSpatialJoin for polygon corpora too large to
    ray.put; the polygon table must carry envelope columns
    (minx/miny/maxx/maxy — the engine's standard polygon-table schema).
    """
    from ..functions.relational import bucketed_join
    from ..geometry.predicates import points_in_polygon
    from ..geometry.wkb import from_wkb

    def tag_points(t: pa.Table) -> pa.Table:
        x = np.asarray(t[x_col], dtype=np.float64)
        y = np.asarray(t[y_col], dtype=np.float64)
        cx = np.floor(x / cell_size).astype(np.int64)
        cy = np.floor(y / cell_size).astype(np.int64)
        return t.append_column("__cell", pa.array(_pack_cell(cx, cy)))

    def explode_polys(t: pa.Table) -> pa.Table:
        x0 = np.asarray(t["minx"], dtype=np.float64)
        y0 = np.asarray(t["miny"], dtype=np.float64)
        x1 = np.asarray(t["maxx"], dtype=np.float64)
        y1 = np.asarray(t["maxy"], dtype=np.float64)
        cx0 = np.floor(x0 / cell_size).astype(np.int64)
        cy0 = np.floor(y0 / cell_size).astype(np.int64)
        nx = np.floor(x1 / cell_size).astype(np.int64) - cx0 + 1
        ny = np.floor(y1 / cell_size).astype(np.int64) - cy0 + 1
        n = nx * ny
        rep = np.repeat(np.arange(len(t), dtype=np.int64), n)
        offs = np.zeros(len(t) + 1, dtype=np.int64)
        np.cumsum(n, out=offs[1:])
        local = np.arange(int(offs[-1]), dtype=np.int64) - offs[rep]
        cellx = cx0[rep] + local // ny[rep]
        celly = cy0[rep] + local % ny[rep]
        out = t.take(pa.array(rep))
        return out.append_column("__cell", pa.array(_pack_cell(cellx, celly)))

    pts = points_ds.map_batches(tag_points, batch_format="pyarrow")
    pls = polys_ds.map_batches(explode_polys, batch_format="pyarrow")
    joined = bucketed_join(pts, pls, key="__cell", n_buckets=n_buckets,
                           n_salts=n_salts)

    def refine(t: pa.Table) -> pa.Table:
        if not len(t):
            return t.drop_columns(["__cell", wkb_col])
        px = np.asarray(t[x_col], dtype=np.float64)
        py = np.asarray(t[y_col], dtype=np.float64)
        pid = np.asarray(t[poly_id_col], dtype=np.int64)
        wkbs = t[wkb_col].to_pylist()
        keep = np.zeros(len(t), dtype=bool)
        order = np.argsort(pid, kind="stable")
        bounds = np.flatnonzero(np.diff(pid[order])) + 1
        for grp in np.split(order, bounds):
            rings = []
            for leaf in from_wkb(wkbs[int(grp[0])]).flatten():
                rings.extend(leaf.rings)
            loc = points_in_polygon(px[grp], py[grp], rings)
            keep[grp] = loc >= 0
        return t.filter(pa.array(keep)).drop_columns(["__cell", wkb_col])

    return joined.map_batches(refine, batch_format="pyarrow")


def cell_knn_join(points_ds, boxes_ds, k: int, radius: float,
                  cell_size: float, x_col: str = "x", y_col: str = "y",
                  point_id_col: str = "event_id", box_id_col: str = "box_id",
                  box_cols=("minx", "miny", "maxx", "maxy"),
                  n_buckets: int = 32, n_salts: int = 1):
    """Bounded kNN join, shuffle path: for each point, the k nearest
    boxes within `radius` (Euclidean point-to-box distance, 0 inside) —
    the practical distributed kNN formulation (a max radius makes the
    join single-round and exact; unbounded kNN needs iterative ring
    expansion, which is the broadcast KNNJoin's territory).

    Shape: each point explodes to the cells covering its radius-bbox,
    each box to its envelope cells; candidates meet in the hash-bucket
    equi-join and a pair is kept only in the REFERENCE-POINT cell of the
    two bboxes' intersection (exactly-once, no dedup shuffle). The
    radius filter then bounds candidates and grouped_topk (per-batch
    partial top-k + coarse-partition final, never a task per point)
    selects k per point with deterministic (dist, box_id) ties.

    Distances are bit-identical to the SQL twin by construction:
    dx/dy are exact max/0 clamps, dx*dx + dy*dy is evaluated in the
    same order, and IEEE sqrt is correctly rounded.
    """
    from ..functions.relational import bucketed_join, grouped_topk

    minx_c, miny_c, maxx_c, maxy_c = box_cols

    def explode_points(t: pa.Table) -> pa.Table:
        x = np.asarray(t[x_col], dtype=np.float64)
        y = np.asarray(t[y_col], dtype=np.float64)
        cx0 = np.floor((x - radius) / cell_size).astype(np.int64)
        cy0 = np.floor((y - radius) / cell_size).astype(np.int64)
        nx = np.floor((x + radius) / cell_size).astype(np.int64) - cx0 + 1
        ny = np.floor((y + radius) / cell_size).astype(np.int64) - cy0 + 1
        n = nx * ny
        rep = np.repeat(np.arange(len(t), dtype=np.int64), n)
        offs = np.zeros(len(t) + 1, dtype=np.int64)
        np.cumsum(n, out=offs[1:])
        local = np.arange(int(offs[-1]), dtype=np.int64) - offs[rep]
        cellx = cx0[rep] + local // ny[rep]
        celly = cy0[rep] + local % ny[rep]
        out = t.take(pa.array(rep))
        return out.append_column("__cell", pa.array(_pack_cell(cellx, celly)))

    def explode_boxes(t: pa.Table) -> pa.Table:
        x0 = np.asarray(t[minx_c], dtype=np.float64)
        y0 = np.asarray(t[miny_c], dtype=np.float64)
        x1 = np.asarray(t[maxx_c], dtype=np.float64)
        y1 = np.asarray(t[maxy_c], dtype=np.float64)
        cx0 = np.floor(x0 / cell_size).astype(np.int64)
        cy0 = np.floor(y0 / cell_size).astype(np.int64)
        nx = np.floor(x1 / cell_size).astype(np.int64) - cx0 + 1
        ny = np.floor(y1 / cell_size).astype(np.int64) - cy0 + 1
        n = nx * ny
        rep = np.repeat(np.arange(len(t), dtype=np.int64), n)
        offs = np.zeros(len(t) + 1, dtype=np.int64)
        np.cumsum(n, out=offs[1:])
        local = np.arange(int(offs[-1]), dtype=np.int64) - offs[rep]
        cellx = cx0[rep] + local // ny[rep]
        celly = cy0[rep] + local % ny[rep]
        out = t.take(pa.array(rep))
        return out.append_column("__cell", pa.array(_pack_cell(cellx, celly)))

    pts = points_ds.map_batches(explode_points, batch_format="pyarrow")
    bxs = boxes_ds.map_batches(explode_boxes, batch_format="pyarrow")
    joined = bucketed_join(pts, bxs, key="__cell", n_buckets=n_buckets,
                           n_salts=n_salts)

    def refine(t: pa.Table) -> pa.Table:
        x = np.asarray(t[x_col], dtype=np.float64)
        y = np.asarray(t[y_col], dtype=np.float64)
        x0 = np.asarray(t[minx_c], dtype=np.float64)
        y0 = np.asarray(t[miny_c], dtype=np.float64)
        x1 = np.asarray(t[maxx_c], dtype=np.float64)
        y1 = np.asarray(t[maxy_c], dtype=np.float64)
        # reference point of (query-bbox ∩ box-bbox): exactly-once guard
        refx = np.maximum(x - radius, x0)
        refy = np.maximum(y - radius, y0)
        ref_cell = _pack_cell(np.floor(refx / cell_size).astype(np.int64),
                              np.floor(refy / cell_size).astype(np.int64))
        dx = np.maximum(np.maximum(x0 - x, 0.0), x - x1)
        dy = np.maximum(np.maximum(y0 - y, 0.0), y - y1)
        dist = np.sqrt(dx * dx + dy * dy)
        keep = (dist <= radius) & (ref_cell == np.asarray(t["__cell"]))
        t = t.filter(pa.array(keep))
        return pa.table({
            point_id_col: t[point_id_col],
            box_id_col: t[box_id_col],
            "knn_dist": pa.array(dist[keep], pa.float64()),
        })

    cands = joined.map_batches(refine, batch_format="pyarrow")
    return grouped_topk(cands, point_id_col, "knn_dist", k,
                        descending=False, tie_col=box_id_col)
