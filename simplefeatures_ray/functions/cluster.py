"""Distributed Lloyd k-means over an embedding column — deterministic
and oracle-checkable.

Scale shape: each iteration is one streaming map_batches pass — the
centroid matrix is broadcast (ray.put once, shared-memory read per
batch), the per-batch kernel computes assignments with one vectorized
(n, k, d) distance evaluation and emits per-cluster PARTIAL sums (k rows
per block, the combiner pattern) — no row shuffle anywhere; the driver
merges k x d floats per iteration. 100 TB cost: iters full scans, zero
exchanges.

Determinism across engines (the reason a DuckDB oracle can replay the
whole iteration history): distances are ROUNDED (default 4 dp) before
the argmin with ties broken by lowest cluster id, and centroid means are
ROUNDED (default 6 dp) after every update, so the one-ulp float-sum
ordering differences between numpy and any SQL engine are absorbed at
each step instead of compounding. Init = the k lowest-id vectors
(rank-labeled 0..k-1).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .ann import _batch_matrix


def _assign(X: np.ndarray, C: np.ndarray, round_dist: int) -> np.ndarray:
    # (n, k) squared euclidean, rounded; argmin takes the LOWEST cluster
    # index on ties (matches the oracle's ORDER BY dist, cluster LIMIT 1)
    dist = np.round(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1),
                    round_dist)
    return np.argmin(dist, axis=1)


def _partial_sums(batch: pa.Table, *, c_ref, vec_col, round_dist) -> pa.Table:
    import ray

    C = ray.get(c_ref) if not isinstance(c_ref, np.ndarray) else c_ref
    X = _batch_matrix(batch, vec_col).astype(np.float64)
    a = _assign(X, C, round_dist)
    k, d = C.shape
    S = np.zeros((k, d), dtype=np.float64)
    np.add.at(S, a, X)
    cnt = np.bincount(a, minlength=k).astype(np.int64)
    nz = np.nonzero(cnt)[0]
    return pa.table({
        "cluster": pa.array(nz.astype(np.int64)),
        "n": pa.array(cnt[nz]),
        "sums": pa.array([S[i].tobytes() for i in nz], pa.binary()),
    })


def kmeans(ds, id_col: str = "vec_id", vec_col: str = "embedding",
           k: int = 8, iters: int = 3, round_dist: int = 4,
           round_centroid: int = 6):
    """Returns (assignments Dataset with columns [id_col, cluster_id],
    final centroid matrix (k, d) float64).

    Empty clusters keep their previous centroid (mirrored in the SQL
    twin via a LEFT JOIN COALESCE)."""
    import ray

    from .relational import collect_table, topk

    # Lloyd is iterative: pin the (id, vec) projection in the object
    # store once instead of re-reading + re-decoding the parquet on
    # every pass (init + iters + final assign = iters + 2 executions).
    # Bounded by the embedding corpus bytes; Ray spills to disk when it
    # exceeds the store — still cheaper than N full re-reads.
    ds = ds.select_columns([id_col, vec_col]).materialize()

    init = collect_table(topk(ds, id_col, k, descending=False))
    order = np.argsort(np.asarray(init[id_col]), kind="stable")
    C = np.round(_batch_matrix(init, vec_col).astype(np.float64)[order],
                 round_centroid)
    if len(C) < k:
        raise ValueError(f"need >= {k} vectors, got {len(C)}")

    for _ in range(iters):
        ref = ray.put(C)
        part = ds.map_batches(
            _partial_sums,
            fn_kwargs={"c_ref": ref, "vec_col": vec_col,
                       "round_dist": round_dist},
            batch_format="pyarrow",
        )
        merged = collect_table(part).to_pandas()
        newC = C.copy()
        if len(merged):
            g = merged.groupby("cluster", sort=True)
            for cl, sub in g:
                n = int(sub["n"].sum())
                s = np.sum([np.frombuffer(b, dtype=np.float64)
                            for b in sub["sums"]], axis=0)
                newC[int(cl)] = np.round(s / n, round_centroid)
        C = newC

    ref = ray.put(C)

    def final_assign(batch: pa.Table) -> pa.Table:
        import ray as _ray

        Cf = _ray.get(ref)
        X = _batch_matrix(batch, vec_col).astype(np.float64)
        a = _assign(X, Cf, round_dist)
        return pa.table({id_col: batch[id_col],
                         "cluster_id": pa.array(a.astype(np.int64))})

    return ds.map_batches(final_assign, batch_format="pyarrow"), C


def kmeans_sql(table: str = "embeddings", id_col: str = "vec_id",
               vec_col: str = "embedding", dim: int = 64, k: int = 8,
               iters: int = 3, round_dist: int = 4,
               round_centroid: int = 6) -> str:
    """DuckDB twin of kmeans(): unrolls every Lloyd iteration as CTEs
    replaying the identical rounded arithmetic (1-based list indexing
    for the unnest; rank-labeled init; dist/centroid rounding; tie-break
    by cluster id; empty clusters keep the prior centroid)."""
    ctes = [
        f"long AS (SELECT {id_col} AS vid, r AS d, "
        f"CAST({vec_col}[r + 1] AS DOUBLE) AS val "
        f"FROM {table}, range({dim}) t(r))",
        f"ini AS (SELECT vid, ROW_NUMBER() OVER (ORDER BY vid) - 1 AS cluster "
        f"FROM (SELECT DISTINCT vid FROM long ORDER BY vid LIMIT {k}))",
        f"c0 AS (SELECT i.cluster, l.d, ROUND(l.val, {round_centroid}) AS val "
        f"FROM long l JOIN ini i USING (vid))",
    ]
    for t in range(iters + 1):
        ctes.append(
            f"d{t} AS (SELECT l.vid, c.cluster, "
            f"ROUND(SUM((l.val - c.val) * (l.val - c.val)), {round_dist}) AS dist "
            f"FROM long l JOIN c{t} c USING (d) GROUP BY 1, 2)")
        ctes.append(
            f"a{t} AS (SELECT vid, cluster FROM ("
            f"SELECT vid, cluster, ROW_NUMBER() OVER "
            f"(PARTITION BY vid ORDER BY dist, cluster) AS rn FROM d{t}) "
            f"WHERE rn = 1)")
        if t < iters:
            ctes.append(
                f"m{t} AS (SELECT a.cluster, l.d, "
                f"ROUND(SUM(l.val) / COUNT(*), {round_centroid}) AS val "
                f"FROM long l JOIN a{t} a USING (vid) GROUP BY 1, 2)")
            ctes.append(
                f"c{t + 1} AS (SELECT c.cluster, c.d, "
                f"COALESCE(m.val, c.val) AS val FROM c{t} c "
                f"LEFT JOIN m{t} m ON m.cluster = c.cluster AND m.d = c.d)")
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT vid AS {id_col}, CAST(cluster AS BIGINT) AS cluster_id "
        f"FROM a{iters}"
    )
