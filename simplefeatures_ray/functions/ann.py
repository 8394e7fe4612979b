"""Approximate / exact nearest-neighbor search over embedding columns.

- brute_force_topk: the baseline — broadcast query matrix (ray.put once),
  per-batch numpy matmul, per-batch partial top-k (combiner), final merge
  on the tiny candidate set. Scales linearly with corpus size and is
  embarrassingly parallel; the shuffle carries only n_queries*k rows per
  block.
- ivf_topk: the scale path — k-means-lite (seeded, few iters) coarse
  quantizer built on a sample, vectors bucketed by nearest centroid
  (groupby shuffle once), queries probe only nprobe buckets.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.values, dtype=np.float32)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """Per-batch cosine top-k against the broadcast query matrix."""

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id", vec_col: str = "embedding"):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.query_ids, qm = q
        self.qm = _normalize(np.asarray(qm, dtype=np.float32))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.vec_col))
        ids = np.asarray(batch[self.id_col])
        sims = self.qm @ m.T  # (nq, nb)
        k = min(self.k, sims.shape[1])
        part = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[0]):
            cand = part[qi]
            out_q.append(np.full(k, self.query_ids[qi]))
            out_id.append(ids[cand])
            out_sim.append(sims[qi, cand])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                self.id_col: pa.array(np.concatenate(out_id)),
                "cosine": pa.array(np.concatenate(out_sim).astype(np.float64)),
            }
        )


def brute_force_topk(ds, query_ids, query_matrix, k: int, *, id_col="vec_id",
                     vec_col="embedding"):
    """Dataset of (id, embedding) -> exact cosine top-k rows per query:
    (query_id, id, cosine, rank), rank 0 = best; ties by lowest id."""
    import ray

    from ..stages.worker_cache import get_cached

    qref = ray.put((np.asarray(query_ids), np.asarray(query_matrix, dtype=np.float32)))

    def build(q):
        return BruteForceTopK(q, k, id_col, vec_col)

    build.__cache_token__ = f"bftopk-{k}-{id_col}-{vec_col}"

    def partial_fn(batch: pa.Table) -> pa.Table:
        return get_cached(qref, build=build)(batch)

    # task-based with per-worker cached state: no actor-pool spin-up
    partial = ds.map_batches(partial_fn, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cosine", id_col], ascending=[False, True], kind="mergesort").head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(len(df), dtype=np.int64)
        return df

    return partial.groupby("query_id").map_groups(merge, batch_format="pandas")


def kmeans_lite(sample: np.ndarray, n_clusters: int, iters: int = 8, seed: int = 7):
    """Seeded deterministic k-means (numpy), for the IVF coarse quantizer."""
    rng = np.random.default_rng(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float32))
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    cents = sample[np.sort(idx)].copy()
    for _ in range(iters):
        sims = sample @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


class IVFAssign:
    def __init__(self, cents_ref, vec_col: str = "embedding"):
        import ray

        self.cents = ray.get(cents_ref)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.vec_col))
        assign = (m @ self.cents.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("ivf_bucket", pa.array(assign, pa.int32()))


def ivf_topk(ds, query_ids, query_matrix, k: int, *, n_clusters=16, nprobe=4,
             sample_rows=2048, id_col="vec_id", vec_col="embedding"):
    """IVF ANN: bucket by nearest centroid; probe nprobe buckets per query.

    The centroid model is built from a deterministic sample (ds.limit),
    broadcast once; the only shuffle is the per-bucket groupby of the
    (much smaller) probed candidate set.
    """
    import ray

    sample_tbl = ds.limit(sample_rows).to_pandas()
    sample = np.stack(sample_tbl[vec_col].to_numpy())
    cents = kmeans_lite(sample, n_clusters)
    cents_ref = ray.put(cents)
    qm = _normalize(np.asarray(query_matrix, dtype=np.float32))
    probes = (qm @ cents.T).argsort(axis=1)[:, ::-1][:, :nprobe]  # (nq, nprobe)

    def build_assign(c):
        a = IVFAssign.__new__(IVFAssign)
        a.cents = c
        a.vec_col = vec_col
        return a

    build_assign.__cache_token__ = f"ivfassign-{vec_col}"

    def assign_fn(batch: pa.Table) -> pa.Table:
        from ..stages.worker_cache import get_cached

        return get_cached(cents_ref, build=build_assign)(batch)

    assigned = ds.map_batches(assign_fn, batch_format="pyarrow")
    # keep only buckets any query probes (vectorized filter)
    wanted = np.unique(probes)

    def filt(t: pa.Table) -> pa.Table:
        b = np.asarray(t["ivf_bucket"])
        return t.filter(pa.array(np.isin(b, wanted)))

    pruned = assigned.map_batches(filt, batch_format="pyarrow")

    # per-query search within probed buckets: reuse brute force on pruned set
    qsel_ref = ray.put((np.asarray(query_ids), qm, probes))

    class ProbedTopK:
        def __init__(self):
            self.query_ids, self.qm, self.probes = ray.get(qsel_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_batch_matrix(batch, vec_col))
            ids = np.asarray(batch[id_col])
            buckets = np.asarray(batch["ivf_bucket"])
            out_q, out_id, out_sim = [], [], []
            for qi in range(len(self.qm)):
                mask = np.isin(buckets, self.probes[qi])
                if not mask.any():
                    continue
                sims = m[mask] @ self.qm[qi]
                kk = min(k, len(sims))
                cand = np.argpartition(-sims, kth=kk - 1)[:kk]
                out_q.append(np.full(kk, self.query_ids[qi]))
                out_id.append(ids[mask][cand])
                out_sim.append(sims[cand])
            if not out_q:
                return pa.table(
                    {"query_id": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()),
                     "cosine": pa.array([], pa.float64())}
                )
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q)),
                    id_col: pa.array(np.concatenate(out_id)),
                    "cosine": pa.array(np.concatenate(out_sim).astype(np.float64)),
                }
            )

    def probed_fn(batch: pa.Table) -> pa.Table:
        from ..stages.worker_cache import get_cached

        return get_cached(qsel_ref, build=lambda _: ProbedTopK())(batch)

    partial = pruned.map_batches(probed_fn, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cosine", id_col], ascending=[False, True], kind="mergesort").head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(len(df), dtype=np.int64)
        return df

    return partial.groupby("query_id").map_groups(merge, batch_format="pandas")


# --------------------------------------------------------------------------- #
# embedding near-duplicate detection
# --------------------------------------------------------------------------- #


class _AllPairsCosine:
    """Batch kernel: rows of this batch vs the broadcast full matrix."""

    def __init__(self, full_ref, threshold, id_col, vec_col):
        import ray

        self.ids, m = ray.get(full_ref)
        self.m = _normalize(np.asarray(m, dtype=np.float64))
        self.threshold = threshold
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mb = _normalize(_batch_matrix(batch, self.vec_col).astype(np.float64))
        ids_b = np.asarray(batch[self.id_col])
        sims = mb @ self.m.T  # (nb, N)
        ii, jj = np.nonzero(sims >= self.threshold)
        ia = ids_b[ii]
        ib = self.ids[jj]
        keep = ia < ib  # dedupe + drop self-pairs
        return pa.table(
            {
                "id_a": pa.array(ia[keep], pa.int64()),
                "id_b": pa.array(ib[keep], pa.int64()),
                "cosine": pa.array(np.round(sims[ii, jj][keep], 6)),
            }
        )


def embedding_near_dup_pairs(ds, threshold: float, *, id_col="vec_id",
                             vec_col="embedding"):
    """EXACT embedding-cosine near-dup pairs (id_a < id_b, cosine >= t).

    The corpus matrix is broadcast once (ray.put); each batch multiplies
    its rows against it — an O(N^2/p) exact sweep suitable when the
    matrix fits in memory. For larger corpora use
    embedding_near_dup_lsh (bucketed, approximate).
    """
    import ray

    from .relational import collect_table

    tbl = collect_table(ds.select_columns([id_col, vec_col]))
    ids = np.asarray(tbl[id_col])
    mat = np.asarray(tbl[vec_col].combine_chunks().values, dtype=np.float32).reshape(
        len(ids), -1
    )
    full_ref = ray.put((ids, mat))

    def build(pair):
        c = _AllPairsCosine.__new__(_AllPairsCosine)
        c.ids, m = pair
        c.m = _normalize(np.asarray(m, dtype=np.float64))
        c.threshold = threshold
        c.id_col = id_col
        c.vec_col = vec_col
        return c

    build.__cache_token__ = f"allpairs-{threshold}-{id_col}-{vec_col}"

    def fn(batch: pa.Table) -> pa.Table:
        from ..stages.worker_cache import get_cached

        return get_cached(full_ref, build=build)(batch)

    return ds.map_batches(fn, batch_format="pyarrow")


class _HyperplaneSig:
    """Random-hyperplane LSH signatures (seeded, deterministic).

    n_tables independent hash tables of n_bits each (OR-amplification):
    each input row explodes into n_tables rows keyed (lsh_table,
    lsh_bucket) so a pair is a candidate if ANY table co-buckets it.
    More tables -> higher recall at fixed verify cost per bucket; more
    bits -> smaller buckets (cheaper verify, lower per-table recall)."""

    def __init__(self, dim, n_bits=16, n_tables=1, seed=99, vec_col="embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.normal(size=(n_tables, n_bits, dim)).astype(np.float32)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.vec_col))
        n_tables, n_bits, _ = self.planes.shape
        n = len(m)
        parts = []
        for ti in range(n_tables):
            bits = (m @ self.planes[ti].T) > 0
            sig = np.zeros(n, dtype=np.uint64)
            for b in range(n_bits):
                sig |= bits[:, b].astype(np.uint64) << np.uint64(b)
            parts.append(batch
                         .append_column("lsh_table", pa.array(np.full(n, ti, np.int32)))
                         .append_column("lsh_bucket", pa.array(sig, pa.uint64())))
        return pa.concat_tables(parts)


def embedding_near_dup_lsh(ds, threshold: float, *, id_col="vec_id",
                           vec_col="embedding", n_bits=12, n_tables=1):
    """Approximate near-dup pairs: hyperplane-LSH bucket groupby, exact
    cosine verify within buckets, distinct-pair final. Scale path: the
    only shuffle carries n_tables x (table, bucket, id, vec) rows and
    near-identical vectors share buckets with high probability.

    Recall tuning: 1 - (1 - (1 - theta/pi)^n_bits)^n_tables for a pair at
    angle theta. Low thresholds (wide angles) need many tables."""
    import pandas as pd

    dim = len(ds.take(1)[0][vec_col])

    def sig_fn(batch: pa.Table) -> pa.Table:
        from ..stages.worker_cache import get_cached

        kern = get_cached(
            f"hyperplane-{dim}-{n_bits}-{n_tables}-{vec_col}",
            build=lambda _: _HyperplaneSig(dim, n_bits, n_tables, vec_col=vec_col))
        return kern(batch)

    sigs = ds.map_batches(sig_fn, batch_format="pyarrow")

    empty = pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                          "id_b": pd.Series([], dtype=np.int64),
                          "cosine": pd.Series([], dtype=np.float64)})

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return empty.copy()
        m = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))
        ids = df[id_col].to_numpy()
        sims = m @ m.T
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        if not len(ii):
            return empty.copy()
        return pd.DataFrame({"id_a": np.minimum(ids[ii], ids[jj]),
                             "id_b": np.maximum(ids[ii], ids[jj]),
                             "cosine": np.round(sims[ii, jj], 6)})

    cand = sigs.groupby(["lsh_table", "lsh_bucket"]).map_groups(
        pairs, batch_format="pandas")
    from .dedup import dedup_pairs

    return dedup_pairs(cand)
