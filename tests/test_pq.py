"""Product quantization: encode parity, determinism across parallelism,
and honest recall@k against exact brute force on clustered embeddings."""
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from simplefeatures_ray.functions.ann import (_pq_encode_matrix, pq_encode,
                                              pq_topk, pq_train)


def _clustered(n=3000, dim=32, n_clusters=12, seed=5):
    rng = np.random.default_rng(seed)
    cents = rng.normal(0, 1, (n_clusters, dim))
    pick = rng.integers(0, n_clusters, n)
    return (cents[pick] + rng.normal(0, 0.15, (n, dim))).astype(np.float32)


def _emb_table(vecs):
    n, dim = vecs.shape
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(vecs.reshape(-1).astype(np.float32)), dim)
    return pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                     "embedding": arr})


def test_encode_parity_and_parallelism_invariance(ray_session):
    vecs = _clustered()
    books = pq_train(vecs[:800], m=8, ks=16)
    t = _emb_table(vecs)
    out2 = pq_encode(rd.from_arrow(t).repartition(2), books).to_pandas()
    out7 = pq_encode(rd.from_arrow(t).repartition(7), books).to_pandas()
    out2 = out2.sort_values("vec_id").reset_index(drop=True)
    out7 = out7.sort_values("vec_id").reset_index(drop=True)
    assert (out2["pq_code"].apply(tuple) == out7["pq_code"].apply(tuple)).all()
    ref = _pq_encode_matrix(vecs, books)
    got = np.stack(out2["pq_code"].to_numpy())
    assert np.array_equal(got, ref)


def test_pq_recall_vs_brute_force(ray_session):
    """PQ is a SHORTLIST stage (scan uint8 codes, then exact re-rank the
    shortlist): the meaningful metric is whether the true nearest
    neighbors appear in the ADC top-R shortlist for R a few times k."""
    vecs = _clustered(n=4000)
    books = pq_train(vecs[:1000], m=16, ks=32)
    t = _emb_table(vecs)
    rng = np.random.default_rng(9)
    qidx = rng.choice(4000, 8, replace=False)
    queries = vecs[qidx] + rng.normal(0, 0.02, (8, 32)).astype(np.float32)
    qids = np.arange(8, dtype=np.int64)
    codes = pq_encode(rd.from_arrow(t).repartition(5), books)
    short = pq_topk(codes, qids, queries, books, k=100).to_pandas()
    hit1 = 0
    rec10 = []
    for qi in range(8):
        d = ((vecs - queries[qi]) ** 2).sum(axis=1)
        order = np.argsort(d, kind="mergesort")
        sl = set(short[short["query_id"] == qi]["vec_id"].tolist())
        hit1 += int(order[0] in sl)
        rec10.append(len(set(order[:10].tolist()) & sl) / 10.0)
    assert hit1 >= 7, hit1                 # true 1-NN in top-100 shortlist
    assert np.mean(rec10) >= 0.7, rec10    # most of true top-10 shortlisted
    # determinism: identical result at different parallelism
    codes3 = pq_encode(rd.from_arrow(t).repartition(11), books)
    short2 = pq_topk(codes3, qids, queries, books, k=100).to_pandas()
    assert short.equals(short2)


def test_pq_exact_variant_parallelism_invariant(ray_session):
    """pq_train_exact + quantized ADC (the ann_pq_topk gate arithmetic):
    bit-identical integer distances at any partitioning, rank total
    order respected."""
    from simplefeatures_ray.functions.ann import pq_train_exact

    vecs = _clustered(n=600)
    sample = np.asarray(vecs[:128], dtype=np.float64)
    books = pq_train_exact(sample, m=8, ks=16, iters=2)
    t = _emb_table(vecs)
    qids = np.arange(3, dtype=np.int64)
    qm = np.asarray(vecs[:3], dtype=np.float64)
    a = pq_topk(pq_encode(rd.from_arrow(t).repartition(3), books,
                          round_dist=4),
                qids, qm, books, k=5, quantize=4).to_pandas()
    b = pq_topk(pq_encode(rd.from_arrow(t).repartition(9), books,
                          round_dist=4),
                qids, qm, books, k=5, quantize=4).to_pandas()
    assert a.equals(b)
    assert a["adc_dist"].dtype == np.int64
    # query 0 is corpus vector 0: its own code must rank it at ADC
    # distance equal to its quantization residual (small, >= 0)
    assert (a["adc_dist"] >= 0).all()
    for q in range(3):
        sub = a[a["query_id"] == q]
        assert list(sub["rank"]) == list(range(len(sub)))
        assert list(sub.sort_values(["adc_dist", "vec_id"])["rank"]) == \
            list(range(len(sub)))
