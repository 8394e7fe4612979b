"""Distributed k-means (functions/cluster.py)."""
import numpy as np
import pyarrow as pa


def _blob_table(n_per=60, d=8, seed=4):
    """Three well-separated gaussian blobs."""
    rng = np.random.default_rng(seed)
    centers = np.array([[0.0] * d, [10.0] * d, [-10.0] * d])
    X = np.concatenate([c + rng.normal(0, 0.5, (n_per, d)) for c in centers])
    ids = np.arange(len(X))
    return pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([row.astype(np.float32) for row in X],
                              pa.list_(pa.float32())),
    }), np.repeat([0, 1, 2], n_per)


def test_kmeans_separates_blobs(ray_session):
    import ray.data as rd

    from simplefeatures_ray.functions.cluster import kmeans

    t, truth = _blob_table()
    assign, C = kmeans(rd.from_arrow(t).repartition(4), k=3, iters=5)
    df = assign.to_pandas().sort_values("vec_id")
    # each true blob maps to exactly one cluster label
    lab = df["cluster_id"].to_numpy()
    for b in range(3):
        assert len(set(lab[truth == b])) == 1
    assert len(set(lab)) == 3
    assert C.shape == (3, 8)


def test_kmeans_parallelism_invariant(ray_session):
    import ray.data as rd

    from simplefeatures_ray.functions.cluster import kmeans

    t, _ = _blob_table(n_per=50, d=6, seed=9)
    a1, C1 = kmeans(rd.from_arrow(t).repartition(8), k=4, iters=3)
    a2, C2 = kmeans(rd.from_arrow(t).repartition(2), k=4, iters=3)
    assert np.array_equal(C1, C2)
    d1 = a1.to_pandas().sort_values("vec_id")["cluster_id"].tolist()
    d2 = a2.to_pandas().sort_values("vec_id")["cluster_id"].tolist()
    assert d1 == d2


def test_kmeans_matches_sql_twin(ray_session):
    import duckdb
    import ray.data as rd

    from simplefeatures_ray.functions.cluster import kmeans, kmeans_sql

    t, _ = _blob_table(n_per=40, d=5, seed=13)
    assign, _ = kmeans(rd.from_arrow(t).repartition(3), k=3, iters=2)
    eng = assign.to_pandas().sort_values("vec_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("embeddings", t.to_pandas())
    ora = con.execute(kmeans_sql("embeddings", dim=5, k=3, iters=2)) \
             .fetchdf().sort_values("vec_id").reset_index(drop=True)
    assert eng["cluster_id"].tolist() == ora["cluster_id"].tolist()


def test_kmeans_too_few_vectors(ray_session):
    import pytest
    import ray.data as rd

    from simplefeatures_ray.functions.cluster import kmeans

    t = pa.table({
        "vec_id": pa.array([0, 1]),
        "embedding": pa.array([[1.0, 2.0], [3.0, 4.0]],
                              pa.list_(pa.float32())),
    })
    with pytest.raises(ValueError):
        kmeans(rd.from_arrow(t), k=5, iters=1)
