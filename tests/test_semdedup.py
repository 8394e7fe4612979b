"""SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — policy brute-force,
blocking invariance, and the measured margins emb_semdedup's decimeter-
style gate rests on (cosine-to-threshold and cc rounding-boundary)."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from simplefeatures_ray.functions.ann import _normalize
from simplefeatures_ray.functions.cluster import _assign, kmeans, semdedup


def _make_ds(X, ids=None):
    import ray.data as rd

    n, d = X.shape
    ids = np.arange(n, dtype=np.int64) if ids is None else ids
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(list(X.astype(np.float32))),
    }))


def _brute_removed(X, out, threshold):
    """Independent replay of the keep-farthest-from-centroid policy from
    the input vectors and the OUTPUT's (cluster, cc): removed(i) iff
    some same-cluster j with sim >= t has lexicographically smaller
    (cc, id)."""
    ids = np.asarray(out["vec_id"], dtype=np.int64)
    cl = np.asarray(out["cluster_id"], dtype=np.int64)
    cc = np.asarray(out["cc"], dtype=np.float64)
    # out rows may be permuted vs X rows: align X by id (ids here are
    # 0..n-1 row indices in these tests)
    Xo = _normalize(X[ids].astype(np.float64))
    S = Xo @ Xo.T
    rm = np.zeros(len(ids), dtype=bool)
    for i in range(len(ids)):
        for j in range(len(ids)):
            if i == j or cl[i] != cl[j] or S[i, j] < threshold:
                continue
            if (cc[j], ids[j]) < (cc[i], ids[i]):
                rm[i] = True
                break
    return rm


@pytest.fixture(scope="module")
def rand_corpus(ray_session):
    rng = np.random.default_rng(42)
    base = rng.normal(size=(120, 16))
    # plant 15 near-duplicate pairs (cosine ~ 0.999)
    dup = base[:15] + rng.normal(scale=0.01, size=(15, 16))
    X = np.vstack([base, dup])
    return X


class TestSemDeDupPolicy:
    def test_brute_force_policy(self, rand_corpus):
        X = rand_corpus
        out = semdedup(_make_ds(X), threshold=0.8, k=4, iters=2).take_all()
        out = pa.Table.from_pylist(out)
        assert len(out) == len(X)
        expect = _brute_removed(X, out, 0.8)
        got = np.asarray(out["removed"])
        assert np.array_equal(got, expect)
        # the planted dups actually triggered removals
        assert got.sum() >= 10

    def test_keeps_farthest_from_centroid(self, rand_corpus):
        X = rand_corpus
        out = pa.Table.from_pylist(
            semdedup(_make_ds(X), threshold=0.8, k=4, iters=2).take_all())
        ids = np.asarray(out["vec_id"], dtype=np.int64)
        cl = np.asarray(out["cluster_id"], dtype=np.int64)
        cc = np.asarray(out["cc"], dtype=np.float64)
        rm = np.asarray(out["removed"])
        Xn = _normalize(X[ids].astype(np.float64))
        S = Xn @ Xn.T
        # for every removed doc there is a kept-or-removed same-cluster
        # neighbor with smaller (cc, id); for every KEPT doc, none.
        for i in np.nonzero(rm)[0]:
            nb = (cl == cl[i]) & (S[i] >= 0.8) & (ids != ids[i])
            assert any((cc[j], ids[j]) < (cc[i], ids[i])
                       for j in np.nonzero(nb)[0])
        for i in np.nonzero(~rm)[0]:
            nb = (cl == cl[i]) & (S[i] >= 0.8) & (ids != ids[i])
            assert not any((cc[j], ids[j]) < (cc[i], ids[i])
                           for j in np.nonzero(nb)[0])

    def test_block_rows_invariance(self, rand_corpus):
        X = rand_corpus

        def run(block_rows):
            t = pa.Table.from_pylist(
                semdedup(_make_ds(X), threshold=0.8, k=4, iters=2,
                         block_rows=block_rows).take_all())
            idx = np.argsort(np.asarray(t["vec_id"]))
            return {c: np.asarray(t[c])[idx] for c in t.column_names}

        a, b = run(7), run(4096)
        for c in a:
            assert np.array_equal(a[c], b[c]), c


class TestGateMargins:
    """emb_semdedup compares raw cosines to threshold 0.35 and rounds cc
    to 6 dp in BOTH engines; these pins re-measure the margins the gate
    rests on for every shipped sf table."""

    @pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
    def test_margins(self, sf, ray_session):
        import ray.data as rd

        t = pq.read_table(f"/root/testdata/{sf}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        _, C = kmeans(rd.from_arrow(t), k=8, iters=3)
        X = np.asarray(t["embedding"].combine_chunks().values,
                       dtype=np.float64).reshape(t.num_rows, -1)
        a = _assign(X, C, 4)
        nv = np.sqrt((X * X).sum(1))
        ncn = np.sqrt((C * C).sum(1))
        cc = (X * C[a]).sum(1) / (nv * ncn[a])
        frac = np.abs(cc * 1e6 - np.floor(cc * 1e6) - 0.5)
        # measured minima: 6.0e-9 (sf0.001), 1.9e-9 (sf0.01), 1.05e-10
        # (sf0.1) — all >= 1e4 x the ~1e-16 raw cross-engine divergence
        assert frac.min() / 1e6 > 1e-12
        Xn = _normalize(X)
        margins = []
        for c in range(len(C)):
            sel = np.nonzero(a == c)[0]
            if len(sel) < 2:
                continue
            S = Xn[sel] @ Xn[sel].T
            iu = np.triu_indices(len(sel), 1)
            margins.append(np.abs(S[iu] - 0.35).min())
        assert min(margins) > 1e-6
