"""Deletion-neighborhood edit-distance-1 join vs brute force."""
import itertools

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from simplefeatures_ray.functions.strsim import _lev_le1, editdist1_pairs


def _lev(a: str, b: str) -> int:
    # textbook DP, the independent reference
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.mark.parametrize("a,b", [
    ("ab", "ba"), ("abc", "abc"), ("abc", "abd"), ("abc", "ab"),
    ("abc", "abcd"), ("", ""), ("", "a"), ("", "ab"), ("aaa", "aba"),
    ("xy", "yx"), ("abcd", "acbd"), ("kitten", "sitten"),
])
def test_lev_le1_matches_dp(a, b):
    assert _lev_le1(a, b) == (_lev(a, b) <= 1)
    assert _lev_le1(b, a) == (_lev(b, a) <= 1)


def test_lev_le1_random_fuzz():
    rng = np.random.default_rng(3)
    alpha = "abc"
    for _ in range(500):
        a = "".join(rng.choice(list(alpha), rng.integers(0, 6)))
        b = "".join(rng.choice(list(alpha), rng.integers(0, 6)))
        assert _lev_le1(a, b) == (_lev(a, b) <= 1), (a, b)


def test_editdist1_pairs_exact_vs_brute(ray_session):
    rng = np.random.default_rng(11)
    base = ["node-%03d" % i for i in range(40)]
    # mutate some to create true pairs, incl. transpositions (dist 2)
    names = base + ["node-%03d" % i for i in range(0, 40, 3)] \
        + [s[::-1] for s in base[:5]] + ["node-01" + str(d) for d in range(10)]
    ids = list(range(len(names)))
    ds = rd.from_arrow(pa.table({
        "rid": pa.array(ids, pa.int64()),
        "name": pa.array(names, pa.string()),
    })).repartition(5)
    got = editdist1_pairs(ds, "rid", "name").to_pandas()
    got_set = set(zip(got["id_a"], got["id_b"]))
    want = {(i, j) for i, j in itertools.combinations(ids, 2)
            if _lev(names[i], names[j]) <= 1}
    assert got_set == want and len(want) > 10


def test_editdist1_unicode_names(ray_session):
    """Multi-byte UTF-8 names (char-hamming != byte-hamming) must still
    verify exactly via the reference path; ASCII majority stays on the
    vectorized verify."""
    import itertools

    import ray.data as rd

    from simplefeatures_ray.functions.strsim import _lev_le1, editdist1_pairs

    names = ["café", "cafe", "cafés", "caffé", "cafz", "münchen",
             "munchen", "münchén", "ab", "ba", "aé", "éa", "a", "",
             "resume", "résumé", "résume", "resumé"]
    t = pa.table({"cid": pa.array(np.arange(len(names), dtype=np.int64)),
                  "name": pa.array(names, pa.string())})
    got = (editdist1_pairs(rd.from_arrow(t).repartition(3), "cid", "name",
                           n_parts=8).to_pandas()
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    exp = [(i, j) for i, j in itertools.combinations(range(len(names)), 2)
           if _lev_le1(names[i], names[j])]
    assert list(map(tuple, got.to_numpy())) == exp
