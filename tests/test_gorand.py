"""Bit-exactness of the Go ``math/rand`` emulation (gorand.GoRand).

The oracle values are well-known published outputs of Go's global
generator / ``rand.New(rand.NewSource(1))`` (identical streams) — e.g. the
canonical ``Int63() == 5577006791947779410`` that appears in the Go
documentation examples.  Matching them transitively pins the cooked-table
jump-ahead derivation (7.8e12 polynomial-exponentiation steps), the MINSTD
seeding fill and the tap/feed stepping order; the R-tree golden-structure
suite (tests/test_rtree_golden.py) then pins seed 0 against the reference's
own 103-row checksum table.
"""
from __future__ import annotations

from simplefeatures_ray.gorand import GoRand


def test_seed1_int63_stream():
    r = GoRand(1)
    assert r.int63() == 5577006791947779410
    assert r.int63() == 8674665223082153551
    assert r.int63() == 6129484611666145821


def test_seed1_float64():
    assert GoRand(1).float64() == 0.6046602879796196


def test_seed1_intn_stream():
    r = GoRand(1)
    assert [r.intn(100) for _ in range(10)] == [81, 87, 47, 59, 81, 18, 25, 40, 56, 0]


def test_seed_normalisation():
    # seed 0 maps to the sentinel 89482311; negative seeds wrap mod 2^31-1.
    assert GoRand(0).int63() == GoRand(89482311).int63()
    m31 = (1 << 31) - 1
    assert GoRand(5).int63() == GoRand(5 + m31).int63()


def test_shuffle_is_deterministic():
    a = list(range(20))
    b = list(range(20))

    def swap_a(i, j):
        a[i], a[j] = a[j], a[i]

    def swap_b(i, j):
        b[i], b[j] = b[j], b[i]

    GoRand(0).shuffle(20, swap_a)
    GoRand(0).shuffle(20, swap_b)
    assert a == b and sorted(a) == list(range(20)) and a != list(range(20))
