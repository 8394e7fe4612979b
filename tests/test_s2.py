"""S2 cell ids: vectorized LUT walk vs an independent scalar recursion.

The scalar oracle below re-derives everything from the definitional
Hilbert tables (POS_TO_IJ / orientation masks) with a bit-at-a-time
descent and scalar math.trig — no lookup tables, no numpy — so it
exercises a genuinely different code path from s2.py's 4-bit LUT walk.
"""
from __future__ import annotations

import math

import numpy as np
import pytest

from simplefeatures_ray import s2


# ---------------------------------------------------------------- scalar oracle
def _scalar_leaf_id(lon_deg: float, lat_deg: float) -> int:
    lon = math.radians(lon_deg)
    lat = math.radians(lat_deg)
    x = math.cos(lat) * math.cos(lon)
    y = math.cos(lat) * math.sin(lon)
    z = math.sin(lat)
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        face, major = 0, x
    elif ay >= az:
        face, major = 1, y
    else:
        face, major = 2, z
    if major < 0:
        face += 3
    if face == 0:
        u, v = y / x, z / x
    elif face == 1:
        u, v = -x / y, z / y
    elif face == 2:
        u, v = -x / z, -y / z
    elif face == 3:
        u, v = z / x, y / x
    elif face == 4:
        u, v = z / y, -x / y
    else:
        u, v = -y / z, -x / z

    def st(w: float) -> float:
        if w >= 0:
            return 0.5 * math.sqrt(1.0 + 3.0 * w)
        return 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * w)

    def ij(s: float) -> int:
        return min(max(int(math.floor(s * (1 << 30))), 0), (1 << 30) - 1)

    i, j = ij(st(u)), ij(st(v))
    pos = 0
    orientation = face & 1
    for k in range(29, -1, -1):
        cell_ij = 2 * ((i >> k) & 1) + ((j >> k) & 1)
        p = int(s2.IJ_TO_POS[orientation, cell_ij])
        pos = (pos << 2) | p
        orientation ^= int(s2.POS_TO_ORIENTATION[p])
    return (face << 61) | (pos << 1) | 1


def test_vectorized_matches_scalar_recursion():
    rng = np.random.default_rng(20260817)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-90, 90, 2000)
    # sprinkle exact face centers / corners / poles
    lon = np.concatenate([lon, [0, 90, 180, -90, 0, 0, 45, -135]])
    lat = np.concatenate([lat, [0, 0, 0, 0, 90, -90, 35.26, -35.26]])
    got = s2.lonlat_to_id(lon, lat)
    want = np.array([_scalar_leaf_id(a, b) for a, b in zip(lon, lat)], dtype=np.uint64)
    assert np.array_equal(got, want)


def test_face_centers_level0():
    lon = [0.0, 90.0, 0.0, 180.0, -90.0, 0.0]
    lat = [0.0, 0.0, 90.0, 0.0, 0.0, -90.0]
    ids = s2.lonlat_to_id(lon, lat, level=0)
    want = np.array([(f << 61) | (1 << 60) for f in range(6)], dtype=np.uint64)
    assert np.array_equal(ids, want)
    assert np.array_equal(s2.cell_level(ids), np.zeros(6, dtype=np.int64))
    assert np.array_equal(s2.cell_face(ids), np.arange(6))


def test_center_roundtrip_all_levels():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-89.9, 89.9, 300)
    leaf = s2.lonlat_to_id(lon, lat)
    for level in (0, 3, 10, 17, 24, 30):
        cells = s2.parent(leaf, level)
        assert np.array_equal(s2.cell_level(cells), np.full(len(cells), level))
        clon, clat = s2.id_center_lonlat(cells)
        back = s2.lonlat_to_id(clon, clat, level=level)
        assert np.array_equal(back, cells)


def test_parent_containment_and_ranges():
    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    leaf = s2.lonlat_to_id(lon, lat)
    for level in (2, 9, 15, 29):
        cells = s2.parent(leaf, level)
        lo, hi = s2.range_min(cells), s2.range_max(cells)
        assert bool(np.all(lo <= leaf)) and bool(np.all(leaf <= hi))
        # deeper parent of the leaf nests inside the shallower one
        deeper = s2.parent(leaf, level + 1)
        assert np.array_equal(s2.parent(deeper, level), cells)


def test_tokens_roundtrip():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    for level in (0, 12, 30):
        ids = s2.lonlat_to_id(lon, lat, level=level)
        toks = s2.id_to_token(ids)
        assert np.array_equal(s2.token_to_id(list(toks)), ids)
        # tokens never end in '0' and are at most 16 chars
        assert all(1 <= len(t) <= 16 and not t.endswith("0") for t in toks)
    assert s2.id_to_token([0])[0] == "X"
    assert s2.token_to_id(["X"])[0] == 0


def test_pos_prefix_consistent_with_parent():
    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 400)
    lat = rng.uniform(-90, 90, 400)
    leaf = s2.lonlat_to_id(lon, lat)
    p10 = s2.parent(leaf, 10)
    # pos-at-level-10 read off the leaf equals the parent's own position
    assert np.array_equal(s2.cell_pos(leaf, 10), s2.cell_pos(p10, 10))


def test_level_validation():
    with pytest.raises(ValueError):
        s2.lonlat_to_id([0.0], [0.0], level=31)


def test_hilbert_locality_beats_morton():
    """Adjacent Hilbert positions should be spatially adjacent cells —
    the property that makes range-sharded shuffles locality-preserving.
    Walk 4096 consecutive level-6 positions on one face and check every
    consecutive pair's centers are within ~2 cell diagonals."""
    level = 6
    n = 1 << (2 * level)  # all positions on face 0
    pos = np.arange(n, dtype=np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (s2.MAX_LEVEL - level))
    ids = (pos << np.uint64(2 * (s2.MAX_LEVEL - level) + 1)) | lsb
    lon, lat = s2.id_center_lonlat(ids)
    x, y, z = s2.lonlat_to_xyz(lon, lat)
    d2 = (np.diff(x) ** 2 + np.diff(y) ** 2 + np.diff(z) ** 2)
    # a level-6 cell edge is ~ (pi/2)/64 rad; adjacent centers must stay
    # within a few edge lengths (Hilbert guarantees edge adjacency)
    max_step = float(np.sqrt(d2.max()))
    assert max_step < 3.0 * (math.pi / 2) / (1 << level)
