"""S2 cell ids: cube-face + quadratic-ST projection + Hilbert curve.

The real S2 cell scheme (as published in the open-source S2 geometry
library's docs and the "S2 cells" spec), implemented from the public
algorithm description with numpy-vectorized kernels:

  lon/lat -> unit XYZ -> cube face (0..5) -> (u,v) on the face plane
  -> quadratic s/t in [0,1] -> 30-bit (i,j) -> 60-bit Hilbert position
  -> 64-bit cell id  =  face<<61 | pos<<1 | 1   (leaf)

Non-leaf ids replace the low bits with a single "lsb" marker bit, so a
cell at level L has lsb = 1 << (2*(30-L)) and ids are self-delimiting.
Tokens are the id's 16-digit hex with trailing zeros stripped.

Why this exists next to cells.py (Web-Mercator Morton quadtree): the
Morton scheme is the engine's fast tiling substrate; this module is the
interoperable S2 index (north rule: "encoded into H3/S2 cells") whose
ids match the de-facto standard bit layout, so tile assignments can be
exchanged with external S2-based systems. The Hilbert traversal (unlike
Morton) guarantees adjacent positions are adjacent cells, which keeps
range-sharded shuffles spatially local.

Everything is vectorized: the Hilbert transform consumes 4 bits of i and
j per step through a 4096-entry lookup table (8 fancy-indexed numpy
steps per batch), the standard publicly-documented technique.

Reference parity note: the reference repo has no cell index; this module
extends SURVEY.md §2.6 tiling with standard-layout ids. Correctness is
gated by (a) an independent scalar recursion in tests (no LUT), and
(b) the `s2_cell_counts` driver oracle, which re-derives face/pos in
pure SQL arithmetic joined against the LUT as a VALUES table.
"""
from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_LOOKUP_BITS = 4
_SWAP = 1
_INVERT = 2

# Hilbert sub-cell traversal order per orientation, and the orientation
# change applied when descending into each position. These four arrays
# are the definitional data of the S2 Hilbert curve.
POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],  # canonical
        [0, 2, 3, 1],  # swap
        [3, 2, 0, 1],  # invert
        [3, 1, 0, 2],  # swap + invert
    ],
    dtype=np.int64,
)
POS_TO_ORIENTATION = np.array([_SWAP, 0, 0, _INVERT | _SWAP], dtype=np.int64)
IJ_TO_POS = np.zeros((4, 4), dtype=np.int64)
for _o in range(4):
    for _p in range(4):
        IJ_TO_POS[_o, POS_TO_IJ[_o, _p]] = _p


def _build_lookup() -> tuple[np.ndarray, np.ndarray]:
    """4-bit-group Hilbert tables.

    lookup_pos[(i4<<6)|(j4<<2)|orient] = (pos8<<2)|orient_out
    lookup_ij [(pos8<<2)|orient]       = ((i4<<4)|j4)<<2 | orient_out
    """
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)

    def rec(level: int, i: int, j: int, orig: int, pos: int, orient: int):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig] = (pos << 2) + orient
            lookup_ij[(pos << 2) + orig] = (ij << 2) + orient
            return
        r = POS_TO_IJ[orient]
        for index in range(4):
            rec(
                level + 1,
                (i << 1) + (int(r[index]) >> 1),
                (j << 1) + (int(r[index]) & 1),
                orig,
                (pos << 2) + index,
                orient ^ int(POS_TO_ORIENTATION[index]),
            )

    for orientation in range(4):
        rec(0, 0, 0, orientation, 0, orientation)
    return lookup_pos, lookup_ij


LOOKUP_POS, LOOKUP_IJ = _build_lookup()


# ---------------------------------------------------------------- projections
def lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray):
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    cl = np.cos(lat)
    return cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)


def xyz_to_face_uv(x, y, z):
    """Largest-|component| cube face and the (u,v) in-face coordinates."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve, de) in enumerate(
        [
            (lambda: y, lambda: z, lambda: x),      # +x
            (lambda: -x, lambda: z, lambda: y),     # +y
            (lambda: -x, lambda: -y, lambda: z),    # +z
            (lambda: z, lambda: y, lambda: x),      # -x
            (lambda: z, lambda: -x, lambda: y),     # -y
            (lambda: -y, lambda: -x, lambda: z),    # -z
        ]
    ):
        m = face == f
        if m.any():
            d = de()[m]
            u[m] = ue()[m] / d
            v[m] = ve()[m] / d
    return face, u, v


def face_uv_to_xyz(face, u, v):
    face = np.asarray(face, dtype=np.int64)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    xs = [one, -u, -u, -one, v, v]
    ys = [u, one, -v, -v, -one, u]
    zs = [v, v, one, -u, -u, -one]
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f in range(6):
        m = face == f
        if m.any():
            x[m], y[m], z[m] = xs[f][m], ys[f][m], zs[f][m]
    return x, y, z


def uv_to_st(u):
    """S2's quadratic projection (the library default)."""
    u = np.asarray(u, dtype=np.float64)
    neg = u < 0
    out = 0.5 * np.sqrt(1.0 + 3.0 * np.where(neg, 0.0, u))
    if neg.any():
        out[neg] = 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u[neg])
    return out


def st_to_uv(s):
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))
    )


def st_to_ij(s):
    return np.clip(np.floor(np.asarray(s) * (1 << MAX_LEVEL)), 0, (1 << MAX_LEVEL) - 1).astype(
        np.int64
    )


# ---------------------------------------------------------------- encode
def face_ij_to_id(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Leaf (level-30) cell ids from face + 30-bit ij, vectorized LUT walk."""
    face = np.asarray(face, dtype=np.uint64)
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    n = face << np.uint64(60)
    bits = (face & np.uint64(_SWAP)).astype(np.int64)
    mask = np.int64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        kk = np.uint64(k * _LOOKUP_BITS)
        bits += (((i >> kk).astype(np.int64) & mask) << (_LOOKUP_BITS + 2))
        bits += (((j >> kk).astype(np.int64) & mask) << 2)
        bits = LOOKUP_POS[bits]
        n |= (bits >> 2).astype(np.uint64) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    return n * np.uint64(2) + np.uint64(1)


def lonlat_to_id(lon, lat, level: int = MAX_LEVEL) -> np.ndarray:
    """uint64 S2 cell ids at `level` for arrays of lon/lat degrees."""
    if not (0 <= level <= MAX_LEVEL):
        raise ValueError(f"level must be 0..{MAX_LEVEL}")
    x, y, z = lonlat_to_xyz(lon, lat)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    ids = face_ij_to_id(face, i, j)
    return parent(ids, level) if level < MAX_LEVEL else ids


def parent(ids: np.ndarray, level: int) -> np.ndarray:
    """Ancestor at `level` (ids must be at a level >= `level`)."""
    ids = np.asarray(ids, dtype=np.uint64)
    new_lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (ids & ~(new_lsb - np.uint64(1))) | new_lsb


def cell_level(ids: np.ndarray) -> np.ndarray:
    """Level of each id (position of the lsb marker bit)."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = ids & ~(ids - np.uint64(1))
    # log2(lsb) via float is exact for powers of two < 2^63
    return (MAX_LEVEL - (np.log2(lsb.astype(np.float64)).astype(np.int64) // 2)).astype(np.int64)


def cell_face(ids: np.ndarray) -> np.ndarray:
    return (np.asarray(ids, dtype=np.uint64) >> np.uint64(61)).astype(np.int64)


def cell_pos(ids: np.ndarray, level: int) -> np.ndarray:
    """Hilbert position truncated to `level` (2*level bits), as int64."""
    ids = np.asarray(ids, dtype=np.uint64)
    pos60 = (ids & ((np.uint64(1) << np.uint64(61)) - np.uint64(1))) >> np.uint64(1)
    return (pos60 >> np.uint64(2 * (MAX_LEVEL - level))).astype(np.int64)


# ---------------------------------------------------------------- decode
def id_to_face_ij(ids: np.ndarray):
    """(face, i, j, orientation) of the leaf-aligned corner of each cell."""
    ids = np.asarray(ids, dtype=np.uint64)
    face = (ids >> np.uint64(61)).astype(np.int64)
    bits = (face & _SWAP).astype(np.int64)
    i = np.zeros(len(ids), dtype=np.int64)
    j = np.zeros(len(ids), dtype=np.int64)
    for k in range(7, -1, -1):
        nbits = (MAX_LEVEL - 7 * _LOOKUP_BITS) if k == 7 else _LOOKUP_BITS
        bits += ((ids >> np.uint64(k * 2 * _LOOKUP_BITS + 1)).astype(np.int64)
                 & ((1 << (2 * nbits)) - 1)) << 2
        bits = LOOKUP_IJ[bits]
        i += (bits >> (_LOOKUP_BITS + 2)) << (k * _LOOKUP_BITS)
        j += ((bits >> 2) & ((1 << _LOOKUP_BITS) - 1)) << (k * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    return face, i, j, bits


def id_center_lonlat(ids: np.ndarray):
    """(lon, lat) degrees of each cell's center point."""
    ids = np.asarray(ids, dtype=np.uint64)
    face, i, j, _ = id_to_face_ij(ids)
    is_leaf = (ids & np.uint64(1)).astype(bool)
    # center si/ti: leaf centers sit at odd si/ti; larger cells at the
    # midpoint of their ij range (delta 0 or 2 depending on curve parity)
    delta = np.where(is_leaf, 1, np.where(((i ^ (ids >> np.uint64(2)).astype(np.int64)) & 1) != 0, 2, 0))
    si = 2 * i + delta
    ti = 2 * j + delta
    s = si.astype(np.float64) / float(1 << (MAX_LEVEL + 1))
    t = ti.astype(np.float64) / float(1 << (MAX_LEVEL + 1))
    u = st_to_uv(s)
    v = st_to_uv(t)
    x, y, z = face_uv_to_xyz(face, u, v)
    norm = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(np.clip(z / norm, -1, 1)))
    lon = np.degrees(np.arctan2(y, x))
    return lon, lat


# ---------------------------------------------------------------- tokens
def id_to_token(ids) -> np.ndarray:
    """Standard S2 tokens: 16-hex-digit id with trailing zeros stripped."""
    ids = np.atleast_1d(np.asarray(ids, dtype=np.uint64))
    out = np.empty(len(ids), dtype=object)
    for ix, v in enumerate(ids):
        if v == 0:
            out[ix] = "X"
        else:
            out[ix] = format(int(v), "016x").rstrip("0")
    return out


def token_to_id(tokens) -> np.ndarray:
    out = np.empty(len(tokens), dtype=np.uint64)
    for ix, t in enumerate(tokens):
        out[ix] = 0 if t in ("", "X", "x") else int(t.ljust(16, "0"), 16)
    return out


def lut_values_sql() -> str:
    """The 4096-entry Hilbert lookup table as a SQL VALUES list.

    Emitted into the driver's `s2_cell_counts` oracle so DuckDB can walk
    the same definitional curve data with its own arithmetic — the SQL
    side recomputes face/u,v/s,t/i,j from scratch and joins this table
    three times (the level-10 position needs only the top three 4-bit
    groups of i and j)."""
    return ", ".join(f"({k},{int(v)})" for k, v in enumerate(LOOKUP_POS))


def range_min(ids: np.ndarray) -> np.ndarray:
    """Smallest leaf id contained in each cell."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = ids & ~(ids - np.uint64(1))
    return ids - lsb + np.uint64(1)


def range_max(ids: np.ndarray) -> np.ndarray:
    """Largest leaf id contained in each cell."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = ids & ~(ids - np.uint64(1))
    return ids + lsb - np.uint64(1)
