"""Hierarchical spatial cell index (H3/S2-style), built on a Web-Mercator
quadtree with Morton (Z-order) codes.

The engine's tiling substrate: lon/lat -> uint64 cell id at a resolution
0..30. Cell ids are self-delimiting (leading 1 bit above 2*res payload
bits, like S2 tokens), so parent/child are plain shifts and a single
uint64 column carries mixed resolutions. The Web-Mercator forward
transform matches the reference's carto projection
(/root/reference/carto/proj_web_mercator.go:24-57). All functions are
numpy-vectorized; this is a hot kernel in the page-encode stage.
"""
from __future__ import annotations

import numpy as np

MAX_LAT = 85.05112878  # Web-Mercator clamp
MAX_RES = 30


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between bits of 32-bit values (Morton helper)."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact_bits(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def mercator_xy(lon: np.ndarray, lat: np.ndarray):
    """Web-Mercator forward to unit square [0,1)^2 (y grows southward)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    x = (lon + 180.0) / 360.0
    rad = np.radians(lat)
    y = (1.0 - np.log(np.tan(np.pi / 4.0 + rad / 2.0)) / np.pi) / 2.0
    return x, y


def lonlat_to_cell(lon, lat, res: int) -> np.ndarray:
    """uint64 cell ids at resolution `res` for arrays of lon/lat degrees."""
    if not (0 <= res <= MAX_RES):
        raise ValueError(f"resolution must be 0..{MAX_RES}")
    x, y = mercator_xy(lon, lat)
    n = np.uint64(1) << np.uint64(res)
    scale = float(1 << res)
    ix = np.minimum(np.floor(x * scale), scale - 1).astype(np.uint64)
    iy = np.minimum(np.floor(y * scale), scale - 1).astype(np.uint64)
    ix = np.maximum(ix, np.uint64(0))
    iy = np.maximum(iy, np.uint64(0))
    morton = _spread_bits(ix) | (_spread_bits(iy) << np.uint64(1))
    return (np.uint64(1) << np.uint64(2 * res)) | morton


def cell_res(cell: np.ndarray) -> np.ndarray:
    """Resolution of each self-delimiting cell id."""
    cell = np.asarray(cell, dtype=np.uint64)
    bits = np.zeros(cell.shape, dtype=np.int64)
    v = cell.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(shift))
        bits[m] += shift
        v[m] >>= np.uint64(shift)
    return bits // 2


def cell_parent(cell: np.ndarray, levels: int = 1) -> np.ndarray:
    return np.asarray(cell, dtype=np.uint64) >> np.uint64(2 * levels)


def cell_children(cell: int) -> list[int]:
    c = int(cell) << 2
    return [c, c | 1, c | 2, c | 3]


def cell_token(cell) -> str:
    return format(int(cell), "x")


def token_to_cell(token: str) -> int:
    return int(token, 16)


def cell_bounds_xy(cell: np.ndarray):
    """Unit-square (x0, y0, x1, y1) bounds of each cell."""
    cell = np.asarray(cell, dtype=np.uint64)
    res = cell_res(cell)
    payload = cell ^ (np.uint64(1) << (np.uint64(2) * res.astype(np.uint64)))
    ix = _compact_bits(payload)
    iy = _compact_bits(payload >> np.uint64(1))
    size = 1.0 / (1 << res).astype(np.float64) if isinstance(res, np.ndarray) else 1.0 / (1 << res)
    size = np.power(2.0, -res.astype(np.float64))
    x0 = ix.astype(np.float64) * size
    y0 = iy.astype(np.float64) * size
    return x0, y0, x0 + size, y0 + size


def cell_center_lonlat(cell: np.ndarray):
    x0, y0, x1, y1 = cell_bounds_xy(cell)
    cx = (x0 + x1) / 2
    cy = (y0 + y1) / 2
    lon = cx * 360.0 - 180.0
    lat = np.degrees(2.0 * np.arctan(np.exp((1.0 - 2.0 * cy) * np.pi)) - np.pi / 2.0)
    return lon, lat
