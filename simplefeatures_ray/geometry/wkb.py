"""WKB codec (reference: geom/wkb_parser.go:14, geom/wkb_marshal.go:10-24).

ISO WKB: type code = base + 1000*Z + 2000*M + 3000*ZM. Both endiannesses
accepted on read (the reference accepts both, wkb_parser.go); writes are
little-endian. Empty points round-trip as NaN ordinates (PostGIS
convention, matched by the reference parser). Bulk float decode uses
numpy frombuffer (the reference has the same fast path,
wkb_parser.go:253-269).
"""
from __future__ import annotations

import struct

import numpy as np

from .core import (
    DIM_XY,
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
    GeometryError,
    ctype_dimension,
)

_CTYPE_TO_OFFSET = {0b00: 0, 0b01: 1000, 0b10: 2000, 0b11: 3000}
_OFFSET_TO_CTYPE = {0: 0b00, 1000: 0b01, 2000: 0b10, 3000: 0b11}


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def byte(self) -> int:
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def u32(self, little: bool) -> int:
        v = struct.unpack_from("<I" if little else ">I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def floats(self, n: int, little: bool) -> np.ndarray:
        end = self.pos + 8 * n
        if end > len(self.buf):
            raise GeometryError("WKB truncated")
        arr = np.frombuffer(self.buf, dtype="<f8" if little else ">f8", count=n, offset=self.pos)
        self.pos = end
        return arr.astype(np.float64, copy=False)


def from_wkb(buf: bytes) -> Geometry:
    if isinstance(buf, memoryview):
        buf = bytes(buf)
    r = _Reader(buf)
    return _read_geometry(r)


def _read_geometry(r: _Reader) -> Geometry:
    order = r.byte()
    if order not in (0, 1):
        raise GeometryError(f"invalid WKB byte order {order}")
    little = order == 1
    code = r.u32(little)
    base = code % 1000
    off = code - base
    if base not in (1, 2, 3, 4, 5, 6, 7) or off not in _OFFSET_TO_CTYPE:
        raise GeometryError(f"invalid WKB geometry type {code}")
    ctype = _OFFSET_TO_CTYPE[off]
    dim = ctype_dimension(ctype)

    if base == POINT:
        vals = r.floats(dim, little)
        if np.all(np.isnan(vals)):
            return Geometry(POINT, ctype, coords=None)
        return Geometry(POINT, ctype, coords=np.array(vals))

    if base == LINESTRING:
        n = r.u32(little)
        arr = r.floats(n * dim, little).reshape(n, dim)
        return Geometry(LINESTRING, ctype, coords=np.array(arr))

    if base == POLYGON:
        nr = r.u32(little)
        rings = []
        for _ in range(nr):
            n = r.u32(little)
            rings.append(np.array(r.floats(n * dim, little).reshape(n, dim)))
        return Geometry(POLYGON, ctype, rings=rings)

    n = r.u32(little)
    geoms = [_read_geometry(r) for _ in range(n)]
    want = {MULTIPOINT: POINT, MULTILINESTRING: LINESTRING, MULTIPOLYGON: POLYGON}.get(base)
    if want is not None:
        for g in geoms:
            if g.tag != want:
                raise GeometryError("WKB multi element of wrong type")
    return Geometry(base, ctype, geoms=geoms)


# --------------------------------------------------------------------------- #
# writer (little-endian)
# --------------------------------------------------------------------------- #


def _w_header(out: bytearray, tag: int, ctype: int):
    out.append(1)
    out += struct.pack("<I", tag + _CTYPE_TO_OFFSET[ctype])


def _w_floats(out: bytearray, arr: np.ndarray):
    out += np.ascontiguousarray(arr, dtype="<f8").tobytes()


def to_wkb(g: Geometry) -> bytes:
    out = bytearray()
    _write_geometry(out, g)
    return bytes(out)


def _write_geometry(out: bytearray, g: Geometry):
    t = g.tag
    _w_header(out, t, g.ctype)
    dim = g.dim
    if t == POINT:
        if g.coords is None:
            _w_floats(out, np.full(dim, np.nan))
        else:
            _w_floats(out, g.coords)
        return
    if t == LINESTRING:
        out += struct.pack("<I", len(g.coords))
        _w_floats(out, g.coords)
        return
    if t == POLYGON:
        out += struct.pack("<I", len(g.rings))
        for ring in g.rings:
            out += struct.pack("<I", len(ring))
            _w_floats(out, ring)
        return
    out += struct.pack("<I", len(g.geoms))
    for sub in g.geoms:
        _write_geometry(out, sub)
