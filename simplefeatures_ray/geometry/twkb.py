"""TWKB codec (reference geom/twkb_parser.go:17, twkb_write.go:17-100,
zigzag varints geom/twkb.go:33-42).

Layout (TWKB spec, twkb.io):
  byte 0: low nibble = geometry type 1..7, high nibble = zigzag XY precision
  byte 1: metadata: bit0 bbox, bit1 size, bit2 idlist, bit3 ext dims, bit4 empty
  [ext dims byte]: bit0 hasZ, bit1 hasM, bits2-4 Z precision, bits5-7 M precision
  [size varint] [bbox: per-dim zigzag(min), zigzag(delta)] [idlist varints]
  body: counts + zigzag delta-encoded coordinates (deltas run across the
  whole geometry). Rings omit the closing point (writer option to keep).
"""
from __future__ import annotations

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


def zigzag(v: int) -> int:
    return ((v << 1) ^ (v >> 63)) & ((1 << 64) - 1) if v < 0 else (v << 1)


def unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def write_varint(out: bytearray, v: int):
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def byte(self) -> int:
        if self.pos >= len(self.buf):
            raise GeometryError("TWKB truncated")
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def varint(self) -> int:
        shift = 0
        out = 0
        while True:
            b = self.byte()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7
            if shift > 70:
                raise GeometryError("TWKB varint too long")

    def svarint(self) -> int:
        return unzigzag(self.varint())


class _Header:
    __slots__ = ("tag", "prec_xy", "has_bbox", "has_size", "has_ids", "is_empty",
                 "ctype", "prec_z", "prec_m", "size", "bbox", "dims", "scales")


def _read_header(r: _Reader) -> _Header:
    h = _Header()
    b0 = r.byte()
    h.tag = b0 & 0x0F
    if h.tag not in (1, 2, 3, 4, 5, 6, 7):
        raise GeometryError(f"invalid TWKB type {h.tag}")
    h.prec_xy = unzigzag(b0 >> 4)
    meta = r.byte()
    h.has_bbox = bool(meta & 0x01)
    h.has_size = bool(meta & 0x02)
    h.has_ids = bool(meta & 0x04)
    ext = bool(meta & 0x08)
    h.is_empty = bool(meta & 0x10)
    h.ctype = DIM_XY
    h.prec_z = h.prec_m = 0
    if ext:
        e = r.byte()
        if e & 0x01:
            h.ctype |= 0b01
        if e & 0x02:
            h.ctype |= 0b10
        h.prec_z = (e >> 2) & 0x07
        h.prec_m = (e >> 5) & 0x07
    h.dims = ctype_dimension(h.ctype)
    scales = [10.0 ** h.prec_xy, 10.0 ** h.prec_xy]
    if h.ctype & 0b01:
        scales.append(10.0 ** h.prec_z)
    if h.ctype & 0b10:
        scales.append(10.0 ** h.prec_m)
    h.scales = scales
    h.size = r.varint() if h.has_size else None
    h.bbox = None
    if h.has_bbox and not h.is_empty:
        box = []
        for _ in range(h.dims):
            mn = r.svarint()
            delta = r.svarint()
            box.append((mn, mn + delta))
        h.bbox = box
    return h


class _DeltaCursor:
    __slots__ = ("prev", "scales")

    def __init__(self, dims, scales):
        self.prev = [0] * dims
        self.scales = scales

    def read_points(self, r: _Reader, n: int) -> np.ndarray:
        dims = len(self.prev)
        out = np.zeros((n, dims))
        for i in range(n):
            for d in range(dims):
                self.prev[d] += r.svarint()
                out[i, d] = self.prev[d] / self.scales[d]
        return out


def from_twkb(buf: bytes) -> Geometry:
    r = _Reader(bytes(buf))
    return _read_geometry(r)


def _read_geometry(r: _Reader) -> Geometry:
    h = _read_header(r)
    dims = h.dims
    if h.is_empty:
        if h.tag == POINT:
            return Geometry(POINT, h.ctype, coords=None)
        if h.tag == LINESTRING:
            return Geometry(LINESTRING, h.ctype, coords=np.zeros((0, dims)))
        if h.tag == POLYGON:
            return Geometry(POLYGON, h.ctype, rings=[])
        return Geometry(h.tag, h.ctype, geoms=[])
    cur = _DeltaCursor(dims, h.scales)
    if h.tag == POINT:
        return Geometry(POINT, h.ctype, coords=cur.read_points(r, 1)[0])
    if h.tag == LINESTRING:
        n = r.varint()
        return Geometry(LINESTRING, h.ctype, coords=cur.read_points(r, n))
    if h.tag == POLYGON:
        return Geometry(POLYGON, h.ctype, rings=_read_rings(r, cur))
    if h.tag == MULTIPOINT:
        n = r.varint()
        if h.has_ids:
            [r.svarint() for _ in range(n)]
        pts = cur.read_points(r, n)
        return Geometry(MULTIPOINT, h.ctype,
                        geoms=[Geometry(POINT, h.ctype, coords=p) for p in pts])
    if h.tag == MULTILINESTRING:
        n = r.varint()
        if h.has_ids:
            [r.svarint() for _ in range(n)]
        lines = []
        for _ in range(n):
            m = r.varint()
            lines.append(Geometry(LINESTRING, h.ctype, coords=cur.read_points(r, m)))
        return Geometry(MULTILINESTRING, h.ctype, geoms=lines)
    if h.tag == MULTIPOLYGON:
        n = r.varint()
        if h.has_ids:
            [r.svarint() for _ in range(n)]
        polys = []
        for _ in range(n):
            polys.append(Geometry(POLYGON, h.ctype, rings=_read_rings(r, cur)))
        return Geometry(MULTIPOLYGON, h.ctype, geoms=polys)
    # GC
    n = r.varint()
    if h.has_ids:
        [r.svarint() for _ in range(n)]
    return Geometry(GEOMETRYCOLLECTION, h.ctype, geoms=[_read_geometry(r) for _ in range(n)])


def _read_rings(r: _Reader, cur: _DeltaCursor):
    nr = r.varint()
    rings = []
    for _ in range(nr):
        n = r.varint()
        pts = cur.read_points(r, n)
        if n >= 1 and not np.array_equal(pts[0], pts[-1]):
            pts = np.concatenate([pts, pts[:1]], axis=0)  # re-close ring
        rings.append(pts)
    return rings


# --------------------------------------------------------------------------- #
# writer
# --------------------------------------------------------------------------- #


def to_twkb(g: Geometry, prec_xy: int = 0, *, prec_z: int = 0, prec_m: int = 0,
            with_size: bool = False, with_bbox: bool = False,
            close_rings: bool = False, id_list=None) -> bytes:
    """Encode at the given decimal precisions (prec_xy in -8..+7;
    reference MarshalTWKB options twkb_write.go:63-100). id_list attaches
    per-element ids to a multi geometry (reference WithIDList option)."""
    if not -8 <= prec_xy <= 7:
        raise GeometryError("TWKB XY precision must be in -8..7")
    if id_list is not None:
        if g.tag not in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
            raise GeometryError("TWKB id list requires a multi geometry")
        if len(id_list) != len(g.geoms):
            raise GeometryError("TWKB id list length must match element count")
    out = bytearray()
    _write_geometry(out, g, prec_xy, prec_z, prec_m, with_size, with_bbox, close_rings,
                    id_list=id_list)
    return bytes(out)


class _Quantizer:
    __slots__ = ("prev", "scales")

    def __init__(self, dims, scales):
        self.prev = [0] * dims
        self.scales = scales

    def quantize(self, arr: np.ndarray):
        """(n, dims) floats -> list of int rows."""
        out = []
        for row in arr:
            out.append([int(round(float(row[d]) * self.scales[d]))
                        for d in range(len(self.prev))])
        return out

    def write_points(self, body: bytearray, rows):
        for row in rows:
            for d in range(len(self.prev)):
                write_varint(body, zigzag(row[d] - self.prev[d]))
                self.prev[d] = row[d]


def _write_geometry(out, g, prec_xy, prec_z, prec_m, with_size, with_bbox, close_rings,
                    id_list=None):
    has_z = bool(g.ctype & 0b01)
    has_m = bool(g.ctype & 0b10)
    dims = g.dim
    scales = [10.0 ** prec_xy] * 2
    if has_z:
        scales.append(10.0 ** prec_z)
    if has_m:
        scales.append(10.0 ** prec_m)
    empty = g.is_empty()

    out.append((g.tag & 0x0F) | ((zigzag(prec_xy) & 0x0F) << 4))
    meta = 0
    if with_bbox and not empty:
        meta |= 0x01
    if with_size:
        meta |= 0x02
    if id_list is not None and not empty:
        meta |= 0x04
    if has_z or has_m:
        meta |= 0x08
    if empty:
        meta |= 0x10
    out.append(meta)
    if has_z or has_m:
        e = (1 if has_z else 0) | (2 if has_m else 0)
        e |= (prec_z & 0x07) << 2
        e |= (prec_m & 0x07) << 5
        out.append(e)

    body = bytearray()
    if not empty:
        q = _Quantizer(dims, scales)
        all_rows = []
        _write_body(body, g, q, all_rows, close_rings, id_list=id_list,
                    precs=(prec_xy, prec_z, prec_m))
        if with_bbox:
            bbox = bytearray()
            arr = np.asarray(all_rows)
            for d in range(dims):
                mn = int(arr[:, d].min())
                mx = int(arr[:, d].max())
                write_varint(bbox, zigzag(mn))
                write_varint(bbox, zigzag(mx - mn))
            body = bbox + body
    if with_size:
        write_varint(out, len(body))
    out.extend(body)


def _write_ids(body, id_list):
    if id_list is not None:
        for v in id_list:
            write_varint(body, zigzag(int(v)))


def _write_body(body, g, q, all_rows, close_rings, id_list=None,
                precs=(0, 0, 0)):
    t = g.tag
    if t == POINT:
        rows = q.quantize(g.coords.reshape(1, -1))
        all_rows.extend(rows)
        q.write_points(body, rows)
        return
    if t == LINESTRING:
        rows = q.quantize(g.coords)
        all_rows.extend(rows)
        write_varint(body, len(rows))
        q.write_points(body, rows)
        return
    if t == POLYGON:
        _write_rings(body, g.rings, q, all_rows, close_rings)
        return
    if t == MULTIPOINT:
        # Empty points are unrepresentable inside a TWKB multipoint: filter
        # them AND their ids in lockstep, else the reader mis-aligns the
        # id stream against the written element count.
        pts = [p for p in g.geoms if p.coords is not None]
        if id_list is not None:
            id_list = [v for p, v in zip(g.geoms, id_list)
                       if p.coords is not None]
        write_varint(body, len(pts))
        _write_ids(body, id_list)
        for p in pts:
            rows = q.quantize(p.coords.reshape(1, -1))
            all_rows.extend(rows)
            q.write_points(body, rows)
        return
    if t == MULTILINESTRING:
        write_varint(body, len(g.geoms))
        _write_ids(body, id_list)
        for l in g.geoms:
            rows = q.quantize(l.coords)
            all_rows.extend(rows)
            write_varint(body, len(rows))
            q.write_points(body, rows)
        return
    if t == MULTIPOLYGON:
        write_varint(body, len(g.geoms))
        _write_ids(body, id_list)
        for p in g.geoms:
            _write_rings(body, p.rings, q, all_rows, close_rings)
        return
    # GC: nested full TWKB values share nothing with the outer cursor, but
    # inherit the parent's precisions (reference twkb_write.go copytwkbWriter:
    # "Same precision as in parent").
    write_varint(body, len(g.geoms))
    _write_ids(body, id_list)
    for sub in g.geoms:
        sub_out = bytearray()
        _write_geometry(sub_out, sub, precs[0], precs[1], precs[2],
                        False, False, close_rings)
        body.extend(sub_out)


def _write_rings(body, rings, q, all_rows, close_rings):
    write_varint(body, len(rings))
    for ring in rings:
        rows = q.quantize(ring)
        if not close_rings and len(rows) >= 2 and rows[0] == rows[-1]:
            rows = rows[:-1]
        all_rows.extend(rows)
        write_varint(body, len(rows))
        q.write_points(body, rows)


# header-only probes (reference UnmarshalTWKBEnvelope/Size/IDList,
# twkb_parser.go:34-82) — cheap metadata scans that never decode the body


def twkb_envelope(buf: bytes):
    """Decoded bbox (minx,miny,maxx,maxy) or None when absent/empty."""
    r = _Reader(bytes(buf))
    h = _read_header(r)
    if h.bbox is None:
        return None
    (x0, x1), (y0, y1) = h.bbox[0], h.bbox[1]
    s = h.scales[0]
    return (x0 / s, y0 / s, x1 / s, y1 / s)


def twkb_size(buf: bytes):
    """Payload size from the size header, or None when absent."""
    r = _Reader(bytes(buf))
    h = _read_header(r)
    return h.size


def twkb_id_list(buf: bytes):
    """The idlist of a multi geometry, or [] when absent."""
    r = _Reader(bytes(buf))
    h = _read_header(r)
    if not h.has_ids or h.is_empty:
        return []
    n = r.varint()
    return [r.svarint() for _ in range(n)]
