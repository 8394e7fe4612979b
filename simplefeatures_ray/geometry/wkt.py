"""WKT codec (reference: geom/wkt_parser.go:21, geom/wkt_lexer.go).

Recursive-descent parser over a regex tokenizer; supports all 7 types,
EMPTY at every level, Z/M/ZM suffixes, MULTIPOINT with or without inner
parens, and `MULTIPOINT(EMPTY, (1 2))` style empty elements.

Writer emits minimal-digit floats (shortest round-trip, no exponent),
matching the reference's strconv-style formatting.
"""
from __future__ import annotations

import math
import re

import numpy as np

from .core import (
    DIM_XY,
    DIM_XYM,
    DIM_XYZ,
    DIM_XYZM,
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    CTYPE_SUFFIX,
    Geometry,
    GeometryError,
    ctype_dimension,
)

_TOKEN = re.compile(
    r"""\s*(
        [A-Za-z][A-Za-z0-9]*      # keyword
      | [-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?   # number
      | \(|\)|,
    )""",
    re.X,
)

_TYPE_WORDS = {
    "POINT": POINT,
    "LINESTRING": LINESTRING,
    "LINEARRING": LINESTRING,  # JTS-style linear rings parse as LineString
    "POLYGON": POLYGON,
    "MULTIPOINT": MULTIPOINT,
    "MULTILINESTRING": MULTILINESTRING,
    "MULTIPOLYGON": MULTIPOLYGON,
    "GEOMETRYCOLLECTION": GEOMETRYCOLLECTION,
}


class _Lexer:
    __slots__ = ("toks", "pos")

    def __init__(self, s: str):
        self.toks = []
        pos = 0
        n = len(s)
        while pos < n:
            m = _TOKEN.match(s, pos)
            if not m:
                if s[pos:].strip() == "":
                    break
                raise GeometryError(f"invalid WKT at offset {pos}: {s[pos:pos+20]!r}")
            self.toks.append(m.group(1))
            pos = m.end()
        self.pos = 0

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise GeometryError("unexpected end of WKT")
        self.pos += 1
        return t

    def expect(self, tok):
        t = self.next()
        if t != tok:
            raise GeometryError(f"expected {tok!r}, got {t!r}")


def from_wkt(s: str) -> Geometry:
    lx = _Lexer(s)
    g = _parse_geometry(lx)
    if lx.peek() is not None:
        raise GeometryError(f"trailing tokens in WKT: {lx.peek()!r}")
    return g


def _parse_ctype(lx: _Lexer) -> int:
    t = lx.peek()
    if t is None:
        return DIM_XY
    up = t.upper()
    if up == "Z":
        lx.next()
        return DIM_XYZ
    if up == "M":
        lx.next()
        return DIM_XYM
    if up == "ZM":
        lx.next()
        return DIM_XYZM
    return DIM_XY


def _is_number(tok) -> bool:
    if tok is None:
        return False
    if tok.upper() in ("NAN", "INF", "-INF"):
        return True
    c = tok[0]
    return c.isdigit() or c in "-+."


def _parse_coord(lx: _Lexer, dim: int):
    vals = []
    while _is_number(lx.peek()):
        vals.append(float(lx.next()))
    if len(vals) != dim:
        raise GeometryError(f"expected {dim} ordinates, got {len(vals)}")
    return vals


def _parse_coord_list(lx: _Lexer, dim: int):
    """( c, c, ... ) -> (n, dim) ndarray."""
    lx.expect("(")
    rows = [_parse_coord(lx, dim)]
    while lx.peek() == ",":
        lx.next()
        rows.append(_parse_coord(lx, dim))
    lx.expect(")")
    return np.asarray(rows, dtype=np.float64)


def _maybe_empty(lx: _Lexer) -> bool:
    t = lx.peek()
    if t is not None and t.upper() == "EMPTY":
        lx.next()
        return True
    return False


def _parse_geometry(lx: _Lexer) -> Geometry:
    word = lx.next().upper()
    if word not in _TYPE_WORDS:
        raise GeometryError(f"unknown geometry type {word!r}")
    tag = _TYPE_WORDS[word]
    ctype = _parse_ctype(lx)
    dim = ctype_dimension(ctype)

    if _maybe_empty(lx):
        if tag == POINT:
            return Geometry(POINT, ctype, coords=None)
        if tag == LINESTRING:
            return Geometry(LINESTRING, ctype, coords=np.zeros((0, dim)))
        if tag == POLYGON:
            return Geometry(POLYGON, ctype, rings=[])
        return Geometry(tag, ctype, geoms=[])

    if tag == POINT:
        lx.expect("(")
        vals = _parse_coord(lx, dim)
        lx.expect(")")
        return Geometry(POINT, ctype, coords=np.asarray(vals, dtype=np.float64))

    if tag == LINESTRING:
        return Geometry(LINESTRING, ctype, coords=_parse_coord_list(lx, dim))

    if tag == POLYGON:
        lx.expect("(")
        rings = []
        while True:
            if _maybe_empty(lx):
                pass  # empty ring: contributes nothing
            else:
                rings.append(_parse_coord_list(lx, dim))
            if lx.peek() == ",":
                lx.next()
                continue
            break
        lx.expect(")")
        return Geometry(POLYGON, ctype, rings=rings)

    if tag == MULTIPOINT:
        lx.expect("(")
        pts = [_parse_multipoint_elem(lx, ctype, dim)]
        while lx.peek() == ",":
            lx.next()
            pts.append(_parse_multipoint_elem(lx, ctype, dim))
        lx.expect(")")
        return Geometry(MULTIPOINT, ctype, geoms=pts)

    if tag == MULTILINESTRING:
        lx.expect("(")
        lines = []
        while True:
            if _maybe_empty(lx):
                lines.append(Geometry(LINESTRING, ctype, coords=np.zeros((0, dim))))
            else:
                lines.append(Geometry(LINESTRING, ctype, coords=_parse_coord_list(lx, dim)))
            if lx.peek() == ",":
                lx.next()
                continue
            break
        lx.expect(")")
        return Geometry(MULTILINESTRING, ctype, geoms=lines)

    if tag == MULTIPOLYGON:
        lx.expect("(")
        polys = []
        while True:
            if _maybe_empty(lx):
                polys.append(Geometry(POLYGON, ctype, rings=[]))
            else:
                lx.expect("(")
                rings = []
                while True:
                    if _maybe_empty(lx):
                        pass  # empty ring: contributes nothing
                    else:
                        rings.append(_parse_coord_list(lx, dim))
                    if lx.peek() == ",":
                        lx.next()
                        continue
                    break
                lx.expect(")")
                polys.append(Geometry(POLYGON, ctype, rings=rings))
            if lx.peek() == ",":
                lx.next()
                continue
            break
        lx.expect(")")
        return Geometry(MULTIPOLYGON, ctype, geoms=polys)

    # GEOMETRYCOLLECTION
    lx.expect("(")
    geoms = [_parse_geometry(lx)]
    while lx.peek() == ",":
        lx.next()
        geoms.append(_parse_geometry(lx))
    lx.expect(")")
    return Geometry(GEOMETRYCOLLECTION, ctype, geoms=geoms)


def _parse_multipoint_elem(lx: _Lexer, ctype: int, dim: int) -> Geometry:
    if _maybe_empty(lx):
        return Geometry(POINT, ctype, coords=None)
    if lx.peek() == "(":
        lx.next()
        vals = _parse_coord(lx, dim)
        lx.expect(")")
    else:
        vals = _parse_coord(lx, dim)
    return Geometry(POINT, ctype, coords=np.asarray(vals, dtype=np.float64))


# --------------------------------------------------------------------------- #
# writer
# --------------------------------------------------------------------------- #


def fmt_float(x: float) -> str:
    """Shortest positional decimal that round-trips (reference uses Go
    strconv.FormatFloat(-1) semantics)."""
    if x != x:
        return "NaN"
    if math.isinf(x):
        return "Inf" if x > 0 else "-Inf"
    if x == int(x) and abs(x) <= 1e15:
        s = str(int(x))
        if x == 0.0 and math.copysign(1.0, x) < 0:
            return "-0"
        return s
    s = np.format_float_positional(x, trim="-", unique=True)
    return s


def _fmt_coord(row) -> str:
    return " ".join(fmt_float(v) for v in row)


def _fmt_seq(arr) -> str:
    return "(" + ",".join(_fmt_coord(row) for row in arr) + ")"


def to_wkt(g: Geometry) -> str:
    suffix = CTYPE_SUFFIX[g.ctype]
    name = g.type_name.upper() + suffix
    # reference formats: "POINT(1 2)" but "POINT Z (1 2 3)" (space after suffix)
    op = (name + " (") if suffix else (name + "(")
    t = g.tag
    if t == POINT:
        if g.coords is None:
            return name + " EMPTY"
        return f"{op}{_fmt_coord(g.coords)})"
    if t == LINESTRING:
        if len(g.coords) == 0:
            return name + " EMPTY"
        return op + _fmt_seq(g.coords)[1:]
    if t == POLYGON:
        if not g.rings:
            return name + " EMPTY"
        return op + ",".join(_fmt_seq(r) for r in g.rings) + ")"
    if t == MULTIPOINT:
        if not g.geoms:
            return name + " EMPTY"
        parts = []
        for p in g.geoms:
            parts.append("EMPTY" if p.coords is None else f"({_fmt_coord(p.coords)})")
        return op + ",".join(parts) + ")"
    if t == MULTILINESTRING:
        if not g.geoms:
            return name + " EMPTY"
        parts = ["EMPTY" if len(l.coords) == 0 else _fmt_seq(l.coords) for l in g.geoms]
        return op + ",".join(parts) + ")"
    if t == MULTIPOLYGON:
        if not g.geoms:
            return name + " EMPTY"
        parts = []
        for p in g.geoms:
            if not p.rings:
                parts.append("EMPTY")
            else:
                parts.append("(" + ",".join(_fmt_seq(r) for r in p.rings) + ")")
        return op + ",".join(parts) + ")"
    # GC
    if not g.geoms:
        return name + " EMPTY"
    return op + ",".join(to_wkt(sub) for sub in g.geoms) + ")"
