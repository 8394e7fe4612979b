"""Core geometry model: a tagged union over the 7 OGC Simple Feature types.

Semantics follow the OGC Simple Feature Access spec as implemented by the
reference (peterstace/simplefeatures, see /root/reference/geom/type_geometry.go:32-47
for the 7-type closed union and geom/type_sequence.go:10-13 for the flat
interleaved-float coordinate layout). This is a from-scratch numpy design:
coordinates are (n, dim) float64 ndarrays, immutable by convention.

Tags reuse WKB geometry type codes (1..7) so encoding is direct.
CoordinatesType is the same 2-bit field as the reference
(geom/coordinate_type.go:10-24): bit0 = has Z, bit1 = has M.
"""
from __future__ import annotations

import numpy as np

# geometry type tags (WKB codes)
POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7

TYPE_NAMES = {
    POINT: "Point",
    LINESTRING: "LineString",
    POLYGON: "Polygon",
    MULTIPOINT: "MultiPoint",
    MULTILINESTRING: "MultiLineString",
    MULTIPOLYGON: "MultiPolygon",
    GEOMETRYCOLLECTION: "GeometryCollection",
}

# coordinate types (bitfield: bit0=Z, bit1=M) — mirrors reference coordinate_type.go
DIM_XY = 0b00
DIM_XYZ = 0b01
DIM_XYM = 0b10
DIM_XYZM = 0b11

CTYPE_SUFFIX = {DIM_XY: "", DIM_XYZ: " Z", DIM_XYM: " M", DIM_XYZM: " ZM"}


def ctype_dimension(ctype: int) -> int:
    """Coordinate stride: 2 for XY, 3 for XYZ/XYM, 4 for XYZM."""
    return 2 + (ctype & 1) + ((ctype >> 1) & 1)


class GeometryError(ValueError):
    pass


class Geometry:
    """Immutable tagged geometry value.

    Fields used per tag:
      POINT              -> coords: (dim,) ndarray or None (empty point)
      LINESTRING         -> coords: (n, dim) ndarray (n == 0 for empty)
      POLYGON            -> rings: list[(n_i, dim) ndarray]; ring 0 = shell
      MULTI*/COLLECTION  -> geoms: list[Geometry]
    """

    __slots__ = ("tag", "ctype", "coords", "rings", "geoms")

    def __init__(self, tag, ctype=DIM_XY, coords=None, rings=None, geoms=None):
        self.tag = tag
        self.ctype = ctype
        self.coords = coords
        self.rings = rings if rings is not None else []
        self.geoms = geoms if geoms is not None else []

    # ---- construction helpers -------------------------------------------------

    @staticmethod
    def point(x: float, y: float, z=None, m=None) -> "Geometry":
        vals = [x, y]
        ctype = DIM_XY
        if z is not None:
            vals.append(z)
            ctype |= DIM_XYZ
        if m is not None:
            vals.append(m)
            ctype |= DIM_XYM
        return Geometry(POINT, ctype, coords=np.asarray(vals, dtype=np.float64))

    @staticmethod
    def empty_point(ctype=DIM_XY) -> "Geometry":
        return Geometry(POINT, ctype, coords=None)

    @staticmethod
    def linestring(coords, ctype=DIM_XY) -> "Geometry":
        arr = np.asarray(coords, dtype=np.float64)
        if arr.size == 0:
            arr = arr.reshape(0, ctype_dimension(ctype))
        return Geometry(LINESTRING, ctype, coords=arr)

    @staticmethod
    def polygon(rings, ctype=DIM_XY) -> "Geometry":
        rs = [np.asarray(r, dtype=np.float64) for r in rings]
        return Geometry(POLYGON, ctype, rings=rs)

    @staticmethod
    def multipoint(points, ctype=None) -> "Geometry":
        pts = list(points)
        if ctype is None:
            ctype = pts[0].ctype if pts else DIM_XY
        return Geometry(MULTIPOINT, ctype, geoms=pts)

    @staticmethod
    def multilinestring(lines, ctype=None) -> "Geometry":
        ls = list(lines)
        if ctype is None:
            ctype = ls[0].ctype if ls else DIM_XY
        return Geometry(MULTILINESTRING, ctype, geoms=ls)

    @staticmethod
    def multipolygon(polys, ctype=None) -> "Geometry":
        ps = list(polys)
        if ctype is None:
            ctype = ps[0].ctype if ps else DIM_XY
        return Geometry(MULTIPOLYGON, ctype, geoms=ps)

    @staticmethod
    def collection(geoms, ctype=None) -> "Geometry":
        gs = list(geoms)
        if ctype is None:
            ctype = gs[0].ctype if gs else DIM_XY
        return Geometry(GEOMETRYCOLLECTION, ctype, geoms=gs)

    # ---- scalar properties ----------------------------------------------------

    @property
    def type_name(self) -> str:
        return TYPE_NAMES[self.tag]

    @property
    def dim(self) -> int:
        """Coordinate stride (2..4)."""
        return ctype_dimension(self.ctype)

    def is_empty(self) -> bool:
        """True when the geometry contains no points (reference: per-type IsEmpty)."""
        t = self.tag
        if t == POINT:
            return self.coords is None
        if t == LINESTRING:
            return len(self.coords) == 0
        if t == POLYGON:
            return len(self.rings) == 0
        return all(g.is_empty() for g in self.geoms)

    def dimension(self) -> int:
        """Topological dimension (reference type_geometry.go:385): max over parts."""
        t = self.tag
        if t == POINT or t == MULTIPOINT:
            return 0
        if t == LINESTRING or t == MULTILINESTRING:
            return 1
        if t == POLYGON or t == MULTIPOLYGON:
            return 2
        return max((g.dimension() for g in self.geoms), default=0)

    # ---- traversal ------------------------------------------------------------

    def coord_arrays(self):
        """Yield every coordinate ndarray (n, dim) in this geometry, in order."""
        t = self.tag
        if t == POINT:
            if self.coords is not None:
                yield self.coords.reshape(1, -1)
        elif t == LINESTRING:
            if len(self.coords):
                yield self.coords
        elif t == POLYGON:
            yield from self.rings
        else:
            for g in self.geoms:
                yield from g.coord_arrays()

    def all_xy(self) -> np.ndarray:
        """All XY coordinates stacked into an (n, 2) array (may be empty)."""
        arrs = [a[:, :2] for a in self.coord_arrays()]
        if not arrs:
            return np.zeros((0, 2), dtype=np.float64)
        return np.concatenate(arrs, axis=0)

    def flatten(self):
        """Yield non-collection leaf geometries (explodes Multi* and GC)."""
        if self.tag in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
            for g in self.geoms:
                yield from g.flatten()
        else:
            yield self

    # ---- transforms -----------------------------------------------------------

    def map_coords(self, fn) -> "Geometry":
        """Apply fn((n,dim) array) -> (n,dim') array to every coordinate array.

        The reference's TransformXY UDF hook (geom/type_geometry.go:459-516).
        fn must be vectorized; ctype is preserved unless fn changes the width.
        """
        t = self.tag
        if t == POINT:
            if self.coords is None:
                return Geometry(POINT, self.ctype, coords=None)
            out = fn(self.coords.reshape(1, -1))[0]
            return Geometry(POINT, self.ctype, coords=out)
        if t == LINESTRING:
            if len(self.coords) == 0:
                return Geometry(LINESTRING, self.ctype, coords=self.coords)
            return Geometry(LINESTRING, self.ctype, coords=fn(self.coords))
        if t == POLYGON:
            return Geometry(POLYGON, self.ctype, rings=[fn(r) for r in self.rings])
        return Geometry(t, self.ctype, geoms=[g.map_coords(fn) for g in self.geoms])

    def force_2d(self) -> "Geometry":
        """Drop Z/M (reference Force2D, type_geometry.go:634)."""
        g = self.map_coords(lambda a: np.ascontiguousarray(a[:, :2]))

        def fix(geom):
            geom.ctype = DIM_XY
            for sub in geom.geoms:
                fix(sub)
            return geom

        return fix(g)

    def reverse(self) -> "Geometry":
        """Reverse coordinate order of every curve (reference Reverse)."""
        t = self.tag
        if t == LINESTRING:
            return Geometry(LINESTRING, self.ctype, coords=self.coords[::-1].copy())
        if t == POLYGON:
            return Geometry(POLYGON, self.ctype, rings=[r[::-1].copy() for r in self.rings])
        if t == POINT:
            return self
        return Geometry(t, self.ctype, geoms=[g.reverse() for g in self.geoms])

    # ---- comparison / debug ---------------------------------------------------

    def __repr__(self):
        from .wkt import to_wkt

        try:
            return f"Geometry<{to_wkt(self)}>"
        except Exception:
            return f"Geometry<{self.type_name}>"

    def __eq__(self, other):
        """Structural exact equality (same layout, same coords)."""
        if not isinstance(other, Geometry):
            return NotImplemented
        if self.tag != other.tag or self.ctype != other.ctype:
            return False
        t = self.tag
        if t == POINT:
            if (self.coords is None) != (other.coords is None):
                return False
            return self.coords is None or bool(np.array_equal(self.coords, other.coords))
        if t == LINESTRING:
            return bool(np.array_equal(self.coords, other.coords))
        if t == POLYGON:
            return len(self.rings) == len(other.rings) and all(
                np.array_equal(a, b) for a, b in zip(self.rings, other.rings)
            )
        return len(self.geoms) == len(other.geoms) and all(
            a == b for a, b in zip(self.geoms, other.geoms)
        )

    def __hash__(self):  # allow use in sets keyed by wkb
        from .wkb import to_wkb

        return hash(to_wkb(self))
