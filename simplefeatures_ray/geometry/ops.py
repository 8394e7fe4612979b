"""IsSimple, Boundary, ExactEquals (reference: type_geometry.go:578,
type_geometry.go:422, geom/alg_exact_equals.go:98-321)."""
from __future__ import annotations

import numpy as np

from .core import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
)
from .predicates import _candidate_pairs, _linework_boundary_points, segment_intersection
from .validate import _curve_self_intersects


# --------------------------------------------------------------------------- #
# IsSimple
# --------------------------------------------------------------------------- #


def is_simple(g: Geometry):
    """OGC simplicity; returns None for GeometryCollection (undefined,
    matching the reference's ok=false behavior)."""
    t = g.tag
    if t == POINT:
        return True
    if t == MULTIPOINT:
        seen = set()
        for p in g.geoms:
            if p.coords is None:
                continue
            k = (float(p.coords[0]), float(p.coords[1]))
            if k in seen:
                return False
            seen.add(k)
        return True
    if t == LINESTRING:
        from .validate import collapse_repeated

        coords = collapse_repeated(g.coords)
        if len(coords) < 2:
            return True  # empty / zero-length lines are simple
        closed = bool(np.array_equal(coords[0], coords[-1]))
        return _curve_self_intersects(coords, closed=closed) is None
    if t == MULTILINESTRING:
        lines = [l for l in g.geoms if len(l.coords) >= 2]
        for l in lines:
            if not is_simple(l):
                return False

        # JTS rule: an intersection point between two elements must be a
        # BOUNDARY point (endpoint) of BOTH elements; closed elements
        # have no boundary, so any contact with a closed element fails.
        def endpoints(l):
            c = l.coords
            if np.array_equal(c[0], c[-1]):
                return set()  # closed: no boundary
            return {(round(float(c[0][0]), 9), round(float(c[0][1]), 9)),
                    (round(float(c[-1][0]), 9), round(float(c[-1][1]), 9))}

        eps = [endpoints(l) for l in lines]
        for i in range(len(lines)):
            for j in range(i + 1, len(lines)):
                sa = np.concatenate([lines[i].coords[:-1, :2], lines[i].coords[1:, :2]], axis=1)
                sb = np.concatenate([lines[j].coords[:-1, :2], lines[j].coords[1:, :2]], axis=1)
                for ii, jj in _candidate_pairs(sa, sb):
                    kind, data = segment_intersection(
                        sa[ii][:2], sa[ii][2:], sb[jj][:2], sb[jj][2:]
                    )
                    if kind == "overlap":
                        return False
                    if kind == "point":
                        p = (round(data[0], 9), round(data[1], 9))
                        if p not in eps[i] or p not in eps[j]:
                            return False
        return True
    if t == POLYGON:
        # JTS isSimple(polygon): each ring must be a simple closed curve
        for r in g.rings:
            ring = Geometry(LINESTRING, 0, coords=r[:, :2].copy())
            if not is_simple(ring):
                return False
        return True
    if t == MULTIPOLYGON:
        return all(is_simple(p) for p in g.geoms)
    return None  # GC: undefined


# --------------------------------------------------------------------------- #
# Boundary
# --------------------------------------------------------------------------- #


def boundary(g: Geometry) -> Geometry:
    """OGC boundary (reference type_geometry.go:422): mod-2 endpoints for
    linework, rings for areal geometries, empty for points."""
    t = g.tag
    if t in (POINT, MULTIPOINT):
        return Geometry(GEOMETRYCOLLECTION, 0, geoms=[])
    if t in (LINESTRING, MULTILINESTRING):
        lines = [g.coords] if t == LINESTRING else [l.coords for l in g.geoms]
        pts = sorted(_linework_boundary_points([l for l in lines if len(l)]))
        if not pts:
            return Geometry(MULTIPOINT, 0, geoms=[])
        return Geometry(
            MULTIPOINT, 0, geoms=[Geometry.point(p[0], p[1]) for p in pts]
        )
    if t == POLYGON:
        rings = [Geometry(LINESTRING, 0, coords=r[:, :2].copy()) for r in g.rings]
        if not rings:
            return Geometry(MULTILINESTRING, 0, geoms=[])
        if len(rings) == 1:
            return rings[0]
        return Geometry(MULTILINESTRING, 0, geoms=rings)
    if t == MULTIPOLYGON:
        rings = [
            Geometry(LINESTRING, 0, coords=r[:, :2].copy())
            for p in g.geoms
            for r in p.rings
        ]
        return Geometry(MULTILINESTRING, 0, geoms=rings)
    # GC: collection of member boundaries
    return Geometry(GEOMETRYCOLLECTION, 0, geoms=[boundary(sub) for sub in g.geoms])


# --------------------------------------------------------------------------- #
# ExactEquals (reference geom/alg_exact_equals.go)
# --------------------------------------------------------------------------- #


def _coords_eq(a, b, tol) -> bool:
    if a.shape != b.shape:
        return False
    if tol == 0:
        return bool(np.array_equal(a, b))
    return bool(np.all(np.abs(a - b) <= tol))


def _ring_rotations_equal(a: np.ndarray, b: np.ndarray, tol) -> bool:
    """Closed rings equal under rotation (reference :127-178)."""
    if a.shape != b.shape:
        return False
    n = len(a) - 1  # drop duplicated closing vertex
    aa = a[:-1]
    bb = b[:-1]
    for shift in range(n):
        if _coords_eq(np.roll(aa, -shift, axis=0), bb, tol):
            return True
    return False


def exact_equals(a: Geometry, b: Geometry, tolerance: float = 0.0,
                 ignore_order: bool = False) -> bool:
    """Structural equality; with ignore_order, multi-element order is
    irrelevant and rings/closed lines may be rotated."""
    if a.tag != b.tag or a.ctype != b.ctype:
        return False
    t = a.tag
    if t == POINT:
        if (a.coords is None) != (b.coords is None):
            return False
        return a.coords is None or _coords_eq(a.coords, b.coords, tolerance)
    if t == LINESTRING:
        if _coords_eq(a.coords, b.coords, tolerance):
            return True
        if ignore_order and len(a.coords) and len(b.coords):
            closed = np.array_equal(a.coords[0], a.coords[-1])
            if closed and np.array_equal(b.coords[0], b.coords[-1]):
                return _ring_rotations_equal(a.coords, b.coords, tolerance) or \
                    _ring_rotations_equal(a.coords[::-1], b.coords, tolerance)
        return False
    if t == POLYGON:
        if len(a.rings) != len(b.rings):
            return False
        for ra, rb in zip(a.rings, b.rings):
            if ignore_order:
                if not (_ring_rotations_equal(ra, rb, tolerance)
                        or _ring_rotations_equal(ra[::-1], rb, tolerance)):
                    return False
            elif not _coords_eq(ra, rb, tolerance):
                return False
        return True
    # multi / collection
    if len(a.geoms) != len(b.geoms):
        return False
    if not ignore_order:
        return all(
            exact_equals(x, y, tolerance, ignore_order)
            for x, y in zip(a.geoms, b.geoms)
        )
    used = [False] * len(b.geoms)
    for x in a.geoms:
        found = False
        for i, y in enumerate(b.geoms):
            if not used[i] and exact_equals(x, y, tolerance, ignore_order):
                used[i] = True
                found = True
                break
        if not found:
            return False
    return True
