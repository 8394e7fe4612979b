"""OGC validity checking (reference: per-type Validate, rule list
geom/errors.go:84-94; polygon ring rules geom/type_polygon.go:42-166;
multipolygon pairwise rules geom/type_multi_polygon.go:40-172).

validate(g) returns (ok, reason); reason is None when valid.
"""
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
from .predicates import (
    INTERIOR,
    _candidate_pairs,
    point_in_polygon,
    segment_intersection,
)


def _finite(arr) -> bool:
    return bool(np.isfinite(arr).all())


def _ring_segments(ring: np.ndarray) -> np.ndarray:
    r = ring[:, :2]
    return np.concatenate([r[:-1], r[1:]], axis=1)


def _key(p):
    return (round(float(p[0]), 9), round(float(p[1]), 9))


def collapse_repeated(coords: np.ndarray) -> np.ndarray:
    """Drop consecutive duplicate vertices (repeated points are VALID per
    JTS/OGC; they just carry no geometric content)."""
    if len(coords) < 2:
        return coords
    keep = np.ones(len(coords), dtype=bool)
    keep[1:] = ~np.all(coords[1:, :2] == coords[:-1, :2], axis=1)
    return coords[keep]


def _curve_self_intersects(coords: np.ndarray, closed: bool):
    """Self-intersection check for one curve: segments may share only the
    endpoints adjacency allows (incl. the closing vertex for rings).
    Consecutive repeated vertices are collapsed first (valid per JTS)."""
    coords = collapse_repeated(coords)
    if len(coords) < 2:
        return None
    segs = np.concatenate([coords[:-1, :2], coords[1:, :2]], axis=1)
    n = len(segs)
    pairs = _candidate_pairs(segs, segs)
    for i, j in pairs:
        if j <= i:
            continue
        adjacent = j == i + 1 or (closed and i == 0 and j == n - 1)
        kind, data = segment_intersection(segs[i][:2], segs[i][2:], segs[j][:2], segs[j][2:])
        if kind == "none":
            continue
        if kind == "overlap":
            return "self-intersection (collinear overlap)"
        if adjacent:
            shared = _key(segs[j][:2]) if j == i + 1 else _key(segs[i][:2])
            if _key(data) != shared:
                return "self-intersection between adjacent segments"
        else:
            return "self-intersection"
    return None


def _orient_fr(ax, ay, bx, by, px, py):
    """EXACT orientation sign of p vs directed line a->b (Fraction)."""
    from fractions import Fraction as Fr

    v = ((Fr(bx) - Fr(ax)) * (Fr(py) - Fr(ay))
         - (Fr(by) - Fr(ay)) * (Fr(px) - Fr(ax)))
    return (v > 0) - (v < 0)


def _cross_exact(s1, s2) -> bool:
    """EXACT segment-crossing verdict: proper transversal crossing, or a
    collinear overlap of positive length. Float parametric solves round
    a vertex touch's parameter a few ulp inside (0,1) and misreport
    'elements cross' — every candidate 'cross' is confirmed here with
    rational arithmetic (only runs on intersecting pairs, so the
    Fraction cost is bounded by actual contacts)."""
    from fractions import Fraction as Fr

    ax, ay, bx, by = (float(v) for v in s1)
    cx, cy, dx, dy = (float(v) for v in s2)
    d1 = _orient_fr(cx, cy, dx, dy, ax, ay)
    d2 = _orient_fr(cx, cy, dx, dy, bx, by)
    d3 = _orient_fr(ax, ay, bx, by, cx, cy)
    d4 = _orient_fr(ax, ay, bx, by, dx, dy)
    if d1 * d2 < 0 and d3 * d4 < 0:
        return True  # proper transversal crossing
    if d1 == 0 and d2 == 0 and d3 == 0 and d4 == 0:
        # collinear: positive-length 1D overlap = shared boundary edge
        rr = (Fr(bx) - Fr(ax)) ** 2 + (Fr(by) - Fr(ay)) ** 2
        if rr == 0:
            return False
        t0 = ((Fr(cx) - Fr(ax)) * (Fr(bx) - Fr(ax))
              + (Fr(cy) - Fr(ay)) * (Fr(by) - Fr(ay))) / rr
        t1 = ((Fr(dx) - Fr(ax)) * (Fr(bx) - Fr(ax))
              + (Fr(dy) - Fr(ay)) * (Fr(by) - Fr(ay))) / rr
        lo, hi = min(t0, t1), max(t0, t1)
        return min(hi, Fr(1)) > max(lo, Fr(0))
    return False


def _ring_pair_touches(ra: np.ndarray, rb: np.ndarray):
    """Classify contact between two rings.

    Returns (kind, touch_points): kind in {'disjoint', 'touch', 'cross'}.
    'touch' = finitely many shared points, no crossings/overlaps.
    """
    sa = _ring_segments(ra)
    sb = _ring_segments(rb)
    touches = set()
    pairs = _candidate_pairs(sa, sb)
    for i, j in pairs:
        kind, data = segment_intersection(sa[i][:2], sa[i][2:], sb[j][:2], sb[j][2:])
        if kind == "none":
            continue
        if kind == "overlap":
            if _cross_exact(sa[i], sb[j]):
                return "cross", touches
            touches.add(_key(data[0]))
            continue
        p = _key(data)
        # a shared point is a crossing unless it is a vertex-touch that
        # does not transversally cross; the float params pre-screen, the
        # exact predicate decides
        ti = _param(data, sa[i])
        tj = _param(data, sb[j])
        if 0.0 < ti < 1.0 and 0.0 < tj < 1.0:
            if _cross_exact(sa[i], sb[j]):
                return "cross", touches
        touches.add(p)
    if not touches:
        return "disjoint", touches
    return "touch", touches


def _param(p, seg):
    ax, ay, bx, by = seg
    dx = bx - ax
    dy = by - ay
    denom = dx * dx + dy * dy
    if denom == 0:
        return 0.0
    return ((p[0] - ax) * dx + (p[1] - ay) * dy) / denom


def _validate_polygon(g: Geometry):
    if not g.rings:
        return None  # empty polygon is valid
    rings = []
    for ring in g.rings:
        if not _finite(ring):
            return "non-finite coordinate"
        if not np.array_equal(ring[0], ring[-1]):
            return "ring not closed"
        ring = collapse_repeated(ring)
        if len(ring) < 4:
            return "ring with fewer than 4 points"
        err = _curve_self_intersects(ring, closed=True)
        if err:
            return f"ring {err}"
        rings.append(ring)
    shell = rings[0]
    holes = rings[1:]
    # interior-connectivity: bipartite union-find over rings AND touch
    # points — a cycle through DISTINCT touch points pinches the interior,
    # but many rings meeting at ONE point is a star (valid). Nodes:
    # ring index i -> i; touch point p -> key.
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def join(x, y) -> bool:
        rx, ry = find(x), find(y)
        if rx == ry:
            return False
        parent[rx] = ry
        return True

    incidences = set()

    def add_touches(ri, rj, touches):
        for p in touches:
            for r in (ri, rj):
                if (r, p) not in incidences:
                    incidences.add((r, p))
                    if not join(("ring", r), ("pt", p)):
                        raise _Disconnected

    class _Disconnected(Exception):
        pass

    for hi, hole in enumerate(holes, start=1):
        kind, touches = _ring_pair_touches(shell, hole)
        if kind == "cross":
            return "hole crosses shell"
        try:
            add_touches(0, hi, touches)
        except _Disconnected:
            return "interior disconnected (ring touch cycle)"
        # hole must be inside the shell: a non-touch vertex must be interior
        inside_ok = False
        for v in hole[:-1]:
            loc = point_in_polygon(v[0], v[1], [shell])
            if loc == INTERIOR:
                inside_ok = True
                break
            if loc == -1 and _key(v) not in touches:
                return "hole outside shell"
        if not inside_ok and len(touches) == 0:
            return "hole outside shell"
    for i in range(len(holes)):
        for j in range(i + 1, len(holes)):
            kind, touches = _ring_pair_touches(holes[i], holes[j])
            if kind == "cross":
                return "holes cross"
            try:
                add_touches(i + 1, j + 1, touches)
            except _Disconnected:
                return "interior disconnected (ring touch cycle)"
            # nested holes: a vertex of one strictly inside the other
            for v in holes[j][:-1]:
                if point_in_polygon(v[0], v[1], [holes[i]]) == INTERIOR:
                    return "nested holes"
            for v in holes[i][:-1]:
                if point_in_polygon(v[0], v[1], [holes[j]]) == INTERIOR:
                    return "nested holes"
    return None


def _validate_multipolygon(g: Geometry):
    polys = [p for p in g.geoms if p.rings]
    for p in polys:
        err = _validate_polygon(p)
        if err:
            return err
    from .algorithms import _polygon_interior_point

    for i in range(len(polys)):
        for j in range(i + 1, len(polys)):
            a = polys[i]
            b = polys[j]
            # pairwise: boundaries may touch at points, interiors disjoint
            for ra in a.rings:
                for rb in b.rings:
                    kind, _t = _ring_pair_touches(ra, rb)
                    if kind == "cross":
                        return "multipolygon elements cross"
            pa = _polygon_interior_point(a.rings)
            pb = _polygon_interior_point(b.rings)
            if point_in_polygon(pa[0], pa[1], b.rings) == INTERIOR:
                return "multipolygon element inside another"
            if point_in_polygon(pb[0], pb[1], a.rings) == INTERIOR:
                return "multipolygon element inside another"
            # vertex-only ring contact can still hide an interior overlap
            # (rings crossing AT vertices); decide by actual overlap area
            from .algorithms import area as _area
            from .overlay import intersection as _intersection

            if _area(_intersection(a, b)) > 1e-12:
                return "multipolygon element interiors overlap"
    return None


def validate(g: Geometry):
    """Returns (ok: bool, reason: str | None)."""
    t = g.tag
    if t == POINT:
        if g.coords is not None and not _finite(g.coords):
            return False, "non-finite coordinate"
        return True, None
    if t == LINESTRING:
        if len(g.coords) == 0:
            return True, None
        if not _finite(g.coords):
            return False, "non-finite coordinate"
        if len(g.coords) < 2:
            return False, "linestring with fewer than 2 points"
        xy = g.coords[:, :2]
        if len(np.unique(xy, axis=0)) < 2:
            return False, "linestring without 2 distinct points"
        return True, None
    if t == POLYGON:
        for ring in g.rings:
            if not _finite(ring):
                return False, "non-finite coordinate"
        err = _validate_polygon(g)
        return (err is None), err
    if t == MULTIPOINT:
        for p in g.geoms:
            ok, err = validate(p)
            if not ok:
                return False, err
        return True, None
    if t == MULTILINESTRING:
        for l in g.geoms:
            ok, err = validate(l)
            if not ok:
                return False, err
        return True, None
    if t == MULTIPOLYGON:
        err = _validate_multipolygon(g)
        return (err is None), err
    if t == GEOMETRYCOLLECTION:
        for sub in g.geoms:
            ok, err = validate(sub)
            if not ok:
                return False, err
        return True, None
    return False, f"unknown tag {t}"


def is_valid(g: Geometry) -> bool:
    return validate(g)[0]
