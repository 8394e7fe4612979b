"""Coverage-aware operations over tiled polygon layers.

Reference surface: geos/entrypoints.go:281 (CoverageUnion), :294
(CoverageSimplifyVW), :311 (CoverageIsValid) — reimplemented from
scratch on the engine's own edge-graph machinery, not a GEOS port.

A polygonal COVERAGE is a set of polygons whose interiors are disjoint
and whose shared boundaries carry identical vertex chains. That
invariant is what makes the O(n) fast paths here possible:

  * coverage_union: every interior (shared) edge appears exactly twice
    with opposite directions once rings are oriented shell-CCW/hole-CW;
    the union boundary is simply the directed edges whose reverse is
    absent — no planar arrangement, no pairwise overlay.
  * coverage_simplify_vw: shared edge CHAINS are simplified once
    (Visvalingam–Whyatt effective-area) and spliced back into every
    owning ring, so neighbours stay vertex-consistent by construction.
  * coverage_is_valid: pairwise checks (R-tree pruned) that interiors
    do not overlap and that collinear boundary overlaps are
    vertex-identical; returns the offending edges.
"""
from __future__ import annotations

import math

import numpy as np

from .core import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOLYGON,
    POLYGON,
    Geometry,
    GeometryError,
)
from .overlay import _assemble_polygons, _key, _ring_area, _trace_rings


def _polygon_parts(g: Geometry) -> list[Geometry]:
    """The coverage's polygon elements; raises on non-polygonal parts."""
    if g.tag not in (GEOMETRYCOLLECTION, MULTIPOLYGON, POLYGON):
        raise GeometryError("coverage input must be polygonal")
    parts = []
    for leaf in g.flatten():
        if leaf.is_empty():
            continue
        if leaf.tag != POLYGON:
            raise GeometryError(
                f"coverage elements must be polygonal, got tag {leaf.tag}")
        parts.append(leaf)
    return parts


def _oriented_rings(poly: Geometry):
    """Rings standardized: shell CCW, holes CW (interior on the left of
    every directed edge)."""
    out = []
    for i, r in enumerate(poly.rings):
        pts = [_key(x, y) for x, y in r[:, :2]]
        if pts[0] != pts[-1]:
            pts.append(pts[0])
        a = _ring_area(pts)
        want_ccw = i == 0
        if (a > 0) != want_ccw:
            pts = pts[::-1]
        out.append(pts)
    return out


def coverage_union(g: Geometry) -> Geometry:
    """Union of a valid polygonal coverage in O(edges) — the fast path
    that skips the planar arrangement entirely (reference
    geos/entrypoints.go:270-283 semantics). Result is undefined if the
    input is not a valid coverage (same contract as the reference)."""
    parts = _polygon_parts(g)
    if not parts:
        return Geometry(POLYGON, 0, rings=[])
    directed = set()
    for p in parts:
        for ring in _oriented_rings(p):
            for u, v in zip(ring[:-1], ring[1:]):
                if u != v:
                    directed.add((u, v))
    boundary = {e for e in directed if (e[1], e[0]) not in directed}
    rings = _trace_rings(boundary)
    return _assemble_polygons(rings)


def _edge_occurrences(parts):
    """Map canonical undirected edge -> list of owning part indices."""
    occ: dict = {}
    for pi, p in enumerate(parts):
        for ring in _oriented_rings(p):
            for u, v in zip(ring[:-1], ring[1:]):
                if u == v:
                    continue
                k = (u, v) if u <= v else (v, u)
                occ.setdefault(k, []).append(pi)
    return occ


def _collinear_overlap(s1, s2):
    """Positive-length overlap of two collinear segments, None otherwise."""
    (ax, ay), (bx, by) = s1
    (cx, cy), (dx, dy) = s2
    ux, uy = bx - ax, by - ay
    # both cross products ~ 0 -> collinear
    if abs(ux * (cy - ay) - uy * (cx - ax)) > 1e-12:
        return None
    if abs(ux * (dy - ay) - uy * (dx - ax)) > 1e-12:
        return None
    denom = ux * ux + uy * uy
    if denom == 0:
        return None
    t1 = ((cx - ax) * ux + (cy - ay) * uy) / denom
    t2 = ((dx - ax) * ux + (dy - ay) * uy) / denom
    lo, hi = max(0.0, min(t1, t2)), min(1.0, max(t1, t2))
    if hi - lo < 1e-12:
        return None
    return (lo, hi)


def coverage_is_valid(g: Geometry, gap_width: float = 0.0):
    """(is_valid, invalid_edges) for a candidate coverage.

    Checks (reference geos/entrypoints.go:300-317): polygonal elements
    only (raises otherwise), disjoint interiors, and vertex-identical
    shared boundaries (partial collinear overlaps / T-junctions are
    invalid). gap_width > 0 additionally flags interior holes of the
    unioned coverage whose mean width (2*area/perimeter) is below
    gap_width — thin slivers between tiles."""
    from .relate import relate
    from ..rtree import STRtree

    parts = _polygon_parts(g)
    bad_segs: list[tuple] = []
    if len(parts) >= 2:
        boxes = np.array([
            [p.rings[0][:, 0].min(), p.rings[0][:, 1].min(),
             p.rings[0][:, 0].max(), p.rings[0][:, 1].max()]
            for p in parts
        ])
        tree = STRtree(boxes)
        occ = _edge_occurrences(parts)
        seg_by_part: dict = {}
        for k, owners in occ.items():
            for pi in owners:
                seg_by_part.setdefault(pi, []).append(k)
        for i, p in enumerate(parts):
            for j in tree.query_box(*boxes[i]):
                j = int(j)
                if j <= i:
                    continue
                m = relate(parts[i], parts[j])
                if m[0] == "2":  # interiors overlap
                    bad_segs.extend(seg_by_part.get(i, []))
                    bad_segs.extend(seg_by_part.get(j, []))
                    continue
                # collinear partial overlaps between non-identical edges
                for e1 in seg_by_part.get(i, []):
                    for e2 in seg_by_part.get(j, []):
                        if e1 == e2:
                            continue
                        if _collinear_overlap(e1, e2) is not None:
                            bad_segs.append(e1)
                            bad_segs.append(e2)
    if gap_width > 0:
        u = coverage_union(g)
        for leaf in u.flatten():
            for r in leaf.rings[1:]:
                pts = [tuple(p) for p in r[:, :2]]
                area = abs(_ring_area(pts if pts[0] == pts[-1] else pts + [pts[0]]))
                per = float(np.hypot(*(np.diff(r[:, :2], axis=0).T)).sum())
                if per > 0 and 2 * area / per < gap_width:
                    bad_segs.extend(zip(pts[:-1], pts[1:]))
    if not bad_segs:
        return True, Geometry(MULTILINESTRING, 0, geoms=[])
    uniq = sorted({(u, v) if u <= v else (v, u) for u, v in bad_segs})
    lines = [Geometry(LINESTRING, 0, coords=np.array([u, v], dtype=np.float64))
             for u, v in uniq]
    return False, Geometry(MULTILINESTRING, 0, geoms=lines)


def _vw_simplify_chain(pts: list, tol: float) -> list:
    """Visvalingam–Whyatt: drop interior points while the smallest
    effective triangle area is below tol. Endpoints always survive."""
    pts = list(pts)
    while len(pts) > 2:
        best_i = -1
        best_a = tol
        for i in range(1, len(pts) - 1):
            (ax, ay), (bx, by), (cx, cy) = pts[i - 1], pts[i], pts[i + 1]
            a = abs((bx - ax) * (cy - ay) - (by - ay) * (cx - ax)) / 2.0
            if a < best_a:
                best_a = a
                best_i = i
        if best_i < 0:
            break
        pts.pop(best_i)
    return pts


def coverage_simplify_vw(g: Geometry, tolerance: float,
                         preserve_boundary: bool = False) -> Geometry:
    """Simplify a polygonal coverage with Visvalingam–Whyatt while
    keeping neighbours vertex-consistent: the shared edge graph is cut
    into chains at junction vertices, each chain is simplified ONCE, and
    every ring is rebuilt from the simplified chains. tolerance is a
    DISTANCE (GEOS CoverageSimplifyVW semantics); the VW effective-area
    threshold is tolerance^2. preserve_boundary=True leaves outer
    (unshared) chains untouched."""
    tolerance = tolerance * tolerance
    parts = _polygon_parts(g)
    if not parts:
        return Geometry(GEOMETRYCOLLECTION, 0, geoms=[])
    occ = _edge_occurrences(parts)
    # junction vertices: incident edges with differing ownership, or
    # degree != 2 in the undirected edge graph
    degree: dict = {}
    owner_sets: dict = {}
    for (u, v), owners in occ.items():
        key = tuple(sorted(owners))
        for w in (u, v):
            degree[w] = degree.get(w, 0) + 1
            owner_sets.setdefault(w, set()).add(key)
    junction = {w for w in degree
                if degree[w] != 2 or len(owner_sets[w]) > 1}

    # walk each ring, cutting at junctions -> chains; simplify each
    # canonical chain once, reuse for both owners
    chain_cache: dict = {}

    def simplified(chain: list) -> list:
        key = tuple(chain) if chain[0] <= chain[-1] else tuple(chain[::-1])
        rev = key[0] != chain[0]
        if key not in chain_cache:
            edge0 = (chain[0], chain[1]) if chain[0] <= chain[1] else (chain[1], chain[0])
            shared = len(occ.get(edge0, [])) > 1
            if preserve_boundary and not shared:
                chain_cache[key] = list(key)
            else:
                chain_cache[key] = _vw_simplify_chain(list(key), tolerance)
        out = chain_cache[key]
        return out[::-1] if rev else out

    new_parts = []
    for p in parts:
        new_rings = []
        for ring in _oriented_rings(p):
            verts = ring[:-1]
            n = len(verts)
            # rotate so the ring starts at a junction if one exists
            starts = [i for i, w in enumerate(verts) if w in junction]
            if starts:
                s = starts[0]
                verts = verts[s:] + verts[:s]
            closed = verts + [verts[0]]
            out: list = []
            chain = [closed[0]]
            for w in closed[1:]:
                chain.append(w)
                if w in junction:
                    seg = simplified(chain)
                    out.extend(seg[:-1])
                    chain = [w]
            if len(chain) > 1:
                seg = simplified(chain)
                out.extend(seg[:-1])
            out.append(out[0])
            if len(out) >= 4:
                new_rings.append(np.asarray(out, dtype=np.float64))
            elif not new_rings:
                new_rings = []
                break
        if new_rings:
            new_parts.append(Geometry(POLYGON, 0, rings=new_rings))
    if not new_parts:
        return Geometry(GEOMETRYCOLLECTION, 0, geoms=[])
    return Geometry(GEOMETRYCOLLECTION, 0, geoms=new_parts)


def _rdp_with_pins(ring: np.ndarray, tol: float, pins: set) -> np.ndarray:
    """Ring RDP that always keeps the pinned vertex indices: the ring is
    cut into chains at the pins (plus vertex 0) and each chain RDPs
    independently."""
    from .algorithms import _rdp

    body = ring[:-1]
    n = len(body)
    anchors = sorted({0} | {p % n for p in pins})
    out = []
    for ai, a in enumerate(anchors):
        b = anchors[(ai + 1) % len(anchors)]
        if b > a:
            chain = body[a:b + 1]
        else:  # wraps past the ring start
            chain = np.concatenate([body[a:], body[:b + 1]], axis=0)
        simp = _rdp(chain, tol)
        out.append(simp[:-1])
    out.append(out[0][:1])
    return np.concatenate(out, axis=0)


def _max_dev_dropped(ring: np.ndarray, simplified: np.ndarray):
    """(index, deviation) of the original vertex farthest from the
    simplified ring's linework, or (None, 0) if nothing was dropped."""
    kept = {tuple(p) for p in simplified[:, :2]}
    best_i, best_d = None, -1.0
    simp = simplified[:, :2]
    seg_a = simp[:-1]
    seg_b = simp[1:]
    for i, p in enumerate(ring[:-1, :2]):
        if tuple(p) in kept:
            continue
        ab = seg_b - seg_a
        ap = p - seg_a
        denom = (ab * ab).sum(axis=1)
        denom[denom == 0] = 1.0
        t = np.clip((ap * ab).sum(axis=1) / denom, 0.0, 1.0)
        proj = seg_a + t[:, None] * ab
        d = float(np.hypot(*(p - proj).T.reshape(2, -1)).min())
        if d > best_d:
            best_i, best_d = i, d
    return best_i, best_d


def topology_preserve_simplify(g: Geometry, tolerance: float) -> Geometry:
    """Douglas-Peucker simplification that preserves topology (reference
    geos/entrypoints.go:235-241 semantics): rings never collapse and the
    result stays valid. When plain RDP breaks validity, the dropped
    vertex with the LARGEST deviation is pinned back and the ring
    re-simplified — the JTS TopologyPreservingSimplifier behaviour of
    keeping exactly the topology-critical control points while still
    removing the rest (falls back to the original coordinates if pinning
    cannot restore validity)."""
    from .algorithms import simplify
    from .ops import is_simple
    from .validate import validate

    t = g.tag
    if t == LINESTRING:
        tol = tolerance
        was_simple = is_simple(g)
        for _ in range(10):
            out = simplify(g, tol)
            if out.is_empty():
                break
            if not was_simple or is_simple(out):
                return out
            tol /= 2.0
        return g
    if t == POLYGON:
        pins = [set() for _ in g.rings]
        for _ in range(64):
            rings_s = [_rdp_with_pins(r, tolerance, pins[i])
                       for i, r in enumerate(g.rings)]
            if all(len(r) >= 4 for r in rings_s):
                cand = Geometry(POLYGON, g.ctype, rings=rings_s)
                if validate(cand)[0]:
                    return cand
            # pin the worst-deviation dropped vertex across all rings
            best = None
            for i, (orig, simp) in enumerate(zip(g.rings, rings_s)):
                bi, bd = _max_dev_dropped(orig, simp)
                if bi is not None and (best is None or bd > best[2]):
                    best = (i, bi, bd)
            if best is None:
                break  # nothing left to pin; give up
            pins[best[0]].add(best[1])
        return g
    if t in (MULTIPOLYGON, GEOMETRYCOLLECTION) or g.geoms is not None:
        subs = [topology_preserve_simplify(s, tolerance) for s in g.geoms]
        return Geometry(t, g.ctype, geoms=subs)
    return simplify(g, tolerance)
