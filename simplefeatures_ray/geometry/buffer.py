"""Buffer (Minkowski sum with a disc), reference geom/alg_buffer.go:24-124.

Construction: union of per-segment rectangles and per-vertex discs
(round joins/caps arise from the vertex discs), computed with the
engine's own planar overlay. Polygon erosion (negative distance) is
polygon minus the buffered boundary. Arc discretization uses
quad_segments vertices per quarter circle (same option as the
reference's WithQuadSegments). Cap styles: round | flat | square.

Approximation note: discs are inscribed 4*quad_segments-gons, so areas
are slightly under pi*r^2 (exact for the polygonal approximation) —
matching the discretization contract of JTS/GEOS buffers.
"""
from __future__ import annotations

import math

import numpy as np

from .core import GEOMETRYCOLLECTION, LINESTRING, MULTIPOLYGON, POINT, POLYGON, Geometry
from .overlay import difference, union_many


def _disc(cx: float, cy: float, r: float, quad_segments: int) -> Geometry:
    n = max(4, 4 * quad_segments)
    ang = np.arange(n) * (2 * math.pi / n)
    ring = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)
    ring = np.concatenate([ring, ring[:1]], axis=0)
    return Geometry(POLYGON, 0, rings=[ring])


def _segment_rect(a, b, r: float, extend_a=0.0, extend_b=0.0) -> Geometry | None:
    dx = b[0] - a[0]
    dy = b[1] - a[1]
    ln = math.hypot(dx, dy)
    if ln == 0:
        return None
    ux, uy = dx / ln, dy / ln
    nx, ny = -uy, ux
    ax = a[0] - ux * extend_a
    ay = a[1] - uy * extend_a
    bx = b[0] + ux * extend_b
    by = b[1] + uy * extend_b
    ring = np.array(
        [
            [ax + nx * r, ay + ny * r],
            [bx + nx * r, by + ny * r],
            [bx - nx * r, by - ny * r],
            [ax - nx * r, ay - ny * r],
            [ax + nx * r, ay + ny * r],
        ]
    )
    return Geometry(POLYGON, 0, rings=[ring])


def _join_patch(v, p_prev, p_next, r: float, join_style: str, mitre_limit: float):
    """Filler polygon for the OUTER side of an interior vertex when the
    join is not round: bevel = triangle, mitre = quad capped at
    mitre_limit*r (falls back to bevel beyond the limit)."""
    d1 = v - p_prev
    d2 = p_next - v
    l1 = math.hypot(d1[0], d1[1])
    l2 = math.hypot(d2[0], d2[1])
    if l1 == 0 or l2 == 0:
        return None
    u1 = d1 / l1
    u2 = d2 / l2
    cross = u1[0] * u2[1] - u1[1] * u2[0]
    if abs(cross) < 1e-12:
        return None  # collinear: rectangles already join seamlessly
    # outer side: right of travel for a left turn, left for a right turn
    sign = -1.0 if cross > 0 else 1.0
    n1 = np.array([-u1[1], u1[0]]) * sign
    n2 = np.array([-u2[1], u2[0]]) * sign
    a = v + n1 * r  # outer corner of the incoming rectangle
    b = v + n2 * r  # outer corner of the outgoing rectangle
    if join_style == "bevel":
        ring = np.array([v, a, b, v])
        return Geometry(POLYGON, 0, rings=[ring])
    # mitre: intersect the two offset lines a + t*u1 and b - s*u2
    denom = u1[0] * (-u2[1]) - u1[1] * (-u2[0])
    if denom == 0:
        return None
    t = ((b[0] - a[0]) * (-u2[1]) - (b[1] - a[1]) * (-u2[0])) / denom
    m = a + u1 * t
    if math.hypot(m[0] - v[0], m[1] - v[1]) > mitre_limit * r:
        ring = np.array([v, a, b, v])  # beyond the limit: bevel
    else:
        ring = np.array([v, a, m, b, v])
    return Geometry(POLYGON, 0, rings=[ring])


def _buffer_linework(coords: np.ndarray, r: float, quad_segments: int,
                     cap_style: str, closed: bool, join_style: str = "round",
                     mitre_limit: float = 5.0) -> list[Geometry]:
    parts = []
    n = len(coords)
    xy = coords[:, :2]
    square_ext = r if cap_style == "square" else 0.0
    for i in range(n - 1):
        ext_a = square_ext if (i == 0 and not closed) else 0.0
        ext_b = square_ext if (i == n - 2 and not closed) else 0.0
        rect = _segment_rect(xy[i], xy[i + 1], r, ext_a, ext_b)
        if rect is not None:
            parts.append(rect)
    if join_style == "round":
        # vertex discs: round joins everywhere; endpoints only for round caps
        for i in range(n):
            endpoint = (i == 0 or i == n - 1) and not closed
            if endpoint and cap_style != "round":
                continue
            parts.append(_disc(xy[i, 0], xy[i, 1], r, quad_segments))
    else:
        # mitre/bevel: fill the outer wedge at interior vertices
        if closed:
            # ring vertices 0..n-2 (last duplicates the first)
            for i in range(n - 1):
                p_prev = xy[i - 1] if i > 0 else xy[n - 2]
                p_next = xy[i + 1]
                patch = _join_patch(xy[i], p_prev, p_next, r, join_style, mitre_limit)
                if patch is not None:
                    parts.append(patch)
        else:
            for i in range(1, n - 1):
                patch = _join_patch(xy[i], xy[i - 1], xy[i + 1], r, join_style, mitre_limit)
                if patch is not None:
                    parts.append(patch)
        if not closed and cap_style == "round":
            parts.append(_disc(xy[0, 0], xy[0, 1], r, quad_segments))
            parts.append(_disc(xy[-1, 0], xy[-1, 1], r, quad_segments))
    return parts


def _side_join_patch(v, p_prev, p_next, r: float, left: bool, join_style: str,
                     mitre_limit: float, quad_segments: int):
    """Filler polygon on the CHOSEN side of a vertex for single-sided
    buffers — only needed when the turn opens a gap on that side (right
    turns for the left side, left turns for the right side)."""
    d1 = v - p_prev
    d2 = p_next - v
    l1 = math.hypot(d1[0], d1[1])
    l2 = math.hypot(d2[0], d2[1])
    if l1 == 0 or l2 == 0:
        return None
    u1 = d1 / l1
    u2 = d2 / l2
    cross = u1[0] * u2[1] - u1[1] * u2[0]
    if abs(cross) < 1e-12:
        return None
    if left and cross > 0:
        return None  # left turn: offsets overlap on the left, no gap
    if not left and cross < 0:
        return None
    sign = 1.0 if left else -1.0
    n1 = np.array([-u1[1], u1[0]]) * sign
    n2 = np.array([-u2[1], u2[0]]) * sign
    a = v + n1 * r
    b = v + n2 * r
    if join_style == "round":
        # circular sector from n1 to n2 sweeping across the gap
        a1 = math.atan2(n1[1], n1[0])
        a2 = math.atan2(n2[1], n2[0])
        sweep = a2 - a1
        # the gap side sweep is opposite the turn direction
        if left and sweep > 0:
            sweep -= 2 * math.pi
        if not left and sweep < 0:
            sweep += 2 * math.pi
        steps = max(1, int(math.ceil(abs(sweep) / (math.pi / 2) * quad_segments)))
        ang = a1 + sweep * np.arange(steps + 1) / steps
        arc = np.stack([v[0] + r * np.cos(ang), v[1] + r * np.sin(ang)], axis=1)
        ring = np.concatenate([[v], arc, [v]], axis=0)
        return Geometry(POLYGON, 0, rings=[ring])
    if join_style == "bevel":
        return Geometry(POLYGON, 0, rings=[np.array([v, a, b, v])])
    # mitre
    denom = u1[0] * (-u2[1]) - u1[1] * (-u2[0])
    if denom == 0:
        return None
    t = ((b[0] - a[0]) * (-u2[1]) - (b[1] - a[1]) * (-u2[0])) / denom
    m = a + u1 * t
    if math.hypot(m[0] - v[0], m[1] - v[1]) > mitre_limit * r:
        ring = np.array([v, a, b, v])
    else:
        ring = np.array([v, a, m, b, v])
    return Geometry(POLYGON, 0, rings=[ring])


def _single_sided_linework(coords: np.ndarray, dist: float, quad_segments: int,
                           join_style: str, mitre_limit: float,
                           closed: bool) -> list[Geometry]:
    """Parts for a single-sided line buffer: one-sided segment rectangles
    (bounded by the line itself) + side-pinned join patches. Positive
    dist = left-hand side, negative = right (reference
    geom/alg_buffer.go:103-112); caps are forced flat."""
    left = dist > 0
    r = abs(dist)
    sign = 1.0 if left else -1.0
    xy = coords[:, :2]
    n = len(xy)
    parts: list[Geometry] = []
    for i in range(n - 1):
        a, b = xy[i], xy[i + 1]
        dx, dy = b[0] - a[0], b[1] - a[1]
        ln = math.hypot(dx, dy)
        if ln == 0:
            continue
        nx, ny = -dy / ln * sign, dx / ln * sign
        ring = np.array([
            [a[0], a[1]], [b[0], b[1]],
            [b[0] + nx * r, b[1] + ny * r],
            [a[0] + nx * r, a[1] + ny * r],
            [a[0], a[1]],
        ])
        parts.append(Geometry(POLYGON, 0, rings=[ring]))
    if closed:
        for i in range(n - 1):
            p_prev = xy[i - 1] if i > 0 else xy[n - 2]
            patch = _side_join_patch(xy[i], p_prev, xy[i + 1], r, left,
                                     join_style, mitre_limit, quad_segments)
            if patch is not None:
                parts.append(patch)
    else:
        for i in range(1, n - 1):
            patch = _side_join_patch(xy[i], xy[i - 1], xy[i + 1], r, left,
                                     join_style, mitre_limit, quad_segments)
            if patch is not None:
                parts.append(patch)
    return parts


def buffer(g: Geometry, dist: float, quad_segments: int = 8,
           cap_style: str = "round", join_style: str = "round",
           mitre_limit: float = 5.0, single_sided: bool = False) -> Geometry:
    """Buffered geometry (always areal or empty). join_style:
    round | mitre | bevel (reference BufferOption joins,
    alg_buffer.go:44-124); mitre_limit caps spike length at sharp
    angles (falls back to bevel beyond it)."""
    if cap_style not in ("round", "flat", "square"):
        raise ValueError(f"unknown cap style {cap_style!r}")
    if join_style not in ("round", "mitre", "bevel"):
        raise ValueError(f"unknown join style {join_style!r}")
    if g.is_empty():
        return Geometry(POLYGON, 0, rings=[])
    if dist == 0:
        t = g.tag
        if t in (POLYGON, MULTIPOLYGON):
            return g
        return Geometry(POLYGON, 0, rings=[])
    t = g.tag
    if t == POINT:
        if dist < 0:
            return Geometry(POLYGON, 0, rings=[])
        return _disc(float(g.coords[0]), float(g.coords[1]), dist, quad_segments)
    if t == LINESTRING:
        closed = bool(np.array_equal(g.coords[0], g.coords[-1]))
        if single_sided:
            return union_many(_single_sided_linework(
                g.coords, dist, quad_segments, join_style, mitre_limit, closed))
        if dist < 0:
            return Geometry(POLYGON, 0, rings=[])
        return union_many(_buffer_linework(g.coords, dist, quad_segments, cap_style,
                                           closed, join_style, mitre_limit))
    if t == POLYGON:
        if not g.rings:
            return Geometry(POLYGON, 0, rings=[])
        ring_parts = []
        for ring in g.rings:
            ring_parts.extend(_buffer_linework(ring, abs(dist), quad_segments, "round",
                                               True, join_style, mitre_limit))
        boundary_buf = union_many(ring_parts)
        if dist > 0:
            return union_many([g, boundary_buf])
        return difference(g, boundary_buf)
    # multis / collections: union of part buffers (negative dist only
    # meaningful for areal parts)
    parts = [buffer(sub, dist, quad_segments, cap_style, join_style, mitre_limit,
                    single_sided=single_sided)
             for sub in g.flatten()]
    parts = [p for p in parts if not p.is_empty()]
    if not parts:
        return Geometry(POLYGON, 0, rings=[])
    return union_many(parts)
