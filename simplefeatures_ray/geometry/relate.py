"""DE-9IM relate + named predicates.

From-scratch implementation (the reference delegates to its JTS-port
RelateNG, /root/reference/geom/alg_relate.go:66-81; we compute the
matrix directly by noding both geometries' linework and classifying
representative elements — sub-segment midpoints, noding points, part
points, and interior probe points — against the other geometry's
interior/boundary/exterior). Named predicate masks follow
geom/alg_relate.go:102-232 (standard OGC masks); the matcher mirrors
geom/de9im.go:83-121.

Supported: all 7 types incl. homogeneous multis; GeometryCollections are
handled by category union (exact for disjoint-part collections).
"""
from __future__ import annotations

import numpy as np

from .core import LINESTRING, POINT, POLYGON, Geometry
from .predicates import (
    BOUNDARY,
    EXTERIOR,
    INTERIOR,
    _candidate_pairs,
    _linework_boundary_points,
    locate_point,
    segment_intersection,
)

F = -1  # "empty" dimension


class _Decomp:
    __slots__ = ("pts", "lines", "rings", "polys", "line_bnd", "geom",
                 "segs", "seg_is_ring")

    def __init__(self, g: Geometry):
        self.geom = g
        self.pts = []
        self.lines = []
        self.rings = []
        self.polys = []
        for leaf in g.flatten():
            if leaf.tag == POINT:
                if leaf.coords is not None:
                    self.pts.append((float(leaf.coords[0]), float(leaf.coords[1])))
            elif leaf.tag == LINESTRING:
                if len(leaf.coords) >= 2:
                    self.lines.append(leaf.coords[:, :2])
            elif leaf.tag == POLYGON:
                if leaf.rings:
                    self.polys.append(leaf.rings)
                    self.rings.extend(r[:, :2] for r in leaf.rings)
        self.line_bnd = _linework_boundary_points(self.lines)
        segs = []
        is_ring = []
        for c in self.lines:
            s = np.concatenate([c[:-1], c[1:]], axis=1)
            segs.append(s)
            is_ring.extend([False] * len(s))
        for r in self.rings:
            s = np.concatenate([r[:-1], r[1:]], axis=1)
            segs.append(s)
            is_ring.extend([True] * len(s))
        self.segs = np.concatenate(segs, axis=0) if segs else np.zeros((0, 4))
        self.seg_is_ring = np.asarray(is_ring, dtype=bool)

    def dim_interior(self) -> int:
        if self.polys:
            return 2
        if self.lines:
            return 1
        if self.pts:
            return 0
        return F

    def dim_boundary(self) -> int:
        if self.polys:
            return 1
        if self.line_bnd:
            return 0
        return F

    def is_empty(self) -> bool:
        return not (self.pts or self.lines or self.polys)


def _seg_param(p, seg):
    ax, ay, bx, by = seg
    dx = bx - ax
    dy = by - ay
    denom = dx * dx + dy * dy
    if denom == 0:
        return 0.0
    return ((p[0] - ax) * dx + (p[1] - ay) * dy) / denom


def _t_eps(seg) -> float:
    """Parameter-space tolerance matching the world-space snap tolerance
    on this segment (a fixed t-epsilon is wrong by the segment length:
    it would merge a genuine 1e-5 lens on a 1e6-long edge)."""
    import math

    from .predicates import _on_tol

    ln = math.hypot(seg[2] - seg[0], seg[3] - seg[1])
    if ln == 0:
        return 0.5
    scale = max(abs(seg[0]), abs(seg[1]), abs(seg[2]), abs(seg[3]))
    return min(0.5, _on_tol(scale) / ln)


def _node(da: _Decomp, db: _Decomp):
    """Split both linework sets at mutual intersections.

    Returns (cuts_a, cuts_b, xpoints): per-segment sorted extra t params
    and the set of 0D intersection points.
    """
    cuts_a: dict[int, set] = {}
    cuts_b: dict[int, set] = {}
    xpoints: set = set()
    # split each side's linework at the OTHER side's point parts (a point
    # lying on a segment otherwise leaves the segment un-noded and its
    # midpoint can coincide with the point — unsampled exterior remainder)
    from .predicates import on_segment

    for pts, segs, cuts in ((db.pts, da.segs, cuts_a), (da.pts, db.segs, cuts_b)):
        for p in pts:
            for i in range(len(segs)):
                s = segs[i]
                if on_segment(p[0], p[1], s[0], s[1], s[2], s[3]):
                    t = _seg_param(p, s)
                    te = _t_eps(s)
                    if te < t < 1 - te:
                        cuts.setdefault(i, set()).add(t)
    pairs = _candidate_pairs(da.segs, db.segs)
    for i, j in pairs:
        sa = da.segs[i]
        sb = db.segs[j]
        kind, data = segment_intersection(sa[:2], sa[2:], sb[:2], sb[2:])
        if kind == "none":
            continue
        pts = [data] if kind == "point" else list(data)
        for p in pts:
            # snap against FP noise: a crossing computed epsilon-inside a
            # segment end would otherwise create a sliver sub-segment
            # whose midpoint sits exactly on the other boundary
            xpoints.add((round(p[0], 9) + 0.0, round(p[1], 9) + 0.0))
            ta = _seg_param(p, sa)
            tb = _seg_param(p, sb)
            if _t_eps(sa) < ta < 1 - _t_eps(sa):
                cuts_a.setdefault(int(i), set()).add(ta)
            if _t_eps(sb) < tb < 1 - _t_eps(sb):
                cuts_b.setdefault(int(j), set()).add(tb)
    return cuts_a, cuts_b, xpoints


def _subseg_mids(d: _Decomp, cuts: dict):
    """Yield (mx, my, is_ring) midpoints of the noded sub-segments.

    Cut params within 1e-9 of each other are merged and sliver
    sub-segments skipped: two parameterizations of the same crossing can
    differ in the last ULP, and the resulting zero-length 'sub-segment'
    would have the crossing itself as its midpoint (a 0D element, already
    handled via xpoints, masquerading as a 1D one)."""
    for i in range(len(d.segs)):
        seg = d.segs[i]
        te = _t_eps(seg)
        raw = sorted({0.0, 1.0} | {t for t in cuts.get(i, ()) if 0.0 < t < 1.0})
        ts = [raw[0]]
        for t in raw[1:]:
            if t - ts[-1] > te:
                ts.append(t)
        if ts[-1] < 1.0:  # keep the endpoint (merge absorbed it)
            ts[-1] = 1.0
        ax, ay, bx, by = seg
        for t0, t1 in zip(ts[:-1], ts[1:]):
            tm = (t0 + t1) / 2.0
            yield (ax + tm * (bx - ax), ay + tm * (by - ay), bool(d.seg_is_ring[i]))


def relate(a: Geometry, b: Geometry) -> str:
    da = _Decomp(a)
    db = _Decomp(b)

    # empty-input matrix synthesis (reference alg_relate.go:33-63)
    if da.is_empty() and db.is_empty():
        return "FFFFFFFF2"
    if da.is_empty():
        m = [F] * 9
        m[6] = db.dim_interior()  # E(A) ∩ I(B)
        m[7] = db.dim_boundary()
        m[8] = 2
        return _fmt(m)
    if db.is_empty():
        m = [F] * 9
        m[2] = da.dim_interior()  # I(A) ∩ E(B)
        m[5] = da.dim_boundary()
        m[8] = 2
        return _fmt(m)

    cuts_a, cuts_b, xpoints = _node(da, db)

    II = IB = IE = BI = BB = BE = EI = EB = F
    ga, gb = da.geom, db.geom

    # batched classification: collect every probe point per side, locate
    # them all with ONE vectorized pass per geometry (PreparedGeometry)
    from .prepared import PreparedGeometry

    prep_a = PreparedGeometry(ga)
    prep_b = PreparedGeometry(gb)

    a_mids = list(_subseg_mids(da, cuts_a))
    b_mids = list(_subseg_mids(db, cuts_b))
    xp = sorted(xpoints)

    def _locs(prep, pts2):
        if not pts2:
            return np.zeros(0, dtype=np.int8)
        arr = np.asarray(pts2, dtype=np.float64)
        return prep.locate_points(arr[:, 0], arr[:, 1])

    loc_a_pts = _locs(prep_b, da.pts)
    loc_b_pts = _locs(prep_a, db.pts)
    loc_a_mids = _locs(prep_b, [(m[0], m[1]) for m in a_mids])
    loc_b_mids = _locs(prep_a, [(m[0], m[1]) for m in b_mids])
    loc_a_bnd = _locs(prep_b, sorted(da.line_bnd))
    loc_b_bnd = _locs(prep_a, sorted(db.line_bnd))
    loc_xp_a = _locs(prep_a, xp)
    loc_xp_b = _locs(prep_b, xp)

    # ---- point parts (all in the respective interiors) --------------------
    for loc in loc_a_pts:
        if loc == INTERIOR:
            II = max(II, 0)
        elif loc == BOUNDARY:
            IB = max(IB, 0)
        else:
            IE = max(IE, 0)
    for loc in loc_b_pts:
        if loc == INTERIOR:
            II = max(II, 0)
        elif loc == BOUNDARY:
            BI = max(BI, 0)
        else:
            EI = max(EI, 0)

    # dimensions used to CLAMP contributions: a midpoint/probe landing in a
    # region only contributes min(its own dim, the other side's dim there)
    # — e.g. a ring arc through a 0-dim interior (a Point) is a 0-dim hit.
    diA = da.dim_interior()
    diB = db.dim_interior()
    dbA = da.dim_boundary()
    dbB = db.dim_boundary()

    # ---- A's noded sub-segments ------------------------------------------
    for (mx, my, is_ring), loc in zip(a_mids, loc_a_mids):
        if is_ring:  # element of B(A)
            if loc == INTERIOR:
                BI = max(BI, min(1, diB))
                if db.polys:
                    II = max(II, 2)  # boundary inside B => area overlap
                    # and E(A) grows across it into B (B ⊃ A or A-hole)
                    EI = max(EI, 2)
            elif loc == BOUNDARY:
                BB = max(BB, max(0, min(1, dbB)))
            else:
                BE = max(BE, 1)
                IE = max(IE, 2)  # boundary outside B => interior outside too
        else:  # element of I(A) (line interior)
            if loc == INTERIOR:
                II = max(II, min(1, diB))
            elif loc == BOUNDARY:
                IB = max(IB, max(0, min(1, dbB)))
            else:
                IE = max(IE, 1)
    # ---- B's noded sub-segments ------------------------------------------
    for (mx, my, is_ring), loc in zip(b_mids, loc_b_mids):
        if is_ring:  # element of B(B)
            if loc == INTERIOR:
                IB = max(IB, min(1, diA))
                if da.polys:
                    II = max(II, 2)
                    # B's boundary inside A: A's interior continues across
                    # it into E(B) (hole interior or A ⊃ B) => I(A)∩E(B)=2
                    IE = max(IE, 2)
            elif loc == BOUNDARY:
                BB = max(BB, max(0, min(1, dbA)))
            else:
                EB = max(EB, 1)
                EI = max(EI, 2)
        else:  # element of I(B)
            if loc == INTERIOR:
                II = max(II, min(1, diA))
            elif loc == BOUNDARY:
                BI = max(BI, max(0, min(1, dbA)))
            else:
                EI = max(EI, 1)

    # ---- line boundary endpoints (0D boundary elements) -------------------
    for loc in loc_a_bnd:
        if loc == INTERIOR:
            BI = max(BI, 0)
        elif loc == BOUNDARY:
            BB = max(BB, 0)
        else:
            BE = max(BE, 0)
    for loc in loc_b_bnd:
        if loc == INTERIOR:
            IB = max(IB, 0)
        elif loc == BOUNDARY:
            BB = max(BB, 0)
        else:
            EB = max(EB, 0)

    # ---- 0D noding points -------------------------------------------------
    for la, lb in zip(loc_xp_a, loc_xp_b):
        if la == INTERIOR and lb == INTERIOR:
            II = max(II, 0)
        elif la == INTERIOR and lb == BOUNDARY:
            IB = max(IB, 0)
        elif la == BOUNDARY and lb == INTERIOR:
            BI = max(BI, 0)
        elif la == BOUNDARY and lb == BOUNDARY:
            BB = max(BB, 0)

    # ---- area interior probes (covers coincident-boundary cases) ----------
    from .algorithms import _polygon_interior_point

    for rings in da.polys:
        pos = _polygon_interior_point(rings)
        loc = locate_point(pos[0], pos[1], gb)
        if loc == INTERIOR:
            II = max(II, min(2, diB))
        elif loc == BOUNDARY:
            IB = max(IB, max(0, min(1, dbB)))
        else:
            IE = max(IE, 2)
    for rings in db.polys:
        pos = _polygon_interior_point(rings)
        loc = locate_point(pos[0], pos[1], ga)
        if loc == INTERIOR:
            II = max(II, min(2, diA))
        elif loc == BOUNDARY:
            BI = max(BI, max(0, min(1, dbA)))
        else:
            EI = max(EI, 2)

    # ---- exterior-row defaults -------------------------------------------
    # E(A) meets I(B)/B(B) whenever B is not covered by A; the element scans
    # above already caught every such case for lines/areas; for pure-point
    # B the point loops handled it. E(A)∩E(B) is always 2 (plane is bigger
    # than both).
    return _fmt([II, IB, IE, BI, BB, BE, EI, EB, 2])


def _fmt(m) -> str:
    return "".join("F" if v < 0 else str(v) for v in m)


# --------------------------------------------------------------------------- #
# mask matching (reference geom/de9im.go:83-121)
# --------------------------------------------------------------------------- #


def relate_matches(matrix: str, mask: str) -> bool:
    for mc, kc in zip(matrix, mask):
        if kc == "*":
            continue
        if kc == "T":
            if mc == "F":
                return False
        elif kc == "F":
            if mc != "F":
                return False
        elif mc != kc:
            return False
    return True


def _match_any(matrix: str, *masks: str) -> bool:
    return any(relate_matches(matrix, m) for m in masks)


# named predicates (masks at reference geom/alg_relate.go:102-232)


def equals(a, b) -> bool:
    """Topological equality (JTS equalsTopo semantics: same point set AND
    same topological dimension — a point is not equal to a zero-length
    line even though their point sets coincide)."""
    if a.is_empty() and b.is_empty():
        return True
    if a.is_empty() != b.is_empty():
        return False
    if a.dimension() != b.dimension():
        return False
    return relate_matches(relate(a, b), "T*F**FFF*")


def disjoint(a, b) -> bool:
    return relate_matches(relate(a, b), "FF*FF****")


def touches(a, b) -> bool:
    return _match_any(relate(a, b), "FT*******", "F**T*****", "F***T****")


def contains(a, b) -> bool:
    return relate_matches(relate(a, b), "T*****FF*")


def within(a, b) -> bool:
    return relate_matches(relate(a, b), "T*F**F***")


def covers(a, b) -> bool:
    return _match_any(
        relate(a, b), "T*****FF*", "*T****FF*", "***T**FF*", "****T*FF*"
    )


def covered_by(a, b) -> bool:
    return _match_any(
        relate(a, b), "T*F**F***", "*TF**F***", "**FT*F***", "**F*TF***"
    )


def crosses(a, b) -> bool:
    da, db_ = a.dimension(), b.dimension()
    m = relate(a, b)
    if da < db_:
        return relate_matches(m, "T*T******")
    if da > db_:
        return relate_matches(m, "T*****T**")
    if da == 1 and db_ == 1:
        return relate_matches(m, "0********")
    return False


def overlaps(a, b) -> bool:
    da, db_ = a.dimension(), b.dimension()
    m = relate(a, b)
    if da == db_ == 1:
        return relate_matches(m, "1*T***T**")
    if da == db_:
        return relate_matches(m, "T*T***T**")
    return False
