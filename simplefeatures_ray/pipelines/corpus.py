"""Deterministic WKT / point corpora used by the correctness queries.

The same corpus feeds both sides of the correctness gate: the Ray
pipeline parses the WKT with the engine's own codecs/kernels, while
oracle_sql() embeds the raw COORDINATES as SQL VALUES and recomputes the
answers inside DuckDB (shoelace via window functions, convex PIP via
cross-product signs) — an independent computation, not baked constants.
"""
from __future__ import annotations

import math

import numpy as np

from ..geometry.core import Geometry


def _ngon_ring(cx, cy, r, n, phase=0.0):
    ang = phase + np.arange(n) * (2 * math.pi / n)
    ring = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)
    ring = np.round(ring, 6)
    return np.concatenate([ring, ring[:1]], axis=0)


def polygon_corpus():
    """list of (case_id, Geometry) polygons — convex n-gons, boxes, one
    with a hole; coordinates exact to 6 decimals."""
    out = []
    cid = 0
    for k in range(12):
        cx = (k * 37 % 100) - 50 + 0.25
        cy = (k * 61 % 80) - 40 + 0.5
        r = 1.0 + (k % 5)
        n = 3 + (k % 6)
        out.append((cid, Geometry(3, 0, rings=[_ngon_ring(cx, cy, r, n, phase=0.2 * k)])))
        cid += 1
    # axis-aligned boxes
    for k in range(4):
        x0, y0 = k * 10.0, -k * 5.0
        ring = np.array([[x0, y0], [x0 + 4, y0], [x0 + 4, y0 + 3], [x0, y0 + 3], [x0, y0]])
        out.append((cid, Geometry(3, 0, rings=[ring])))
        cid += 1
    # box with a centered square hole (shell + hole)
    shell = np.array([[0.0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
    hole = np.array([[4.0, 4], [4, 6], [6, 6], [6, 4], [4, 4]])  # CW
    out.append((cid, Geometry(3, 0, rings=[shell, hole])))
    cid += 1
    return out


def linestring_corpus():
    out = []
    cid = 0
    for k in range(10):
        n = 3 + k
        t = np.arange(n, dtype=float)
        xs = np.round(t * (1 + 0.1 * k), 6)
        ys = np.round(np.sin(t * 0.7 + k) * (2 + k % 3), 6)
        out.append((cid, Geometry(2, 0, coords=np.stack([xs, ys], axis=1))))
        cid += 1
    return out


def point_probe_grid():
    """(probe_id, x, y) integer-derived probe points (exact in SQL)."""
    rows = []
    pid = 0
    for i in range(-55, 56, 5):
        for j in range(-45, 46, 5):
            rows.append((pid, float(i) / 1.0, float(j) / 1.0))
            pid += 1
    return rows


def event_points_sql(alias: str = "pts") -> str:
    """SQL snippet deriving deterministic integer-exact x/y from event_id —
    duplicated in events_xy() below; both sides are pure integer math."""
    return (
        f"(SELECT event_id, "
        f"(CAST(event_id * 7919 % 36000 AS DOUBLE)/100.0 - 180.0) AS x, "
        f"(CAST(event_id * 104729 % 14000 AS DOUBLE)/100.0 - 70.0) AS y "
        f"FROM events) {alias}"
    )


def events_xy(event_id: np.ndarray):
    """numpy twin of event_points_sql — integer modular arithmetic, exact."""
    e = event_id.astype(np.int64)
    x = (e * 7919 % 36000).astype(np.float64) / 100.0 - 180.0
    y = (e * 104729 % 14000).astype(np.float64) / 100.0 - 70.0
    return x, y


# literal boxes used by the spatial-join oracle queries
JOIN_BOXES = [
    # (box_id, minx, miny, maxx, maxy)
    (0, -170.0, -60.0, -120.0, -20.0),
    (1, -100.0, 0.0, -60.0, 40.0),
    (2, -30.0, -45.0, 20.0, 5.0),
    (3, 40.0, 10.0, 90.0, 55.0),
    (4, 100.0, -50.0, 160.0, 0.0),
    (5, -179.0, 45.0, 179.0, 69.0),  # wide northern band (overlaps others)
]


def join_boxes_sql(alias: str = "boxes") -> str:
    rows = ", ".join(f"({b},{x0},{y0},{x1},{y1})" for b, x0, y0, x1, y1 in JOIN_BOXES)
    return (
        f"(SELECT * FROM (VALUES {rows}) AS t(box_id, minx, miny, maxx, maxy)) {alias}"
    )


def boxes_as_polygon_table():
    """JOIN_BOXES as the engine's polygon-table schema (wkb + envelope)."""
    import pyarrow as pa

    from ..geometry.wkb import to_wkb

    ids, wkbs, minx, miny, maxx, maxy = [], [], [], [], [], []
    for b, x0, y0, x1, y1 in JOIN_BOXES:
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
        ids.append(b)
        wkbs.append(to_wkb(Geometry(3, 0, rings=[ring])))
        minx.append(x0)
        miny.append(y0)
        maxx.append(x1)
        maxy.append(y1)
    return pa.table(
        {
            "poly_id": pa.array(ids, pa.int64()),
            "name": pa.array([f"box_{i}" for i in ids], pa.string()),
            "wkb": pa.array(wkbs, pa.binary()),
            "minx": pa.array(minx),
            "miny": pa.array(miny),
            "maxx": pa.array(maxx),
            "maxy": pa.array(maxy),
        }
    )


def coords_values_sql(geoms, only_shell=False) -> str:
    """Corpus coordinates as SQL VALUES (case_id, ring_id, idx, x, y, sign).

    sign = +1 for shells, -1 for holes, so SUM(sign * |shoelace|) is the
    polygon area with holes subtracted.
    """
    rows = []
    for cid, g in geoms:
        arrs = g.rings if g.tag == 3 else [g.coords]
        for ring_id, ring in enumerate(arrs):
            if only_shell and ring_id > 0:
                continue
            sign = 1 if ring_id == 0 else -1
            for idx, (x, y) in enumerate(ring[:, :2]):
                rows.append(f"({cid},{ring_id},{idx},{x!r},{y!r},{sign})")
    return (
        "(SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(case_id, ring_id, idx, x, y, sign))"
    )


# ------------------------------------------------------------------ #
# synthetic LARGE box side for the cell-bucketed spatial join gate.
# Pure integer modular arithmetic -> bit-identical doubles in numpy
# and DuckDB (same pattern as events_xy / event_points_sql).
# ------------------------------------------------------------------ #


def synth_boxes(n: int = 400):
    """n deterministic boxes: centers sweep the events lon/lat domain,
    half-extents 2..10 x-wise and 2..8 y-wise."""
    import pyarrow as pa

    b = np.arange(n, dtype=np.int64)
    cx = (b * 7907 % 36000).astype(np.float64) / 100.0 - 180.0
    cy = (b * 104717 % 14000).astype(np.float64) / 100.0 - 70.0
    w = (b * 31 % 80).astype(np.float64) / 10.0 + 2.0
    h = (b * 17 % 60).astype(np.float64) / 10.0 + 2.0
    return pa.table(
        {
            "box_id": pa.array(b),
            "minx": pa.array(cx - w),
            "miny": pa.array(cy - h),
            "maxx": pa.array(cx + w),
            "maxy": pa.array(cy + h),
        }
    )


def synth_boxes_sql(n: int = 400, alias: str = "boxes") -> str:
    """SQL twin of synth_boxes — identical IEEE operation order."""
    return (
        f"(SELECT b AS box_id, cx - w AS minx, cy - h AS miny, "
        f"cx + w AS maxx, cy + h AS maxy FROM ("
        f"SELECT r AS b, "
        f"CAST(r * 7907 % 36000 AS DOUBLE)/100.0 - 180.0 AS cx, "
        f"CAST(r * 104717 % 14000 AS DOUBLE)/100.0 - 70.0 AS cy, "
        f"CAST(r * 31 % 80 AS DOUBLE)/10.0 + 2.0 AS w, "
        f"CAST(r * 17 % 60 AS DOUBLE)/10.0 + 2.0 AS h "
        f"FROM range({n}) t(r))) {alias}"
    )


def synth_intervals(n: int = 300):
    """n deterministic time intervals (epoch-us int64) inside the events
    table's January-2024 span — integer modular arithmetic, exact in SQL."""
    import pyarrow as pa

    i = np.arange(n, dtype=np.int64)
    base = 1704067200000000  # 2024-01-01T00:00:00Z in epoch microseconds
    start = base + (i * 104729 % 2592000) * 1000000
    dur = ((i * 131 % 7200) + 600) * 1000000
    return pa.table(
        {
            "interval_id": pa.array(i),
            "t_start": pa.array(start),
            "t_end": pa.array(start + dur),
        }
    )


def synth_intervals_sql(n: int = 300, alias: str = "iv") -> str:
    """SQL twin of synth_intervals."""
    return (
        f"(SELECT r AS interval_id, "
        f"1704067200000000 + (r * 104729 % 2592000) * 1000000 AS t_start, "
        f"1704067200000000 + (r * 104729 % 2592000) * 1000000 "
        f"+ ((r * 131 % 7200) + 600) * 1000000 AS t_end "
        f"FROM range({n}) t(r)) {alias}"
    )


# octagon direction set (CCW, dyadic components -> exact doubles)
_OCT_OX = np.array([1.0, 0.75, 0.0, -0.75, -1.0, -0.75, 0.0, 0.75])
_OCT_OY = np.array([0.0, 0.75, 1.0, 0.75, 0.0, -0.75, -1.0, -0.75])


def synth_convex_polys(n: int = 60):
    """n deterministic convex octagons (CCW shells) over the events
    domain — engine polygon-table schema (wkb + envelope). The SQL twin
    (synth_convex_polys_values) inlines the SAME vertex doubles as
    literals, the established pattern of the geom_* oracles."""
    import pyarrow as pa

    from ..geometry.core import Geometry
    from ..geometry.wkb import to_wkb

    b = np.arange(n, dtype=np.int64)
    cx = (b * 7907 % 36000).astype(np.float64) / 100.0 - 180.0
    cy = (b * 104717 % 14000).astype(np.float64) / 100.0 - 70.0
    r = (b * 31 % 80).astype(np.float64) / 16.0 + 2.0
    ids, wkbs, minx, miny, maxx, maxy = [], [], [], [], [], []
    for i in range(n):
        vx = cx[i] + r[i] * _OCT_OX
        vy = cy[i] + r[i] * _OCT_OY
        ring = np.column_stack([np.append(vx, vx[0]), np.append(vy, vy[0])])
        ids.append(int(b[i]))
        wkbs.append(to_wkb(Geometry(3, 0, rings=[ring])))
        minx.append(vx.min())
        miny.append(vy.min())
        maxx.append(vx.max())
        maxy.append(vy.max())
    return pa.table(
        {
            "poly_id": pa.array(ids, pa.int64()),
            "wkb": pa.array(wkbs, pa.binary()),
            "minx": pa.array(minx),
            "miny": pa.array(miny),
            "maxx": pa.array(maxx),
            "maxy": pa.array(maxy),
        }
    )


def synth_convex_polys_values(n: int = 60) -> str:
    """(poly_id, idx, x, y) VALUES literals for the SQL twin — the exact
    doubles the engine table holds, via repr round-trip."""
    b = np.arange(n, dtype=np.int64)
    cx = (b * 7907 % 36000).astype(np.float64) / 100.0 - 180.0
    cy = (b * 104717 % 14000).astype(np.float64) / 100.0 - 70.0
    r = (b * 31 % 80).astype(np.float64) / 16.0 + 2.0
    rows = []
    for i in range(n):
        vx = cx[i] + r[i] * _OCT_OX
        vy = cy[i] + r[i] * _OCT_OY
        for j in range(len(_OCT_OX)):
            rows.append(f"({int(b[i])},{j},{vx[j]!r},{vy[j]!r})")
    return ", ".join(rows)


def events_xy_half(event_id: np.ndarray):
    """HALF-integer-degree point grid (exact doubles) for the cell-index
    gates: integer lats land exactly on Mercator cell boundaries at
    every resolution (lat=0 -> my=0.5), a cross-engine knife-edge; the
    +-0.5 lattice keeps every my*2^res >= 5e-3 away from an integer for
    res<=8 (enumerated over all 140 lats), so numpy-vs-DuckDB ulp
    differences in ln/tan can never flip a floor. The lon path is pure
    rational arithmetic in the same op order on both sides — exact."""
    e = event_id.astype(np.int64)
    x = (e * 7919 % 360).astype(np.float64) - 179.5
    y = (e * 104729 % 140).astype(np.float64) - 69.5
    return x, y


def event_points_half_sql(alias: str = "pts") -> str:
    """SQL twin of events_xy_half."""
    return (
        f"(SELECT event_id, "
        f"CAST(event_id * 7919 % 360 AS DOUBLE) - 179.5 AS x, "
        f"CAST(event_id * 104729 % 140 AS DOUBLE) - 69.5 AS y "
        f"FROM events) {alias}"
    )


def events_xy_swiss(event_id: np.ndarray):
    """Deterministic millidegree lattice inside the Swiss LV95 domain
    (lon 5.9..10.5, lat 45.8..47.9) — exact doubles on both engines
    (integer/1000). Pair period lcm(4600, 2100) = 96,600, small enough
    to enumerate exhaustively for rounding-straddle proofs."""
    e = event_id.astype(np.int64)
    x = (e * 7919 % 4600).astype(np.float64) / 1000.0 + 5.9
    y = (e * 104729 % 2100).astype(np.float64) / 1000.0 + 45.8
    return x, y


def event_points_swiss_sql(alias: str = "pts") -> str:
    """SQL twin of events_xy_swiss."""
    return (
        f"(SELECT event_id, "
        f"CAST(event_id * 7919 % 4600 AS DOUBLE)/1000.0 + 5.9 AS x, "
        f"CAST(event_id * 104729 % 2100 AS DOUBLE)/1000.0 + 45.8 AS y "
        f"FROM events) {alias}"
    )


def morton_sql(res: int, ix: str = "ix", iy: str = "iy") -> str:
    """Bit-interleave SQL expression: the Morton payload of (ix, iy)
    at `res` bits per axis (twin of cells._spread_bits)."""
    return " + ".join(
        f"((({ix} >> {b}) & 1) << {2 * b}) + ((({iy} >> {b}) & 1) << {2 * b + 1})"
        for b in range(res)
    )


def cell_grid_sql(res: int, pts: str) -> str:
    """merc+grid CTE body: (ix, iy) cell grid coords at `res` of a
    point relation with (event_id, x, y) columns — IDENTICAL op order
    to cells.mercator_xy/lonlat_to_cell so boundary floors agree."""
    scale = float(1 << res)
    nmax = (1 << res) - 1
    return (
        f"SELECT event_id, "
        f"greatest(least(CAST(floor(((x + 180.0) / 360.0) * {scale!r}) AS BIGINT), {nmax}), 0) AS ix, "
        f"greatest(least(CAST(floor(((1.0 - ln(tan(pi() / 4.0 + (least(greatest(y, -85.05112878), 85.05112878) * (pi() / 180.0)) / 2.0)) / pi()) / 2.0) * {scale!r}) AS BIGINT), {nmax}), 0) AS iy "
        f"FROM {pts}"
    )


def events_xy_int(event_id: np.ndarray):
    """INTEGER-degree point grid (exact doubles): the kNN-vs-SQL gate
    needs distances whose ties are exact in BOTH engines — the 0.01
    lattice's unrepresentable decimals make sub-ulp knife-edges."""
    e = event_id.astype(np.int64)
    x = (e * 7919 % 360).astype(np.float64) - 180.0
    y = (e * 104729 % 140).astype(np.float64) - 70.0
    return x, y


def event_points_int_sql(alias: str = "pts") -> str:
    """SQL twin of events_xy_int."""
    return (
        f"(SELECT event_id, "
        f"CAST(event_id * 7919 % 360 AS DOUBLE) - 180.0 AS x, "
        f"CAST(event_id * 104729 % 140 AS DOUBLE) - 70.0 AS y "
        f"FROM events) {alias}"
    )


def synth_boxes_int(n: int = 800):
    """n deterministic INTEGER-cornered boxes (exact doubles; see
    events_xy_int for why)."""
    import pyarrow as pa

    b = np.arange(n, dtype=np.int64)
    cx = (b * 7907 % 360).astype(np.float64) - 180.0
    cy = (b * 104717 % 140).astype(np.float64) - 70.0
    w = (b * 31 % 8).astype(np.float64) + 2.0
    h = (b * 17 % 6).astype(np.float64) + 2.0
    return pa.table(
        {
            "box_id": pa.array(b),
            "minx": pa.array(cx - w),
            "miny": pa.array(cy - h),
            "maxx": pa.array(cx + w),
            "maxy": pa.array(cy + h),
        }
    )


def synth_boxes_int_sql(n: int = 800, alias: str = "boxes") -> str:
    """SQL twin of synth_boxes_int."""
    return (
        f"(SELECT b AS box_id, cx - w AS minx, cy - h AS miny, "
        f"cx + w AS maxx, cy + h AS maxy FROM ("
        f"SELECT r AS b, "
        f"CAST(r * 7907 % 360 AS DOUBLE) - 180.0 AS cx, "
        f"CAST(r * 104717 % 140 AS DOUBLE) - 70.0 AS cy, "
        f"CAST(r * 31 % 8 AS DOUBLE) + 2.0 AS w, "
        f"CAST(r * 17 % 6 AS DOUBLE) + 2.0 AS h "
        f"FROM range({n}) t(r))) {alias}"
    )


def synth_boxes_int_polygon_table(n: int = 800):
    """synth_boxes_int(n) in the polygon-table schema (wkb + envelope)."""
    import pyarrow as pa

    from ..geometry.wkb import to_wkb

    b = synth_boxes_int(n)
    minx = np.asarray(b["minx"]); miny = np.asarray(b["miny"])
    maxx = np.asarray(b["maxx"]); maxy = np.asarray(b["maxy"])
    wkbs = []
    for x0, y0, x1, y1 in zip(minx, miny, maxx, maxy):
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
        wkbs.append(to_wkb(Geometry(3, 0, rings=[ring])))
    return pa.table(
        {
            "poly_id": b["box_id"],
            "wkb": pa.array(wkbs, pa.binary()),
            "minx": b["minx"],
            "miny": b["miny"],
            "maxx": b["maxx"],
            "maxy": b["maxy"],
        }
    )


# ------------------------------------------------------------------ #
# general (non-rectangle) relate gate: convex INTEGER polygon pairs.
# Integer coordinates make every SQL orientation / cross-product sign
# exact in doubles (products < 2^53), so the oracle can derive the
# topological class from first principles with no epsilon anywhere.
# ------------------------------------------------------------------ #

_RELATE_TEMPLATES = [
    # CCW, integer, convex
    [(0, 0), (8, 0), (8, 6), (0, 6)],                    # box
    [(0, 0), (10, 0), (4, 7)],                           # triangle
    [(2, 0), (6, 0), (8, 3), (6, 6), (2, 6), (0, 3)],    # hexagon
    [(4, 0), (8, 4), (4, 8), (0, 4)],                    # diamond
    [(0, 0), (12, 1), (1, 3)],                           # thin triangle
]


def relate_pair_corpus(n_pairs: int = 175):
    """Deterministic (pair_id, side, idx, x, y) convex-pair corpus
    covering equals/disjoint/touches/contains/within/overlaps. side 0
    is A, side 1 is B; vertex lists are OPEN (no closing repeat), CCW.
    """
    rows = []
    for p in range(n_pairs):
        ta = _RELATE_TEMPLATES[p % 5]
        tb = _RELATE_TEMPLATES[(p // 5) % 5]
        cfg = p % 7
        sa, sb = 1, 1
        ax = ay = bx = by = 0
        if cfg == 0:
            pass                                  # same spot: overlap/equals
        elif cfg == 1:
            bx, by = 30, 5                        # far: disjoint
        elif cfg == 2:
            bx = max(x for x, _ in ta) - min(x for x, _ in tb)  # bbox kiss
        elif cfg == 3:
            sa = 4                                # A scaled 4x: B inside?
            bx, by = 9, 8
        elif cfg == 4:
            bx, by = 3, 2                         # partial overlap
        elif cfg == 5:
            bx = max(x for x, _ in ta) - min(x for x, _ in tb)
            by = max(y for y, _ in ta) - min(y for y, _ in tb)  # corner kiss
        else:
            sb = 2
            bx, by = -20, 0                       # disjoint, B scaled
        for side, (tpl, s, dx, dy) in enumerate(
                ((ta, sa, ax, ay), (tb, sb, bx, by))):
            for idx, (x, y) in enumerate(tpl):
                rows.append((p, side, idx, x * s + dx, y * s + dy))
    return rows


def relate_pairs_values_sql(rows) -> str:
    vals = ", ".join(f"({p},{s},{i},{x},{y})" for p, s, i, x, y in rows)
    return (f"(SELECT * FROM (VALUES {vals}) "
            f"AS t(pair_id, side, idx, x, y))")


def events_xy_nad83(event_id: np.ndarray):
    """Deterministic millidegree lattice inside UTM zone 15N's NAD83
    domain (lon -99..-87.5, lat 26..48) — exact doubles on both engines
    (integer/1000)."""
    e = event_id.astype(np.int64)
    x = (e * 7919 % 11500).astype(np.float64) / 1000.0 - 99.0
    y = (e * 104729 % 22000).astype(np.float64) / 1000.0 + 26.0
    return x, y


def event_points_nad83_sql(alias: str = "pts") -> str:
    """SQL twin of events_xy_nad83."""
    return (
        f"(SELECT event_id, "
        f"CAST(event_id * 7919 % 11500 AS DOUBLE)/1000.0 - 99.0 AS x, "
        f"CAST(event_id * 104729 % 22000 AS DOUBLE)/1000.0 + 26.0 AS y "
        f"FROM events) {alias}"
    )


def events_xy_australia(event_id: np.ndarray):
    """Deterministic millidegree lattice over Australia (lon 113..153,
    lat -43..-11) for the GDA94 Albers gate."""
    e = event_id.astype(np.int64)
    x = (e * 7919 % 40000).astype(np.float64) / 1000.0 + 113.0
    y = (e * 104729 % 32000).astype(np.float64) / 1000.0 - 43.0
    return x, y


def event_points_australia_sql(alias: str = "pts") -> str:
    """SQL twin of events_xy_australia."""
    return (
        f"(SELECT event_id, "
        f"CAST(event_id * 7919 % 40000 AS DOUBLE)/1000.0 + 113.0 AS x, "
        f"CAST(event_id * 104729 % 32000 AS DOUBLE)/1000.0 - 43.0 AS y "
        f"FROM events) {alias}"
    )


def events_xy_california(event_id: np.ndarray):
    """Deterministic millidegree lattice inside California SPCS zone 3's
    domain (lon -122.5..-118.5, lat 35..38.5)."""
    e = event_id.astype(np.int64)
    x = (e * 7919 % 4000).astype(np.float64) / 1000.0 - 122.5
    y = (e * 104729 % 3500).astype(np.float64) / 1000.0 + 35.0
    return x, y


def event_points_california_sql(alias: str = "pts") -> str:
    """SQL twin of events_xy_california."""
    return (
        f"(SELECT event_id, "
        f"CAST(event_id * 7919 % 4000 AS DOUBLE)/1000.0 - 122.5 AS x, "
        f"CAST(event_id * 104729 % 3500 AS DOUBLE)/1000.0 + 35.0 AS y "
        f"FROM events) {alias}"
    )


def events_xy_texas(event_id: np.ndarray):
    """Deterministic millidegree lattice inside Texas Central's domain
    (lon -103..-97.5, lat 28..32)."""
    e = event_id.astype(np.int64)
    x = (e * 7919 % 5500).astype(np.float64) / 1000.0 - 103.0
    y = (e * 104729 % 4000).astype(np.float64) / 1000.0 + 28.0
    return x, y


def event_points_texas_sql(alias: str = "pts") -> str:
    """SQL twin of events_xy_texas."""
    return (
        f"(SELECT event_id, "
        f"CAST(event_id * 7919 % 5500 AS DOUBLE)/1000.0 - 103.0 AS x, "
        f"CAST(event_id * 104729 % 4000 AS DOUBLE)/1000.0 + 28.0 AS y "
        f"FROM events) {alias}"
    )
