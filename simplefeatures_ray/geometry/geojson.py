"""GeoJSON codec (reference geom/geojson_unmarshal.go:11,
geojson_marshal.go:3-51, feature collections
geojson_feature_collection.go).

Dimension inference on read: 2 ordinates -> XY, 3 -> XYZ (GeoJSON has no
M). On write, M values are dropped (spec), Z is emitted.
"""
from __future__ import annotations

import json

import numpy as np

from .core import (
    DIM_XY,
    DIM_XYZ,
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
    GeometryError,
)

_NAMES = {
    POINT: "Point",
    LINESTRING: "LineString",
    POLYGON: "Polygon",
    MULTIPOINT: "MultiPoint",
    MULTILINESTRING: "MultiLineString",
    MULTIPOLYGON: "MultiPolygon",
    GEOMETRYCOLLECTION: "GeometryCollection",
}
_TAGS = {v: k for k, v in _NAMES.items()}


def _infer_ctype(coords) -> int:
    """Depth-first first coordinate decides XY vs XYZ."""
    c = coords
    while isinstance(c, (list, tuple)) and c and isinstance(c[0], (list, tuple)):
        c = c[0]
    if isinstance(c, (list, tuple)) and len(c) >= 3:
        return DIM_XYZ
    return DIM_XY


def _coords_array(rows, dim) -> np.ndarray:
    if not rows:
        return np.zeros((0, dim))
    out = np.zeros((len(rows), dim))
    for i, r in enumerate(rows):
        if len(r) < 2:
            raise GeometryError("GeoJSON position with fewer than 2 ordinates")
        out[i, 0] = r[0]
        out[i, 1] = r[1]
        if dim >= 3:
            out[i, 2] = r[2] if len(r) >= 3 else 0.0
    return out


def from_geojson(doc) -> Geometry:
    """Parse a GeoJSON geometry (dict or JSON string)."""
    if isinstance(doc, (str, bytes)):
        doc = json.loads(doc)
    if not isinstance(doc, dict) or "type" not in doc:
        raise GeometryError("invalid GeoJSON: missing type")
    typ = doc["type"]
    if typ == "GeometryCollection":
        geoms = [from_geojson(g) for g in doc.get("geometries", [])]
        return Geometry(GEOMETRYCOLLECTION, geoms[0].ctype if geoms else DIM_XY, geoms=geoms)
    if typ not in _TAGS:
        raise GeometryError(f"invalid GeoJSON type {typ!r}")
    tag = _TAGS[typ]
    coords = doc.get("coordinates", [])
    ctype = _infer_ctype(coords)
    dim = 2 + (1 if ctype == DIM_XYZ else 0)
    if tag == POINT:
        if not coords:
            return Geometry(POINT, ctype, coords=None)
        return Geometry(POINT, ctype, coords=_coords_array([coords], dim)[0])
    if tag == LINESTRING:
        return Geometry(LINESTRING, ctype, coords=_coords_array(coords, dim))
    if tag == POLYGON:
        return Geometry(POLYGON, ctype, rings=[_coords_array(r, dim) for r in coords])
    if tag == MULTIPOINT:
        pts = [
            Geometry(POINT, ctype, coords=_coords_array([c], dim)[0] if c else None)
            for c in coords
        ]
        return Geometry(MULTIPOINT, ctype, geoms=pts)
    if tag == MULTILINESTRING:
        return Geometry(
            MULTILINESTRING, ctype,
            geoms=[Geometry(LINESTRING, ctype, coords=_coords_array(l, dim)) for l in coords],
        )
    # MultiPolygon
    return Geometry(
        MULTIPOLYGON, ctype,
        geoms=[
            Geometry(POLYGON, ctype, rings=[_coords_array(r, dim) for r in p])
            for p in coords
        ],
    )


def _num(v: float):
    import math

    f = float(v)
    if f == 0.0 and math.copysign(1.0, f) < 0:
        return f  # keep -0.0 (int() would drop the sign)
    return int(f) if f == int(f) and abs(f) < 1e15 else f


def _pos(row, emit_z: bool):
    out = [_num(row[0]), _num(row[1])]
    if emit_z and len(row) >= 3:
        out.append(_num(row[2]))
    return out


def to_geojson_dict(g: Geometry) -> dict:
    """Geometry -> GeoJSON dict. M is dropped; Z kept (reference
    geojson_marshal.go)."""
    emit_z = bool(g.ctype & DIM_XYZ)
    t = g.tag
    if t == GEOMETRYCOLLECTION:
        return {"type": "GeometryCollection",
                "geometries": [to_geojson_dict(s) for s in g.geoms]}
    name = _NAMES[t]
    if t == POINT:
        coords = [] if g.coords is None else _pos(g.coords, emit_z)
    elif t == LINESTRING:
        coords = [_pos(r, emit_z) for r in g.coords]
    elif t == POLYGON:
        coords = [[_pos(c, emit_z) for c in ring] for ring in g.rings]
    elif t == MULTIPOINT:
        coords = [([] if p.coords is None else _pos(p.coords, emit_z)) for p in g.geoms]
    elif t == MULTILINESTRING:
        coords = [[_pos(c, emit_z) for c in l.coords] for l in g.geoms]
    else:  # MultiPolygon
        coords = [
            [[_pos(c, emit_z) for c in ring] for ring in p.rings] for p in g.geoms
        ]
    return {"type": name, "coordinates": coords}


def to_geojson(g: Geometry) -> str:
    return json.dumps(to_geojson_dict(g), separators=(",", ":"))


# --------------------------------------------------------------------------- #
# features (reference geojson_feature_collection.go:11-29)
# --------------------------------------------------------------------------- #


def feature_to_dict(geometry: Geometry, properties: dict | None = None, fid=None) -> dict:
    out = {"type": "Feature", "geometry": to_geojson_dict(geometry),
           "properties": properties or {}}
    if fid is not None:
        out["id"] = fid
    return out


def parse_feature(doc):
    """GeoJSON Feature -> (Geometry, id, properties)."""
    if isinstance(doc, (str, bytes)):
        doc = json.loads(doc)
    if doc.get("type") != "Feature":
        raise GeometryError("not a GeoJSON Feature")
    return from_geojson(doc["geometry"]), doc.get("id"), doc.get("properties") or {}


def parse_feature_collection(doc):
    """FeatureCollection -> list of (Geometry, id, properties)."""
    if isinstance(doc, (str, bytes)):
        doc = json.loads(doc)
    if doc.get("type") != "FeatureCollection":
        raise GeometryError("not a GeoJSON FeatureCollection")
    return [parse_feature(f) for f in doc.get("features", [])]
