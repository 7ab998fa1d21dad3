"""GeoJSON geometry codec (RFC 7946) for the packed GeometryArray.

Pure Python/numpy — the GeoJSON analogue of the WKT/WKB codecs: the
reference reads/writes GeoJSON through OGR (fileops.py:1621-1745,
driver table geofileops/util/geofiletypes.csv); this sandbox has no
GDAL, so the coordinate-array conversion is implemented directly.
Coordinates are 2D (the engine's coordinate model); Z values in input
are dropped, like the WKB decoder's Z-strip."""

from __future__ import annotations

import numpy as np

from .array import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MISSING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    GeometryArray,
)


class GeoJsonError(ValueError):
    pass


def _seq(coords) -> np.ndarray:
    a = np.asarray(coords, dtype=np.float64)
    if a.ndim != 2 or a.shape[1] < 2:
        raise GeoJsonError(f"bad coordinate sequence shape {a.shape}")
    return np.ascontiguousarray(a[:, :2])


def parse_geometry(g: dict | None) -> tuple[int, list]:
    """One GeoJSON geometry object → (type code, parts) in the
    GeometryArray.from_parts convention (same shapes as the WKT
    parser). GeometryCollection flattens member parts (the array model
    keeps one type code per row — same degrade as WKB/WKT)."""
    if g is None:
        return MISSING, []
    t = g.get("type")
    c = g.get("coordinates")
    if t == "Point":
        if c is None or len(c) == 0:
            return POINT, []
        return POINT, [[_seq([c])]]
    if t == "LineString":
        if not c:
            return LINESTRING, []
        return LINESTRING, [[_seq(c)]]
    if t == "Polygon":
        if not c:
            return POLYGON, []
        return POLYGON, [[_seq(r) for r in c]]
    if t == "MultiPoint":
        return MULTIPOINT, [[_seq([p])] for p in (c or [])]
    if t == "MultiLineString":
        return MULTILINESTRING, [[_seq(ln)] for ln in (c or [])]
    if t == "MultiPolygon":
        return MULTIPOLYGON, [[_seq(r) for r in poly] for poly in (c or [])]
    if t == "GeometryCollection":
        parts: list = []
        for sub in g.get("geometries") or []:
            _c, p = parse_geometry(sub)
            parts.extend(p)
        return GEOMETRYCOLLECTION, parts
    raise GeoJsonError(f"unknown GeoJSON geometry type {t!r}")


def from_geojson(values: list[dict | None]) -> GeometryArray:
    """Sequence of GeoJSON geometry dicts (None → missing row)."""
    return GeometryArray.from_parts([parse_geometry(v) for v in values])


def _ring_closed(ring: np.ndarray) -> bool:
    return len(ring) >= 4 and bool(np.all(ring[0] == ring[-1]))


def _part_geojson(code: int, part: list[np.ndarray]) -> dict:
    if code == POINT:
        return {"type": "Point", "coordinates": part[0][0].tolist()}
    if code == LINESTRING:
        return {"type": "LineString", "coordinates": part[0].tolist()}
    return {"type": "Polygon", "coordinates": [r.tolist() for r in part]}


def geometry_geojson(arr: GeometryArray, i: int) -> dict | None:
    """Row ``i`` as a GeoJSON geometry object (missing → None)."""
    t = int(arr.types[i])
    if t == MISSING:
        return None
    parts = arr._parts_of(i)
    if t == POINT:
        if not parts:
            return {"type": "Point", "coordinates": []}
        return _part_geojson(POINT, parts[0])
    if t == LINESTRING:
        if not parts:
            return {"type": "LineString", "coordinates": []}
        return _part_geojson(LINESTRING, parts[0])
    if t == POLYGON:
        return {
            "type": "Polygon",
            "coordinates": [r.tolist() for r in (parts[0] if parts else [])],
        }
    if t == MULTIPOINT:
        return {
            "type": "MultiPoint",
            "coordinates": [p[0][0].tolist() for p in parts],
        }
    if t == MULTILINESTRING:
        return {
            "type": "MultiLineString",
            "coordinates": [p[0].tolist() for p in parts],
        }
    if t == MULTIPOLYGON:
        return {
            "type": "MultiPolygon",
            "coordinates": [[r.tolist() for r in p] for p in parts],
        }
    # GEOMETRYCOLLECTION: members re-inferred from ring structure (the
    # same inference the WKB encoder uses for carried collections)
    members = []
    for part in parts:
        if len(part) == 1 and len(part[0]) == 1:
            members.append(_part_geojson(POINT, part))
        elif len(part) == 1 and not _ring_closed(part[0]):
            members.append(_part_geojson(LINESTRING, part))
        else:
            members.append(_part_geojson(POLYGON, part))
    return {"type": "GeometryCollection", "geometries": members}


def to_geojson(arr: GeometryArray) -> list[dict | None]:
    return [geometry_geojson(arr, i) for i in range(len(arr))]
