"""GeoJSON geometry <-> internal representation.

The internal representation IS GeoJSON-shaped (type + nested coordinate
lists), so conversion is thin: tuples <-> lists plus validation.
GeoJSON text output matches GDAL's ``geometry.json()`` semantics
(reference ``src/lib.rs:400-405``).
"""

from __future__ import annotations

GEOJSON_TYPES = (
    "Point",
    "LineString",
    "Polygon",
    "MultiPoint",
    "MultiLineString",
    "MultiPolygon",
    "GeometryCollection",
)


class GeoJsonError(ValueError):
    pass


def _tup(x):
    if isinstance(x, (list, tuple)):
        return [_tup(v) for v in x] if isinstance(x[0] if x else 0, (list, tuple)) else tuple(x)
    return x


def geojson_to_geom(obj: dict) -> tuple:
    if not isinstance(obj, dict) or "type" not in obj:
        raise GeoJsonError("not a GeoJSON geometry object")
    t = obj["type"]
    if t not in GEOJSON_TYPES:
        raise GeoJsonError(f"unsupported GeoJSON type {t!r}")
    if t == "GeometryCollection":
        return t, [geojson_to_geom(g) for g in obj.get("geometries", [])]
    coords = obj.get("coordinates")
    if coords is None:
        raise GeoJsonError("geometry missing coordinates")
    return t, _conv(t, coords)


def _conv(t: str, coords):
    if t == "Point":
        return tuple(coords)
    if t in ("LineString", "MultiPoint"):
        return [tuple(p) for p in coords]
    if t in ("Polygon", "MultiLineString"):
        return [[tuple(p) for p in ring] for ring in coords]
    if t == "MultiPolygon":
        return [[[tuple(p) for p in ring] for ring in poly] for poly in coords]
    raise GeoJsonError(f"unsupported GeoJSON type {t!r}")


def geom_to_geojson(geom: tuple) -> dict:
    t, c = geom
    if t == "GeometryCollection":
        return {"type": t, "geometries": [geom_to_geojson(g) for g in c]}

    def listify(x):
        if isinstance(x, tuple) and x and isinstance(x[0], (int, float)):
            return list(x)
        return [listify(v) for v in x]

    return {"type": t, "coordinates": listify(c)}
