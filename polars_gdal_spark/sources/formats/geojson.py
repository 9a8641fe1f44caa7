"""GeoJSON driver (FeatureCollection / single Feature / bare geometry /
newline-delimited GeoJSON).

Schema is value-sniffed across ALL features (the reference's per-row
union semantics, ``src/lib.rs:409-450``): a property's type comes from
its first non-null value, ragged/missing properties are nullable, and
conflicting value types widen to string. Unlike the reference, list
values are supported (``ArrayType``) — the reference left them
``unimplemented!`` (``unprocessed_series.rs:172``).

A ``.geojsonl`` / ``.ndjson`` file of one feature per line is treated
as the same layer and IS splittable; a single JSON document is not.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from polars_gdal_spark.geometry.geojson import geojson_to_geom
from polars_gdal_spark.sources.formats.base import (
    Feature,
    Field,
    FormatDriver,
    register,
)

LAYER = "features"


def _iter_raw(path: str) -> Iterator[dict]:
    with open(path, "rb") as f:
        head = f.read(1)
        f.seek(0)
        first_line = f.readline()
        # NDJSON probe: first line parses as a complete JSON object and
        # there is a second non-empty line.
        rest = f.readline()
        is_ndjson = False
        if rest.strip():
            try:
                json.loads(first_line)
                is_ndjson = True
            except ValueError:
                is_ndjson = False
        f.seek(0)
        if is_ndjson:
            for line in f:
                line = line.strip()
                if line:
                    yield json.loads(line)
            return
        obj = json.load(f)
    if obj.get("type") == "FeatureCollection":
        yield from obj.get("features", [])
    elif obj.get("type") == "Feature":
        yield obj
    else:
        yield {"type": "Feature", "geometry": obj, "properties": {}}


def _sniff_dtype(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "bigint"
    if isinstance(v, float):
        return "double"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        inner = None
        for item in v:
            inner = _sniff_dtype(item)
            if inner:
                break
        if inner in ("bigint", "double", "string", None):
            return f"array<{inner or 'string'}>"
        return "array<string>"
    return "string"


_WIDEN = {
    ("bigint", "double"): "double",
    ("double", "bigint"): "double",
}


def merge_dtypes(a: str | None, b: str | None) -> str | None:
    if a is None:
        return b
    if b is None or a == b:
        return a
    return _WIDEN.get((a, b), "string")


class GeoJsonDriver(FormatDriver):
    name = "GeoJSON"
    extensions = (".json", ".geojson", ".geojsonl", ".ndjson")

    def can_open(self, path: str, head: bytes) -> bool:
        stripped = head.lstrip()
        if not stripped.startswith(b"{"):
            return False
        # A Topology document is TopoJSON (its own driver), not GeoJSON.
        return b'"type"' in head and b'"Topology"' not in head

    def list_layers(self, path: str, options: dict) -> list[str]:
        return [LAYER]

    def layer_crs(self, path: str, layer: str, options: dict) -> str | None:
        return "EPSG:4326"  # RFC 7946: GeoJSON is implicitly WGS84

    def layer_fields(self, path: str, layer: str, options: dict) -> list[Field]:
        # First-seen property order — the engine's documented improvement
        # over the reference's nondeterministic HashMap order
        # (SURVEY §4.3.1, reference src/lib.rs:474).
        order: list[str] = []
        types: dict[str, str | None] = {}
        for raw in _iter_raw(path):
            for k, v in (raw.get("properties") or {}).items():
                if k not in types:
                    order.append(k)
                    types[k] = None
                types[k] = merge_dtypes(types[k], _sniff_dtype(v))
        # All-null columns stay as nullable string (divergence from the
        # reference's silent drop, SURVEY §4.3.5), unless dropped by option.
        drop_all_null = str(options.get("dropallnullcolumns", "false")).lower() == "true"
        fields = []
        for k in order:
            if types[k] is None and drop_all_null:
                continue
            fields.append(Field(k, types[k] or "string"))
        return fields

    def iter_features(
        self, path: str, layer: str, options: dict
    ) -> Iterator[Feature]:
        for i, raw in enumerate(_iter_raw(path)):
            gj = raw.get("geometry")
            geom = geojson_to_geom(gj) if gj else None
            fid = raw.get("id")
            fid = fid if isinstance(fid, int) else i
            yield Feature(fid=fid, geom=geom, props=raw.get("properties") or {})

    # -- NDJSON parallelism ----------------------------------------------
    # One-feature-per-line files are splittable by feature ordinal: each
    # partition iterates lines (cheap) but JSON-parses only its slice
    # (the ~10× part). A FeatureCollection document is one JSON value and
    # stays unsplittable.

    def _is_ndjson(self, path: str) -> bool:
        with open(path, "rb") as f:
            first = f.readline()
            rest = f.readline()
        if not rest.strip():
            return False
        try:
            json.loads(first)
            return True
        except ValueError:
            return False

    def feature_count(self, path: str, layer: str, options: dict) -> int | None:
        if not self._is_ndjson(path):
            return None
        with open(path, "rb") as f:
            return sum(1 for line in f if line.strip())

    def split_ranges(
        self, path: str, layer: str, options: dict, target_splits: int
    ) -> list[tuple[int, int]] | None:
        n = self.feature_count(path, layer, options)
        if not n or n < 8192:  # below this, split overhead beats the win
            return None
        step = -(-n // max(1, target_splits))
        return [(s, min(s + step, n)) for s in range(0, n, step)]

    def iter_features_range(
        self, path: str, layer: str, options: dict, start: int, end: int
    ) -> Iterator[Feature]:
        idx = 0
        with open(path, "rb") as f:
            for line in f:
                if not line.strip():
                    continue
                if idx >= end:
                    return
                if idx >= start:
                    raw = json.loads(line)
                    gj = raw.get("geometry")
                    geom = geojson_to_geom(gj) if gj else None
                    fid = raw.get("id")
                    yield Feature(
                        fid=fid if isinstance(fid, int) else idx,
                        geom=geom,
                        props=raw.get("properties") or {},
                    )
                idx += 1


register(GeoJsonDriver())


# ----------------------------------------------------------------- writer


def write_feature_collection(
    path: str, features: list[dict], pretty: bool = False
) -> None:
    doc = {"type": "FeatureCollection", "features": features}
    with open(path, "w", encoding="utf-8") as f:
        json.dump(doc, f, indent=2 if pretty else None, default=float)
