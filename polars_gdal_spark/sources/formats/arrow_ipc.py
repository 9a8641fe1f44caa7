"""Arrow IPC driver (.arrow / .feather / .ipc).

The reference's own write-path fixture is Arrow IPC with a WKB binary
``geometry`` column + GeoParquet-style ``geo`` metadata
(``test_data/cities.arrow``, ``src/test.rs:123-158``). This driver reads
that shape: attribute columns map by Arrow type, the geometry column
(named ``geometry`` or flagged in ``geo`` metadata) is decoded from WKB.

Splittable by record-batch row ranges.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from polars_gdal_spark.sources.formats.base import (
    Feature,
    Field,
    FormatDriver,
    register,
)

_ARROW_DDL = {
    "int8": "bigint", "int16": "bigint", "int32": "bigint", "int64": "bigint",
    "uint8": "bigint", "uint16": "bigint", "uint32": "bigint", "uint64": "bigint",
    "float": "double", "double": "double", "halffloat": "double",
    "string": "string", "large_string": "string", "utf8": "string",
    "bool": "boolean",
    "binary": "binary", "large_binary": "binary",
    "date32[day]": "date", "date64[ms]": "date",
}


def _geometry_column(schema) -> str | None:
    meta = schema.metadata or {}
    geo = meta.get(b"geo")
    if geo:
        try:
            return json.loads(geo).get("primary_column", "geometry")
        except ValueError:
            pass
    return "geometry" if "geometry" in schema.names else None


class ArrowIpcDriver(FormatDriver):
    name = "Arrow"
    extensions = (".arrow", ".feather", ".ipc")

    def can_open(self, path: str, head: bytes) -> bool:
        return head.startswith(b"ARROW1") or head[:4] == b"\xff\xff\xff\xff"

    def _table(self, path: str):
        import pyarrow as pa
        import pyarrow.ipc

        try:
            with pa.ipc.open_file(path) as r:
                return r.read_all()
        except pa.ArrowInvalid:
            with open(path, "rb") as f:
                with pa.ipc.open_stream(f) as r:
                    return r.read_all()

    def list_layers(self, path: str, options: dict) -> list[str]:
        import os

        return [os.path.splitext(os.path.basename(path))[0]]

    def layer_fields(self, path: str, layer: str, options: dict) -> list[Field]:
        tbl = self._table(path)
        gcol = _geometry_column(tbl.schema)
        out = []
        for f in tbl.schema:
            if f.name == gcol:
                continue
            ddl = _ARROW_DDL.get(str(f.type))
            if ddl is None:
                t = str(f.type)
                if t.startswith("list<") or t.startswith("large_list<"):
                    inner = t.split("<", 1)[1].rsplit(">", 1)[0]
                    inner = inner.split(":", 1)[-1].strip()
                    ddl = f"array<{_ARROW_DDL.get(inner, 'string')}>"
                elif t.startswith("timestamp"):
                    ddl = "timestamp_ntz"
                else:
                    ddl = "string"
            out.append(Field(f.name, ddl))
        return out

    def feature_count(self, path: str, layer: str, options: dict) -> int | None:
        return self._table(path).num_rows

    def split_ranges(
        self, path: str, layer: str, options: dict, target_splits: int
    ) -> list[tuple[int, int]] | None:
        n = self._table(path).num_rows
        if n == 0:
            return None
        step = max(1, -(-n // max(1, target_splits)))
        return [(s, min(s + step, n)) for s in range(0, n, step)]

    def iter_features_range(
        self, path: str, layer: str, options: dict, start: int, end: int
    ) -> Iterator[Feature]:
        from polars_gdal_spark.geometry.wkb import wkb_to_geom

        tbl = self._table(path).slice(start, end - start)
        gcol = _geometry_column(tbl.schema)
        cols = [n for n in tbl.schema.names if n != gcol]
        data = tbl.to_pydict()
        geoms = data.get(gcol, [None] * tbl.num_rows) if gcol else [None] * tbl.num_rows
        for i in range(tbl.num_rows):
            g = geoms[i]
            geom = wkb_to_geom(bytes(g)) if g is not None else None
            yield Feature(
                fid=start + i,
                geom=geom,
                props={c: data[c][i] for c in cols},
            )

    def iter_features(
        self, path: str, layer: str, options: dict
    ) -> Iterator[Feature]:
        yield from self.iter_features_range(
            path, layer, options, 0, self._table(path).num_rows
        )


register(ArrowIpcDriver())
