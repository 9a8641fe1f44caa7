"""CSV driver with coordinate-column geometry synthesis.

Mirrors GDAL's CSV driver behavior the reference exercises
(``README.md:46-54``, ``src/test.rs:26-35``): open options
``X_POSSIBLE_NAMES`` / ``Y_POSSIBLE_NAMES`` (glob-ish patterns like
``Lon*``) pick coordinate columns and synthesize Point geometry;
``WKT`` geometry columns are honored via ``GEOM_POSSIBLE_NAMES``.
Without options, all columns read as strings (exactly GDAL's default),
unless ``AUTODETECT_TYPE=YES`` (another real GDAL open option).

Splittable: feature ranges map to line ranges (header skipped).
"""

from __future__ import annotations

import csv
import fnmatch
import io
from collections.abc import Iterator

from polars_gdal_spark.geometry.wkt import wkt_to_geom
from polars_gdal_spark.sources.formats.base import (
    Feature,
    Field,
    FormatDriver,
    register,
)

LAYER = "layer"


def _match_names(header: list[str], patterns: str | None) -> str | None:
    if not patterns:
        return None
    for pat in patterns.split(","):
        for col in header:
            if fnmatch.fnmatch(col.lower(), pat.strip().lower()):
                return col
    return None


def _sniff(v: str) -> str:
    try:
        int(v)
        return "bigint"
    except ValueError:
        pass
    try:
        float(v)
        return "double"
    except ValueError:
        return "string"


class CsvDriver(FormatDriver):
    name = "CSV"
    extensions = (".csv", ".tsv")

    def can_open(self, path: str, head: bytes) -> bool:
        if not head:
            return False
        try:
            text = head.decode("utf-8", errors="strict")
        except UnicodeDecodeError:
            return False
        first = text.splitlines()[0] if text.splitlines() else ""
        return ("," in first or "\t" in first) and not first.lstrip().startswith(
            ("{", "[", "<")
        )

    def _open(self, path: str, options: dict):
        delim = "\t" if path.lower().endswith(".tsv") else ","
        f = open(path, "r", encoding="utf-8-sig", newline="")
        return csv.reader(f, delimiter=delim), f

    def _geometry_config(self, header: list[str], options: dict):
        """Resolve (x_col, y_col, wkt_col) from GDAL-style open options."""
        x = _match_names(header, options.get("x_possible_names"))
        y = _match_names(header, options.get("y_possible_names"))
        g = _match_names(header, options.get("geom_possible_names"))
        return x, y, g

    def list_layers(self, path: str, options: dict) -> list[str]:
        return [LAYER]

    def layer_fields(self, path: str, layer: str, options: dict) -> list[Field]:
        rdr, f = self._open(path, options)
        try:
            header = next(rdr, [])
            x, y, g = self._geometry_config(header, options)
            autodetect = (
                str(options.get("autodetect_type", "no")).lower() in ("yes", "true")
            )
            types: dict[str, str | None] = {c: None for c in header}
            if autodetect:
                for row in rdr:
                    for c, v in zip(header, row):
                        if v == "":
                            continue
                        t = _sniff(v)
                        prev = types[c]
                        if prev is None or prev == t:
                            types[c] = t
                        elif {prev, t} == {"bigint", "double"}:
                            types[c] = "double"
                        else:
                            types[c] = "string"
            fields = []
            for c in header:
                if c in (x, y, g):
                    continue  # consumed by geometry synthesis (GDAL parity)
                fields.append(Field(c, types[c] or "string"))
            return fields
        finally:
            f.close()

    def iter_features(
        self, path: str, layer: str, options: dict
    ) -> Iterator[Feature]:
        rdr, f = self._open(path, options)
        try:
            header = next(rdr, [])
            x, y, g = self._geometry_config(header, options)
            idx = {c: i for i, c in enumerate(header)}
            keep = [c for c in header if c not in (x, y, g)]
            for i, row in enumerate(rdr):
                geom = None
                if x and y:
                    try:
                        geom = (
                            "Point",
                            (float(row[idx[x]]), float(row[idx[y]])),
                        )
                    except (ValueError, IndexError):
                        geom = None
                elif g:
                    try:
                        geom = wkt_to_geom(row[idx[g]])
                    except Exception:  # noqa: BLE001
                        geom = None
                props = {
                    c: (row[idx[c]] if idx[c] < len(row) else None) for c in keep
                }
                # empty string stays "" (GDAL CSV parity); missing cell → None
                yield Feature(fid=i, geom=geom, props=props)
        finally:
            f.close()

    # -- row-range parallelism -------------------------------------------
    # CSV is record-per-line (quoted embedded newlines excepted — probe
    # below rejects those files): partitions parse only their row slice,
    # like the NDJSON split in the geojson driver.

    def _splittable_count(self, path: str, options: dict) -> int | None:
        rdr, f = self._open(path, options)
        try:
            next(rdr, [])  # header
            n = 0
            for row in rdr:
                if any("\n" in v for v in row):
                    return None  # embedded newline → byte slicing unsafe
                n += 1
            return n
        finally:
            f.close()

    def split_ranges(
        self, path: str, layer: str, options: dict, target_splits: int
    ) -> list[tuple[int, int]] | None:
        n = self._splittable_count(path, options)
        if not n or n < 8192:
            return None
        step = -(-n // max(1, target_splits))
        return [(s, min(s + step, n)) for s in range(0, n, step)]

    def iter_features_range(
        self, path: str, layer: str, options: dict, start: int, end: int
    ) -> Iterator[Feature]:
        # split_ranges verified no embedded newlines, so rows before
        # `start` can be skipped as raw lines — only this partition's
        # slice pays csv parsing + geometry synthesis.
        delim = "\t" if path.lower().endswith(".tsv") else ","
        with open(path, "r", encoding="utf-8-sig", newline="") as f:
            header = next(csv.reader([f.readline()], delimiter=delim), [])
            x, y, g = self._geometry_config(header, options)
            idx = {c: i for i, c in enumerate(header)}
            keep = [c for c in header if c not in (x, y, g)]
            for _ in range(start):
                if not f.readline():
                    return
            for i, row in enumerate(csv.reader(f, delimiter=delim)):
                fid = start + i
                if fid >= end:
                    return
                geom = None
                if x and y:
                    try:
                        geom = (
                            "Point",
                            (float(row[idx[x]]), float(row[idx[y]])),
                        )
                    except (ValueError, IndexError):
                        geom = None
                elif g:
                    try:
                        geom = wkt_to_geom(row[idx[g]])
                    except Exception:  # noqa: BLE001
                        geom = None
                props = {
                    c: (row[idx[c]] if idx[c] < len(row) else None)
                    for c in keep
                }
                yield Feature(fid=fid, geom=geom, props=props)


register(CsvDriver())


# ----------------------------------------------------------------- writer


def write_csv(path: str, header: list[str], rows: Iterator[list]) -> None:
    with open(path, "w", encoding="utf-8", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        for row in rows:
            w.writerow(row)
