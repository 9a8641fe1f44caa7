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
import os
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

    _probe_cache: dict[tuple, int | None] = {}

    def _splittable_count(self, path: str, options: dict) -> int | None:
        """Record count if every record is exactly one physical line.

        Byte-level probe: count ``\\n`` (and lone ``\\r``, which also
        breaks ``readline``-based skipping) and compare against the
        parsed record count from pyarrow's streaming reader — if a quoted
        field contained a newline, physical lines exceed records and the
        file is rejected. Memoized per (path, size, mtime): planning runs
        once per query, and the probe result can't change under an
        unchanged file."""
        st = os.stat(path)
        key = (path, st.st_size, st.st_mtime_ns)
        if key in self._probe_cache:
            return self._probe_cache[key]
        self._probe_cache[key] = n = self._probe(path)
        return n

    def _probe(self, path: str) -> int | None:
        delim = "\t" if path.lower().endswith(".tsv") else ","
        nl = cr = crnl = 0
        last = b""
        with open(path, "rb") as f:
            while True:
                chunk = f.read(1 << 20)
                if not chunk:
                    break
                nl += chunk.count(b"\n")
                cr += chunk.count(b"\r")
                crnl += chunk.count(b"\r\n")
                if last.endswith(b"\r") and chunk.startswith(b"\n"):
                    crnl += 1
                last = chunk[-1:]
        if cr != crnl:
            return None  # lone \r: breaks readline()-based row skipping
        lines = nl + (0 if last in (b"\n", b"") else 1)
        try:
            from pyarrow import csv as pacsv

            n = 0
            with pacsv.open_csv(
                path,
                parse_options=pacsv.ParseOptions(delimiter=delim),
                convert_options=pacsv.ConvertOptions(include_columns=[]),
            ) as rdr:
                for batch in rdr:
                    n += batch.num_rows
        except Exception:  # noqa: BLE001 — ragged/odd file: not splittable
            return None
        return n if lines == n + 1 else None

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


    # -- columnar fast path ----------------------------------------------
    # Full scans (no filters / offset / limit) parse with pyarrow.csv —
    # multithreaded C++ instead of interpreted-Python csv.reader — and
    # synthesize Point WKB for the whole batch with one numpy pass.
    # Any condition the C++ parser can't reproduce byte-for-byte
    # (WKT geometry columns, boolean coercions, nulls in coordinate
    # columns, ragged rows) returns None → row-path fallback, so the
    # fast path can never change results, only speed.

    def iter_arrow_batches(
        self,
        path: str,
        layer: str,
        options: dict,
        columns: list[tuple[str, str, str]],
        fid_col: str | None,
        geom_col: str,
        geom_format: str,
        start: int | None = None,
        end: int | None = None,
    ):
        import pyarrow as pa
        from pyarrow import csv as pacsv

        delim = "\t" if path.lower().endswith(".tsv") else ","
        rdr, f = self._open(path, options)
        try:
            header = next(rdr, [])
        finally:
            f.close()
        x, y, g = self._geometry_config(header, options)
        if g or (geom_format != "wkb" and (x and y)):
            return None  # WKT parse / non-WKB encode: row path only
        type_map = {"string": pa.string(), "bigint": pa.int64(), "double": pa.float64()}
        if any(t not in type_map for _, _, t in columns):
            return None
        if len(set(header)) != len(header):
            return None  # duplicate headers: row-path dict semantics
        src_types = {src: type_map[t] for _, src, t in columns}
        for c in (x, y):
            if c:
                src_types[c] = pa.float64()

        def gen():
            convert = pacsv.ConvertOptions(
                column_types=src_types,
                include_columns=list(src_types),
                include_missing_columns=False,
            )
            read = pacsv.ReadOptions(
                column_names=header,
                skip_rows=1 + (start or 0),
                encoding="utf-8",
            )
            emitted = 0
            cap = None if start is None else end - start
            with pacsv.open_csv(
                path,
                read_options=read,
                parse_options=pacsv.ParseOptions(delimiter=delim),
                convert_options=convert,
            ) as reader:
                for batch in reader:
                    if cap is not None and emitted >= cap:
                        return
                    if cap is not None and emitted + batch.num_rows > cap:
                        batch = batch.slice(0, cap - emitted)
                    out = _assemble_batch(
                        batch, columns, fid_col, geom_col, x, y,
                        fid_base=(start or 0) + emitted,
                    )
                    emitted += batch.num_rows
                    yield out

        try:
            return _probe_gen(gen())
        except (pa.ArrowInvalid, pa.ArrowKeyError, ValueError):
            return None  # cast/parse divergence → row path


def _probe_gen(it):
    """Pull the first batch eagerly so parse/cast errors surface as a
    clean row-path fallback instead of mid-scan, then re-chain it."""
    import itertools

    first = next(it, None)
    if first is None:
        return iter(())
    return itertools.chain([first], it)


def _assemble_batch(batch, columns, fid_col, geom_col, x, y, fid_base):
    """Reorder a parsed pyarrow batch into the reader's output schema,
    synthesizing fid ordinals and 21-byte Point WKB columnar-ly."""
    import numpy as np
    import pyarrow as pa

    n = batch.num_rows
    arrays, names = [], []
    if fid_col:
        arrays.append(pa.array(np.arange(fid_base, fid_base + n, dtype=np.int64)))
        names.append(fid_col)
    for out_name, src, _t in columns:
        arrays.append(batch.column(batch.schema.get_field_index(src)))
        names.append(out_name)
    if x and y:
        xa = batch.column(batch.schema.get_field_index(x))
        ya = batch.column(batch.schema.get_field_index(y))
        if xa.null_count or ya.null_count:
            raise ValueError("null coordinates: row path handles these")
        xs = xa.to_numpy(zero_copy_only=False)
        ys = ya.to_numpy(zero_copy_only=False)
        buf = np.empty((n, 21), dtype=np.uint8)
        buf[:, 0] = 1  # little-endian byte order mark
        buf[:, 1] = 1  # wkbPoint
        buf[:, 2:5] = 0
        buf[:, 5:13] = xs.astype("<f8").view(np.uint8).reshape(n, 8)
        buf[:, 13:21] = ys.astype("<f8").view(np.uint8).reshape(n, 8)
        offsets = np.arange(0, 21 * (n + 1), 21, dtype=np.int32)
        geom = pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf.tobytes())],
        )
        arrays.append(geom)
        names.append(geom_col)
    else:
        arrays.append(pa.nulls(n, pa.binary()))
        names.append(geom_col)
    return pa.RecordBatch.from_arrays(arrays, names=names)


register(CsvDriver())


# ----------------------------------------------------------------- writer


def write_csv(path: str, header: list[str], rows: Iterator[list]) -> None:
    with open(path, "w", encoding="utf-8", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        for row in rows:
            w.writerow(row)
