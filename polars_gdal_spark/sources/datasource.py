"""The ``gdal`` PySpark DataSource: vector geospatial formats in/out.

Spark-first re-expression of the reference's read/write API surface
(SURVEY §2.A–§2.C): ``spark.read.format("gdal")`` replaces
``df_from_resource`` (reference ``src/lib.rs:294-312``),
``df.write.format("gdal")`` replaces ``gdal_resource_from_df``
(``src/lib.rs:629-642``).

Reader options (parity with ``ReadParams``, ``src/lib.rs:29-88``):

=====================  =====================================================
``layer``              layer name (``src/lib.rs:61-63``)
``layerIndex``         layer index, name wins (``src/lib.rs:65-67``)
``fidColumn``          emit source FID as leading bigint col (``69-70``)
``geometryColumn``     geometry column name, default ``geometry`` (``72-75``)
``geometryFormat``     ``wkb`` (default) | ``wkt`` | ``geojson`` (``77-78``)
``offset``             skip first N features (``86-88``)
``limit``              truncating limit — max rows *returned* (``80-81``;
                       intentional divergence from the reference's
                       raw-index check, SURVEY §4.3.3)
``maxRows``            erroring limit (``83-84``: FeatureLimitReached)
``drivers``            comma-separated driver allow-list (``41-44``)
``x/y/geom_possible_names``, ``autodetect_type``
                       CSV open options (GDAL parity, README.md:46-54)
``dropAllNullColumns`` reference drops all-null cols (``474-478``); we
                       keep them as null strings unless this is ``true``
=====================  =====================================================

Scale design: ``partitions()`` fans out per input file AND intra-file
via driver ``split_ranges`` (FID ranges from .shx, rowid ranges in
SQLite) — the reference is single-threaded (SURVEY §3); this source
parallelizes the same byte formats. Simple pushed filters are evaluated
inside the scan loop (the OGR ``SetAttributeFilter`` analogue), so rows
drop before crossing the Python→JVM Arrow boundary.
"""

from __future__ import annotations

import glob as _glob
import json
import os
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from polars_gdal_spark.errors import (
    CannotFindGeometryColumnError,
    FeatureLimitReachedError,
    GeometryColumnWrongTypeError,
    UnsupportedFormatError,
)

GEOMETRY_FORMATS = ("wkb", "wkt", "geojson")


def _parse_ddl_type(ddl: str):
    """DDL type string → DataType without a SparkSession (the planning
    worker has none)."""
    from pyspark.sql import types as T

    atomic = {
        "bigint": T.LongType(),
        "int": T.IntegerType(),
        "smallint": T.ShortType(),
        "double": T.DoubleType(),
        "float": T.FloatType(),
        "string": T.StringType(),
        "boolean": T.BooleanType(),
        "binary": T.BinaryType(),
        "date": T.DateType(),
        "timestamp": T.TimestampType(),
        "timestamp_ntz": T.TimestampNTZType(),
    }
    d = ddl.strip().lower()
    if d in atomic:
        return atomic[d]
    if d.startswith("array<") and d.endswith(">"):
        return T.ArrayType(_parse_ddl_type(d[6:-1]))
    raise ValueError(f"unsupported DDL type {ddl!r}")


def _opt(options: dict, name: str, default=None):
    # DataSource options arrive lower-cased (CaseInsensitiveDict semantics).
    return options.get(name.lower(), default)


def _localize(path: str) -> str:
    """Remote and compressed resources: download / decompress once per
    machine into a content-addressed cache.

    * HTTPS (the reference's HTTPS-via-GDAL path, ``src/test.rs:86-94``)
      downloads to a per-machine cache.
    * ``.gz`` (GDAL's transparent ``/vsigzip/`` behavior) stream-
      decompresses next to the cache with the inner extension restored,
      so driver dispatch sees ``file.geojson`` for ``file.geojson.gz``.
      Composable with HTTPS (download first, then gunzip).

    Called on both driver (schema/partitions) and executors (read), so
    each machine fetches/inflates independently — no shared-filesystem
    assumption. At cluster scale a .gz member is NOT range-splittable
    (DEFLATE has no sync points), matching Spark's own behavior on
    gzipped text: parallelism comes from many files, not splits.
    """
    import hashlib
    import tempfile

    if path.startswith(("http://", "https://")):
        import urllib.request

        key = hashlib.sha1(path.encode()).hexdigest()[:16]
        name = os.path.basename(path.split("?")[0]) or "remote.bin"
        dest = os.path.join(tempfile.gettempdir(), f"gdal_http_{key}_{name}")
        if not os.path.exists(dest):
            tmp = dest + f".tmp{os.getpid()}"
            urllib.request.urlretrieve(path, tmp)  # noqa: S310
            try:
                os.rename(tmp, dest)
            except OSError:
                os.remove(tmp)
        path = dest
    if path.endswith(".gz"):
        import gzip
        import shutil

        try:
            stat = os.stat(path)
            stamp = f"{path}:{stat.st_size}:{stat.st_mtime_ns}"
        except OSError:
            stamp = path
        key = hashlib.sha1(stamp.encode()).hexdigest()[:16]
        inner = os.path.basename(path)[:-3] or "member"
        dest = os.path.join(tempfile.gettempdir(), f"gdal_gz_{key}_{inner}")
        if not os.path.exists(dest):
            tmp = dest + f".tmp{os.getpid()}"
            with gzip.open(path, "rb") as src, open(tmp, "wb") as out:
                shutil.copyfileobj(src, out, 1 << 20)
            try:
                os.rename(tmp, dest)
            except OSError:
                os.remove(tmp)
        path = dest
    return path


def _resolve_paths(path: str) -> list[str]:
    # Newline-separated multi-path (URLs can't contain raw newlines): one
    # load() call carries N sources, each becoming its own scan partition.
    # This keeps partition planning inside the datasource for paged remote
    # reads (WFS) instead of an N-deep union of per-page DataFrames.
    if "\n" in path:
        out = [p for p in (s.strip() for s in path.split("\n")) if p]
        if not out:
            raise UnsupportedFormatError(f"no input files at {path!r}")
        return out
    if path.startswith(("http://", "https://")):
        return [path]
    if os.path.isdir(path):
        out = sorted(
            p
            for p in _glob.glob(os.path.join(path, "*"))
            if os.path.isfile(p) and not p.endswith((".shx", ".dbf", ".prj", ".cpg"))
        )
    elif any(ch in path for ch in "*?["):
        out = sorted(_glob.glob(path))
    else:
        out = [path]
    if not out:
        raise UnsupportedFormatError(f"no input files at {path!r}")
    return out


def _resolve_layer(driver, path: str, options: dict) -> str:
    layers = driver.list_layers(path, options)
    name = _opt(options, "layer")
    if name is not None:
        if name not in layers:
            raise ValueError(f"layer {name!r} not found; available: {layers}")
        return name
    idx = _opt(options, "layerIndex")
    if idx is not None:
        return layers[int(idx)]
    return layers[0]  # name → index → 0 (reference src/lib.rs:303-309)


#: GDAL open-flag names the engine understands (ReadParams.open_flags
#: parity, reference src/lib.rs:30-39). READONLY/VECTOR/VERBOSE_ERROR/
#: SHARED/ALL are accepted no-ops (this engine always opens vector data
#: read-only and raises typed errors); UPDATE and RASTER are rejected.
_OPEN_FLAG_NOOPS = {"READONLY", "VECTOR", "VERBOSE_ERROR", "SHARED", "ALL"}


def _check_open_flags(options: dict) -> None:
    raw = _opt(options, "open_flags") or _opt(options, "openFlags")
    if raw is None:
        return
    for tok in str(raw).split("|"):
        tok = tok.strip().upper().removeprefix("GDAL_OF_")
        if not tok:
            continue
        if tok == "UPDATE":
            from polars_gdal_spark.errors import UpdateNotSupportedError

            raise UpdateNotSupportedError(
                "open_flags=UPDATE: this engine opens sources read-only "
                "(reference rejects update on byte input the same way, "
                "src/lib.rs:213-217)"
            )
        if tok == "RASTER":
            raise UnsupportedFormatError(
                "open_flags=RASTER: only vector sources are supported"
            )
        if tok not in _OPEN_FLAG_NOOPS:
            raise ValueError(
                f"unknown open_flags token {tok!r}; known: "
                f"{sorted(_OPEN_FLAG_NOOPS | {'UPDATE', 'RASTER'})}"
            )


def infer_schema(options: dict) -> StructType:
    """Driver-side inference pass (SURVEY §1.4): column order is
    fid?, attributes (first-seen), geometry last (src/lib.rs:466-482)."""
    from polars_gdal_spark.sources.formats import find_driver

    _check_open_flags(options)
    path = _opt(options, "path")
    paths = _resolve_paths(path)
    allowed = _opt(options, "drivers")
    allowed = [d.strip() for d in allowed.split(",")] if allowed else None
    # Multi-file input: union schemas across a bounded sample of files
    # (first-seen column order, numeric widening, conflicts → string) —
    # the per-row schema-drift semantics of the reference
    # (src/lib.rs:409-450) lifted to per-file granularity.
    sample_cap = int(_opt(options, "schemaSampleFiles", 16))
    fields = []
    seen: dict[str, int] = {}
    layer = None
    for p in paths[:sample_cap]:
        p = _localize(p)
        driver = find_driver(p, allowed)
        layer = _resolve_layer(driver, p, options)
        for f in driver.layer_fields(p, layer, options):
            if f.name in seen:
                prev = fields[seen[f.name]]
                if prev.dtype != f.dtype:
                    widened = {
                        frozenset(("bigint", "double")): "double",
                    }.get(frozenset((prev.dtype, f.dtype)), "string")
                    prev.dtype = widened
            else:
                seen[f.name] = len(fields)
                fields.append(f)

    geom_col = _opt(options, "geometryColumn", "geometry")
    fid_col = _opt(options, "fidColumn")
    gfmt = _opt(options, "geometryFormat", "wkb").lower()
    if gfmt not in GEOMETRY_FORMATS:
        raise ValueError(f"geometryFormat must be one of {GEOMETRY_FORMATS}")

    ddl = []
    if fid_col:
        ddl.append((fid_col, "bigint", False))
    for f in fields:
        name = f.name
        # Conflict rename (reference src/lib.rs:453-463): attribute
        # colliding with geometry/fid column becomes {name}_original.
        if name == geom_col or (fid_col and name == fid_col):
            name = f"{name}_original"
        ddl.append((name, f.dtype, True))
    geom_type = "binary" if gfmt == "wkb" else "string"
    ddl.append((geom_col, geom_type, True))

    # Build the StructType programmatically (fromDDL would need a JVM,
    # absent in the planning worker). The geometry field carries CRS
    # metadata when the format stores one — strictly more than the
    # reference keeps (it drops CRS on read, SURVEY §1.2).
    crs = driver.layer_crs(_localize(paths[0]), layer, options)
    st = StructType()
    for name, dtype, _nullable in ddl:
        meta = None
        # Field metadata is OPT-IN (batch-only): Spark's streaming runner
        # asserts the prefetched Arrow batch schema equals the declared
        # schema and Arrow drops field metadata, so readStream on a
        # metadata-carrying schema dies with an internal assertion.
        # polars_gdal_spark.read_gdal() sets this automatically for batch.
        if name == geom_col and str(
            _opt(options, "crsMetadata", "false")
        ).lower() == "true":
            meta = {"encoding": gfmt}
            if crs:
                meta["crs"] = crs
        st.add(name, _parse_ddl_type(dtype), True, meta)
    return st


@dataclass
class GdalInputPartition(InputPartition):
    path: str
    layer: str
    start: int | None = None  # feature-range split (None = whole layer)
    end: int | None = None
    # Pushed filters travel IN the partition, not on the reader instance:
    # Spark reuses one reader instance across queries on the same
    # DataFrame, so instance state set by pushFilters() in one query
    # would leak into the next query's scan (observed: a filtered write
    # contaminating a later unfiltered count). partitions() snapshots
    # the current query's filters here and resets the instance.
    filters: tuple = ()
    # True only for the sentinel partition emitted when spatial pruning
    # eliminates every input file (the DataSource API requires ≥1
    # partition); read() yields nothing for it.
    empty: bool = False
    # Follow-on (path, layer) pairs read sequentially AFTER `path` by the
    # same task — used when offset/limit/maxRows demand one global row
    # counter over a multi-file input (per-file counters would apply the
    # offset/limit once per file).
    chain: tuple = ()


def _passes(filters: list[tuple], props: dict) -> bool:
    for kind, col, val in filters:
        v = props.get(col)
        if kind == "isnull":
            if v is not None:
                return False
            continue
        if kind == "isnotnull":
            if v is None:
                return False
            continue
        if v is None:
            return False
        try:
            if kind == "eq" and not v == val:
                return False
            if kind == "gt" and not v > val:
                return False
            if kind == "ge" and not v >= val:
                return False
            if kind == "lt" and not v < val:
                return False
            if kind == "le" and not v <= val:
                return False
        except TypeError:
            return False
    return True


class GdalDataSourceReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.options = dict(options)
        self.pushed: list[tuple] = []

        self.geom_col = _opt(options, "geometryColumn", "geometry")
        self.fid_col = _opt(options, "fidColumn")
        self.gfmt = _opt(options, "geometryFormat", "wkb").lower()
        self.offset = int(_opt(options, "offset", 0) or 0)
        self.limit = _opt(options, "limit")
        self.limit = int(self.limit) if self.limit is not None else None
        self.max_rows = _opt(options, "maxRows")
        self.max_rows = int(self.max_rows) if self.max_rows is not None else None
        # Spatial filter (OGR SetSpatialFilter analogue — the "spatial
        # filter" pre-processing the reference names at src/lib.rs:316-318):
        # keep features whose geometry envelope intersects the bbox.
        # Like OGR, features with no geometry are excluded while a
        # spatial filter is active.
        bbox = _opt(options, "bbox")
        self.bbox = (
            tuple(float(v) for v in bbox.split(",")) if bbox else None
        )
        if self.bbox is not None and len(self.bbox) != 4:
            raise ValueError("bbox must be 'minx,miny,maxx,maxy'")
        allowed = _opt(options, "drivers")
        self.allowed = (
            [d.strip() for d in allowed.split(",")] if allowed else None
        )
        self.attr_fields = [
            f.name
            for f in schema.fields
            if f.name != self.geom_col and f.name != self.fid_col
        ]
        self.dtypes = {f.name: f.dataType.simpleString() for f in schema.fields}

    # -- planning ---------------------------------------------------------
    def partitions(self) -> Sequence[InputPartition]:
        from polars_gdal_spark.sources.formats import find_driver

        paths = _resolve_paths(_opt(self.options, "path"))
        # offset/limit/maxRows are global row semantics → single partition
        # (the reference is single-threaded anyway, SURVEY §3).
        sequential = self.offset or self.limit is not None or self.max_rows is not None
        pushed = tuple(self.pushed)
        self.pushed = []  # consume: this query's filters only
        parts: list[InputPartition] = []
        survivors: list[tuple[str, str]] = []
        target = max(1, int(_opt(self.options, "targetPartitions", 32)) // max(1, len(paths)))
        for p in paths:
            local = _localize(p)
            driver = find_driver(local, self.allowed)
            layer = _resolve_layer(driver, local, self.options)
            if self.bbox is not None:
                # Spatial partition pruning: drop whole files whose
                # header/index envelope misses the filter box (the
                # spatial analogue of parquet min/max pruning; the
                # per-feature envelope test in read() stays exact).
                bb = driver.layer_bbox(local, layer, self.options)
                if bb is not None:
                    bx0, by0, bx1, by1 = self.bbox
                    if bb[2] < bx0 or bb[0] > bx1 or bb[3] < by0 or bb[1] > by1:
                        continue
            if sequential:
                survivors.append((p, layer))
                continue
            ranges = driver.split_ranges(local, layer, self.options, target)
            if ranges:
                for s, e in ranges:
                    parts.append(GdalInputPartition(p, layer, s, e, pushed))
            else:
                parts.append(GdalInputPartition(p, layer, filters=pushed))
        if sequential and survivors:
            # One task walks every file in path order so the offset /
            # limit / maxRows counters are global, matching the
            # reference's single-threaded whole-read semantics.
            first_path, first_layer = survivors[0]
            parts.append(
                GdalInputPartition(
                    first_path,
                    first_layer,
                    filters=pushed,
                    chain=tuple(survivors[1:]),
                )
            )
        if not parts:  # every file spatially pruned
            parts.append(GdalInputPartition(paths[0], "", empty=True))
        return parts

    # -- execution --------------------------------------------------------
    def _encode_geom(self, geom) -> object:
        if geom is None:
            return None  # empty geometry → null (reference src/lib.rs:386-388)
        if self.gfmt == "wkb":
            from polars_gdal_spark.geometry.wkb import geom_to_wkb

            return geom_to_wkb(geom)
        if self.gfmt == "wkt":
            from polars_gdal_spark.geometry.wkt import geom_to_wkt

            return geom_to_wkt(geom)
        from polars_gdal_spark.geometry.geojson import geom_to_geojson

        return json.dumps(geom_to_geojson(geom))

    def _coerce(self, v, dtype: str):
        if v is None:
            return None
        if dtype == "string" and not isinstance(v, str):
            return json.dumps(v) if isinstance(v, (list, dict)) else str(v)
        if dtype == "double":
            if isinstance(v, int):
                return float(v)
            if isinstance(v, str):  # typed CSV path (autodetect_type)
                try:
                    return float(v)
                except ValueError:
                    return None
        if dtype == "bigint":
            if isinstance(v, bool):
                return int(v)
            if isinstance(v, str):
                try:
                    return int(v)
                except ValueError:
                    return None
        if dtype == "boolean" and isinstance(v, str):
            return v.lower() in ("true", "t", "yes", "1")
        return v

    def read(self, partition: GdalInputPartition) -> Iterator:
        """Yield pyarrow RecordBatches (the fast path: one Arrow block
        per ~4096 rows crosses the Python↔JVM boundary instead of one
        pickled tuple per row — SURVEY §1.5's "better: Arrow batches");
        falls back to row tuples for any schema Arrow can't mirror."""
        pa_schema = self._arrow_schema()
        fast = self._columnar_batches(partition, pa_schema)
        if fast is not None:
            import pyarrow as pa

            for b in fast:
                # Rebuild against the declared schema so nullability and
                # field metadata match what Spark asserts on.
                yield pa.RecordBatch.from_arrays(list(b.columns), schema=pa_schema)
            return
        rows = self._read_rows(partition)
        if pa_schema is None:
            yield from rows
            return
        import pyarrow as pa

        cols = [f.name for f in self.schema.fields]
        chunk: list[tuple] = []

        def flush():
            arrays = [
                pa.array([r[i] for r in chunk], type=pa_schema.field(i).type)
                for i in range(len(cols))
            ]
            return pa.RecordBatch.from_arrays(arrays, schema=pa_schema)

        for row in rows:
            chunk.append(row)
            if len(chunk) >= 4096:
                yield flush()
                chunk = []
        if chunk:
            yield flush()

    def _columnar_batches(self, partition: GdalInputPartition, pa_schema):
        """Driver columnar fast path (iter_arrow_batches), applicable only
        to the plain full-scan shape — no pushed filters, bbox, offset,
        limit, or maxRows — where batch semantics provably equal the row
        path. Returns an iterator of RecordBatches, or None."""
        if (
            pa_schema is None
            or partition.empty
            or partition.filters
            or self.bbox is not None
            or self.offset
            or self.limit is not None
            or self.max_rows is not None
        ):
            return None
        from polars_gdal_spark.sources.formats import find_driver

        local = _localize(partition.path)
        driver = find_driver(local, self.allowed)
        attr_src = {
            name: (name[: -len("_original")] if name.endswith("_original") else name)
            for name in self.attr_fields
        }
        columns = [
            (name, attr_src[name], self.dtypes[name]) for name in self.attr_fields
        ]
        return driver.iter_arrow_batches(
            local,
            partition.layer,
            self.options,
            columns,
            self.fid_col,
            self.geom_col,
            self.gfmt,
            partition.start,
            partition.end,
        )

    def _arrow_schema(self):
        """pyarrow mirror of the Spark schema, or None if a field's type
        has no safe mapping (→ tuple fallback)."""
        try:
            import pyarrow as pa
        except ImportError:  # pragma: no cover
            return None
        atomic = {
            "string": pa.string(),
            "bigint": pa.int64(),
            "int": pa.int32(),
            "smallint": pa.int16(),
            "double": pa.float64(),
            "float": pa.float32(),
            "boolean": pa.bool_(),
            "binary": pa.binary(),
        }

        def conv(ddl: str):
            if ddl in atomic:
                return atomic[ddl]
            if ddl.startswith("array<") and ddl.endswith(">"):
                inner = conv(ddl[6:-1])
                return pa.list_(inner) if inner is not None else None
            return None

        fields = []
        for f in self.schema.fields:
            t = conv(f.dataType.simpleString())
            if t is None:
                return None
            fields.append(pa.field(f.name, t))
        return pa.schema(fields)

    def _read_rows(self, partition: GdalInputPartition) -> Iterator[tuple]:
        from polars_gdal_spark.sources.formats import find_driver

        if partition.empty:
            return iter(())
        local = _localize(partition.path)
        driver = find_driver(local, self.allowed)
        if partition.start is not None:
            feats = driver.iter_features_range(
                local,
                partition.layer,
                self.options,
                partition.start,
                partition.end,
            )
        else:
            feats = driver.iter_features(
                local, partition.layer, self.options
            )
            if partition.chain:
                feats = self._chain_files(feats, partition.chain)

        return self._emit_rows(feats, partition)

    def _chain_files(self, feats, chain):
        """Lazily continue the feature stream through follow-on files
        (global offset/limit semantics: one counter over all files)."""
        from polars_gdal_spark.sources.formats import find_driver

        yield from feats
        for p, layer in chain:
            local = _localize(p)
            driver = find_driver(local, self.allowed)
            yield from driver.iter_features(local, layer, self.options)

    def _emit_rows(self, feats, partition: GdalInputPartition) -> Iterator[tuple]:
        geom_col, fid_col = self.geom_col, self.fid_col
        attr_src = {
            name: (name[: -len("_original")] if name.endswith("_original") else name)
            for name in self.attr_fields
        }
        emitted = 0
        for idx, feat in enumerate(feats):
            if idx < self.offset:
                continue  # B1 offset skip (src/lib.rs:361-365)
            if self.max_rows is not None and emitted >= self.max_rows:
                raise FeatureLimitReachedError(self.max_rows)  # B3
            if self.limit is not None and emitted >= self.limit:
                return  # B2 truncating limit: stop pulling (src/lib.rs:366-370)
            if partition.filters and not _passes(partition.filters, feat.props):
                continue
            if self.bbox is not None:
                if feat.geom is None:
                    continue
                from polars_gdal_spark.geometry import geom_bounds

                mnx, mny, mxx, mxy = geom_bounds(feat.geom)
                bx0, by0, bx1, by1 = self.bbox
                if mxx < bx0 or mnx > bx1 or mxy < by0 or mny > by1:
                    continue
            row = []
            if fid_col:
                row.append(feat.fid)
            for name in self.attr_fields:
                row.append(
                    self._coerce(
                        feat.props.get(attr_src[name]), self.dtypes[name]
                    )
                )
            if feat.wkb is not None and self.gfmt == "wkb":
                row.append(feat.wkb)  # driver fast path: pre-encoded WKB
            else:
                row.append(self._encode_geom(feat.geom))
            emitted += 1
            yield tuple(row)


class GdalPushdownReader(GdalDataSourceReader):
    """Reader variant used only under ``option("pushdown", "true")``.

    Kept as a SEPARATE class because Spark 4 asserts at plan time when a
    Python reader merely *defines* ``pushFilters`` while
    ``spark.sql.python.filterPushdown.enabled`` is false — the default
    reader must not carry the method, or plain ``load()`` on a vanilla
    session dies before reading a byte.
    """

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """OGR SetAttributeFilter analogue (SURVEY §4.2): simple
        comparisons on attribute columns are evaluated inside the scan
        loop; everything else stays with Spark.

        OPT-IN because Spark caches the first-planned Python scan per
        DataFrame and reuses it for later queries with different filters,
        so a pushed filter from query 1 would silently constrain query 2
        (verified against Spark 4.1). Safe for single-use loads
        (read→transform→write); off by default.
        """
        kinds = {
            EqualTo: "eq",
            GreaterThan: "gt",
            GreaterThanOrEqual: "ge",
            LessThan: "lt",
            LessThanOrEqual: "le",
            IsNull: "isnull",
            IsNotNull: "isnotnull",
        }
        self.pushed = []  # overwrite: never accumulate across plannings
        for f in filters:
            kind = kinds.get(type(f))
            col = f.attribute[0] if len(f.attribute) == 1 else None
            if kind and col and col in self.attr_fields:
                val = getattr(f, "value", None)
                self.pushed.append((kind, col, val))
            else:
                yield f


# ----------------------------------------------------------------- writer


@dataclass
class GdalCommitMessage(WriterCommitMessage):
    part_path: str
    count: int


class GdalDataSourceWriter(DataSourceArrowWriter):
    """Two-phase write: partitions stream their Arrow record batches to
    IPC part files verbatim (geometry stays WKB/WKT — ZERO per-row
    Python on the executors), ``commit`` assembles the final resource
    through the chosen format encoder, decoding each feature exactly
    once (single-writer formats like GeoJSON need one assembler —
    reference discussion SURVEY §7.4.3). ``partitioned=true`` skips
    assembly and leaves one NDJSON feature file per partition — the
    100 TB escape hatch (NDJSON is that mode's *output* format, so its
    parts are still built row-wise)."""

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self.schema = schema
        self.options = dict(options)
        self.path = _opt(options, "path")
        self.overwrite = overwrite
        self.append = False
        if not overwrite and self.path and os.path.exists(self.path):
            drv = str(_opt(options, "driver", self._sniff_driver())).lower()
            if drv == "gpkg":
                # GeoPackage is a CONTAINER: mode("append") adds a NEW
                # LAYER to the existing dataset — the reference's
                # layer-level write model (gdal_layer_from_df writes one
                # layer into a dataset, src/lib.rs:499-573).
                self.append = True
            else:
                # Single-file vector formats: the two-phase assemble()
                # would silently REPLACE the resource (reference writers
                # always create, src/lib.rs:629-642) — refuse loudly.
                from polars_gdal_spark.errors import UpdateNotSupportedError

                raise UpdateNotSupportedError(
                    f"cannot append to existing resource {self.path!r}: "
                    "only GPKG supports mode('append') (a new layer); "
                    "other drivers need mode('overwrite') or a fresh path"
                )
        self.geom_col = _opt(options, "geometryColumn", "geometry")
        self.gfmt = _opt(options, "geometryFormat")
        # `.gz` destination (write side of the reader's /vsigzip/
        # parity): assemble the inner format, then gzip the single
        # artifact. Only single-file outputs can wrap — sidecar formats
        # (Shapefile, MapInfo) and append/partitioned modes cannot.
        self.gzip_out = bool(self.path) and self.path.lower().endswith(".gz")
        self.driver_name = _opt(options, "driver", self._sniff_driver())
        self.partitioned = str(_opt(options, "partitioned", "false")).lower() == "true"
        if self.gzip_out:
            if self.partitioned:
                raise ValueError(
                    "partitioned=true cannot combine with a .gz "
                    "destination (parts stay separate files)"
                )
            if self.append:
                raise ValueError("cannot append to a .gz destination")
            if self.driver_name.lower() in ("esri shapefile", "mapinfo file"):
                raise ValueError(
                    f"driver {self.driver_name!r} writes sidecar files "
                    "and cannot be wrapped in a single .gz member"
                )

        names = [f.name for f in schema.fields]
        if self.geom_col not in names:
            raise CannotFindGeometryColumnError(self.geom_col)
        # CRS: explicit option wins; else the geometry column's metadata
        # (carried by the reader) round-trips automatically.
        meta = schema[self.geom_col].metadata or {}
        if not _opt(options, "srs") and meta.get("crs"):
            self.options["srs"] = meta["crs"]
        gtype = schema[self.geom_col].dataType.simpleString()
        if self.gfmt is None:
            self.gfmt = "wkb" if gtype == "binary" else "wkt"
        expected = "binary" if self.gfmt == "wkb" else "string"
        if gtype != expected:
            raise GeometryColumnWrongTypeError(self.geom_col, expected, gtype)
        self.attr_cols = [n for n in names if n != self.geom_col]
        self.tmp_dir = self.path + ".parts.tmp"

    def _sniff_driver(self) -> str:
        p = (self.path or "").lower()
        if p.endswith(".gz"):
            p = p[:-3]
        if p.endswith((".geojson", ".json")):
            return "GeoJSON"
        if p.endswith(".csv"):
            return "CSV"
        if p.endswith(".gpkg"):
            return "GPKG"
        if p.endswith((".ndjson", ".geojsonl")):
            return "GeoJSONSeq"
        if p.endswith((".mif", ".tab")):
            return "MapInfo File"
        if p.endswith((".arrow", ".feather", ".ipc")):
            return "Arrow"
        if p.endswith(".dxf"):
            return "DXF"
        if p.endswith(".sql"):
            return "PGDump"
        return "GeoJSON"

    def _decode_geom(self, v) -> dict | None:
        if v is None:
            return None
        from polars_gdal_spark import geometry as G

        if self.gfmt == "wkb":
            return G.geom_to_geojson(G.wkb_to_geom(bytes(v)))
        if self.gfmt == "wkt":
            return G.geom_to_geojson(G.wkt_to_geom(v))
        return json.loads(v)

    def write(self, iterator) -> GdalCommitMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # Attempt-unique part names (FileCommitProtocol's reason to
        # exist): a retried or speculative attempt writes its OWN file,
        # so a still-running zombie attempt can never interleave bytes
        # into the file whose path the committed attempt reported.
        # commit() assembles exactly the committed attempts' paths;
        # failed-attempt leftovers die with the tmp dir in _cleanup().
        attempt = ctx.taskAttemptId()
        os.makedirs(self.tmp_dir, exist_ok=True)
        n = 0
        if self.partitioned:
            # NDJSON is this mode's OUTPUT format — build it row-wise.
            part = os.path.join(
                self.tmp_dir, f"part-{pid:05d}-{attempt}.ndjson"
            )
            with open(part, "w", encoding="utf-8") as f:
                for batch in iterator:
                    for d in batch.to_pylist():
                        geom = self._decode_geom(d.pop(self.geom_col, None))
                        feat = {
                            "type": "Feature",
                            "geometry": geom,
                            "properties": {
                                k: _json_safe(v) for k, v in d.items()
                            },
                        }
                        f.write(json.dumps(feat, default=str))
                        f.write("\n")
                        n += 1
            return GdalCommitMessage(part_path=part, count=n)
        # Assembled path: pass batches through untouched — columnar I/O,
        # no per-row Python; commit() decodes once while encoding.
        import pyarrow as pa

        part = os.path.join(self.tmp_dir, f"part-{pid:05d}-{attempt}.arrow")
        writer = sink = None
        for batch in iterator:
            if writer is None:
                sink = pa.OSFile(part, "wb")
                writer = pa.ipc.new_stream(sink, batch.schema)
            writer.write_batch(batch)
            n += batch.num_rows
        if writer is not None:
            writer.close()
            sink.close()
        return GdalCommitMessage(part_path=part if n else None, count=n)

    def commit(self, messages) -> None:
        from polars_gdal_spark.errors import EmptyDataframeError
        from polars_gdal_spark.sinks import assemble

        parts = [
            m.part_path
            for m in messages
            if m is not None and m.part_path is not None
        ]
        total = sum(m.count for m in messages if m is not None)
        if total == 0:
            self._cleanup()
            # reference rejects writing an empty frame (src/lib.rs:509-511)
            raise EmptyDataframeError("refusing to write an empty DataFrame")
        dest = self.path
        if self.gzip_out:
            # assemble under the INNER name (so format encoders that
            # key on the extension behave), then gzip to the final path
            dest = self.path[:-3] + f".tmp{os.getpid()}" + os.path.splitext(
                self.path[:-3]
            )[1]
            self._gz_artifacts = (dest, self.path + f".tmp{os.getpid()}")
        assemble(
            self.driver_name,
            parts,
            dest,
            self.options,
            self.schema,
            self.geom_col,
            partitioned=self.partitioned,
            gfmt=self.gfmt,
            append=self.append,
        )
        if self.gzip_out:
            import gzip as _gzip
            import shutil as _shutil

            # Compress to a temp name and rename onto the final path so a
            # mid-compress failure never leaves a corrupt partial .gz at
            # the destination; abort()/_cleanup() know both temp names.
            gz_tmp = self.path + f".tmp{os.getpid()}"
            try:
                with open(dest, "rb") as src, _gzip.open(
                    gz_tmp, "wb"
                ) as out:
                    _shutil.copyfileobj(src, out, 1 << 20)
                os.replace(gz_tmp, self.path)
            except BaseException:
                if os.path.exists(gz_tmp):
                    os.remove(gz_tmp)
                raise
            finally:
                if os.path.exists(dest):
                    os.remove(dest)
        # Committed parts were consumed (moved/encoded) by assemble —
        # the tmp dir now holds only failed-attempt leftovers; drop it
        # in every mode so zombie-attempt files never linger.
        self._cleanup()

    def abort(self, messages) -> None:
        self._cleanup()

    def _cleanup(self, keep_parts: bool = False) -> None:
        import shutil

        for p in getattr(self, "_gz_artifacts", ()):
            if os.path.exists(p):
                try:
                    os.remove(p)
                except OSError:
                    pass
        if not keep_parts and os.path.isdir(self.tmp_dir):
            shutil.rmtree(self.tmp_dir, ignore_errors=True)


def _json_safe(v):
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return v


class GdalDataSource(DataSource):
    """`format("gdal")` — see module docstring for options."""

    @classmethod
    def name(cls) -> str:
        return "gdal"

    def schema(self):
        return infer_schema(self.options)

    def reader(self, schema: StructType) -> GdalDataSourceReader:
        if str(_opt(self.options, "pushdown", "false")).lower() == "true":
            return GdalPushdownReader(schema, self.options)
        return GdalDataSourceReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> GdalDataSourceWriter:
        return GdalDataSourceWriter(schema, self.options, overwrite)

    def streamReader(self, schema: StructType):
        """File-arrival micro-batch streaming over a directory of vector
        files (engine extension; the reference is batch-only, SURVEY §2.K).
        Full stream-reader API: the driver only lists filenames; each
        file's feature decode is an executor-side input partition."""
        from polars_gdal_spark.streaming import GdalStreamReader

        return GdalStreamReader(schema, self.options)
