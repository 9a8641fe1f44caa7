"""GeoParquet read/write helpers.

GeoParquet = parquet with a WKB geometry column + a ``geo`` key in the
file metadata (the same convention the reference's ``cities.arrow``
fixture carries in Arrow IPC form — FIXTURES.md, ``src/test.rs:123``).
Spark's native parquet reader handles the data path (full pushdown /
pruning / splitting for free); these helpers handle the ``geo``
metadata contract on top.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def read_geoparquet(spark: SparkSession, path: str) -> DataFrame:
    """Read GeoParquet: native parquet scan + CRS/encoding attached as
    geometry-column metadata from the file-level ``geo`` key."""
    df = spark.read.parquet(path)
    meta = _geo_file_metadata(path)
    if meta:
        primary = meta.get("primary_column", "geometry")
        col_meta = meta.get("columns", {}).get(primary, {})
        crs = col_meta.get("crs")
        if isinstance(crs, dict):  # PROJJSON → compact id string if present
            ident = crs.get("id", {})
            crs = (
                f"{ident.get('authority', 'EPSG')}:{ident.get('code')}"
                if ident.get("code")
                else json.dumps(crs)
            )
        field_meta = {"encoding": col_meta.get("encoding", "WKB").lower()}
        if crs:
            field_meta["crs"] = crs
        if primary in df.columns:
            df = df.withMetadata(primary, field_meta)
    return df


def _geo_file_metadata(path: str) -> dict | None:
    import glob
    import os

    import pyarrow.parquet as pq

    target = path
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            return None
        target = parts[0]
    kv = pq.ParquetFile(target).schema_arrow.metadata or {}
    raw = kv.get(b"geo")
    if not raw:
        return None
    try:
        return json.loads(raw)
    except ValueError:
        return None


def write_geoparquet(
    df: DataFrame,
    path: str,
    geometry_column: str = "geometry",
    crs: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write GeoParquet: Spark's parallel parquet write, then the ``geo``
    metadata key stamped into every part file's footer (footer rewrite is
    a driver-side metadata-only pass — payload row groups are not
    rewritten, so this stays cheap even when parts are large)."""
    import glob
    import os

    import pyarrow.parquet as pq

    if geometry_column not in df.columns:
        from polars_gdal_spark.errors import CannotFindGeometryColumnError

        raise CannotFindGeometryColumnError(geometry_column)
    if crs is None:
        crs = (df.schema[geometry_column].metadata or {}).get("crs")
    geo = {
        "version": "1.0.0",
        "primary_column": geometry_column,
        "columns": {
            geometry_column: {
                "encoding": "WKB",
                "geometry_types": [],
                **({"crs": crs} if crs else {}),
            }
        },
    }
    df.write.mode(mode).parquet(path)
    payload = json.dumps(geo).encode()
    for part in glob.glob(os.path.join(path, "*.parquet")):
        tbl = pq.read_table(part)
        meta = dict(tbl.schema.metadata or {})
        meta[b"geo"] = payload
        pq.write_table(tbl.replace_schema_metadata(meta), part)
        # drop Hadoop's checksum sidecar — the rewrite invalidated it
        crc = os.path.join(
            os.path.dirname(part), f".{os.path.basename(part)}.crc"
        )
        if os.path.exists(crc):
            os.remove(crc)
