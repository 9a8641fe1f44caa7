"""polars_gdal_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ``phayes/polars_gdal`` crate.

The reference (see SURVEY.md) is a GDAL/OGR vector-format I/O layer over a
single-node DataFrame library, delegating all relational work to OGR SQL.
This engine re-expresses that surface Spark-first:

* ``sources``/``sinks``: a PySpark custom DataSource (format name ``"gdal"``)
  reading/writing vector geospatial formats with geometry as a WKB
  ``BinaryType`` column (reference ``src/lib.rs:390-393``) — implemented in
  pure Python (GeoJSON, Shapefile, CSV-with-latlon, SpatiaLite/GeoPackage)
  because no GDAL binding ships in this environment.
* ``geometry``: WKB/WKT/GeoJSON codecs (reference ``GeometryFormat``,
  ``src/lib.rs:126-139``).
* ``functions``: scalar/vector operator library — geometry conversions plus
  the LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal columns) designed for 100 TB scale.
* ``queries``: the declared query inventory wired to the driver contract
  (``__spark_entry__.py``) with DuckDB-oracle SQL for every SQL-expressible
  operator.

Everything relational is plain Spark DataFrame API — Catalyst owns
optimization; no bespoke planner (SURVEY.md §4.2).
"""

from __future__ import annotations

__version__ = "0.1.0"

from polars_gdal_spark.session import get_spark  # noqa: F401


def register_gdal_source(spark) -> None:
    """Register the ``gdal`` and ``geoparquet`` DataSources on a
    SparkSession (idempotent)."""
    from polars_gdal_spark.sources.datasource import GdalDataSource
    from polars_gdal_spark.sources.geoparquet import GeoParquetDataSource

    spark.dataSource.register(GdalDataSource)
    spark.dataSource.register(GeoParquetDataSource)


def read_gdal(spark, path: str, **options):
    """Batch read through the ``gdal`` source with CRS/encoding carried as
    geometry-column metadata (metadata is batch-only: Spark's streaming
    runner rejects schemas with field metadata, so ``readStream`` paths
    must go through ``spark.readStream.format("gdal")`` directly)."""
    register_gdal_source(spark)
    reader = spark.read.format("gdal").option("crsMetadata", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)
