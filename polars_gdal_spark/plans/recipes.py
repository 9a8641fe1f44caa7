"""OGR SQL → Spark SQL recipes (SURVEY §2.D, M3).

The reference's only relational surface is GDAL's OGR SQL dialect, run
before the scan: ``dataset.execute_sql("SELECT ... WHERE ...")`` →
result layer → DataFrame (reference ``src/test.rs:54-70``). Every
construct in the public OGR SQL dialect maps to Spark as follows — all
native, no custom planner work (SURVEY §4.2):

=============================  ==========================================
OGR SQL construct              Spark equivalent
=============================  ==========================================
``SELECT cols``                ``df.select(...)`` / projection pruning
``AS alias``, ``CAST``         ``.alias()``, ``.cast()``
``DISTINCT``                   ``df.distinct()``
``WHERE`` =,<,>,LIKE,IN,        ``df.where(...)`` — pushed to parquet; to
BETWEEN, AND/OR/NOT            the gdal source with option pushdown=true
``COUNT/MIN/MAX/AVG/SUM``      ``df.agg(...)`` (partial agg automatic)
``ORDER BY``                   ``df.orderBy(...)``
equi-``JOIN``                  ``df.join(other, on)`` (+ broadcast)
``LIMIT`` / ``OFFSET``         ``df.limit(n)`` / ``df.offset(n)``
spatial filter                 grid-cell blocking (functions.geo
                               ``st_grid_cell``) + exact refine UDF
=============================  ==========================================

Everything OGR SQL lacks (outer/semi/anti joins, windows, grouping
sets, set ops, subqueries, 700+ scalar functions) comes free with
Spark; see queries/relational.py and queries/analytics.py for the
oracle-checked inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ogr_sql(
    spark: SparkSession,
    path: str,
    sql: str,
    view_name: str = "layer",
    **options: str,
) -> DataFrame:
    """The engine's ``dataset.execute_sql`` (reference ``src/test.rs:54-70``):
    load a vector resource as ``view_name`` and run SQL over it.

    Example (the reference README's shapefile filter, README.md:33-44)::

        ogr_sql(spark, "my.shp",
                "SELECT kind, is_bridge, highway FROM layer "
                "WHERE highway = 'pedestrian'")

    OGR SQL's documented *special fields* are honored when the statement
    references them (per the public GDAL OGR SQL dialect docs):
    ``FID`` (source feature id), ``OGR_GEOMETRY`` (geometry type name),
    ``OGR_GEOM_WKT`` (WKT text), ``OGR_GEOM_AREA`` (planar area) — each
    materialized as a computed column on the view, so plain Spark SQL
    resolves them.
    """
    import re

    from polars_gdal_spark import register_gdal_source
    from polars_gdal_spark.functions import geo

    register_gdal_source(spark)
    wants = {
        name
        for name in ("FID", "OGR_GEOMETRY", "OGR_GEOM_WKT", "OGR_GEOM_AREA")
        if re.search(rf"\b{name}\b", sql, flags=re.IGNORECASE)
    }
    reader = spark.read.format("gdal")
    if "FID" in wants:
        options.setdefault("fidColumn", "FID")
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load(path)
    geom_col = options.get("geometryColumn", "geometry")
    if "OGR_GEOMETRY" in wants:
        df = df.withColumn(
            "OGR_GEOMETRY", geo.geometry_type_col(df[geom_col])
        )
    if "OGR_GEOM_WKT" in wants:
        df = df.withColumn("OGR_GEOM_WKT", geo.wkb_to_wkt_col(df[geom_col]))
    if "OGR_GEOM_AREA" in wants:
        df = df.withColumn("OGR_GEOM_AREA", geo.st_area(df[geom_col]))
    df.createOrReplaceTempView(view_name)
    return spark.sql(sql)
