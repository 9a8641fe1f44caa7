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
    """
    from polars_gdal_spark import register_gdal_source

    register_gdal_source(spark)
    reader = spark.read.format("gdal")
    for k, v in options.items():
        reader = reader.option(k, v)
    reader.load(path).createOrReplaceTempView(view_name)
    return spark.sql(sql)
