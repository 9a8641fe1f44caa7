"""Query-planning layer documentation and helpers.

The reference has no planner: all relational capability is delegated to
GDAL's OGR SQL engine (reference ``README.md:33-44``, ``src/lib.rs:316-318``).
In this engine that delegation collapses into Catalyst (SURVEY §3.3):
``recipes`` documents the dialect-by-dialect mapping and provides
``ogr_sql`` — a convenience that registers a loaded layer as a temp view
and runs Spark SQL over it, the literal equivalent of
``dataset.execute_sql(...)`` → ``df_from_layer``.
"""

from polars_gdal_spark.plans.recipes import ogr_sql  # noqa: F401
