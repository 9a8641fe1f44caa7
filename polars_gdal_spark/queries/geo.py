"""Geospatial queries through the ``gdal`` DataSource (driver contract).

DuckDB in this environment has no spatial extension, so these entries
omit ``oracle_sql`` — the driver records the weaker rows-only check.
Full value-level verification (row counts, golden WKB bytes, round-trip
byte equality) lives in tests/test_datasource_read.py and
tests/test_datasource_write.py.

The fixtures are engine-generated (tools/gen_fixtures.py), committed
under tests/data/.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from polars_gdal_spark.queries import query

_DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "data",
)


def _gdal(spark: SparkSession):
    from polars_gdal_spark import register_gdal_source

    register_gdal_source(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return spark.read.format("gdal")


@query("gdal_read_geojson")
def gdal_read_geojson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeoJSON scan through the custom DataSource (reference
    df_from_resource, src/lib.rs:294-312): attributes + WKB geometry."""
    df = _gdal(spark).load(f"{_DATA}/cities.geojson")
    return df.select(
        "name", "population", "region", F.length("geometry").alias("wkb_len")
    ).orderBy("name")


@query("gdal_read_csv_points")
def gdal_read_csv_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV with coordinate-synthesis open options (reference
    README.md:46-54) + point accessors through the geo function library."""
    from polars_gdal_spark.functions import geo

    df = (
        _gdal(spark)
        .option("x_possible_names", "lon")
        .option("y_possible_names", "lat")
        .option("autodetect_type", "yes")
        .load(f"{_DATA}/cities.csv")
    )
    return df.select(
        "name",
        "population",
        geo.st_x(F.col("geometry")).alias("x"),
        geo.st_y(F.col("geometry")).alias("y"),
    ).orderBy("name")


@query("gdal_roundtrip_gpkg")
def gdal_roundtrip_gpkg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full read→write→read round-trip through the GPKG sink (reference
    gdal_resource_from_df, src/lib.rs:629-642): returns per-region WKB
    byte totals, which only match if geometry survives byte-exact."""
    import tempfile

    src = _gdal(spark).load(f"{_DATA}/cities.geojson")
    out = os.path.join(tempfile.mkdtemp(), "cities.gpkg")
    src.write.format("gdal").mode("overwrite").option("driver", "GPKG").option(
        "layer", "cities"
    ).save(out)
    back = _gdal(spark).load(out)
    return (
        back.groupBy("region")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("geometry")).alias("wkb_bytes"),
        )
        .orderBy("region")
    )


@query("gdal_grid_bucket_agg")
def gdal_grid_bucket_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial bucketing: 30-degree grid cells over the cities layer —
    the equi-join blocking key for scalable spatial joins (SURVEY §2.E)."""
    from polars_gdal_spark.functions import geo

    df = _gdal(spark).load(f"{_DATA}/cities.geojson")
    cell = F.concat_ws(
        ":",
        F.floor(geo.st_x(F.col("geometry")) / 30).cast("int"),
        F.floor(geo.st_y(F.col("geometry")) / 30).cast("int"),
    )
    return (
        df.select(cell.alias("cell30"))
        .groupBy("cell30")
        .agg(F.count("*").alias("n"))
        .orderBy("cell30")
    )


@query("gdal_geometry_formats")
def gdal_geometry_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometry encode conversions (reference GeometryFormat,
    src/lib.rs:126-139): WKB→WKT→WKB fixed point per row."""
    from polars_gdal_spark.functions import geo

    df = _gdal(spark).load(f"{_DATA}/cities.geojson")
    return df.select(
        "name",
        geo.geometry_type_col(F.col("geometry")).alias("gtype"),
        (
            geo.wkt_to_wkb_col(geo.wkb_to_wkt_col(F.col("geometry")))
            == F.col("geometry")
        ).alias("wkt_fixed_point"),
    ).orderBy("name")
