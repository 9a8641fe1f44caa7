"""GeoParquet ``geo`` footer read/write (spec v1.1.0 convention).

Covers: round-trip through format("geoparquet"), CRS carried into the
geometry column metadata on read (and back out on write), observed
geometry_types in the footer, interop with an independently-written
GeoParquet file (pyarrow-direct, the footer any external tool produces),
and plain-parquet passthrough (no geo footer -> no metadata)."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import polars_gdal_spark as pg
from polars_gdal_spark.sources.geoparquet import read_geo_footer

WKB_PT = bytes.fromhex("0101000000000000000000f03f0000000000000040")  # (1 2)
WKB_LINE = bytes.fromhex(
    "010200000002000000"
    "00000000000000000000000000000000"
    "000000000000f03f000000000000f03f"
)


@pytest.fixture()
def cities(spark):
    pg.register_gdal_source(spark)
    return spark.createDataFrame(
        [("berlin", WKB_PT), ("line", WKB_LINE)],
        "name string, geometry binary",
    )


def test_roundtrip_and_footer(spark, cities, tmp_path):
    out = str(tmp_path / "cities.gpq")
    cities.write.format("geoparquet").mode("append").option(
        "crs", "EPSG:3857"
    ).save(out)

    geo = read_geo_footer(out)
    assert geo["primary_column"] == "geometry"
    col = geo["columns"]["geometry"]
    assert col["encoding"] == "WKB"
    assert col["crs"]["id"] == {"authority": "EPSG", "code": 3857}
    assert col["geometry_types"] == ["LineString", "Point"]

    back = spark.read.format("geoparquet").load(out)
    assert back.schema["geometry"].metadata["crs"] == "EPSG:3857"
    assert back.schema["geometry"].metadata["encoding"] == "WKB"
    rows = {r["name"]: bytes(r["geometry"]) for r in back.collect()}
    assert rows == {"berlin": WKB_PT, "line": WKB_LINE}

    # native Spark parquet reads the same parts (it's plain parquet)
    assert spark.read.parquet(out).count() == 2


def test_crs84_maps_to_null_crs(spark, cities, tmp_path):
    out = str(tmp_path / "wgs.gpq")
    cities.write.format("geoparquet").mode("append").save(out)  # default CRS
    geo = read_geo_footer(out)
    assert geo["columns"]["geometry"]["crs"] is None  # spec: null = CRS84
    back = spark.read.format("geoparquet").load(out)
    assert back.schema["geometry"].metadata["crs"] == "OGC:CRS84"


def test_read_external_geoparquet_file(spark, tmp_path):
    """A GeoParquet file produced by a different writer (pyarrow direct,
    the same footer geopandas/GDAL emit) reads with CRS carried."""
    pg.register_gdal_source(spark)
    table = pa.table(
        {"name": ["a"], "geometry": pa.array([WKB_PT], pa.binary())}
    )
    geo = {
        "version": "1.0.0",
        "primary_column": "geometry",
        "columns": {
            "geometry": {
                "encoding": "WKB",
                "geometry_types": ["Point"],
                "crs": {"id": {"authority": "EPSG", "code": 25832}},
            }
        },
    }
    f = str(tmp_path / "external.parquet")
    pq.write_table(
        table.replace_schema_metadata({"geo": json.dumps(geo)}), f
    )
    back = spark.read.format("geoparquet").load(f)
    assert back.schema["geometry"].metadata["crs"] == "EPSG:25832"
    assert json.loads(back.schema["geometry"].metadata["geo"])[
        "columns"
    ]["geometry"]["geometry_types"] == ["Point"]
    assert bytes(back.collect()[0]["geometry"]) == WKB_PT


def test_plain_parquet_no_geo_metadata(spark, tmp_path):
    pg.register_gdal_source(spark)
    f = str(tmp_path / "plain.parquet")
    pq.write_table(pa.table({"x": [1, 2]}), f)
    back = spark.read.format("geoparquet").load(f)
    assert back.schema["x"].metadata == {}
    assert back.count() == 2


def test_crs_roundtrips_from_column_metadata(spark, cities, tmp_path):
    """write -> read -> write: the CRS read into column metadata feeds
    the second write with no explicit option (the round-trip contract
    the gdal source uses, SURVEY §1.2)."""
    first = str(tmp_path / "first.gpq")
    cities.write.format("geoparquet").mode("append").option(
        "crs", "EPSG:3035"
    ).save(first)
    loaded = spark.read.format("geoparquet").load(first)
    second = str(tmp_path / "second.gpq")
    loaded.write.format("geoparquet").mode("append").save(second)
    assert read_geo_footer(second)["columns"]["geometry"]["crs"]["id"] == {
        "authority": "EPSG",
        "code": 3035,
    }


def test_overwrite_guard_and_mode(spark, cities, tmp_path):
    out = str(tmp_path / "guard.gpq")
    cities.write.format("geoparquet").mode("append").save(out)
    with pytest.raises(Exception, match="overwrite"):
        cities.write.format("geoparquet").mode("append").save(out)
    cities.write.format("geoparquet").mode("overwrite").save(out)
    assert spark.read.format("geoparquet").load(out).count() == 2
