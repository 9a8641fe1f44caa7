"""In-memory bytes read (reference df_from_bytes, src/test.rs:43-52)."""

from __future__ import annotations

import pytest

from polars_gdal_spark.errors import EmptyDataError
from polars_gdal_spark.sources import read_gdal_bytes

INLINE_GEOJSON = b"""{"type": "FeatureCollection", "features": [
  {"type": "Feature",
   "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
   "properties": {"name": "foo", "value": 7}},
  {"type": "Feature",
   "geometry": {"type": "Point", "coordinates": [3.0, 4.0]},
   "properties": {"name": "bar", "value": 8}}
]}"""


def test_inline_geojson_bytes(spark):
    df = read_gdal_bytes(spark, INLINE_GEOJSON, "inline.geojson")
    assert df.count() == 2
    assert df.columns == ["name", "value", "geometry"]
    assert {r["name"] for r in df.collect()} == {"foo", "bar"}


def test_bytes_with_csv_hint(spark):
    data = b"name,Lon,Lat\nx,1.5,2.5\ny,3.5,4.5\n"
    df = read_gdal_bytes(
        spark,
        data,
        "points.csv",
        x_possible_names="Lon",
        y_possible_names="Lat",
    )
    assert df.count() == 2
    assert df.columns == ["name", "geometry"]


def test_empty_bytes_rejected(spark):
    # reference src/lib.rs:205-207 (error EmptyData)
    with pytest.raises(EmptyDataError):
        read_gdal_bytes(spark, b"", "x.geojson")
