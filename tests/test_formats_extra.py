"""Zip, Arrow IPC, KML, GPX driver tests — including the reference's own
zipped-shapefile and cities.arrow fixtures (src/test.rs:49-51, 123-158)."""

from __future__ import annotations

import pytest

from polars_gdal_spark.geometry import wkb_to_geom
from tests.conftest import REF_DATA

ZIPPED_SHP = f"{REF_DATA}/stations_shapefile.shp.zip"
CITIES_ARROW = f"{REF_DATA}/cities.arrow"

KML_DOC = """<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document>
 <Placemark><name>alpha</name>
  <ExtendedData><Data name="kind"><value>tower</value></Data></ExtendedData>
  <Point><coordinates>10.5,45.25,120</coordinates></Point></Placemark>
 <Placemark><name>beta</name>
  <LineString><coordinates>0,0 1,1 2,0</coordinates></LineString></Placemark>
 <Placemark><name>gamma</name>
  <Polygon><outerBoundaryIs><LinearRing>
   <coordinates>0,0 4,0 4,4 0,0</coordinates>
  </LinearRing></outerBoundaryIs></Polygon></Placemark>
</Document></kml>"""

GPX_DOC = """<?xml version="1.0"?>
<gpx xmlns="http://www.topografix.com/GPX/1/1" version="1.1">
 <wpt lat="47.5" lon="8.5"><name>w1</name><ele>400.5</ele></wpt>
 <wpt lat="47.6" lon="8.6"><name>w2</name></wpt>
 <trk><name>t1</name><trkseg>
   <trkpt lat="47.0" lon="8.0"/><trkpt lat="47.1" lon="8.1"/>
 </trkseg></trk>
</gpx>"""


def test_zipped_shapefile(spark):
    # reference test_df_from_bytes zipped variant (src/test.rs:49-51)
    df = spark.read.format("gdal").load(ZIPPED_SHP)
    assert df.count() == 86
    assert "name" in df.columns and df.columns[-1] == "geometry"


def test_cities_arrow(spark):
    # reference write-path fixture: 202 rows, name + WKB geometry
    df = spark.read.format("gdal").load(CITIES_ARROW)
    assert df.count() == 202
    assert df.columns == ["name", "geometry"]
    t, coords = wkb_to_geom(bytes(df.first()["geometry"]))
    assert t == "Point"


def test_arrow_roundtrip_through_gpkg(spark, tmp_path):
    src = spark.read.format("gdal").load(CITIES_ARROW)
    out = str(tmp_path / "cities.gpkg")
    src.write.format("gdal").mode("overwrite").option("driver", "GPKG").save(out)
    back = spark.read.format("gdal").load(out)
    a = sorted(bytes(r["geometry"]) for r in src.collect())
    b = sorted(bytes(r["geometry"]) for r in back.select("geometry").collect())
    assert a == b


def test_kml(spark, tmp_path):
    p = tmp_path / "doc.kml"
    p.write_text(KML_DOC)
    df = spark.read.format("gdal").load(str(p))
    rows = {r["name"]: r for r in df.collect()}
    assert set(rows) == {"alpha", "beta", "gamma"}
    assert rows["alpha"]["kind"] == "tower"
    t, c = wkb_to_geom(bytes(rows["alpha"]["geometry"]))
    assert t == "Point" and c == (10.5, 45.25, 120.0)
    assert wkb_to_geom(bytes(rows["beta"]["geometry"]))[0] == "LineString"
    assert wkb_to_geom(bytes(rows["gamma"]["geometry"]))[0] == "Polygon"


def test_gpx_waypoints_and_tracks(spark, tmp_path):
    p = tmp_path / "route.gpx"
    p.write_text(GPX_DOC)
    wpts = spark.read.format("gdal").load(str(p))  # default layer: waypoints
    assert wpts.count() == 2
    w1 = wpts.where("name = 'w1'").first()
    assert w1["ele"] == 400.5
    assert wkb_to_geom(bytes(w1["geometry"]))[1] == (8.5, 47.5)

    trks = spark.read.format("gdal").option("layer", "tracks").load(str(p))
    assert trks.count() == 1
    assert wkb_to_geom(bytes(trks.first()["geometry"]))[0] == "LineString"


def test_ogr_sql_recipe(spark):
    from polars_gdal_spark.plans import ogr_sql

    df = ogr_sql(
        spark,
        f"{REF_DATA}/stations.shp",
        "SELECT name, line FROM layer WHERE line = 'blue' ORDER BY name LIMIT 5",
    )
    assert df.count() == 5
    assert df.columns == ["name", "line"]


def test_ogr_sql_special_fields(spark):
    """OGR SQL special fields (public GDAL dialect docs): FID,
    OGR_GEOMETRY, OGR_GEOM_WKT, OGR_GEOM_AREA resolve on the view."""
    from polars_gdal_spark.plans import ogr_sql

    rows = ogr_sql(
        spark,
        f"{REF_DATA}/stations.shp",
        "SELECT FID, name, OGR_GEOMETRY, OGR_GEOM_WKT, OGR_GEOM_AREA "
        "FROM layer ORDER BY FID LIMIT 3",
    ).collect()
    assert [r["FID"] for r in rows] == [0, 1, 2]
    assert all(r["OGR_GEOMETRY"] == "Point" for r in rows)
    assert all(r["OGR_GEOM_WKT"].startswith("POINT") for r in rows)
    assert all(r["OGR_GEOM_AREA"] == 0.0 for r in rows)  # points: no area


def test_geoparquet_roundtrip(spark, tmp_path):
    from polars_gdal_spark import read_gdal
    from polars_gdal_spark.sources.geoparquet import (
        read_geoparquet,
        write_geoparquet,
    )

    src = read_gdal(spark, f"{REF_DATA}/stations.shp")
    out = str(tmp_path / "stations_gpq")
    write_geoparquet(src, out)
    back = read_geoparquet(spark, out)
    assert back.count() == 86
    meta = back.schema["geometry"].metadata
    assert meta["encoding"] == "wkb"
    assert "WGS_1984" in meta["crs"]
    a = sorted(bytes(r["geometry"]) for r in src.select("geometry").collect())
    b = sorted(bytes(r["geometry"]) for r in back.select("geometry").collect())
    assert a == b
