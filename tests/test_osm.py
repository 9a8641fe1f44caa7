"""OSM XML driver tests: GDAL-style layer split (tagged points / open
ways as lines / closed ways as multipolygons), node-ref resolution, and
the other_tags surplus-tag encoding."""

from __future__ import annotations

import json

from polars_gdal_spark.geometry import wkb_to_geom

OSM = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6" generator="test">
 <node id="1" lat="52.5" lon="13.4">
  <tag k="name" v="cafe"/>
  <tag k="amenity" v="cafe"/>
  <tag k="cuisine" v="coffee_shop"/>
 </node>
 <node id="2" lat="52.51" lon="13.41"/>
 <node id="3" lat="52.52" lon="13.42"/>
 <node id="4" lat="52.53" lon="13.41"/>
 <node id="5" lat="52.52" lon="13.40"/>
 <way id="100">
  <nd ref="2"/><nd ref="3"/><nd ref="4"/>
  <tag k="highway" v="residential"/>
  <tag k="name" v="Main Street"/>
 </way>
 <way id="200">
  <nd ref="2"/><nd ref="3"/><nd ref="4"/><nd ref="5"/><nd ref="2"/>
  <tag k="building" v="yes"/>
 </way>
</osm>
"""


def _write(tmp_path):
    p = tmp_path / "map.osm"
    p.write_text(OSM)
    return str(p)


def test_points_layer_tagged_nodes_only(spark, tmp_path):
    df = spark.read.format("gdal").load(_write(tmp_path))  # first layer
    [row] = df.collect()
    assert row["osm_id"] == 1 and row["name"] == "cafe"
    assert json.loads(row["other_tags"]) == {
        "amenity": "cafe",
        "cuisine": "coffee_shop",
    }
    t, c = wkb_to_geom(bytes(row["geometry"]))
    assert t == "Point" and c == (13.4, 52.5)


def test_lines_layer_open_ways(spark, tmp_path):
    df = (
        spark.read.format("gdal")
        .option("layer", "lines")
        .load(_write(tmp_path))
    )
    [row] = df.collect()
    assert row["osm_id"] == 100 and row["name"] == "Main Street"
    t, c = wkb_to_geom(bytes(row["geometry"]))
    assert t == "LineString"
    assert c == [(13.41, 52.51), (13.42, 52.52), (13.41, 52.53)]


def test_multipolygons_layer_closed_ways(spark, tmp_path):
    df = (
        spark.read.format("gdal")
        .option("layer", "multipolygons")
        .load(_write(tmp_path))
    )
    [row] = df.collect()
    assert row["osm_id"] == 200 and row["name"] is None
    assert json.loads(row["other_tags"]) == {"building": "yes"}
    t, polys = wkb_to_geom(bytes(row["geometry"]))
    assert t == "MultiPolygon"
    ring = polys[0][0]
    assert ring[0] == ring[-1] and len(ring) == 5
