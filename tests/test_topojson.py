"""TopoJSON driver tests: arc stitching (incl. negative/reversed indexes),
quantized delta decoding, per-object layers, and .json routing.

The reference reads TopoJSON via GDAL's driver set (README.md:9); ours
is a from-spec implementation of TopoJSON 3.0."""

from __future__ import annotations

import json

import pytest

from polars_gdal_spark.geometry import wkb_to_geom

# Two unit squares sharing the vertical edge (1,0)-(1,1) as arc 0;
# the right square references it reversed (index -1).
TOPO = {
    "type": "Topology",
    "objects": {
        "squares": {
            "type": "GeometryCollection",
            "geometries": [
                {
                    "type": "Polygon",
                    "arcs": [[0, 1]],
                    "id": 10,
                    "properties": {"name": "left", "pop": 100},
                },
                {
                    "type": "Polygon",
                    "arcs": [[-1, 2]],
                    "id": 11,
                    "properties": {"name": "right", "pop": 250},
                },
            ],
        },
        "places": {
            "type": "GeometryCollection",
            "geometries": [
                {
                    "type": "Point",
                    "coordinates": [0.5, 0.5],
                    "properties": {"name": "center", "elev": 12.5},
                },
                {
                    "type": "LineString",
                    "arcs": [0],
                    "properties": {"name": "border"},
                },
            ],
        },
    },
    "arcs": [
        [[1, 0], [1, 1]],
        [[1, 1], [0, 1], [0, 0], [1, 0]],
        [[1, 0], [2, 0], [2, 1], [1, 1]],
    ],
}

# Same single arc, quantized: scale 0.1, translate (10, 20), deltas.
TOPO_Q = {
    "type": "Topology",
    "transform": {"scale": [0.1, 0.1], "translate": [10.0, 20.0]},
    "objects": {
        "lines": {
            "type": "GeometryCollection",
            "geometries": [
                {"type": "LineString", "arcs": [0], "properties": {"n": 1}},
                {
                    "type": "Point",
                    "coordinates": [5, 30],
                    "properties": {"n": 2},
                },
            ],
        }
    },
    "arcs": [[[0, 0], [10, 0], [0, 10]]],
}


@pytest.fixture()
def topo_path(tmp_path):
    p = tmp_path / "map.topojson"
    p.write_text(json.dumps(TOPO))
    return str(p)


def test_layers_and_default(spark, topo_path):
    df = spark.read.format("gdal").load(topo_path)  # first object = squares
    rows = {r["name"]: r for r in df.collect()}
    assert set(rows) == {"left", "right"}
    assert rows["left"]["pop"] == 100 and rows["right"]["pop"] == 250


def test_shared_arc_stitching(spark, topo_path):
    df = spark.read.format("gdal").option("fidColumn", "fid").load(topo_path)
    rows = {r["name"]: r for r in df.collect()}
    assert rows["left"]["fid"] == 10 and rows["right"]["fid"] == 11
    t, rings = wkb_to_geom(bytes(rows["left"]["geometry"]))
    assert t == "Polygon"
    assert rings[0] == [(1, 0), (1, 1), (0, 1), (0, 0), (1, 0)]
    t, rings = wkb_to_geom(bytes(rows["right"]["geometry"]))
    # negative index -1 → arc 0 reversed, then arc 2 stitched
    assert rings[0] == [(1, 1), (1, 0), (2, 0), (2, 1), (1, 1)]


def test_second_layer(spark, topo_path):
    df = spark.read.format("gdal").option("layer", "places").load(topo_path)
    rows = {r["name"]: r for r in df.collect()}
    assert set(rows) == {"center", "border"}
    assert rows["center"]["elev"] == 12.5
    t, c = wkb_to_geom(bytes(rows["center"]["geometry"]))
    assert t == "Point" and c == (0.5, 0.5)
    t, c = wkb_to_geom(bytes(rows["border"]["geometry"]))
    assert t == "LineString" and c == [(1, 0), (1, 1)]


def test_quantized_decode(spark, tmp_path):
    p = tmp_path / "quant.topojson"
    p.write_text(json.dumps(TOPO_Q))
    df = spark.read.format("gdal").load(str(p))
    rows = sorted(df.collect(), key=lambda r: r["n"])
    t, c = wkb_to_geom(bytes(rows[0]["geometry"]))
    # deltas (0,0),(10,0),(0,10) → quantized (0,0),(10,0),(10,10)
    # → * 0.1 + (10,20) = (10,20),(11,20),(11,21)
    assert t == "LineString"
    assert [(round(x, 9), round(y, 9)) for x, y in c] == [
        (10.0, 20.0),
        (11.0, 20.0),
        (11.0, 21.0),
    ]
    # point coordinates are transformed but NOT delta-encoded
    t, c = wkb_to_geom(bytes(rows[1]["geometry"]))
    assert t == "Point" and c == (10.5, 23.0)


def test_json_extension_routes_to_topojson(spark, tmp_path):
    p = tmp_path / "map.json"  # .json but a Topology document
    p.write_text(json.dumps(TOPO))
    assert spark.read.format("gdal").load(str(p)).count() == 2
    # plain GeoJSON under .json still routes to the GeoJSON driver
    g = tmp_path / "plain.json"
    g.write_text(
        json.dumps(
            {
                "type": "FeatureCollection",
                "features": [
                    {
                        "type": "Feature",
                        "geometry": {"type": "Point", "coordinates": [1, 2]},
                        "properties": {"a": 1},
                    }
                ],
            }
        )
    )
    assert spark.read.format("gdal").load(str(g)).count() == 1
