"""Geometry codec tests: WKB/WKT/GeoJSON round-trips + known-good bytes."""

from __future__ import annotations

import binascii
import json

import pytest

from polars_gdal_spark.geometry import (
    geojson_to_geom,
    geojson_to_wkb,
    geom_to_geojson,
    geom_to_wkb,
    geom_to_wkt,
    wkb_to_geojson,
    wkb_to_geom,
    wkt_to_geom,
    wkt_to_wkb,
)
from polars_gdal_spark.geometry.wkb import WkbError

GEOMS = [
    ("Point", (1.0, 2.0)),
    ("Point", (1.5, 2.5, 3.5)),
    ("LineString", [(0.0, 0.0), (1.0, 1.0), (2.0, 0.0)]),
    (
        "Polygon",
        [
            [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)],
            [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 1.0)],
        ],
    ),
    ("MultiPoint", [(1.0, 2.0), (3.0, 4.0)]),
    ("MultiLineString", [[(0.0, 0.0), (1.0, 1.0)], [(2.0, 2.0), (3.0, 3.0)]]),
    (
        "MultiPolygon",
        [
            [[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0)]],
            [[(5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 5.0)]],
        ],
    ),
    (
        "GeometryCollection",
        [("Point", (1.0, 2.0)), ("LineString", [(0.0, 0.0), (1.0, 1.0)])],
    ),
]


@pytest.mark.parametrize("geom", GEOMS, ids=[g[0] for g in GEOMS])
def test_wkb_roundtrip(geom):
    assert geom_to_wkb(wkb_to_geom(geom_to_wkb(geom))) == geom_to_wkb(geom)


@pytest.mark.parametrize("geom", GEOMS, ids=[g[0] for g in GEOMS])
def test_wkt_roundtrip(geom):
    wkb = geom_to_wkb(geom)
    assert wkt_to_wkb(geom_to_wkt(wkb_to_geom(wkb))) == wkb


@pytest.mark.parametrize("geom", GEOMS, ids=[g[0] for g in GEOMS])
def test_geojson_roundtrip(geom):
    wkb = geom_to_wkb(geom)
    gj = json.loads(json.dumps(geom_to_geojson(wkb_to_geom(wkb))))
    assert geom_to_wkb(geojson_to_geom(gj)) == wkb


def test_known_good_point_wkb():
    # canonical little-endian ISO WKB for POINT(1 2)
    expected = binascii.unhexlify("0101000000000000000000F03F0000000000000040")
    assert geom_to_wkb(("Point", (1.0, 2.0))) == expected
    assert wkb_to_geom(expected) == ("Point", (1.0, 2.0))


def test_big_endian_wkb_decodes():
    be = binascii.unhexlify("00000000013FF00000000000004000000000000000")
    assert wkb_to_geom(be) == ("Point", (1.0, 2.0))


def test_ewkb_srid_flag_skipped():
    # EWKB: little endian, type 1 | 0x20000000, SRID 4326, point 1 2
    ewkb = binascii.unhexlify(
        "0101000020E6100000000000000000F03F0000000000000040"
    )
    assert wkb_to_geom(ewkb) == ("Point", (1.0, 2.0))


def test_wkt_formats():
    assert geom_to_wkt(("Point", (1.0, 2.0))) == "POINT (1 2)"
    assert (
        geom_to_wkt(("LineString", [(0.0, 0.0), (1.5, 1.5)]))
        == "LINESTRING (0 0, 1.5 1.5)"
    )
    assert wkt_to_geom("MULTIPOINT (1 2, 3 4)") == (
        "MultiPoint",
        [(1.0, 2.0), (3.0, 4.0)],
    )
    assert wkt_to_geom("MULTIPOINT ((1 2), (3 4))") == (
        "MultiPoint",
        [(1.0, 2.0), (3.0, 4.0)],
    )
    assert wkt_to_geom("POINT Z (1 2 3)") == ("Point", (1.0, 2.0, 3.0))


def test_truncated_wkb_raises():
    with pytest.raises(WkbError):
        wkb_to_geom(binascii.unhexlify("0101000000000000"))


def test_empty_wkb_raises():
    with pytest.raises(WkbError):
        wkb_to_geom(b"")


def test_geojson_text_roundtrip():
    gj = {"type": "Point", "coordinates": [3.25, -7.5]}
    assert wkb_to_geojson(geojson_to_wkb(gj)) == gj


def test_st_contains_xy_and_covering_cells(spark):
    """Unit coverage for the spatial-join primitives: hole-aware
    containment and bbox covering cells."""
    import pyspark.sql.functions as F

    from polars_gdal_spark.functions import geo
    from polars_gdal_spark.geometry import geom_to_wkb

    donut = geom_to_wkb(
        ("Polygon", [
            [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
            [(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)],
        ])
    )
    df = spark.createDataFrame(
        [(donut, 2.0, 2.0, True),   # in shell
         (donut, 5.0, 5.0, False),  # in hole
         (donut, 11.0, 5.0, False)],  # outside
        "g binary, x double, y double, want boolean",
    )
    rows = df.select(
        geo.st_contains_xy(F.col("g"), F.col("x"), F.col("y")).alias("got"),
        "want",
    ).collect()
    assert all(r["got"] == r["want"] for r in rows)

    cells = df.limit(1).select(
        geo.st_covering_cells(F.col("g"), F.lit(4.0)).alias("c")
    ).collect()[0]["c"]
    assert sorted(cells) == sorted(
        f"{i}:{j}" for i in range(0, 3) for j in range(0, 3)
    )


def test_st_measures(spark):
    """Area with hole subtraction, perimeter, centroid (hole-symmetric),
    curve length; non-areal area = 0."""
    import pyspark.sql.functions as F

    from polars_gdal_spark.functions import geo
    from polars_gdal_spark.geometry import geom_to_wkb

    donut = geom_to_wkb(
        ("Polygon", [
            [(0, 0), (8, 0), (8, 4), (0, 4), (0, 0)],
            [(1, 1), (7, 1), (7, 3), (1, 3), (1, 1)],
        ])
    )
    line = geom_to_wkb(("LineString", [(0, 0), (3, 4), (3, 16)]))
    df = spark.createDataFrame([(donut, line)], "poly binary, line binary")
    row = df.select(
        geo.st_area(F.col("poly")).alias("area"),
        geo.st_perimeter(F.col("poly")).alias("perim"),
        geo.st_centroid(F.col("poly")).alias("cent"),
        geo.st_length(F.col("line")).alias("len"),
        geo.st_area(F.col("line")).alias("line_area"),
    ).collect()[0]
    assert row["area"] == 8 * 4 - 6 * 2
    assert row["perim"] == 2 * (8 + 4) + 2 * (6 + 2)
    assert (row["cent"]["x"], row["cent"]["y"]) == (4.0, 2.0)
    assert row["len"] == 5.0 + 12.0
    assert row["line_area"] == 0.0
