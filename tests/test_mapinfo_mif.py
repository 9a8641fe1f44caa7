"""MapInfo MIF/MID driver tests: header/column parsing, MID attribute
pairing, geometry objects (point, pline, region with hole, rect, none),
and the sibling_files allow-list.

Reference reads MapInfo via GDAL (README.md:9); ours is from the public
MIF/MID interchange spec."""

from __future__ import annotations

import datetime

import pytest

from polars_gdal_spark.geometry import wkb_to_geom

MIF = """Version 300
Charset "WindowsLatin1"
Delimiter ","
CoordSys Earth Projection 1, 104
Columns 4
  name Char(30)
  pop Integer
  area Float
  opened Date
Data

Point 10 20
    Symbol (34,0,12)
Region 2
  5
0 0
8 0
8 8
0 8
0 0
  5
2 2
6 2
6 6
2 6
2 2
    Pen (1,2,0)
    Brush (2,16777215)
Pline 3
0 0
1 1
2 0
Line 5 5 7 7
Rect 1 1 3 4
NONE
"""

MID = """"alpha",100,1.5,20200115
"beta",250,64.0,20210301
"gamma",7,0.0,20190704
"delta",12,2.5,20220101
"epsilon",3,6.0,20230615
"zeta",0,0.0,20240101
"""


@pytest.fixture()
def mif_path(tmp_path):
    (tmp_path / "towns.mif").write_text(MIF)
    (tmp_path / "towns.mid").write_text(MID)
    return str(tmp_path / "towns.mif")


def test_schema_and_attributes(spark, mif_path):
    df = spark.read.format("gdal").load(mif_path)
    assert df.columns == ["name", "pop", "area", "opened", "geometry"]
    rows = {r["name"]: r for r in df.collect()}
    assert len(rows) == 6
    assert rows["alpha"]["pop"] == 100 and rows["alpha"]["area"] == 1.5
    assert rows["alpha"]["opened"] == datetime.date(2020, 1, 15)
    assert rows["zeta"]["geometry"] is None  # NONE object


def test_geometries(spark, mif_path):
    df = spark.read.format("gdal").load(mif_path)
    rows = {r["name"]: r for r in df.collect()}
    t, c = wkb_to_geom(bytes(rows["alpha"]["geometry"]))
    assert t == "Point" and c == (10.0, 20.0)
    t, rings = wkb_to_geom(bytes(rows["beta"]["geometry"]))
    assert t == "Polygon" and len(rings) == 2  # shell + hole
    assert rings[0][0] == (0.0, 0.0) and rings[1][0] == (2.0, 2.0)
    t, c = wkb_to_geom(bytes(rows["gamma"]["geometry"]))
    assert t == "LineString" and c == [(0, 0), (1, 1), (2, 0)]
    t, c = wkb_to_geom(bytes(rows["delta"]["geometry"]))
    assert t == "LineString" and c == [(5, 5), (7, 7)]
    t, rings = wkb_to_geom(bytes(rows["epsilon"]["geometry"]))
    assert t == "Polygon"
    assert rings[0] == [(1, 1), (3, 1), (3, 4), (1, 4), (1, 1)]


def test_sibling_files_excludes_mid(spark, mif_path):
    df = (
        spark.read.format("gdal")
        .option("sibling_files", "towns.mif")
        .load(mif_path)
    )
    # .mid not in the allow-list → attributes all null, geometry intact
    row = df.filter("name is null").count()
    assert row == 6
    assert df.count() == 6


def test_multisection_pline_and_multipoint(spark, tmp_path):
    (tmp_path / "m.mif").write_text(
        """Version 300
Delimiter ","
Columns 1
  tag Char(10)
Data
Pline Multiple 2
  2
0 0
1 0
  3
5 5
6 6
7 5
Multipoint 2
1 2
3 4
"""
    )
    (tmp_path / "m.mid").write_text('"a"\n"b"\n')
    df = spark.read.format("gdal").load(str(tmp_path / "m.mif"))
    rows = {r["tag"]: r for r in df.collect()}
    t, segs = wkb_to_geom(bytes(rows["a"]["geometry"]))
    assert t == "MultiLineString" and len(segs) == 2
    assert segs[1] == [(5, 5), (6, 6), (7, 5)]
    t, pts = wkb_to_geom(bytes(rows["b"]["geometry"]))
    assert t == "MultiPoint" and pts == [(1, 2), (3, 4)]


def test_non_latin1_text_roundtrips_via_utf8_charset(spark, tmp_path):
    """Non-Latin-1 attribute text flips the writer to Charset "UTF-8"
    (which the reader honors); pure-Latin-1 data keeps classic Neutral.
    Found by the hypothesis round-trip: the old writer crashed on U+0100.
    """
    df = spark.createDataFrame(
        [(1, "Ā köttbullar 北京"), (2, "plain")],
        "id bigint, label string",
    ).selectExpr(
        "id", "label",
        "unhex('0101000000000000000000F03F0000000000000040') AS geometry",
    )
    out = str(tmp_path / "uni.mif")
    df.write.format("gdal").mode("overwrite").option(
        "driver", "MapInfo File"
    ).save(out)
    assert 'Charset "UTF-8"' in open(out, encoding="utf-8").read()
    back = spark.read.format("gdal").load(out)
    assert {r["label"] for r in back.collect()} == {"Ā köttbullar 北京", "plain"}

    df2 = df.where("id = 2")
    out2 = str(tmp_path / "plain.mif")
    df2.write.format("gdal").mode("overwrite").option(
        "driver", "MapInfo File"
    ).save(out2)
    assert 'Charset "Neutral"' in open(out2, encoding="latin-1").read()
