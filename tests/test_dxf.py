"""DXF driver tests: the group-code/value pair stream, ENTITIES-section
entity mapping, legacy POLYLINE/VERTEX/SEQEND accumulation, and the
GDAL-parity attribute subset (Layer/EntityHandle/Text).

The reference reads DXF via GDAL's driver set (README.md:9); ours is a
from-spec implementation of the public ASCII DXF group-code format."""

from __future__ import annotations

import pytest

from polars_gdal_spark.geometry import wkb_to_geom


def _pairs(*cv) -> str:
    return "".join(f"{c}\n{v}\n" for c, v in zip(cv[::2], cv[1::2]))


DXF = (
    _pairs(0, "SECTION", 2, "HEADER", 0, "ENDSEC")
    + _pairs(0, "SECTION", 2, "ENTITIES")
    + _pairs(0, "POINT", 5, "2A", 8, "sites", 10, "1.5", 20, "2.5")
    + _pairs(
        0, "LINE", 5, "2B", 8, "roads",
        10, "0.0", 20, "0.0", 11, "3.0", 21, "4.0",
    )
    + _pairs(
        0, "LWPOLYLINE", 5, "2C", 8, "parcels", 90, "4", 70, "1",
        10, "0.0", 20, "0.0", 10, "2.0", 20, "0.0",
        10, "2.0", 20, "2.0", 10, "0.0", 20, "2.0",
    )
    + _pairs(0, "TEXT", 5, "2D", 8, "labels", 10, "5.0", 20, "6.0", 1, "hello")
    + _pairs(0, "POLYLINE", 5, "2E", 8, "paths", 70, "0")
    + _pairs(0, "VERTEX", 10, "0.0", 20, "0.0")
    + _pairs(0, "VERTEX", 10, "1.0", 20, "1.0")
    + _pairs(0, "VERTEX", 10, "2.0", 20, "0.0")
    + _pairs(0, "SEQEND")
    + _pairs(0, "INSERT", 5, "2F", 8, "blocks", 10, "9.0", 20, "9.0")
    + _pairs(0, "ENDSEC", 0, "EOF")
)


@pytest.fixture()
def dxf_path(tmp_path):
    p = tmp_path / "plan.dxf"
    p.write_text(DXF)
    return str(p)


def test_entities_layer_and_attrs(spark, dxf_path):
    df = spark.read.format("gdal").load(dxf_path)
    rows = {r["EntityHandle"]: r for r in df.collect()}
    # INSERT (2F) is an unhandled entity type and must be skipped
    assert set(rows) == {"2A", "2B", "2C", "2D", "2E"}
    assert rows["2A"]["Layer"] == "sites"
    assert rows["2D"]["Text"] == "hello"
    assert rows["2A"]["Text"] is None


def test_geometry_mapping(spark, dxf_path):
    df = spark.read.format("gdal").load(dxf_path)
    rows = {r["EntityHandle"]: r for r in df.collect()}
    t, c = wkb_to_geom(bytes(rows["2A"]["geometry"]))
    assert t == "Point" and c == (1.5, 2.5)
    t, c = wkb_to_geom(bytes(rows["2B"]["geometry"]))
    assert t == "LineString" and c == [(0.0, 0.0), (3.0, 4.0)]
    # closed LWPOLYLINE (flag 70&1) → one-ring Polygon, ring closed
    t, rings = wkb_to_geom(bytes(rows["2C"]["geometry"]))
    assert t == "Polygon"
    assert rings[0] == [(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]
    # open legacy POLYLINE → LineString from its VERTEX stream
    t, c = wkb_to_geom(bytes(rows["2E"]["geometry"]))
    assert t == "LineString" and c == [(0, 0), (1, 1), (2, 0)]


def test_circle_strokes_to_polygon(spark, tmp_path):
    dxf = (
        _pairs(0, "SECTION", 2, "ENTITIES")
        + _pairs(0, "CIRCLE", 5, "30", 8, "c", 10, "1.0", 20, "2.0", 40, "3.0")
        + _pairs(0, "ENDSEC", 0, "EOF")
    )
    p = tmp_path / "circle.dxf"
    p.write_text(dxf)
    df = spark.read.format("gdal").load(str(p))
    [row] = df.collect()
    t, rings = wkb_to_geom(bytes(row["geometry"]))
    assert t == "Polygon" and len(rings[0]) == 73  # 72 segments + closure
    xs = [pt[0] for pt in rings[0]]
    ys = [pt[1] for pt in rings[0]]
    assert max(xs) == pytest.approx(4.0) and min(xs) == pytest.approx(-2.0)
    assert max(ys) == pytest.approx(5.0) and min(ys) == pytest.approx(-1.0)


def test_driver_allowlist_and_fid(spark, dxf_path):
    df = (
        spark.read.format("gdal")
        .option("drivers", "DXF")
        .option("fidColumn", "fid")
        .load(dxf_path)
    )
    assert [r["fid"] for r in df.orderBy("fid").collect()] == [0, 1, 2, 3, 4]


def test_non_ascii_text_escapes_and_roundtrips(spark, tmp_path):
    """Non-ASCII TEXT/layer values travel as AutoCAD \\U+XXXX escapes in
    the ASCII DXF and decode back on read (GDAL's convention). The old
    writer crashed with UnicodeEncodeError."""
    df = spark.createDataFrame(
        [("Ā北京", "Ωmega layer")], "Text string, Layer string"
    ).selectExpr(
        "Layer", "Text",
        "unhex('0101000000000000000000F03F0000000000000040') AS geometry",
    )
    out = str(tmp_path / "uni.dxf")
    df.write.format("gdal").mode("overwrite").save(out)
    raw = open(out, encoding="ascii").read()  # pure ASCII on disk
    assert "\\U+0100" in raw and "\\U+03A9" in raw
    [row] = spark.read.format("gdal").load(out).collect()
    assert row["Text"] == "Ā北京" and row["Layer"] == "Ωmega layer"
