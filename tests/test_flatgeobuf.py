"""FlatGeobuf driver tests: unit-level writer/reader round-trip plus the
Spark DataSource path (read + write, WKB byte-equality vs the shapefile
source — same contract as the other sink round-trips)."""

from __future__ import annotations

import struct

from polars_gdal_spark.sources.formats.flatgeobuf import (
    FlatGeobufDriver,
    _packed_rtree_size,
    write_fgb,
)
from tests.conftest import REF_DATA

STATIONS = f"{REF_DATA}/stations.shp"


def test_fgb_unit_roundtrip(tmp_path):
    feats = [
        (("Point", (1.5, 2.5)), {"name": "a", "n": 1, "x": 1.25, "ok": True}),
        (("Polygon", [[(0, 0), (4, 0), (4, 4), (0, 0)], [(1, 1), (2, 1), (1, 1)]]),
         {"name": None, "n": 3, "x": 2.5, "ok": False}),
        (("MultiPolygon", [[[(0, 0), (1, 0), (1, 1), (0, 0)]]]),
         {"name": "d", "n": None, "x": None, "ok": None}),
        (None, {"name": "h", "n": 8, "x": 8.5, "ok": False}),
    ]
    fields = [("name", "string"), ("n", "bigint"), ("x", "double"), ("ok", "boolean")]
    p = str(tmp_path / "t.fgb")
    write_fgb(p, fields, iter(feats), srs_code=4326)

    d = FlatGeobufDriver()
    assert [f.name for f in d.layer_fields(p, "layer", {})] == [
        "name", "n", "x", "ok",
    ]
    assert d.layer_crs(p, "layer", {}) == "EPSG:4326"
    assert d.feature_count(p, "layer", {}) == 4
    out = list(d.iter_features(p, "layer", {}))
    assert [f.geom for f in out] == [
        ("Point", (1.5, 2.5)),
        ("Polygon", [[(0, 0), (4, 0), (4, 4), (0, 0)], [(1, 1), (2, 1), (1, 1)]]),
        ("MultiPolygon", [[[(0, 0), (1, 0), (1, 1), (0, 0)]]]),
        None,
    ]
    assert out[0].props == {"name": "a", "n": 1, "x": 1.25, "ok": True}
    assert out[2].props == {"name": "d", "n": None, "x": None, "ok": None}


def test_fgb_magic_and_record_alignment(tmp_path):
    p = str(tmp_path / "t.fgb")
    write_fgb(p, [("a", "double")], [(("Point", (1.0, 2.0)), {"a": 3.5})])
    data = open(p, "rb").read()
    assert data[:3] == b"fgb"
    # header starts 8-aligned; every size-prefixed record length is a
    # multiple of 8 so doubles stay naturally aligned in a mapped stream
    pos = 8
    while pos + 4 <= len(data):
        (sz,) = struct.unpack_from("<I", data, pos)
        assert (sz + 4) % 8 == 0
        pos += 4 + sz
    assert pos == len(data)


def test_packed_rtree_size_matches_spec():
    # flatgeobuf packedrtree: 2 items, node 16 → 2 leaves + 1 root = 120 B
    assert _packed_rtree_size(2, 16) == 120
    assert _packed_rtree_size(17, 16) == (17 + 2 + 1) * 40


def test_fgb_spark_roundtrip(spark, tmp_path):
    stations = spark.read.format("gdal").load(STATIONS)
    out = str(tmp_path / "stations.fgb")
    (
        stations.write.format("gdal").mode("overwrite")
        .option("driver", "FlatGeobuf").save(out)
    )
    back = spark.read.format("gdal").load(out)
    assert back.count() == 86
    wkb = lambda df: sorted(  # noqa: E731
        bytes(r["geometry"]) for r in df.select("geometry").collect()
    )
    assert wkb(back) == wkb(stations)
    src = {r["name"]: r["line"] for r in stations.collect()}
    assert {r["name"]: r["line"] for r in back.collect()} == src
