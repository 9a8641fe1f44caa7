"""EWKB decode unit tests (sources/postgis.py) — no server needed.

Fixture bytes are hand-assembled per the PostGIS EWKB wire format
(flags on the type word: 0x20000000 SRID-present, 0x80000000 Z;
either byte order), matching what the reference reads through GDAL's
PostGIS driver (src/test.rs:72-84).
"""

from __future__ import annotations

import struct

from polars_gdal_spark.geometry import geom_to_wkb, wkb_to_geom
from polars_gdal_spark.sources.postgis import ewkb_hex_col, ewkb_to_wkb

SRID_FLAG = 0x20000000
Z_FLAG = 0x80000000


def _le(type_word: int, *doubles: float, srid: int | None = None) -> bytes:
    out = b"\x01" + struct.pack("<I", type_word)
    if srid is not None:
        out += struct.pack("<I", srid)
    return out + struct.pack(f"<{len(doubles)}d", *doubles)


def test_point_with_srid_flag():
    ewkb = _le(1 | SRID_FLAG, 2.5, -3.25, srid=4326)
    wkb = ewkb_to_wkb(ewkb)
    assert wkb == geom_to_wkb(("Point", (2.5, -3.25)))
    assert wkb_to_geom(wkb) == ("Point", (2.5, -3.25))


def test_point_z_flag_maps_to_iso_1001():
    ewkb = _le(1 | Z_FLAG, 1.0, 2.0, 3.0)
    wkb = ewkb_to_wkb(ewkb)
    assert struct.unpack_from("<I", wkb, 1)[0] == 1001
    assert wkb_to_geom(wkb) == ("Point", (1.0, 2.0, 3.0))


def test_point_srid_and_z():
    ewkb = _le(1 | SRID_FLAG | Z_FLAG, 7.0, 8.0, 9.0, srid=3857)
    assert wkb_to_geom(ewkb_to_wkb(ewkb)) == ("Point", (7.0, 8.0, 9.0))


def test_big_endian_point():
    ewkb = b"\x00" + struct.pack(">I", 1) + struct.pack(">2d", 5.0, 6.0)
    assert ewkb_to_wkb(ewkb) == geom_to_wkb(("Point", (5.0, 6.0)))


def test_polygon_with_srid():
    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0)]
    body = struct.pack("<I", 1) + struct.pack("<I", len(ring))
    for x, y in ring:
        body += struct.pack("<2d", x, y)
    ewkb = b"\x01" + struct.pack("<I", 3 | SRID_FLAG) + struct.pack("<I", 4326) + body
    assert wkb_to_geom(ewkb_to_wkb(ewkb)) == ("Polygon", [ring])


def test_plain_wkb_passthrough():
    wkb = geom_to_wkb(("LineString", [(0.0, 0.0), (1.0, 2.0)]))
    assert ewkb_to_wkb(wkb) == wkb


def test_ewkb_hex_column_udf(spark):
    ewkb = _le(1 | SRID_FLAG, 10.0, 20.0, srid=4326)
    df = spark.createDataFrame(
        [(ewkb.hex(),), (None,)], "geom_hex string"
    )
    rows = df.select(ewkb_hex_col(df.geom_hex).alias("g")).collect()
    got = [None if r["g"] is None else bytes(r["g"]) for r in rows]
    assert geom_to_wkb(("Point", (10.0, 20.0))) in got
    assert None in got
