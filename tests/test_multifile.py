"""Multi-file reads: directory/glob fan-out, cross-file schema union
(per-file drift semantics), remote URL handling."""

from __future__ import annotations

import json
import socket

import pytest


def _write(dirpath, name: str, features: list[dict]) -> None:
    with open(dirpath / name, "w") as f:
        json.dump({"type": "FeatureCollection", "features": features}, f)


def _feat(props: dict, x: float = 1.0) -> dict:
    return {
        "type": "Feature",
        "geometry": {"type": "Point", "coordinates": [x, x]},
        "properties": props,
    }


def test_directory_fan_out(spark, tmp_path):
    d = tmp_path / "many"
    d.mkdir()
    for i in range(4):
        _write(d, f"part{i}.geojson", [_feat({"a": i * 10 + j}) for j in range(5)])
    df = spark.read.format("gdal").load(str(d))
    assert df.count() == 20
    assert df.rdd.getNumPartitions() >= 4


def test_cross_file_schema_union(spark, tmp_path):
    d = tmp_path / "ragged"
    d.mkdir()
    _write(d, "a.geojson", [_feat({"a": 1, "shared": 5})])
    _write(d, "b.geojson", [_feat({"b": "only-in-b", "shared": 6.5})])
    df = spark.read.format("gdal").load(str(d))
    # union: a (from file 1), shared (widened bigint+double->double), b
    assert df.columns == ["a", "shared", "b", "geometry"]
    assert dict(df.dtypes)["shared"] == "double"
    rows = {r["shared"]: (r["a"], r["b"]) for r in df.collect()}
    assert rows[5.0] == (1, None)
    assert rows[6.5] == (None, "only-in-b")


def test_conflicting_types_widen_to_string(spark, tmp_path):
    d = tmp_path / "conflict"
    d.mkdir()
    _write(d, "a.geojson", [_feat({"v": 42})])
    _write(d, "b.geojson", [_feat({"v": "forty-two"})])
    df = spark.read.format("gdal").load(str(d))
    assert dict(df.dtypes)["v"] == "string"
    assert {r["v"] for r in df.collect()} == {"42", "forty-two"}


def _has_network() -> bool:
    try:
        socket.create_connection(("raw.githubusercontent.com", 443), 2).close()
        return True
    except OSError:
        return False


@pytest.mark.skipif(not _has_network(), reason="no network in this environment")
def test_https_read(spark):
    # the reference's HTTPS test target (src/test.rs:86-94)
    url = (
        "https://raw.githubusercontent.com/phayes/polars_gdal/main/"
        "test_data/us_states.feature_collection.implicit_4326.json"
    )
    df = spark.read.format("gdal").load(url)
    assert df.count() == 51


def test_spatial_partition_pruning(spark, tmp_path):
    """Multi-file read with bbox skips whole files via header/index
    envelopes (shapefile header bbox; FGB R-tree root node), and an
    all-pruned read yields an empty result, not an error."""
    import pyspark.sql.functions as F

    from polars_gdal_spark.functions import geo
    from polars_gdal_spark.sources.datasource import GdalDataSourceReader, infer_schema
    from polars_gdal_spark.sources.formats.flatgeobuf import FlatGeobufDriver

    d = tmp_path / "tiles"
    d.mkdir()
    for tile, x0 in (("west", 0), ("east", 100)):
        df = spark.range(5).select(
            (F.col("id") + x0).alias("n"),
            geo.wkt_to_wkb_col(
                F.format_string("POINT (%d 5)", F.col("id") + x0)
            ).alias("geometry"),
        )
        (
            df.coalesce(1).write.format("gdal")
            .option("driver", "FlatGeobuf")
            .option("spatialIndex", "true")
            .mode("overwrite")
            .save(str(d / f"{tile}.fgb"))
        )

    fgb = FlatGeobufDriver()
    bb_west = fgb.layer_bbox(str(d / "west.fgb"), "layer", {})
    assert bb_west == (0.0, 5.0, 4.0, 5.0)

    # reader-level: only the east file survives pruning
    opts = {"path": str(d), "bbox": "100,0,200,10"}
    reader = GdalDataSourceReader(infer_schema(opts), opts)
    parts = reader.partitions()
    assert len(parts) == 1 and parts[0].path.endswith("east.fgb")

    got = {
        r["n"]
        for r in spark.read.format("gdal")
        .option("bbox", "100,0,200,10")
        .load(str(d))
        .collect()
    }
    assert got == {100, 101, 102, 103, 104}

    none = (
        spark.read.format("gdal")
        .option("bbox", "50,50,60,60")
        .load(str(d))
    )
    assert none.count() == 0
