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
