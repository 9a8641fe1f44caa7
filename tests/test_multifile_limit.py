"""Global offset/limit/maxRows semantics over multi-file inputs.

A glob/directory read with offset/limit/maxRows must behave as ONE
sequential stream over all files in path order (reference semantics:
single-threaded whole-read, src/lib.rs:361-370) — not per-file counters
that would return up to N rows per file or skip the offset in every
file.
"""

from __future__ import annotations

import json
import os

import pytest

from polars_gdal_spark.errors import FeatureLimitReachedError


def _write_geojson(path: str, names: list[str]) -> None:
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"name": n},
                "geometry": {"type": "Point", "coordinates": [i, i]},
            }
            for i, n in enumerate(names)
        ],
    }
    with open(path, "w") as f:
        json.dump(fc, f)


@pytest.fixture()
def three_files(tmp_path):
    # path order = lexicographic: a.geojson (3 rows), b (3), c (3)
    _write_geojson(os.path.join(tmp_path, "a.geojson"), ["a0", "a1", "a2"])
    _write_geojson(os.path.join(tmp_path, "b.geojson"), ["b0", "b1", "b2"])
    _write_geojson(os.path.join(tmp_path, "c.geojson"), ["c0", "c1", "c2"])
    return str(tmp_path)


def test_limit_is_global(spark, three_files):
    df = (
        spark.read.format("gdal")
        .option("limit", 4)
        .load(os.path.join(three_files, "*.geojson"))
    )
    names = sorted(r["name"] for r in df.collect())
    assert names == ["a0", "a1", "a2", "b0"]


def test_offset_is_global(spark, three_files):
    df = (
        spark.read.format("gdal")
        .option("offset", 7)
        .load(os.path.join(three_files, "*.geojson"))
    )
    names = sorted(r["name"] for r in df.collect())
    assert names == ["c1", "c2"]


def test_offset_plus_limit_window(spark, three_files):
    df = (
        spark.read.format("gdal")
        .option("offset", 2)
        .option("limit", 3)
        .load(os.path.join(three_files, "*.geojson"))
    )
    names = sorted(r["name"] for r in df.collect())
    assert names == ["a2", "b0", "b1"]


def test_max_rows_errors_globally(spark, three_files):
    df = (
        spark.read.format("gdal")
        .option("maxRows", 5)
        .load(os.path.join(three_files, "*.geojson"))
    )
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "FeatureLimitReached" in str(ei.value) or "5" in str(ei.value)


def test_plain_multifile_still_parallel(spark, three_files):
    df = spark.read.format("gdal").load(
        os.path.join(three_files, "*.geojson")
    )
    assert df.count() == 9
