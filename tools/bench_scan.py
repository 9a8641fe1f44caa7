"""Micro-benchmark: gdal-datasource scan/write throughput on the
REFERENCE'S OWN fixture files (BASELINE.md "reference-derived
micro-baselines" rows) — read-only use of /root/reference/test_data.

Prints one JSON line: per-fixture median wall time over 5 runs (after
2 warmups) and derived features/sec. The reference publishes no
numbers, so these are OUR measurements on ITS fixtures — the
apples-to-apples scan-path comparison the baseline doc calls for.

Usage: python tools/bench_scan.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from polars_gdal_spark.session import get_spark  # noqa: E402

FIXTURES = "/root/reference/test_data"


def _median_time(fn, warmups: int = 2, runs: int = 5) -> float:
    for _ in range(warmups):
        fn()
    ts = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return statistics.median(ts)


def main() -> None:
    import polars_gdal_spark as pg

    spark = get_spark("bench_scan")
    spark.sparkContext.setLogLevel("ERROR")
    pg.register_gdal_source(spark)

    out: dict[str, dict] = {}
    scans = [
        ("lakes_geojson", "global_large_lakes.feature_collection.implicit_4326.json"),
        ("us_states_geojson", "us_states.feature_collection.implicit_4326.json"),
        ("stations_shapefile", "stations.shp"),
        ("countries_csv", "lat_lon_countries.csv"),
        ("cities_arrow", "cities.arrow"),
    ]
    for name, fname in scans:
        path = os.path.join(FIXTURES, fname)
        if not os.path.exists(path):
            continue
        df = spark.read.format("gdal").load(path)
        n = df.count()
        med = _median_time(lambda d=df: d.count())
        out[name] = {
            "rows": n,
            "sec": round(med, 4),
            "rows_per_sec": round(n / med) if med > 0 else None,
        }

    # write path: cities.arrow -> GeoJSON (the reference's own
    # write-roundtrip fixture shape, src/test.rs:146-158)
    cities = spark.read.format("gdal").load(
        os.path.join(FIXTURES, "cities.arrow")
    )
    cities = cities.localCheckpoint(eager=True)
    tmp = tempfile.mkdtemp()

    def write_once():
        cities.write.format("gdal").mode("overwrite").option(
            "driver", "GeoJSON"
        ).save(os.path.join(tmp, "cities_out.geojson"))

    medw = _median_time(write_once)
    out["cities_write_geojson"] = {
        "rows": cities.count(),
        "sec": round(medw, 4),
        "rows_per_sec": round(cities.count() / medw) if medw > 0 else None,
    }
    print(json.dumps({"metric": "reference_fixture_scan", "fixtures": out}))


if __name__ == "__main__":
    main()
