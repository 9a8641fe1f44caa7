"""Degenerate-input sweep: EVERY registered query must run (not crash)
over a corpus with the right schemas and zero rows.

At 100 TB this is not an edge case — empty partitions, empty date
ranges, and freshly-created tables hit every operator constantly; an
operator that np.stack-crashes or divides by zero on an empty relation
would take the whole job down."""

from __future__ import annotations

import pytest

from polars_gdal_spark.queries import QUERIES, TABLE_NAMES


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("sf_empty")
    for t in TABLE_NAMES:
        (
            spark.read.parquet(f"{src}/{t}.parquet")
            .limit(0)
            .write.mode("overwrite")
            .parquet(str(out / f"{t}.parquet"))
        )
    return str(out)


def test_every_query_survives_empty_corpus(spark, empty_sf):
    failures = []
    for name, spec in QUERIES.items():
        try:
            n = spec.func(spark, empty_sf).count()
            assert n >= 0
        except Exception as e:  # noqa: BLE001 - collecting the full sweep
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)
