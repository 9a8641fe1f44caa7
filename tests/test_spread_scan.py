"""spread_scan: the CPU-dense-stage rebalancing hint.

Contract under test (functions/__init__.py):

* fires (adds a hash exchange to factor x slots partitions) only when
  the source yields fewer splits than the cluster has task slots AND
  the source is at least ``min_bytes``;
* no-ops — returning the SAME DataFrame object, so plans stay
  byte-identical — when the source is already wide enough or too small
  to be worth an exchange;
* never changes values, only partitioning.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from polars_gdal_spark.functions import spread_scan


def _parts(df) -> int:
    return df.rdd.getNumPartitions()


def test_noop_below_min_bytes(spark):
    df = spark.range(100).coalesce(1)
    out = spread_scan(df, "id")  # ~800 bytes << 4 MB default floor
    assert out is df


def test_fires_on_narrow_large_source(spark):
    df = spark.range(20_000).coalesce(1).select(
        "id", F.repeat(F.lit("x"), 64).alias("pad")
    )
    out = spread_scan(df, "id", min_bytes=1)
    slots = spark.sparkContext.defaultParallelism
    assert _parts(out) == 2 * slots
    # values unchanged, only the layout
    assert out.count() == 20_000
    assert out.agg(F.sum("id")).first()[0] == sum(range(20_000))


def test_noop_when_already_wide(spark):
    slots = spark.sparkContext.defaultParallelism
    df = spark.range(10_000).repartition(slots + 1)
    out = spread_scan(df, "id", min_bytes=1)
    assert out is df


def test_keyless_round_robin(spark):
    df = spark.range(5_000).coalesce(1)
    out = spread_scan(df, min_bytes=1)
    assert _parts(out) == 2 * spark.sparkContext.defaultParallelism
    assert out.count() == 5_000


def test_driver_fixture_scales_stay_unchanged(spark):
    """The driver's sf0.001/sf0.01/sf0.1 documents tables are all below
    the 4 MB floor, so every oracle-gated plan at driver scales is
    byte-identical to the pre-helper one."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert spread_scan(df, "doc_id") is df
