"""Bucketed-table co-located join: the shuffle-elimination technique for
repeated big-big joins at 100 TB (SCALE.md). Writing both sides bucketed
by the join key lets SortMergeJoin read co-located buckets directly —
the plan must contain NO Exchange on either side."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from polars_gdal_spark.queries import load_tables
from tests.conftest import SF_SMOKE


@pytest.fixture()
def no_broadcast(spark):
    """Force SortMergeJoin so the Exchange assertion is meaningful."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_bucketed_join_skips_both_exchanges(spark, no_broadcast):
    events = load_tables(spark, SF_SMOKE)["events"]
    users = events.groupBy("user_id").agg(F.count("*").alias("n"))
    for t in ("ev_b", "us_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        (
            events.write.bucketBy(8, "user_id")
            .sortBy("user_id")
            .mode("overwrite")
            .saveAsTable("ev_b")
        )
        (
            users.write.bucketBy(8, "user_id")
            .sortBy("user_id")
            .mode("overwrite")
            .saveAsTable("us_b")
        )
        joined = spark.table("ev_b").join(spark.table("us_b"), "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # both sides read pre-bucketed
        # and the join result is still correct
        assert joined.count() == events.count()
    finally:
        for t in ("ev_b", "us_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_unbucketed_join_needs_exchanges(spark, no_broadcast):
    """Control: the same join over plain parquet shuffles both sides —
    the cost bucketing removes."""
    events = load_tables(spark, SF_SMOKE)["events"]
    users = events.groupBy("user_id").agg(F.count("*").alias("n"))
    joined = events.join(users, "user_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan


def test_bucketed_tables_isolate_sf_dirs(spark):
    """Two sf_dirs in ONE session must not share bucketed tables: the
    round-5 review found the cache keyed by sf_dir while catalog names
    were fixed, so the second build silently repointed the first's
    tables. Names now carry an sf-dir digest — counts must match each
    source even when queried after the other sf_dir's build."""
    from polars_gdal_spark.queries import load_tables
    from polars_gdal_spark.queries.pipeline import _bucketed_tables

    sf_a, sf_b = "/root/testdata/sf0.001", "/root/testdata/sf0.01"
    ot_a, lt_a = _bucketed_tables(spark, sf_a)
    ot_b, lt_b = _bucketed_tables(spark, sf_b)
    assert {ot_a, lt_a}.isdisjoint({ot_b, lt_b})
    # sf_a's cached names still read sf_a's data AFTER sf_b's build
    n_a = spark.table(lt_a).count()
    n_b = spark.table(lt_b).count()
    assert n_a == load_tables(spark, sf_a)["lineitem"].count()
    assert n_b == load_tables(spark, sf_b)["lineitem"].count()
    assert n_a != n_b
