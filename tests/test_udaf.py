"""Pandas UDAF surface (SURVEY §2.L): grouped-agg trimmed mean,
checked against an independent reference and for partition-layout
independence (the determinism contract of the sorted implementation)."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F

from polars_gdal_spark.functions.udaf_ops import trimmed_mean_10
from polars_gdal_spark.queries import load_tables
from tests.conftest import SF_SMOKE


def _reference(values):
    a = np.sort(np.array([v for v in values if v is not None], dtype=np.float64))
    k = int(len(a) * 0.10)
    core = a[k : len(a) - k] if len(a) - 2 * k > 0 else a[0:0]
    return float(core.sum() / len(core)) if len(core) else float("nan")


def test_trimmed_mean_matches_reference(spark):
    ev = load_tables(spark, SF_SMOKE)["events"]
    got = {
        r["event_type"]: r["tm"]
        for r in ev.groupBy("event_type")
        .agg(trimmed_mean_10("value").alias("tm"))
        .collect()
    }
    rows = ev.select("event_type", "value").collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    assert set(got) == set(by_type)
    for t, vals in by_type.items():
        assert got[t] == _reference(vals), t


def test_trimmed_mean_partition_independent(spark):
    ev = load_tables(spark, SF_SMOKE)["events"]
    base = ev.groupBy("event_type").agg(
        trimmed_mean_10("value").alias("tm")
    )
    reshaped = (
        ev.repartition(7, "user_id")
        .groupBy("event_type")
        .agg(trimmed_mean_10("value").alias("tm"))
    )
    a = {r["event_type"]: r["tm"] for r in base.collect()}
    b = {r["event_type"]: r["tm"] for r in reshaped.collect()}
    assert a == b


def test_trimmed_mean_degenerate_groups(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("b", None)],
        "g string, v double",
    )
    got = {
        r["g"]: r["tm"]
        for r in df.groupBy("g").agg(trimmed_mean_10("v").alias("tm")).collect()
    }
    assert got["a"] == 1.0
    assert got["b"] is None or math.isnan(got["b"])
