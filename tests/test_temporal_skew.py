"""as_of_join and salted_join unit tests."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from polars_gdal_spark.functions.skew import salted_join
from polars_gdal_spark.functions.temporal import as_of_join


def test_as_of_join_basic(spark):
    trades = spark.createDataFrame(
        [(1, "A", 10), (2, "A", 25), (3, "B", 5), (4, "A", 7)],
        "trade_id bigint, sym string, t bigint",
    )
    quotes = spark.createDataFrame(
        [("A", 8, 100.0), ("A", 20, 101.0), ("A", 25, 102.0), ("B", 9, 50.0)],
        "sym string, t bigint, px double",
    )
    out = {
        r["trade_id"]: r["px_asof"]
        for r in as_of_join(
            trades, quotes, on="sym", time_col="t", right_cols=["px"]
        ).collect()
    }
    assert out[1] == 100.0    # t=10 → quote at 8
    assert out[2] == 102.0    # t=25 → equal-timestamp quote included
    assert out[3] is None     # t=5, earliest B quote is 9 → no match
    assert out[4] is None     # t=7 before first A quote


def test_as_of_join_matches_naive(spark):
    import random

    rng = random.Random(7)
    left = [(i, f"k{rng.randrange(5)}", rng.randrange(1000)) for i in range(200)]
    right = [
        (f"k{rng.randrange(5)}", rng.randrange(1000), float(i)) for i in range(300)
    ]
    ldf = spark.createDataFrame(left, "lid bigint, k string, t bigint")
    rdf = spark.createDataFrame(right, "k string, t bigint, v double")

    got = {
        r["lid"]: r["v_asof"]
        for r in as_of_join(
            ldf, rdf, on="k", time_col="t", right_cols=["v"]
        ).collect()
    }

    by_key: dict = {}
    for k, t, v in right:
        by_key.setdefault(k, []).append((t, v))
    for v in by_key.values():
        v.sort()
    expect = {}
    for lid, k, t in left:
        best = None
        for rt, rv in by_key.get(k, []):
            if rt <= t:
                best = rv
        expect[lid] = best
    assert got == expect


def test_salted_join_equals_plain_join(spark):
    left = spark.createDataFrame(
        [(i, "hot" if i % 3 else f"k{i}") for i in range(300)],
        "id bigint, k string",
    )
    right = spark.createDataFrame(
        [("hot", 1.0)] + [(f"k{i}", float(i)) for i in range(0, 300, 3)],
        "k string, v double",
    )
    plain = sorted(
        (r["id"], r["v"]) for r in left.join(right, "k").collect()
    )
    salted = sorted(
        (r["id"], r["v"]) for r in salted_join(left, right, "k").collect()
    )
    assert plain == salted


def test_as_of_join_nullable_right_cols_atomic(spark):
    """A NULL in one carried right column must NOT tear the attached row:
    every carried column comes from the same (latest at-or-before) right
    row, even when that row holds NULLs."""
    trades = spark.createDataFrame(
        [(1, "A", 30)], "trade_id bigint, sym string, t bigint"
    )
    quotes = spark.createDataFrame(
        [("A", 10, 100.0, "early"), ("A", 20, None, "late")],
        "sym string, t bigint, px double, src string",
    )
    r = as_of_join(
        trades, quotes, on="sym", time_col="t", right_cols=["px", "src"]
    ).collect()[0]
    # latest row at t=20 has px NULL — a per-column ignorenulls carry
    # would leak px=100.0 from the earlier row next to src='late'
    assert r["src_asof"] == "late"
    assert r["px_asof"] is None


def test_as_of_join_forward_nullable_right_cols_atomic(spark):
    from polars_gdal_spark.functions.temporal import as_of_join_forward

    clicks = spark.createDataFrame(
        [(1, "A", 10)], "click_id bigint, sym string, t bigint"
    )
    purchases = spark.createDataFrame(
        [("A", 20, None, "first"), ("A", 30, 5.0, "second")],
        "sym string, t bigint, amount double, label string",
    )
    r = as_of_join_forward(
        clicks, purchases, on="sym", time_col="t",
        right_cols=["amount", "label"],
    ).collect()[0]
    # earliest row at t=20 has amount NULL — per-column carry would pair
    # amount=5.0 (from t=30) with label='first' (from t=20)
    assert r["label_next"] == "first"
    assert r["amount_next"] is None
    assert r["t_next"] == 20


def test_as_of_join_forward_tolerance_nulls_whole_row(spark):
    from polars_gdal_spark.functions.temporal import as_of_join_forward

    clicks = spark.createDataFrame(
        [(1, "A", 10)], "click_id bigint, sym string, t bigint"
    )
    purchases = spark.createDataFrame(
        [("A", 500, None, "far")],
        "sym string, t bigint, amount double, label string",
    )
    r = as_of_join_forward(
        clicks, purchases, on="sym", time_col="t",
        right_cols=["amount", "label"], tolerance_seconds=60,
    ).collect()[0]
    assert r["label_next"] is None and r["amount_next"] is None
    assert r["t_next"] is None
