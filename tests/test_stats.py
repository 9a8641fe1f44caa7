"""Unit tests for functions.stats (order statistics without global windows).

``ordered_cumsum`` advertises a general weighted cumulative sum; round-3
advice flagged that a fractional weight column hit the hard-coded bigint
offset schema. These tests pin integral AND double weight columns to a
single-partition pandas oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from polars_gdal_spark.functions.stats import ordered_cumsum


def _oracle(rows, key=lambda r: r[0]):
    rows = sorted(rows, key=key)
    out, run = [], 0.0
    for r in rows:
        run += r[1]
        out.append((r[0], r[1], run))
    return out


def test_ordered_cumsum_integral_weights(spark):
    # Unique (k, w) ordering keys: Spark's cumulative window uses a RANGE
    # frame, so tied keys would share a cumsum and break a row-wise oracle.
    rows = [(i % 17, i) for i in range(200)]
    df = spark.createDataFrame(rows, "k int, w int")
    got = (
        ordered_cumsum(df, [F.col("k").asc(), F.col("w").asc()], "w", num_partitions=5)
        .orderBy("_rn")
        .collect()
    )
    exp = _oracle(rows, key=lambda r: (r[0], r[1]))
    assert [r["_rn"] for r in got] == list(range(1, len(rows) + 1))
    assert [(r["k"], r["w"], r["_cum"]) for r in got] == [
        (k, w, int(c)) for k, w, c in exp
    ]


def test_ordered_cumsum_double_weights(spark):
    rows = [(float(i % 13), i * 0.25 + 0.25) for i in range(150)]
    df = spark.createDataFrame(rows, "k double, w double")
    got = (
        ordered_cumsum(df, [F.col("k").asc(), F.col("w").asc()], "w", num_partitions=4)
        .orderBy("_rn")
        .collect()
    )
    exp = _oracle(rows, key=lambda r: (r[0], r[1]))
    assert [r["_rn"] for r in got] == list(range(1, len(rows) + 1))
    for g, (k, w, c) in zip(got, exp):
        assert g["k"] == k and g["w"] == w
        assert abs(g["_cum"] - c) < 1e-9
