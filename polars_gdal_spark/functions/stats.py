"""Exact distributed order statistics (discrete percentiles).

The naive formulation — ``row_number() OVER (ORDER BY v)`` — moves the
whole table through ONE partition (Spark's WindowExec warns about
exactly this), which is fine at sf0.1 and fatal at 100 TB.  This module
computes the same exact k-th order statistics with no unpartitioned
window anywhere:

1. value histogram ``groupBy(v).count()`` — one parallel shuffle that
   also collapses duplicate values (the histogram is <= |distinct|
   rows of 16 bytes, far smaller than the input);
2. ``repartitionByRange`` on the value — Spark samples range bounds, so
   skewed value distributions still split evenly; the assignment is
   pinned with ``localCheckpoint`` so the two consumers below see the
   same partitioning;
3. per-range-partition count totals — at most ``num_partitions`` rows,
   collected to the driver to form cumulative offsets (the standard
   "per-partition offsets" trick for distributed ranking);
4. a *partitioned* cumulative-sum window plus the broadcast offsets
   gives every distinct value its global "rows <= v" count;
5. the value at ascending rank k (1-indexed) is the smallest v whose
   cumulative count >= k — a plain aggregate.

Total cost: one scan of the input, one small shuffle of the histogram,
one 1-row result.  Every stage is parallel.

Reference parity note: the reference (phayes/polars_gdal) delegates all
analytics to OGR SQL, which has no percentile support at all
(`src/lib.rs:316-318`); this operator is engine-side added value.
"""

from __future__ import annotations

from typing import Mapping

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    percentiles: Mapping[str, int],
    num_partitions: int = 32,
) -> DataFrame:
    """1-row DataFrame of exact discrete percentiles (lower method).

    ``percentiles`` maps output alias -> integer percent p; the value
    reported for p is the order statistic at 1-indexed ascending rank
    ``(n - 1) * p // 100 + 1`` — identical to the ``row_number``
    formulation DuckDB runs in the oracle, but computed scalably.

    Builds eagerly: the histogram is materialized (localCheckpoint) and
    the tiny per-partition totals are collected while constructing the
    result plan.  The returned DataFrame reads only the checkpointed
    histogram.
    """
    spark = df.sparkSession
    hist = (
        df.groupBy(F.col(value_col).alias("_v"))
        .agg(F.count("*").alias("_cnt"))
        .repartitionByRange(num_partitions, "_v")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    per_pid = sorted(
        (r["_pid"], r["_pc"])
        for r in hist.groupBy("_pid").agg(F.sum("_cnt").alias("_pc")).collect()
    )
    n = sum(pc for _, pc in per_pid)
    offsets, running = [], 0
    for pid, pc in per_pid:
        offsets.append((pid, running))
        running += pc
    off_df = spark.createDataFrame(offsets, "_pid int, _off bigint")
    w = Window.partitionBy("_pid").orderBy("_v")
    cum = hist.join(F.broadcast(off_df), "_pid").withColumn(
        "_cum", F.sum("_cnt").over(w) + F.col("_off")
    )
    aggs = []
    for alias, p in percentiles.items():
        k = (n - 1) * p // 100 + 1 if n else 0
        aggs.append(
            F.min(F.when(F.col("_cum") >= F.lit(k), F.col("_v"))).alias(alias)
        )
    return cum.agg(*aggs)


def ordered_cumsum(
    df: DataFrame,
    order_cols,
    weight_col: str,
    num_partitions: int = 32,
) -> DataFrame:
    """Add global rank (``_rn``) and running-total (``_cum``) columns
    under ``order_cols`` ordering — WITHOUT an unpartitioned window.

    Same per-partition-offsets construction as :func:`exact_percentiles`,
    generalized to arbitrary sort expressions and a weighted cumulative
    sum: ``repartitionByRange`` on the ordering (sampled range bounds,
    so skew still splits evenly), per-partition row/weight totals
    collected to the driver (``num_partitions`` rows — driver-local by
    contract), then a PARTITIONED cumulative window plus the broadcast
    offsets. Every stage is parallel; the input is scanned once.

    The input is pinned with ``localCheckpoint`` so the two consumers
    (offset totals, the ranked output) see one materialization of the
    same partition assignment.
    """
    spark = df.sparkSession
    part = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    per_pid = sorted(
        (r["_pid"], r["_rows"], r["_wsum"])
        for r in part.groupBy("_pid")
        .agg(
            F.count("*").alias("_rows"),
            F.sum(weight_col).alias("_wsum"),
        )
        .collect()
    )
    # Type the weight offset from the weight column's dtype: integral
    # weights keep exact bigint offsets; fractional (float/double/decimal)
    # weights accumulate as Python floats, which a bigint schema would
    # reject — use double for those.
    wtype = dict(df.dtypes)[weight_col]
    integral = wtype in ("tinyint", "smallint", "int", "bigint")
    offsets, rows_run = [], 0
    w_run = 0 if integral else 0.0
    for pid, nrows, wsum in per_pid:
        offsets.append((pid, rows_run, w_run))
        rows_run += nrows
        w_run += (wsum or 0) if integral else float(wsum or 0)
    off_df = spark.createDataFrame(
        offsets,
        f"_pid int, _rows_off bigint, _w_off {'bigint' if integral else 'double'}",
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        part.join(F.broadcast(off_df), "_pid")
        .withColumn("_rn", F.row_number().over(w) + F.col("_rows_off"))
        .withColumn("_cum", F.sum(weight_col).over(w) + F.col("_w_off"))
        .drop("_pid", "_rows_off", "_w_off")
    )


def cusum_positive(
    df: DataFrame,
    group_col: str,
    order_cols,
    y_col: str,
    out_col: str = "cusum",
) -> DataFrame:
    """Per-group one-sided CUSUM statistic, integer-exact and
    window-parallel.

    The textbook recurrence ``s_i = max(0, s_{i-1} + y_i)`` is not
    associative, but it has a closed form that IS expressible with two
    running windows: with prefix sums ``P_i = y_1 + … + y_i``,

        ``s_i = P_i - min(0, min_{j<=i} P_j)``

    (the clamp at zero is equivalent to restarting the sum after the
    lowest prefix seen so far).  Both the running sum and the running
    min are ordinary cumulative window aggregates PARTITIONED by the
    group — no unpartitioned window, map-parallel per group, and with
    integral ``y_col`` every intermediate is an exact BIGINT, so the
    result is identical across engines and partitionings.

    Adds ``out_col`` to the input rows; callers aggregate peaks or
    threshold crossings on top.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Two chained cumulative aggregates over the SAME window spec —
    # Catalyst fuses them into one WindowExec (one sort, one pass).
    return (
        df.withColumn("_pre", F.sum(y_col).over(w))
        .withColumn(
            out_col, F.col("_pre") - F.least(F.lit(0), F.min("_pre").over(w))
        )
        .drop("_pre")
    )
