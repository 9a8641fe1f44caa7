"""Temporal join operators (engine extensions; absent in the reference,
SURVEY §2.E notes range/as-of joins as Spark-native capabilities).

``as_of_join`` implements the classic time-series "latest right row at or
before each left row" without a non-equi join: both sides are unioned,
sorted once per key, and the right values are carried forward with a
last-value window. One shuffle on the key — O(n log n) per key instead
of the O(n·m) nested-loop a naive range join degenerates to. This is the
shape that survives 100 TB of ticks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    time_col: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row with the same
    key and ``right.time <= left.time``.

    Ties (equal timestamps) resolve to the right row — "at or before"
    semantics, matching DuckDB's ``ASOF JOIN`` (its ``>=`` inequality),
    which is the oracle used in the driver contract.
    """
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in (on, time_col)
        ]
    lcols = left.columns

    l_tag = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        *[
            F.col(c) if c in (on, time_col) else F.lit(None).cast(
                left.schema[c].dataType
            ).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows (side 0) sort before left rows at equal time → "at or
    # before" includes same-timestamp right rows
    w = (
        Window.partitionBy(on)
        .orderBy(time_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "_side",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )
    return carried.where(F.col("_side") == 1).drop("_side")


def as_of_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    time_col: str,
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    tiebreak_col: str | None = None,
    suffix: str = "_next",
) -> DataFrame:
    """Forward as-of: for each left row, the EARLIEST right row with the
    same key and ``right.time >= left.time`` (optionally within
    ``tolerance_seconds``) — "next event after" semantics.

    Same union-sort-carry shape as :func:`as_of_join` (one shuffle per
    key, no non-equi join): right rows sort after left rows at equal
    timestamps (so "at or after" includes same-instant rights), ties
    among simultaneous right rows break on ``tiebreak_col``, and a
    forward-looking ``first_value`` carries the next right row back.
    Tolerance is applied after the carry by nulling out columns whose
    attached right time is too far ahead — the window itself stays
    unbounded, which keeps it a single pass.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, time_col)]
    carry = list(right_cols) + [time_col]
    lcols = left.columns

    l_tag = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in carry
        ],
    )
    tie = (
        F.col(tiebreak_col).cast("long")
        if tiebreak_col
        else F.lit(0).cast("long")
    )
    r_tag = right.select(
        *[
            F.col(c)
            if c in (on, time_col)
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        tie.alias("_tie"),
        *[F.col(c).alias(f"_r_{c}") for c in carry],
    )
    unioned = l_tag.unionByName(r_tag)
    # left rows (side 1) sort BEFORE right rows at equal time under
    # descending _side → the forward window from a left row includes
    # same-timestamp rights; _tie orders simultaneous rights.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(time_col).asc(), F.col("_side").desc(), F.col("_tie").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        *lcols,
        "_side",
        *[
            F.first(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in carry
        ],
    )
    out = carried.where(F.col("_side") == 1).drop("_side")
    if tolerance_seconds is not None:
        within = F.col(f"{time_col}{suffix}") <= F.col(time_col) + F.expr(
            f"INTERVAL {int(tolerance_seconds)} SECOND"
        )
        for c in carry:
            out = out.withColumn(
                f"{c}{suffix}", F.when(within, F.col(f"{c}{suffix}"))
            )
    return out
