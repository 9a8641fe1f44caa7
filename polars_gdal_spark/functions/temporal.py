"""Temporal join operators (engine extensions; absent in the reference,
SURVEY §2.E notes range/as-of joins as Spark-native capabilities).

``as_of_join`` implements the classic time-series "latest right row at or
before each left row" without a non-equi join: both sides are unioned,
sorted once per key, and the right values are carried forward with a
last-value window. One shuffle on the key — O(n log n) per key instead
of the O(n·m) nested-loop a naive range join degenerates to. This is the
shape that survives 100 TB of ticks.

Both directions carry the attached right row as ONE struct through a
single last/first window, not one window per column: per-column
``ignorenulls`` windows would tear the attached row apart whenever a
right column holds a legitimate NULL (that column alone would skip ahead
to a different right row). The struct is non-null exactly when a right
row is present, so ``ignorenulls`` keys on row presence, never on
individual field values, and the attached row is atomic by construction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, Window


def _right_struct_type(right: DataFrame, cols: list[str]) -> T.StructType:
    return T.StructType(
        [T.StructField(c, right.schema[c].dataType, True) for c in cols]
    )


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
    which is the oracle used in the driver contract. The attached right
    row is atomic: all carried columns come from the same right row even
    when some of its columns are NULL.
    """
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in (on, time_col)
        ]
    lcols = left.columns
    stype = _right_struct_type(right, right_cols)

    l_tag = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(stype).alias("_r"),
    )
    r_tag = right.select(
        *[
            F.col(c) if c in (on, time_col) else F.lit(None).cast(
                left.schema[c].dataType
            ).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("_r"),
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
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    return carried.where(F.col("_side") == 1).select(
        *lcols,
        *[F.col("_r")[c].alias(f"{c}{suffix}") for c in right_cols],
    )


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
    forward-looking ``first_value`` over the single right-row struct
    carries the next right row back atomically. Tolerance is applied
    after the carry by nulling out the whole attached struct when its
    right time is too far ahead — the window itself stays unbounded,
    which keeps it a single pass, and the tolerance can never retain a
    value torn from a beyond-tolerance row because the struct is all-or-
    nothing.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, time_col)]
    carry = list(right_cols) + [time_col]
    lcols = left.columns
    stype = _right_struct_type(right, carry)

    l_tag = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
        F.lit(None).cast(stype).alias("_r"),
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
        F.struct(*[F.col(c).alias(c) for c in carry]).alias("_r"),
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
        F.first("_r", ignorenulls=True).over(w).alias("_r"),
    )
    out = carried.where(F.col("_side") == 1).drop("_side")
    if tolerance_seconds is not None:
        # timestamp time cols take an INTERVAL; numeric time cols are
        # treated as seconds and offset directly
        if isinstance(
            left.schema[time_col].dataType,
            (T.TimestampType, T.TimestampNTZType),
        ):
            bound = F.col(time_col) + F.expr(
                f"INTERVAL {int(tolerance_seconds)} SECOND"
            )
        else:
            bound = F.col(time_col) + F.lit(int(tolerance_seconds))
        out = out.withColumn(
            "_r", F.when(F.col("_r")[time_col] <= bound, F.col("_r"))
        )
    return out.select(
        *lcols,
        *[F.col("_r")[c].alias(f"{c}{suffix}") for c in carry],
    )
