"""Skew-mitigation join helpers.

AQE's skew-join split (enabled in session.py) handles most runtime skew;
``salted_join`` is the explicit version for pathologically hot keys —
the left side's hot keys are sharded into N salts and the right side is
replicated N× so each (key, salt) bucket shuffles independently.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salts: int = 8,
) -> DataFrame:
    """Equi-join on ``on`` with the left side salted and the right side
    replicated ``salts``× — identical results to ``left.join(right, on,
    how)`` for inner/left joins, but a hot key's rows spread over
    ``salts`` reducers instead of one straggler task."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    l = left.withColumn(
        "_salt", (F.abs(F.hash(F.monotonically_increasing_id())) % salts)
    )
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    out = l.join(r, [on, "_salt"], how)
    return out.drop("_salt")
