"""Pandas UDAF (grouped-aggregate UDF) — the SURVEY §2.L custom
AGGREGATE extension point, sibling of the UDTF surface (udtf_ops.py).

Worked example: trimmed mean. Spark ships mean/median/percentile_approx
but no trimmed mean (drop the lowest and highest q-fraction, average
the rest) — the robust location estimate monitoring pipelines use when
a metric has fat tails but MAD is too aggressive. A GROUPED_AGG pandas
UDF receives each group's values as one Arrow-backed Series and returns
one scalar — executor-side, vectorized, one row per group on the wire.

Determinism: the series arrives in shuffle-dependent order, so the
implementation SORTS before trimming and summing — the result is then a
pure function of the group's value multiset, reproducible under any
partitioning (pytest-enforced against an independent reference).

Scale note: unlike applyInPandas (whole group materialized as a
DataFrame), GROUPED_AGG also materializes the group's column per task —
fine for per-key metrics, not for billion-row single groups; salt such
keys first (functions/skew.py) or pre-aggregate. The JVM-expression
histogram tricks (functions/stats.py) stay the preferred path whenever
the statistic can be phrased as order statistics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

_CACHED = None


def _trimmed_mean_10_impl(v: pd.Series) -> float:
    """Mean of the middle 80% (trim 10% from each tail, by count:
    k = floor(n * 0.10) rows dropped per side). NaN/None excluded.
    Empty after trimming → NaN."""
    a = np.sort(v.dropna().to_numpy(dtype=np.float64))
    k = int(len(a) * 0.10)
    core = a[k : len(a) - k] if len(a) - 2 * k > 0 else a[0:0]
    return float(core.sum() / len(core)) if len(core) else float("nan")


def trimmed_mean_10(col):
    """Column expression: 10%-per-tail trimmed mean of ``col`` as a
    GROUPED_AGG pandas UDF. (Constructed lazily — decorating at module
    import would require an active SparkSession for type parsing.)"""
    global _CACHED
    if _CACHED is None:
        _CACHED = pandas_udf(_trimmed_mean_10_impl, DoubleType())
    return _CACHED(col)
