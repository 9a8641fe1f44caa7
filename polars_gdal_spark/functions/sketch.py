"""Sketch-based operators: bounded-memory candidate generation with
exact verification.

The pattern that makes "top items over 100 TB" tractable: a per-partition
streaming sketch (here Misra-Gries) reduces the candidate space to a
bounded set with a coverage GUARANTEE, then one exact counting pass over
just the candidates produces an exact answer. The sketch is approximate
and partition-order-dependent; the final result is exact and
engine-reproducible — which is why the driver's DuckDB oracle can check
it with a plain GROUP BY.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame


def _mg_candidates(m: int, value_col: str):
    """mapInPandas kernel: Misra-Gries summary with ``m`` counters per
    partition; emits the partition's surviving candidate values.

    Guarantee: any value whose PARTITION count exceeds n_p/m survives
    that partition's summary; by pigeonhole, any value whose GLOBAL
    count exceeds n/m survives in at least one partition. Memory is
    O(m) regardless of partition size."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters: dict = {}
        for pdf in batches:
            for v in pdf[value_col]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < m:
                    counters[v] = 1
                else:
                    # decrement-all step (amortized via dict rebuild)
                    counters = {
                        key: c - 1 for key, c in counters.items() if c > 1
                    }
        yield pd.DataFrame({value_col: list(counters.keys())})

    return run


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    phi_denom: int,
    sketch_counters: int | None = None,
) -> DataFrame:
    """EXACT φ-heavy hitters (count > n/``phi_denom``) in two passes.

    Pass 1 — candidates: per-partition Misra-Gries with
    ``sketch_counters`` (default ``4 * phi_denom``) counters over Arrow
    batches; with counters ≥ phi_denom the union of partition survivors
    provably contains every global heavy hitter. The union is at most
    ``partitions × counters`` values — tiny next to the data — and is
    broadcast.

    Pass 2 — verify: exact counts for candidate rows only (map-side
    combinable groupBy on the pre-filtered stream), thresholded against
    the exact total. Output (value, n) is exact, independent of
    partitioning, and matches a plain GROUP BY oracle.
    """
    m = sketch_counters or 4 * phi_denom
    if m < phi_denom:
        # fewer counters than phi_denom breaks the Misra-Gries pigeonhole
        # guarantee: a global heavy hitter could be evicted in every
        # partition and silently vanish from the "exact" result
        raise ValueError(
            f"sketch_counters ({m}) must be >= phi_denom ({phi_denom}) "
            "for the candidate set to provably cover all heavy hitters"
        )
    src = df.select(F.col(value_col).alias("v")).where(F.col("v").isNotNull())
    # candidate schema mirrors the input column's type — hardcoding
    # 'string' would silently cast non-string values across the join
    vtype = df.schema[value_col].dataType
    cands = src.mapInPandas(
        _mg_candidates(m, "v"), T.StructType([T.StructField("v", vtype)])
    ).distinct()
    total = src.agg(F.count("*").alias("_n"))
    return (
        src.join(F.broadcast(cands), "v")
        .groupBy("v")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(total))
        .where(F.col("n") * phi_denom > F.col("_n"))
        .select(F.col("v").alias(value_col), "n")
    )
