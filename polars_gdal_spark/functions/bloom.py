"""Explicit Bloom-filter join prefilters.

The shuffle is the expensive half of a big join. When the dim side is
too large to broadcast as ROWS but its key set fits a few KB of BITS,
a Bloom filter broadcast to the fact side drops non-matching rows
BEFORE the exchange — the classic sideways-information-passing /
runtime-filter trick (Spark's AQE injects these opportunistically;
this module makes the filter explicit, sized, and testable).

Semantics contract: the Bloom filter is a PREFILTER only — it may pass
false positives (bounded by the bits-per-key sizing below) and never
drops a true match; the exact equi-join downstream makes the final
result precise, so the SQL oracle is the plain join. Engine
reproducibility therefore does NOT depend on xxhash64 parity across
engines.

Scale shape: building the filter is one map-side-combinable
``bit_or`` aggregate over the dim keys (m/64 longs to the driver — a
documented bounded collect, like IVF centroids); applying it is pure
codegen'd integral arithmetic per fact row, no extra pass, no join.

Reference parity note: the GDAL reference has no join machinery at all
(joins are delegated to OGR SQL, `README.md:33-44`); this is part of
the engine's large-scale extension surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}


def _normalize_key_expr(key_col: str, key_type: str | None) -> str:
    """xxhash64 is TYPE-SENSITIVE in Spark: the same value hashes
    differently as INT and BIGINT. If build and probe sides carried
    different integral widths, every probe would miss and true matches
    would be silently dropped before the semi join — violating the
    'never drops a true match' contract. All integral keys therefore
    hash through a common BIGINT cast; other types hash as-is."""
    if key_type in _INTEGRAL:
        return f"CAST({key_col} AS BIGINT)"
    return key_col


def _positions_sql(key_expr: str, m_bits: int, n_hashes: int) -> list[str]:
    """SQL exprs for the ``n_hashes`` bit positions of a key (xxhash64
    seeded by hashing a distinct literal alongside the key)."""
    return [
        f"pmod(xxhash64({i}, {key_expr}), {m_bits})"
        for i in range(n_hashes)
    ]


def bloom_bitmap(
    df: DataFrame,
    key_col: str,
    m_bits: int = 8192,
    n_hashes: int = 3,
) -> list[int]:
    """Build the filter: ``m_bits``-bit bitmap as a python list of
    ``m_bits // 64`` longs. One distributed aggregate; the collect is
    the bitmap words (``m_bits/64`` rows max — 8 KiB of bits = 128
    rows), never the keys."""
    assert m_bits % 64 == 0
    key_expr = _normalize_key_expr(key_col, dict(df.dtypes).get(key_col))
    pos = F.explode(
        F.array(
            *[F.expr(p) for p in _positions_sql(key_expr, m_bits, n_hashes)]
        )
    ).alias("_pos")
    words = (
        df.select(pos)
        .select(
            (F.col("_pos") / 64).cast("long").alias("_w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))")
            .alias("_b"),
        )
        .groupBy("_w")
        .agg(F.expr("bit_or(_b)").alias("_bits"))
        .collect()
    )
    bitmap = [0] * (m_bits // 64)
    for r in words:
        bitmap[int(r["_w"])] = int(r["_bits"])
    return bitmap


def bloom_might_contain(
    key_col: str,
    bitmap: list[int],
    n_hashes: int = 3,
    *,
    key_type: str,
) -> Column:
    """Membership predicate Column over a fact-side key column: for each
    hash, test the addressed bit of the broadcast bitmap literal. Pure
    integral expressions — stays inside whole-stage codegen.

    ``key_type`` (the probe column's Spark dtype string, e.g.
    ``dict(df.dtypes)[key_col]``) is REQUIRED: :func:`bloom_bitmap`
    hashes integral build keys through a BIGINT cast, so the probe must
    apply the same normalization or every true member silently fails
    the bit test (xxhash64 is type-sensitive — an optional default here
    would reintroduce the build/probe asymmetry this exists to kill)."""
    m_bits = len(bitmap) * 64
    key_expr = _normalize_key_expr(key_col, key_type)
    arr = "array(" + ",".join(f"CAST({w} AS BIGINT)" for w in bitmap) + ")"
    tests = [
        f"((shiftright(element_at({arr}, CAST(({p}) / 64 AS INT) + 1),"
        f" CAST(({p}) % 64 AS INT)) & 1) = 1)"
        for p in _positions_sql(key_expr, m_bits, n_hashes)
    ]
    return F.expr(" AND ".join(tests))


def bloom_prefiltered_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    bits_per_key: int = 10,
    n_hashes: int = 3,
    max_bits: int = 1 << 20,
) -> DataFrame:
    """Exact semi-join of ``fact`` against ``dim_keys`` with a Bloom
    prefilter sized from the dim cardinality (``bits_per_key`` ≈ 10 →
    ~1% false-positive rate with 3 hashes): non-matching fact rows drop
    before the shuffle, the semi join keeps the result exact. The one
    driver scalar is the dim ``count()``."""
    n = dim_keys.count()
    m_bits = 64
    while m_bits < min(max_bits, max(1024, bits_per_key * max(n, 1))):
        m_bits <<= 1
    fact_t = dict(fact.dtypes).get(fact_key)
    dim_t = dict(dim_keys.dtypes).get(dim_key)
    # a missing/misspelled key must fail as a column error, not as a
    # misleading "type family (None)" mismatch (round-6 ADVICE)
    if fact_t is None:
        raise ValueError(
            f"bloom_prefiltered_semi_join: fact key {fact_key!r} not found;"
            f" fact columns: {', '.join(fact.columns)}"
        )
    if dim_t is None:
        raise ValueError(
            f"bloom_prefiltered_semi_join: dim key {dim_key!r} not found;"
            f" dim columns: {', '.join(dim_keys.columns)}"
        )
    if (fact_t in _INTEGRAL) != (dim_t in _INTEGRAL) or (
        fact_t not in _INTEGRAL and fact_t != dim_t
    ):
        raise ValueError(
            f"bloom_prefiltered_semi_join: fact key {fact_key!r} ({fact_t})"
            f" and dim key {dim_key!r} ({dim_t}) must hash in the same"
            " type family (integral widths are unified to BIGINT)"
        )
    bitmap = bloom_bitmap(dim_keys, dim_key, m_bits, n_hashes)
    pre = fact.where(
        bloom_might_contain(fact_key, bitmap, n_hashes, key_type=fact_t)
    )
    return pre.join(
        dim_keys.withColumnRenamed(dim_key, fact_key),
        fact_key,
        "left_semi",
    )
