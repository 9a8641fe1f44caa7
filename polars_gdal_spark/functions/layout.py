"""Multi-dimensional data-layout keys (Z-order / Morton curves).

At 100 TB the cheapest query is the one that never reads the file:
min/max column statistics (parquet row groups, Delta/Iceberg file
stats) prune scans, but only if rows that are close in *key space* are
close in *file space*. Sorting by one column clusters that column and
scatters every other; interleaving the bits of several columns (the
Z-order / Morton curve — Morton 1966, and the layout behind
Delta Lake's OPTIMIZE ZORDER BY) keeps EVERY interleaved dimension
range-compact, so predicates on any of them skip files.

The kernel is pure integral bit arithmetic — shift/AND/OR magic-number
bit spreading, identical semantics on Spark BIGINT and DuckDB BIGINT —
so the engine and the SQL oracle produce bit-identical keys
(``morton_sql`` renders the same expression tree for the oracle).

Reference parity note: the GDAL reference has no layout op (its
clustering is whatever order OGR yields, `src/lib.rs:261-338`); this
module is part of the engine's large-scale extension surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# (shift, mask) ladder spreading the low 16 bits of x to even positions
_SPREAD16 = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread16(col: Column) -> Column:
    """Spread the low 16 bits of a non-negative BIGINT to the even bit
    positions of a 32-bit lane (0babcd -> 0b0a0b0c0d)."""
    x = col.bitwiseAND(F.lit(0xFFFF).cast("long"))
    for sh, mask in _SPREAD16:
        x = x.bitwiseOR(F.shiftleft(x, sh)).bitwiseAND(
            F.lit(mask).cast("long")
        )
    return x


def morton_key(a: Column, b: Column) -> Column:
    """32-bit Z-order key interleaving the low 16 bits of two
    non-negative BIGINT columns (a in even positions, b in odd)."""
    return spread16(a).bitwiseOR(F.shiftleft(spread16(b), 1))


def _spread16_sql(expr: str) -> str:
    """The SQL twin of :func:`spread16` — identical operator tree so
    DuckDB computes bit-identical keys. The input is forced to BIGINT:
    DuckDB evaluates `<<` in the operand's width, so an INTEGER-typed
    expression would overflow at shift 8 (found by the hypothesis
    property test in tests/test_property_kernels.py)."""
    x = f"((CAST({expr} AS BIGINT)) & 65535)"
    for sh, mask in _SPREAD16:
        x = f"((({x}) | (({x}) << {sh})) & {mask})"
    return x


def morton_sql(a_expr: str, b_expr: str) -> str:
    """SQL expression for :func:`morton_key` over two column exprs."""
    return f"({_spread16_sql(a_expr)} | ({_spread16_sql(b_expr)} << 1))"
