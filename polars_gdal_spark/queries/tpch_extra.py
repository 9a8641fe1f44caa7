"""Third-wave TPC-H coverage (SURVEY §2.D-§2.J breadth).

The driver tables are a *reduced* TPC-H (no ``partsupp``; fewer columns:
no l_commitdate/l_receiptdate/l_shipmode, no c_phone, no ps_supplycost),
so queries whose essence survives the reduction are implemented as
faithful adaptations and the rest (Q2, Q11) are genuinely inexpressible
on this schema. Each adaptation keeps the *plan shape* that makes the
original interesting — multi-way star joins (Q7/Q8/Q9), conditional
aggregation (Q8/Q12/Q14), scalar-subquery max (Q15), correlated-avg
anti-pattern (Q17), HAVING on a big agg (Q18), OR-of-ANDs pushdown
(Q19), double EXISTS/NOT EXISTS correlation (Q21), anti join +
uncorrelated scalar subquery (Q22).

Determinism contract: money math in DECIMAL(18,2), ratios as
double/double division of exact decimal sums, dates emitted as strings,
every LIMIT preceded by a total order (see queries/__init__.py).

Scale notes (100 TB): every join here is either fact-to-fact on the
shuffle key Catalyst picks (orderkey), or fact-to-dim where the dim side
(nation/region/supplier/part at TPC-H ratios) is explicitly
``F.broadcast``-ed; aggregates are all partial-then-final (map-side
combine) by construction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from polars_gdal_spark.queries import load_tables, query

DEC = "decimal(18,2)"


def _dec(c):
    return F.col(c).cast(DEC)


def _rev():
    one = F.lit(1).cast(DEC)
    return F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))


_REV_SQL = (
    "sum(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2))))"
)


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           CAST({_REV_SQL} AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional nation-pair trade volume by ship year.
    Fact-fact join on orderkey; all four dims broadcast."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (
        F.col("cust_nation") == "NATION_1"
    )
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("snk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cnk"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(_rev().cast("double").alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(nation_rev AS DOUBLE) / CAST(total_rev AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             sum(CASE WHEN n2.n_name = 'NATION_3'
                      THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS nation_rev,
             {_REV_SQL} AS total_rev
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
      GROUP BY 1
    )
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of PROMO-part revenue into ASIA, per
    order year — conditional aggregation over a 7-table star. The share
    divides two exact DECIMAL sums as doubles (IEEE-deterministic)."""
    t = load_tables(spark, sf_dir)
    one = F.lit(1).cast(DEC)
    zero = F.lit(0).cast(DEC)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    asia = t["region"].where(F.col("r_name") == "ASIA")
    promo = t["part"].where(F.col("p_type") == "PROMO")
    vol = _dec("l_extendedprice") * (one - _dec("l_discount"))
    agg = (
        t["lineitem"]
        .join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(asia), F.col("crk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("snk"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero)
            ).alias("nation_rev"),
            _rev().alias("total_rev"),
        )
    )
    return agg.select(
        "o_year",
        (
            F.col("nation_rev").cast("double")
            / F.col("total_rev").cast("double")
        ).alias("mkt_share"),
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST({_REV_SQL} AS DOUBLE) AS sum_profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted: no ps_supplycost on this schema, so profit =
    discounted revenue): per supplier-nation per order-year over parts
    whose name matches a substring — the LIKE prunes the broadcast side
    before the fact join."""
    t = load_tables(spark, sf_dir)
    red = t["part"].where(F.col("p_name").like("%red%")).select("p_partkey")
    return (
        t["lineitem"]
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(_rev().cast("double").alias("sum_profit"))
    )


@query(
    "q12_priority_lineitems",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def q12_priority_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (adapted: no l_shipmode/commitdate/receiptdate; grouped
    by l_linestatus over a shipdate year instead): conditional counts of
    high- vs low-priority orders per group."""
    t = load_tables(spark, sf_dir)
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_effect",
    oracle="""
    SELECT 100.0 * CAST(promo_rev AS DOUBLE) / CAST(total_rev AS DOUBLE)
             AS promo_revenue_pct
    FROM (
      SELECT sum(CASE WHEN p.p_type = 'PROMO'
                      THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS promo_rev,
             sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS total_rev
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
        AND l.l_shipdate <  TIMESTAMP '1997-06-01'
    )
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue as a percentage of a quarter's revenue —
    single-row conditional aggregate, part dim broadcast."""
    t = load_tables(spark, sf_dir)
    one = F.lit(1).cast(DEC)
    zero = F.lit(0).cast(DEC)
    vol = _dec("l_extendedprice") * (one - _dec("l_discount"))
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-06-01").cast("timestamp"))
    )
    agg = (
        li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)
            ).alias("promo_rev"),
            _rev().alias("total_rev"),
        )
    )
    return agg.select(
        (
            F.lit(100.0)
            * F.col("promo_rev").cast("double")
            / F.col("total_rev").cast("double")
        ).alias("promo_revenue_pct")
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST({_REV_SQL} AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the max quarterly revenue — scalar
    subquery over a derived aggregate. The scalar max is computed as a
    1-row aggregate broadcast back into the revenue relation (the
    pattern at q20/q22) — a window-max over ``Window.partitionBy()``
    would single-partition the per-supplier relation, which is millions
    of rows at 100 TB."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_rev().cast("double").alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("_max"))
    top = (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("_max"))
        .drop("_max")
    )
    return (
        F.broadcast(top)
        .join(t["supplier"], F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted: lineitem stands in for the absent partsupp as
    the part-supplier relation): distinct-supplier counts per
    brand/type/size with negated + IN-list dim predicates."""
    t = load_tables(spark, sf_dir)
    p = t["part"].where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    return (
        t["lineitem"]
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders — correlated avg
    per partkey, decorrelated into an aggregate + self-join (what
    Catalyst does to the subquery form too). l_quantity is an exact
    small double, so 0.2*avg is IEEE-identical across engines."""
    t = load_tables(spark, sf_dir)
    brand = t["part"].where(F.col("p_brand") == "Brand#3").select("p_partkey")
    li = t["lineitem"].join(
        F.broadcast(brand), F.col("l_partkey") == F.col("p_partkey")
    )
    per_part = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut"))
    )
    return (
        li.join(F.broadcast(per_part), F.col("l_partkey") == F.col("pk"))
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_totalprice,
           sum(l.l_quantity) AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2, 3, 4, 5
    HAVING sum(l.l_quantity) > 300
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders (HAVING over a fact aggregate),
    top-100 by price. Catalyst turns orderBy+limit into
    TakeOrderedAndProject — no global sort materializes."""
    t = load_tables(spark, sf_dir)
    # Aggregate lineitem FIRST on the narrow orderkey (map-side
    # combined; quantities are integral doubles so the sum is exact and
    # order-independent) and filter to the rare >300 orders. AQE
    # broadcasts that set into the joins at these scales (so neither
    # orders nor customer shuffles, and the wide name/date/price
    # columns never ride a shuffle); the hint is deliberately unforced
    # because the >300 set grows with the corpus. Grouping by orderkey
    # alone is equivalent to the oracle's 5-key group because orderkey
    # determines the other four.
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    return (
        t["orders"]
        # unforced: the >300 set is rare but grows with the corpus, so
        # the broadcast decision belongs to AQE, not a pinned hint
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(t["customer"]),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "q19_banded_revenue",
    oracle=f"""
    SELECT CAST({_REV_SQL} AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 25
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 40
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_banded_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (adapted to this schema's columns): revenue under an
    OR of conjunctive brand/size/quantity bands — the classic
    disjunctive-pushdown shape (Catalyst extracts the common join key
    and pushes each band's dim predicates below the join)."""
    t = load_tables(spark, sf_dir)

    def band(brand, s_lo, s_hi, q_lo, q_hi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .where(
            band("Brand#1", 1, 10, 1, 20)
            | band("Brand#2", 10, 25, 10, 35)
            | band("Brand#3", 20, 40, 20, 50)
        )
        .agg(_rev().cast("double").alias("revenue"))
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY 1
    ORDER BY numwait DESC, s.s_name
    LIMIT 25
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted: l_returnflag='R' stands in for the absent
    receipt-after-commit lateness): suppliers solely responsible for a
    failed multi-supplier order — the double EXISTS / NOT EXISTS
    correlation, expressed as a semi join then an anti join on
    (orderkey, conditions), both shuffle-partitioned by orderkey."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    l1 = (
        li.where(F.col("l_returnflag") == "R")
        .join(
            t["orders"].where(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = (
        li.where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("k2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        ).join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    return (
        waiting.join(
            F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(25)
    )


@query(
    "q22_dormant_customers",
    oracle="""
    SELECT CAST(c.c_custkey % 10 AS INT) AS cntrycode,
           count(*) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM customer c
    WHERE CAST(c.c_custkey % 10 AS INT) IN (1, 3, 5, 7, 9)
      AND CAST(c.c_acctbal AS DECIMAL(18,2)) > (
        SELECT CAST(avg(CAST(c2.c_acctbal AS DECIMAL(18,2)))
                    AS DECIMAL(18,2))
        FROM customer c2 WHERE c2.c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY 1
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted: custkey-mod stands in for the absent phone
    country code): above-average-balance customers with no orders —
    uncorrelated scalar subquery + anti join to the fact table
    (dormant = no orders since 2000, so the anti join is non-vacuous
    on this data)."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].where(
        (F.col("c_custkey") % 10).cast("int").isin(1, 3, 5, 7, 9)
    )
    recent = t["orders"].where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    cutoff = (
        t["customer"]
        .where(F.col("c_acctbal") > 0)
        .agg(F.avg(_dec("c_acctbal")).cast(DEC).alias("cut"))
    )
    return (
        c.crossJoin(F.broadcast(cutoff))
        .where(_dec("c_acctbal") > F.col("cut"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_custkey") % 10).cast("int").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@query(
    "q20_promotion_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'small%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING sum(l.l_quantity) > 40
    )
    """,
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted: lineitem stands in for the absent partsupp
    availability relation): suppliers who moved > 40 units of any
    'small%' part in 1997 — IN-subquery over a HAVING aggregate,
    executed as aggregate → semi join (no decorrelation needed since
    the subquery is uncorrelated after the reduction)."""
    t = load_tables(spark, sf_dir)
    small = (
        t["part"].where(F.col("p_name").like("small%")).select("p_partkey")
    )
    qualified = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 40)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(qualified, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "q2_min_price_supplier",
    oracle="""
    WITH ps AS (
      SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
             min(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 / CAST(l.l_quantity AS DECIMAL(18,2))) AS unit_price
      FROM lineitem l
      GROUP BY 1, 2
    )
    SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, n.n_name AS nation
    FROM ps
    JOIN part p     ON p.p_partkey = ps.partkey
    JOIN supplier s ON s.s_suppkey = ps.suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_size = 10 AND p.p_type = 'SMALL'
      AND ps.unit_price = (
        SELECT min(ps2.unit_price) FROM ps ps2
        WHERE ps2.partkey = ps.partkey
      )
    ORDER BY p.p_partkey, s.s_suppkey
    """,
)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted: observed lineitem unit price stands in for the
    absent ps_supplycost): for filtered parts, the supplier(s) offering
    the minimum unit price — the correlated-min pattern, decorrelated
    into a per-part min + equality join exactly as Catalyst rewrites the
    subquery form. DECIMAL division keeps the min comparison exact."""
    t = load_tables(spark, sf_dir)
    ps = (
        t["lineitem"]
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(
            F.min(_dec("l_extendedprice") / _dec("l_quantity")).alias(
                "unit_price"
            )
        )
    )
    dim = t["part"].where(
        (F.col("p_size") == 10) & (F.col("p_type") == "SMALL")
    )
    ps_f = ps.join(F.broadcast(dim), F.col("partkey") == F.col("p_partkey"))
    best = ps_f.groupBy(F.col("partkey").alias("bpk")).agg(
        F.min("unit_price").alias("best_price")
    )
    return (
        ps_f.join(
            best,
            (F.col("partkey") == F.col("bpk"))
            & (F.col("unit_price") == F.col("best_price")),
        )
        .join(F.broadcast(t["supplier"]), F.col("suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation"),
        )
        .orderBy("p_partkey", "s_suppkey")
    )


@query(
    "q11_important_parts",
    oracle="""
    WITH val AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS part_value
      FROM lineitem
      GROUP BY 1
    )
    SELECT l_partkey AS partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM val
    WHERE CAST(part_value AS DOUBLE) > (
      SELECT 0.0007 * CAST(sum(part_value) AS DOUBLE) FROM val
    )
    ORDER BY partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted: lineitem revenue stands in for partsupp stock
    value): parts whose traded value exceeds a fraction of the total —
    aggregate, then compare against an uncorrelated scalar aggregate of
    the SAME relation (one extra reduce over the small post-agg set, not
    a second corpus scan). The 0.0007 threshold multiplies in double on
    both engines (exact decimal sums cast first)."""
    t = load_tables(spark, sf_dir)
    val = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(_rev().alias("part_value"))
    )
    total = val.agg(
        (F.lit(0.0007) * F.sum("part_value").cast("double")).alias("cut")
    )
    return (
        val.crossJoin(F.broadcast(total))
        .where(F.col("part_value").cast("double") > F.col("cut"))
        .select(
            "partkey", F.col("part_value").cast("double").alias("part_value")
        )
        .orderBy("partkey")
    )
