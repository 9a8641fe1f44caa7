"""Relational operator inventory (SURVEY.md §2.D–§2.J).

The reference reaches these only by delegating to GDAL's OGR SQL dialect
(reference ``README.md:33-44``, ``src/test.rs:54-70``): projection, CAST,
DISTINCT, WHERE with LIKE/IN/BETWEEN, single-table aggregates, ORDER BY,
equi-JOIN, LIMIT/OFFSET. Here each capability — and everything Spark adds
on top (outer/semi/anti joins, grouping sets, windows, set ops) — is a
declarative DataFrame plan so Catalyst owns pushdown, pruning, join
strategy and AQE. Dimension tables are explicitly broadcast.

Scale notes (100 TB design stance):
* Fact-fact joins (orders⋈lineitem) shuffle on the join key — at scale
  these become sort-merge joins with AQE skew splitting; dimensions
  (region/nation/customer/supplier/part at any realistic SF) broadcast.
* All aggregates are expressed so Catalyst generates partial (map-side)
  aggregation before the shuffle.
* Money math uses DECIMAL so results are exact and order-independent —
  required for oracle hash-matching and good practice at scale anyway.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from polars_gdal_spark.queries import load_tables, query

DEC = "decimal(18,2)"


def _dec(c):
    return F.col(c).cast(DEC)


# ---------------------------------------------------------------------------
# Scan / projection / filter (OGR SQL: SELECT cols WHERE ...; §2.D)
# ---------------------------------------------------------------------------


@query(
    "scan_project_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS disc_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-03-01'
      AND l_quantity > 45
    """,
)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + filter + computed column; Catalyst pushes the shipdate
    and quantity predicates into the parquet scan and prunes to 6 columns
    (reference parity: OGR SQL SELECT/WHERE, README.md:33-44)."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_quantity") > 45)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            (_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount")))
            .cast("double")
            .alias("disc_price"),
        )
    )


@query(
    "filter_in_between_like",
    oracle="""
    SELECT p_brand, count(*) AS n_parts,
           CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM part
    WHERE p_type LIKE '%ECO%'
      AND p_size BETWEEN 10 AND 40
      AND p_brand IN ('Brand#1','Brand#2','Brand#3','Brand#4','Brand#5')
    GROUP BY p_brand
    """,
)
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / IN / BETWEEN predicate coverage (OGR SQL WHERE dialect)."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .where(
            F.col("p_type").like("%ECO%")
            & F.col("p_size").between(10, 40)
            & F.col("p_brand").isin(
                "Brand#1", "Brand#2", "Brand#3", "Brand#4", "Brand#5"
            )
        )
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum(_dec("p_retailprice")).cast("double").alias("sum_price"),
        )
    )


@query(
    "distinct_values",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (OGR SQL supports it; Spark hash-aggregates it)."""
    t = load_tables(spark, sf_dir)
    return t["orders"].select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "cast_and_scalar_functions",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderpriority)                         AS prio_upper,
           substr(o_orderpriority, 1, 1)                  AS prio_code,
           length(o_orderpriority)                        AS prio_len,
           concat(o_orderstatus, '-', o_orderpriority)    AS status_prio,
           CAST(year(o_orderdate) AS INT)                 AS order_year,
           CAST(month(o_orderdate) AS INT)                AS order_month,
           CAST(floor(o_totalprice / 1000) AS BIGINT)     AS price_bucket,
           abs(CAST(o_custkey AS BIGINT) - 75)            AS key_dist,
           CASE WHEN o_totalprice > 250000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END                          AS size_class
    FROM orders
    WHERE o_orderkey < 500
    """,
)
def cast_and_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function library coverage: string, date-part, math, CASE —
    the reference has no scalar functions beyond geometry encode (§2.J);
    Spark's built-ins cover OGR SQL's and far more."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].where(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.length("o_orderpriority").alias("prio_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("price_bucket"),
        F.abs(F.col("o_custkey").cast("bigint") - 75).alias("key_dist"),
        F.when(F.col("o_totalprice") > 250000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_class"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (§2.B B1-B3, §2.H)
# ---------------------------------------------------------------------------


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k = orderBy().limit(k): Catalyst plans TakeOrderedAndProject —
    no full sort, no single-node shuffle; scales as a per-partition heap +
    driver merge. Total order via o_orderkey tiebreak."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
    )


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 20 OFFSET 10
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OFFSET+LIMIT (reference B1+B2, ``src/lib.rs:361-375``). Documented
    divergence from the reference quirk (SURVEY §4.3.3): limit counts rows
    *returned* after the offset, so offset=10,limit=20 yields 20 rows, not
    the reference's 0-or-10."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(10)
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Aggregation (§2.F)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                / count(*) AS DOUBLE) AS avg_qty,
           CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                / count(*) AS DOUBLE) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: multi-aggregate groupBy with exact
    DECIMAL money math. Catalyst emits partial aggregation before the
    shuffle (map-side combine), so the shuffle carries 6 rows per
    partition, not 600k — the pattern that survives 100 TB."""
    t = load_tables(spark, sf_dir)
    one = F.lit(1).cast(DEC)
    li = t["lineitem"].where(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
    )
    disc_price = _dec("l_extendedprice") * (one - _dec("l_discount"))
    charge = disc_price * (one + _dec("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).alias("_sq"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.sum(_dec("l_discount")).alias("_sd"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("_sq").cast("double").alias("sum_qty"),
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            (F.col("_sq").cast("double") / F.col("count_order")).alias("avg_qty"),
            (F.col("_sd").cast("double") / F.col("count_order")).alias("avg_disc"),
            "count_order",
        )
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-side filter + global aggregate. All three
    predicates push into the parquet reader; at 100 TB this is the
    I/O-bound lower bound for scan speed."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "rollup_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS INT) AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_prio,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals with GROUPING() disambiguation — absent in
    the reference (§2.F), free in Spark."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "g_status", "g_prio",
            "n_orders", "sum_price",
        )
    )


@query(
    "cube_lineitem_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_rf,
           CAST(grouping(l_linestatus) AS INT) AS g_ls,
           count(*) AS n_items,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over both flag dimensions (grouping-sets family, §2.F)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            F.count("*").alias("n_items"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
        .select(
            "l_returnflag", "l_linestatus", "g_rf", "g_ls", "n_items", "sum_qty"
        )
    )


# ---------------------------------------------------------------------------
# Joins (§2.E)
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS o_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join + agg + top-k. Customer (filtered dim) is
    broadcast; orders⋈lineitem co-partitions on orderkey — one shuffle.
    Date cast to DATE so the oracle hash is timezone-proof."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].where(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = t["lineitem"].where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    one = F.lit(1).cast(DEC)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('AMERICA', 'ASIA')
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way star join. All dimensions broadcast; the only
    shuffle is orders⋈lineitem on orderkey. Join reordering + pushdown
    left entirely to Catalyst (SURVEY §4.2: zero custom rules needed)."""
    t = load_tables(spark, sf_dir)
    one = F.lit(1).cast(DEC)
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    r = t["region"].where(F.col("r_name").isin("AMERICA", "ASIA"))
    j = (
        t["lineitem"]
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return j.groupBy("n_name").agg(
        F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
        .cast("double")
        .alias("revenue")
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT n.n_name, count(c.c_custkey) AS n_customers,
           CAST(coalesce(sum(CAST(c.c_acctbal AS DECIMAL(18,2))), 0) AS DOUBLE)
             AS sum_acctbal
    FROM nation n
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving empty nations (absent in reference)."""
    t = load_tables(spark, sf_dir)
    return (
        t["nation"]
        .join(
            t["customer"],
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left",
        )
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.coalesce(F.sum(_dec("c_acctbal")), F.lit(0).cast(DEC))
            .cast("double")
            .alias("sum_acctbal"),
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers having any 400k+ order."""
    t = load_tables(spark, sf_dir)
    big = t["orders"].where(F.col("o_totalprice") > 400000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no orders."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "join_range_nonequi",
    oracle="""
    SELECT o.o_orderkey, p.bucket_lo, p.bucket_hi
    FROM orders o
    JOIN (VALUES (0.0, 100000.0), (100000.0, 250000.0), (250000.0, 500000.0))
         AS p(bucket_lo, bucket_hi)
      ON o.o_totalprice >= p.bucket_lo AND o.o_totalprice < p.bucket_hi
    WHERE o.o_orderkey < 2000
    """,
)
def join_range_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join against a tiny bucket dimension: Spark plans
    BroadcastNestedLoopJoin — correct strategy when one side is rows-small.
    (Reference has no join code at all, §2.E.)"""
    t = load_tables(spark, sf_dir)
    buckets = spark.createDataFrame(
        [(0.0, 100000.0), (100000.0, 250000.0), (250000.0, 500000.0)],
        "bucket_lo double, bucket_hi double",
    )
    o = t["orders"].where(F.col("o_orderkey") < 2000)
    return (
        o.join(
            F.broadcast(buckets),
            (F.col("o_totalprice") >= F.col("bucket_lo"))
            & (F.col("o_totalprice") < F.col("bucket_hi")),
        )
        .select("o_orderkey", "bucket_lo", "bucket_hi")
    )


# ---------------------------------------------------------------------------
# Window functions (§2.G)
# ---------------------------------------------------------------------------


@query(
    "window_topn_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via row_number window — the scalable alternative to
    a per-key collect. One shuffle on the partition key."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        t["orders"]
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("int").alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT user_id, event_id,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value
    FROM events
    WHERE user_id < 50
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per user ordered by event time (rowsBetween frame).
    DECIMAL accumulator keeps the prefix sums exact."""
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t["events"]
        .where(F.col("user_id") < 50)
        .select(
            "user_id",
            "event_id",
            F.sum(F.col("value").cast(DEC)).over(w).cast("double")
            .alias("running_value"),
        )
    )


@query(
    "window_lag_delta",
    oracle="""
    SELECT user_id, event_id,
           CAST(CAST(value AS DECIMAL(18,2))
                - lag(CAST(value AS DECIMAL(18,2)), 1, 0) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE)
             AS delta
    FROM events
    WHERE user_id < 50
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() delta between consecutive events per user."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.col("value").cast(DEC)
    return (
        t["events"]
        .where(F.col("user_id") < 50)
        .select(
            "user_id",
            "event_id",
            (v - F.lag(v, 1, 0).over(w)).cast("double").alias("delta"),
        )
    )


# ---------------------------------------------------------------------------
# Set operations (§2.I)
# ---------------------------------------------------------------------------


@query(
    "setop_union",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    t = load_tables(spark, sf_dir)
    a = (
        t["customer"]
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    b = (
        t["orders"]
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.union(b).distinct()


@query(
    "setop_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of the same two key sets."""
    t = load_tables(spark, sf_dir)
    a = (
        t["customer"]
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    b = (
        t["orders"]
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.intersect(b)


@query(
    "setop_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference) of the same two key sets."""
    t = load_tables(spark, sf_dir)
    a = (
        t["customer"]
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    b = (
        t["orders"]
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.exceptAll(b).distinct()


# ---------------------------------------------------------------------------
# Events: time-window aggregation + semi-structured extraction
# ---------------------------------------------------------------------------


@query(
    "events_hourly_rollup",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour_bucket,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation expressed batch-side with date_trunc —
    the batch twin of the Structured Streaming windowed agg
    (polars_gdal_spark.streaming); emitted as a string bucket so the hash
    is timezone-proof."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00")
            .alias("hour_bucket"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
    )


@query(
    "events_json_extract",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON extraction from a string column (get_json_object)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .select(
            (F.get_json_object("props", "$.k").cast("bigint") % 10)
            .alias("k_bucket")
        )
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"))
    )


@query(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
                  OR lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions
    FROM flagged GROUP BY user_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + flag-sum — the
    classic scalable sessionizer: one shuffle on user_id, no state blowup."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | ((F.unix_micros("ts") - F.unix_micros(prev_ts)) > 1_800_000_000),
        1,
    ).otherwise(0)
    return (
        t["events"]
        .select("user_id", new_session.alias("new_session"))
        .groupBy("user_id")
        .agg(F.sum("new_session").cast("bigint").alias("n_sessions"))
    )


@query(
    "events_session_windows",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  OR lag(ts) OVER w IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING
             ) AS session_id
      FROM flagged
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) + 1800000000 AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session aggregates via Spark's NATIVE ``session_window`` (30-min
    inactivity gap): each user's events merge into sessions whose end
    extends 30 min past the last event — all JVM-side, and the *same
    expression* runs under Structured Streaming with a watermark (the
    state-store-backed sessionizer); ``events_sessionize`` counts the
    sessions with lag+flag-sum, this one materializes their extents.
    One shuffle on (user, session-merge); map-side partial aggregation
    applies. The DuckDB oracle derives identical extents by
    gaps-and-islands (lag flag → running sum → group), proving the
    built-in operator against first principles; timestamps emitted as
    epoch micros (never hash raw timestamps)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "join_salted_skew",
    oracle="""
    SELECT e.user_id,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e
    JOIN (
      SELECT user_id, count(*) AS user_events
      FROM events GROUP BY user_id
    ) u ON e.user_id = u.user_id
    GROUP BY e.user_id
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join, oracle-proven equivalent to the plain join:
    the fact side is salted into 8 shards per key and the (small,
    aggregated) build side replicated 8×, so a pathologically hot user
    spreads over 8 reducers instead of one straggler task — the manual
    fallback when AQE's skew split can't fire (e.g. the skew is in a
    shuffle AQE can't observe). The oracle runs the UNsalted join; the
    hash match certifies result equivalence, which is the entire
    contract of salting."""
    from polars_gdal_spark.functions.skew import salted_join

    t = load_tables(spark, sf_dir)
    ev = t["events"].select("user_id", "value")
    users = (
        t["events"].groupBy("user_id").agg(F.count("*").alias("user_events"))
    )
    joined = salted_join(ev, users, on="user_id", salts=8)
    return joined.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
    )


@query(
    "events_zscore_outliers",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    stats AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s,
             CAST(sum(cents * cents) AS BIGINT) AS ss
      FROM c GROUP BY event_type
    )
    SELECT c.event_type,
           stats.n AS n_events,
           CAST(sum(CASE WHEN
             CAST(stats.n * c.cents - stats.s AS DECIMAL(38,0))
               * CAST(stats.n * c.cents - stats.s AS DECIMAL(38,0))
               * CAST(stats.n - 1 AS DECIMAL(38,0))
             > CAST(9 AS DECIMAL(38,0))
               * CAST(stats.n AS DECIMAL(38,0))
               * CAST(stats.n * ss - CAST(s AS DECIMAL(38,0)) * s
                      AS DECIMAL(38,0))
             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM c JOIN stats USING (event_type)
    GROUP BY c.event_type, stats.n
    """,
)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly detection: per event type, count events more than 3
    sample standard deviations from the type mean — the monitoring
    gate every event pipeline runs. The test
    ``(n·x − s)²·(n−1) > 9·n·(n·ss − s²)`` is the z>3 condition cleared
    of divisions, evaluated in DECIMAL(38,0): exact integer cents in,
    exact comparison out, so Spark and DuckDB agree bit-for-bit (no
    float stddev anywhere — stddev_samp would hash-mismatch across
    engines from summation order alone).

    Scale shape: one partial-aggregated pass for the 4-row stats
    relation, broadcast back into a second scan-fused pass — no window,
    no sort, two linear scans at any corpus size."""
    ev = load_tables(spark, sf_dir)["events"]
    c = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    stats = c.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("ss"),
    )
    j = c.join(F.broadcast(stats), "event_type")
    dev = (F.col("n") * F.col("cents") - F.col("s")).cast("decimal(19,0)")
    lhs = dev * dev * (F.col("n") - 1).cast("decimal(19,0)")
    var_num = (
        F.col("n").cast("decimal(19,0)") * F.col("ss").cast("decimal(19,0)")
        - F.col("s").cast("decimal(19,0)") * F.col("s").cast("decimal(19,0)")
    )
    rhs = F.lit(9).cast("decimal(19,0)") * F.col("n").cast("decimal(19,0)") * var_num
    return j.groupBy("event_type", F.col("n").alias("n_events")).agg(
        F.sum(F.when(lhs > rhs, 1).otherwise(0)).cast("bigint").alias("n_outliers")
    )


@query(
    "join_full_outer",
    oracle="""
    WITH rich AS (
      SELECT c_nationkey AS nk, count(*) AS rich_customers
      FROM customer WHERE c_acctbal > 7500 GROUP BY c_nationkey
    ),
    broke AS (
      SELECT s_nationkey AS nk, count(*) AS broke_suppliers
      FROM supplier WHERE s_acctbal < 0 GROUP BY s_nationkey
    )
    SELECT coalesce(r.nk, b.nk) AS nationkey,
           r.rich_customers,
           b.broke_suppliers
    FROM rich r FULL OUTER JOIN broke b ON r.nk = b.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: nations having high-balance customers, negative
    -balance suppliers, or both — unmatched sides surface as NULL counts
    (both filters are selective enough that some nations appear on only
    one side, so all three match cases occur).

    Scale shape: both inputs are pre-aggregated to at most |nation| rows
    BEFORE the join (aggregate-then-join, not join-then-aggregate), so
    the full-outer join — which cannot broadcast — shuffles only the
    tiny per-nation relations however large the fact tables grow.
    """
    t = load_tables(spark, sf_dir)
    rich = (
        t["customer"]
        .where(F.col("c_acctbal") > 7500)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("rich_customers"))
    )
    broke = (
        t["supplier"]
        .where(F.col("s_acctbal") < 0)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("broke_suppliers"))
    )
    return (
        rich.join(broke, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            "rich_customers",
            "broke_suppliers",
        )
    )


@query(
    "grouping_sets_orders",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           grouping(o_orderstatus) AS g_status,
           grouping(o_orderpriority) AS g_priority,
           count(*) AS n_orders,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (not derivable from rollup/cube alone):
    (status, priority) detail, status subtotals, and a grand total in
    one pass, with grouping() flags disambiguating aggregated-away NULLs
    from data NULLs. Aggregates are count/min/max only — no double SUM,
    whose partial-aggregation order would make cross-engine bit
    equality accidental.

    Scale shape: Spark expands grouping sets with a single Expand +
    partial-then-final hash aggregate — one scan, one shuffle whose
    width is |sets| x |groups|, never a self-union of three scans.
    """
    t = load_tables(spark, sf_dir)
    t["orders"].createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               o_orderpriority,
               grouping(o_orderstatus) AS g_status,
               grouping(o_orderpriority) AS g_priority,
               count(*) AS n_orders,
               min(o_totalprice) AS min_price,
               max(o_totalprice) AS max_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """
    )


@query(
    "unpivot_metrics",
    oracle="""
    WITH long AS (
      SELECT 'quantity' AS metric, l_quantity AS v FROM lineitem
      UNION ALL
      SELECT 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT 'discount', l_discount FROM lineitem
    )
    SELECT metric, count(*) AS n, min(v) AS min_v, max(v) AS max_v
    FROM long GROUP BY metric
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long melt) + per-metric profile: the inverse of the
    pivot query, exercising Spark's native ``unpivot``/``melt`` API.
    Aggregates are count/min/max only (order-independent, engine-exact).

    Scale shape: Spark compiles unpivot to a single Expand node — each
    input row fans out to |metrics| rows IN PLACE (no join, no shuffle,
    no second scan, unlike the oracle's 3-scan UNION ALL formulation);
    the profile aggregate is map-side combined into 3 groups.
    """
    t = load_tables(spark, sf_dir)
    long = t["lineitem"].unpivot(
        [],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "v",
    )
    # unpivot labels rows with the source column name; map to the
    # oracle's short metric names with a fixed CASE (JVM expression).
    name = (
        F.when(F.col("metric") == "l_quantity", "quantity")
        .when(F.col("metric") == "l_extendedprice", "extendedprice")
        .otherwise("discount")
    )
    return (
        long.select(name.alias("metric"), "v")
        .groupBy("metric")
        .agg(
            F.count("*").alias("n"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
    )


@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders o
    WHERE o.o_custkey IN (
      SELECT c_custkey FROM customer
      WHERE c_mktsegment = 'BUILDING' AND c_nationkey < 5
    )
    GROUP BY o.o_orderpriority
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi join — sideways information passing made
    explicit: the selective customer key set compresses to a bitmap
    (~10 bits/key, sized from the dim count), broadcasts as a literal,
    and drops non-matching orders BEFORE the shuffle; the exact semi
    join after it removes the ~1% false positives, so the result (and
    the oracle) is the plain semi join. This is the shape for a dim too
    big to broadcast as rows but whose key set fits a few KB of bits —
    at 100 TB the exchange this avoids IS the query cost. Filter apply
    is pure codegen'd integral arithmetic, no extra pass."""
    from polars_gdal_spark.functions.bloom import bloom_prefiltered_semi_join

    t = load_tables(spark, sf_dir)
    dim = (
        t["customer"]
        .where(
            (F.col("c_mktsegment") == "BUILDING") & (F.col("c_nationkey") < 5)
        )
        .select("c_custkey")
    )
    kept = bloom_prefiltered_semi_join(
        t["orders"], dim, fact_key="o_custkey", dim_key="c_custkey"
    )
    return kept.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


@query(
    "join_fuzzy_entity_match",
    oracle="""
    WITH names AS (
      SELECT p_name, min(p_partkey) AS rep_key
      FROM part GROUP BY p_name
    ),
    mut AS (
      SELECT DISTINCT substr(p_name, 1, length(p_name) - 1) AS m_name
      FROM part
    ),
    cand AS (
      SELECT m.m_name, n.p_name, n.rep_key,
             levenshtein(m.m_name, n.p_name) AS dist
      FROM mut m JOIN names n
        ON substr(m.m_name, 1, 4) = substr(n.p_name, 1, 4)
      WHERE levenshtein(m.m_name, n.p_name) <= 2
    )
    SELECT m_name, p_name AS matched_name,
           rep_key AS matched_key, CAST(dist AS INT) AS dist
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY m_name ORDER BY dist, rep_key) AS rk
      FROM cand
    ) WHERE rk = 1
    """,
)
def join_fuzzy_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity-resolution join — the record-linkage shape: noisy
    names (each part name with its last character dropped) match back
    to the clean catalog by edit distance ≤ 2, BLOCKED on a 4-char
    prefix key so candidate pairs come from an equi-join, never
    all-pairs; best match per noisy name by (distance, key) rank.

    Scale design: both join sides first collapse to DISTINCT entity
    names (a map-side-combined groupBy) — the linkage runs on entity
    cardinality, not row count, so a 100 TB catalog with bounded name
    vocabulary joins in milliseconds while the per-row work stays one
    linear dedup pass. levenshtein evaluates only inside prefix blocks
    (JVM codegen, no UDF)."""
    part = load_tables(spark, sf_dir)["part"]
    names = part.groupBy("p_name").agg(F.min("p_partkey").alias("rep_key"))
    mut = part.select(
        F.expr("substring(p_name, 1, length(p_name) - 1)").alias("m_name")
    ).distinct()
    cand = (
        mut.withColumn("_blk", F.substring("m_name", 1, 4))
        .join(
            names.withColumn("_blk", F.substring("p_name", 1, 4)),
            "_blk",
        )
        .withColumn("dist", F.levenshtein("m_name", "p_name"))
        .where(F.col("dist") <= 2)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("m_name").orderBy(
        F.asc("dist"), F.asc("rep_key")
    )
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(
            "m_name",
            F.col("p_name").alias("matched_name"),
            F.col("rep_key").alias("matched_key"),
            F.col("dist").cast("int").alias("dist"),
        )
    )


@query(
    "events_top_paths",
    oracle="""
    WITH s AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT path, count(*) AS n_sessions
    FROM s GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 20
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event paths — the product-analytics "what do users actually
    do" query: each (user, day) session becomes an ordered
    event-type string (deterministic (ts, event_id) order), and the 20
    most common paths rank by frequency.

    Scale shape: one groupBy builds sessions (collect_list is bounded
    by session length, not corpus size), path assembly runs on the
    per-session array (rows = sessions, so the interpreted-HOF cost the
    hot paths avoid is per-session here), and the final count collapses
    to TakeOrderedAndProject."""
    ev = load_tables(spark, sf_dir)["events"]
    sess = ev.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("seq")
    )
    paths = sess.select(
        F.expr(
            "array_join(transform(seq, x -> x.event_type), '>')"
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
    )


@query(
    "events_value_trend",
    oracle="""
    WITH pts AS (
      SELECT user_id,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
             CAST(floor(value * 100) AS BIGINT) AS y
      FROM events
    ),
    s AS (
      SELECT user_id, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy
      FROM pts GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           CASE WHEN n * sxx - sx * sx <> 0 THEN
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE)
           END AS slope_cents_per_day
    FROM s
    """,
)
def events_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value trend — closed-form OLS slope (cents/day) from
    exact integer sums: x = days since epoch, y = floor(value·100).
    n·Σxy − Σx·Σy and n·Σx² − (Σx)² are exact BIGINTs (bounds checked:
    |num| < 2^61 at sf3 event volumes), so the single IEEE division is
    bit-identical across engines AND across partitionings — the classic
    float-sum nondeterminism of distributed regression disappears when
    the sums are integral. Users on a single day get NULL (zero
    variance), not a division blowup.

    Scale shape: one scan, one map-side-combined groupBy carrying five
    integer accumulators per user — the same cost as a count. This is
    the degenerate-but-exact end of per-group ML: closed-form fits stay
    one aggregate at any scale."""
    ev = load_tables(spark, sf_dir)["events"]
    pts = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("x"),
        F.floor(F.col("value") * 100).cast("long").alias("y"),
    )
    s = pts.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.select(
        "user_id",
        F.col("n").cast("bigint").alias("n_events"),
        F.when(den != 0, num.cast("double") / den.cast("double")).alias(
            "slope_cents_per_day"
        ),
    )


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o.o_orderkey,
           o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    HAVING count(*) >= 6
    ORDER BY revenue DESC, o_orderkey
    LIMIT 100
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact join with ZERO exchanges: both sides come from the
    bucketed layout (``pipeline_bucketed_layout`` — bucketBy(8,
    orderkey) + sortBy), so the sort-merge join AND the per-orderkey
    aggregation both reuse the on-disk hash distribution. The physical
    plan is pinned to contain no Exchange at all — scan → join → agg →
    TakeOrderedAndProject.

    Scale shape: THE pattern for repeated big-big joins at 100 TB — the
    layout shuffle is paid once (by the writer), after which every
    orderkey-keyed join or rollup is shuffle-free regardless of how
    many times the pipeline runs. The merge hint keeps AQE from
    "helpfully" broadcasting the small test-scale side, so the plan
    shape measured here is the one a 1000-executor cluster gets.
    grouping on (o_orderkey, o_orderpriority) stays exchange-free
    because HashPartitioning(o_orderkey) already clusters any key set
    containing o_orderkey."""
    from polars_gdal_spark.queries.pipeline import _bucketed_tables

    ot, lt = _bucketed_tables(spark, sf_dir)
    o = spark.table(ot)
    li = spark.table(lt)
    one = F.lit(1).cast(DEC)
    return (
        li.hint("merge")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
            .cast("double")
            .alias("revenue"),
        )
        .where(F.col("n_items") >= 6)
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(100)
    )


@query(
    "join_interval_binned",
    oracle="""
    WITH pur AS (
      SELECT event_id, epoch_us(ts) AS t FROM events
      WHERE event_type = 'purchase'
    ),
    err AS (
      SELECT epoch_us(ts) AS lo, epoch_us(ts) + 1800000000 AS hi
      FROM events WHERE event_type = 'error'
    )
    SELECT p.event_id, CAST(count(*) AS BIGINT) AS n_incidents
    FROM pur p JOIN err e ON p.t >= e.lo AND p.t < e.hi
    GROUP BY 1
    """,
)
def join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIG×BIG interval-overlap join made EQUI by bucketization — count,
    per purchase event, the 30-minute error-incident windows containing
    it. The naive plan for point-in-interval predicates is a
    BroadcastNestedLoopJoin (fine for a 3-row bucket dim like
    ``join_range_nonequi``; catastrophic when BOTH sides grow with the
    corpus). The production recipe instead:

    * bucket width = window width, so every interval covers ≤ 2 buckets
      (bounded blow-up) and each point lands in exactly 1;
    * explode intervals into their covered buckets (codegen
      ``explode(sequence(...))``), equi-join on the bucket, exact range
      filter after — a (point, interval) pair can match in at most one
      bucket, so no dedup pass is needed;
    * the join is now shuffle-partitioned on the bucket key: both sides
      scale out instead of nesting loops.

    All arithmetic is BIGINT epoch-microseconds on both engines. Note
    the matched-pair count itself is semantics-driven (a purchase
    inside k overlapping incident windows must count k) — the recipe's
    contribution is that the pair generation is equi-partitioned and
    map-side pre-aggregable across the cluster instead of nested-looped
    on one executor."""
    ev = load_tables(spark, sf_dir)["events"]
    W = 1_800_000_000  # 30 min in micros = bucket width = window width
    pur = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        F.unix_micros("ts").alias("t"),
        # integer div, not `/`: double division of epoch-micros loses
        # exactness near bucket boundaries
        F.expr(f"unix_micros(ts) div {W}").alias("bucket"),
    )
    err = ev.where(F.col("event_type") == "error").select(
        F.unix_micros("ts").alias("lo"),
        (F.unix_micros("ts") + W).alias("hi"),
    )
    err_b = err.select(
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.expr(f"lo div {W}"),
                F.expr(f"(hi - 1) div {W}"),
            )
        ).alias("bucket"),
    )
    return (
        pur.join(err_b, "bucket")
        .where((F.col("t") >= F.col("lo")) & (F.col("t") < F.col("hi")))
        .groupBy("event_id")
        .agg(F.count("*").cast("bigint").alias("n_incidents"))
    )
