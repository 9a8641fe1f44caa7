"""Window-function family completion + remaining SQL-surface coverage
(rank family, range frames, first/last, HAVING, FILTER aggregates,
explode/unnest, null-handling scalars, argmax pattern)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from polars_gdal_spark.queries import load_tables, query

DEC = "decimal(18,2)"


@query(
    "window_rank_family",
    oracle="""
    SELECT o_orderkey,
           CAST(rank() OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cdist
    FROM orders
    WHERE o_orderkey < 1000
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/ntile/percent_rank/cume_dist — ratios are exact
    int/int divisions, identical across engines."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return (
        t["orders"]
        .where(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.rank().over(w).cast("int").alias("rnk"),
            F.dense_rank().over(w).cast("int").alias("drnk"),
            F.ntile(4).over(w).cast("int").alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cdist"),
        )
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey,
           CAST(count(*) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS orders_last_30d
    FROM orders
    WHERE o_custkey < 30
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based window): orders per customer in the
    trailing 30 days — the rolling-window shape rowsBetween can't give."""
    t = load_tables(spark, sf_dir)
    day = F.datediff(
        F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, Window.currentRow)
    )
    return (
        t["orders"]
        .where(F.col("o_custkey") < 30)
        .select(
            "o_orderkey",
            F.count("*").over(w).cast("bigint").alias("orders_last_30d"),
        )
    )


@query(
    "window_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_order
    FROM orders
    WHERE o_custkey < 30
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value with an explicit full-partition frame
    (the default frame would make last_value = current row)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        t["orders"]
        .where(F.col("o_custkey") < 30)
        .select(
            "o_orderkey",
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(wfull).alias("last_order"),
        )
    )


@query(
    "having_filter_groups",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           CAST(bool_or(o_totalprice > 400000) AS INT) AS has_big
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 15
    """,
)
def having_filter_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING + FILTER-clause aggregates + bool_or."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias(
                "n_finished"
            ),
            F.max(F.when(F.col("o_totalprice") > 400000, 1).otherwise(0))
            .cast("int")
            .alias("has_big"),
        )
        .where(F.col("n_orders") >= 15)
    )


@query(
    "word_frequencies",
    oracle="""
    SELECT w AS word, count(*) AS freq
    FROM (
      SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        AS w
      FROM documents
    )
    GROUP BY w
    ORDER BY freq DESC, word
    LIMIT 20
    """,
)
def word_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode/unnest (lateral) + top-k: the word-count of the corpus."""
    t = load_tables(spark, sf_dir)
    toks = F.filter(
        F.split(F.lower("text"), " "), lambda x: x != F.lit("")
    )
    return (
        t["documents"]
        .select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(20)
    )


@query(
    "scalar_null_handling",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
           greatest(o_totalprice, 100000.0) AS at_least_100k,
           least(CAST(o_orderkey AS BIGINT), CAST(o_custkey AS BIGINT)) AS min_key,
           CAST(o_custkey IS NOT NULL AS INT) AS has_cust,
           ifnull(NULL, o_orderkey) AS passthrough
    FROM orders WHERE o_orderkey < 300
    """,
)
def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalar coverage: coalesce/nullif/greatest/least/
    ifnull."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .where(F.col("o_orderkey") < 300)
        .select(
            "o_orderkey",
            F.coalesce(
                F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")
            ).alias("status_or_open"),
            F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias(
                "at_least_100k"
            ),
            F.least(
                F.col("o_orderkey").cast("bigint"),
                F.col("o_custkey").cast("bigint"),
            ).alias("min_key"),
            F.col("o_custkey").isNotNull().cast("int").alias("has_cust"),
            F.ifnull(F.lit(None), F.col("o_orderkey")).alias("passthrough"),
        )
    )


@query(
    "argmax_latest_order",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_order,
           strftime(o_orderdate, '%Y-%m-%d') AS latest_date
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def argmax_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The argmax/QUALIFY pattern: latest order per customer via
    row_number=1 — WindowGroupLimit trims partitions before the sort
    materializes (see tools/explain_audit.py)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        t["orders"]
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_order"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("latest_date"),
        )
    )


@query(
    "window_nth_value",
    oracle="""
    SELECT o_orderkey,
           COALESCE(nth_value(o_orderkey, 2) OVER w, -1) AS second_cheapest,
           CAST(CAST(COALESCE(nth_value(o_totalprice, 3) OVER w, -1)
                     AS DECIMAL(18,2)) AS DOUBLE) AS third_price
    FROM orders
    WHERE o_orderkey < 1000
    WINDOW w AS (
      PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over a full-partition frame (the per-group "2nd/3rd
    best" lookup without a self-join): second-cheapest order id and
    third-cheapest price per status, -1 when the partition is smaller
    than n (null-free output keeps the cross-engine compare exact).
    Deterministic under ties via the (price, key) compound ordering;
    partitioned window, parallel over status groups."""
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        t["orders"]
        .where(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.coalesce(F.nth_value("o_orderkey", 2).over(w), F.lit(-1))
            .alias("second_cheapest"),
            F.coalesce(F.nth_value("o_totalprice", 3).over(w), F.lit(-1))
            .cast(DEC)
            .cast("double")
            .alias("third_price"),
        )
    )


@query(
    "scd2_customer_history",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderkey, o_orderpriority, o_orderdate,
             CASE WHEN lag(o_orderpriority) OVER w
                       IS DISTINCT FROM o_orderpriority
                  THEN 1 ELSE 0 END AS chg
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    v AS (
      SELECT o_custkey, o_orderpriority, o_orderdate,
             CAST(sum(chg) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
      FROM o
    ),
    runs AS (
      SELECT o_custkey, version,
             min(o_orderpriority) AS priority,
             min(o_orderdate) AS vf
      FROM v GROUP BY o_custkey, version
    )
    SELECT o_custkey, version, priority,
           strftime(vf, '%Y-%m-%d') AS valid_from,
           strftime(lead(vf) OVER (PARTITION BY o_custkey ORDER BY version),
                    '%Y-%m-%d') AS valid_to
    FROM runs
    """,
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build — collapse each
    customer's order-priority timeline into effective-dated runs
    (valid_from / valid_to, open-ended current row) — the warehouse
    merge that turns an append-only fact stream into a versioned
    dimension, and the shape every incremental ingestion pipeline needs
    for "what was true at time t" joins.

    Gaps-and-islands in three partitioned steps: lag() marks change
    points, a running sum numbers the runs (version), one
    map-side-combined groupBy collapses runs, and lead() closes each
    interval with its successor's start. All windows are PARTITIONED by
    customer — per-customer timelines are tiny and uniform, so this
    parallelizes by key at any corpus size; dates are emitted as
    strings per the no-raw-timestamps determinism contract."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o = t["orders"].withColumn(
        "chg",
        F.expr(
            "CASE WHEN lag(o_orderpriority) OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey) IS DISTINCT FROM "
            "o_orderpriority THEN 1 ELSE 0 END"
        ),
    )
    v = o.withColumn("version", F.sum("chg").over(wc).cast("bigint"))
    runs = v.groupBy("o_custkey", "version").agg(
        F.min("o_orderpriority").alias("priority"),
        F.min("o_orderdate").alias("vf"),
    )
    wl = Window.partitionBy("o_custkey").orderBy("version")
    return runs.select(
        "o_custkey",
        "version",
        "priority",
        F.date_format("vf", "yyyy-MM-dd").alias("valid_from"),
        F.date_format(F.lead("vf").over(wl), "yyyy-MM-dd").alias("valid_to"),
    )
