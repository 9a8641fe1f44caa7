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


# SCD2 CTE chain shared by the dimension build and the point-in-time
# join: gaps-and-islands over the per-customer priority timeline.
_SCD2_SQL = """
    o AS (
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
    ),
    dim AS (
      SELECT o_custkey, version, priority,
             strftime(vf, '%Y-%m-%d') AS valid_from,
             strftime(lead(vf) OVER (PARTITION BY o_custkey
                                     ORDER BY version),
                      '%Y-%m-%d') AS valid_to
      FROM runs
    )
"""


@query(
    "scd2_customer_history",
    oracle=f"""
    WITH {_SCD2_SQL}
    SELECT o_custkey, version, priority, valid_from, valid_to FROM dim
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
    return _scd2_dim(spark, sf_dir)


def _scd2_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
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


@query(
    "join_scd2_pointintime",
    oracle=f"""
    WITH {_SCD2_SQL},
    f AS (
      SELECT l.l_orderkey, l.l_linenumber, o.o_custkey,
             strftime(l.l_shipdate, '%Y-%m-%d') AS ship_date
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_orderkey < 20000
    )
    SELECT f.l_orderkey, f.l_linenumber, f.ship_date,
           d.priority AS priority_at_ship,
           CAST(d.version AS BIGINT) AS dim_version
    FROM f JOIN dim d
      ON d.o_custkey = f.o_custkey
     AND f.ship_date >= d.valid_from
     AND (d.valid_to IS NULL OR f.ship_date < d.valid_to)
    """,
)
def join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) join against the SCD2 dimension —
    the USE half of ``scd2_customer_history``'s BUILD: for every
    lineitem, recover the customer's priority attribute as it was ON
    THE SHIP DATE (ship dates lag order dates, so this genuinely reads
    historical versions, not the row's own run). This is the canonical
    warehouse pattern for joining facts to slowly-changing dimensions
    without leaking future attribute values into the past — the
    training-data analogue is labeling examples with the metadata that
    was true at collection time.

    Scale shape: the fact side equi-joins the dimension on the
    CUSTOMER key (co-partitioned shuffle); the validity-window test
    rides along as a join residual, and per-key interval lists are
    bounded by that customer's change count — so the pair space is
    |facts| × versions-per-customer, never a nested loop. Interval
    endpoints compare as yyyy-MM-dd strings (lexicographic = temporal,
    identical both engines); the open current row is the IS NULL arm."""
    t = load_tables(spark, sf_dir)
    dim = _scd2_dim(spark, sf_dir)
    f = (
        t["lineitem"]
        .where(F.col("l_orderkey") < 20000)
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "o_custkey",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        )
    )
    d = dim.select(
        F.col("o_custkey").alias("d_custkey"),
        "version",
        "priority",
        "valid_from",
        "valid_to",
    )
    return (
        f.join(
            d,
            (F.col("o_custkey") == F.col("d_custkey"))
            & (F.col("ship_date") >= F.col("valid_from"))
            & (
                F.col("valid_to").isNull()
                | (F.col("ship_date") < F.col("valid_to"))
            ),
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "ship_date",
            F.col("priority").alias("priority_at_ship"),
            F.col("version").cast("bigint").alias("dim_version"),
        )
    )
