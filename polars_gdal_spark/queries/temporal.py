"""Temporal-join and IVF queries (driver contract)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from polars_gdal_spark.functions.similarity import ivf_search
from polars_gdal_spark.functions.temporal import as_of_join
from polars_gdal_spark.queries import load_tables, query

_Q_SQL = """
  q AS (
    SELECT vec_id, label,
           list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
    FROM embeddings
  )
"""


@query(
    "asof_purchase_last_click",
    oracle="""
    SELECT p.event_id, p.user_id,
           c.event_id AS click_id_asof,
           c.value AS click_value_asof
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase gets the user's most recent click at or
    before it. Implemented as union + sort + last-value carry-forward —
    one shuffle per key, no non-equi join (functions/temporal.py); the
    oracle is DuckDB's native ASOF JOIN."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), F.col("value").alias("click_value")
    )
    joined = as_of_join(
        purchases, clicks, on="user_id", time_col="ts",
        right_cols=["click_id", "click_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("click_id_asof"),
        F.col("click_value_asof"),
    )


@query(
    "sim_ivf_probe_search",
    oracle=f"""
    WITH {_Q_SQL},
    cent AS (SELECT vec_id AS centroid_id, v AS cv FROM q WHERE vec_id < 8),
    vecs AS (SELECT vec_id, v FROM q WHERE vec_id >= 8),
    qq AS (SELECT v AS qv FROM q WHERE vec_id = 8),
    assign AS (
      SELECT vec_id, centroid_id FROM (
        SELECT vecs.vec_id, cent.centroid_id,
               row_number() OVER (
                 PARTITION BY vecs.vec_id
                 ORDER BY list_dot_product(vecs.v, cent.cv)
                          / (sqrt(list_dot_product(vecs.v, vecs.v))
                             * sqrt(list_dot_product(cent.cv, cent.cv))) DESC,
                          cent.centroid_id) AS rk
        FROM vecs, cent
      ) WHERE rk = 1
    ),
    probe AS (
      SELECT centroid_id FROM cent, qq
      ORDER BY list_dot_product(cent.cv, qq.qv)
               / (sqrt(list_dot_product(cent.cv, cent.cv))
                  * sqrt(list_dot_product(qq.qv, qq.qv))) DESC, centroid_id
      LIMIT 2
    )
    SELECT v.vec_id, a.centroid_id,
           list_dot_product(v.v, qq.qv)
             / (sqrt(list_dot_product(v.v, v.v))
                * sqrt(list_dot_product(qq.qv, qq.qv))) AS cosine
    FROM vecs v
    JOIN assign a ON a.vec_id = v.vec_id
    JOIN probe p ON p.centroid_id = a.centroid_id, qq
    ORDER BY cosine DESC, v.vec_id
    LIMIT 5
    """,
)
def sim_ivf_probe_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: vectors 0-7 serve as deterministic coarse centroids;
    corpus = the rest; query = vec_id 8. Assign → probe top-2 cells →
    exact re-rank top-5. The scan prunes to ~n_probe/n_cells of the
    corpus — the index structure brute force graduates to at scale."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    centroids = emb.where(F.col("vec_id") < 8)
    corpus = emb.where(F.col("vec_id") >= 8)
    qv = emb.where(F.col("vec_id") == 8)
    return ivf_search(corpus, centroids, qv, k=5, n_probe=2)


@query(
    "events_click_attribution",
    oracle="""
    SELECT c.user_id AS c_user,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           epoch_us(c.ts) AS click_us,
           epoch_us(p.ts) AS purchase_us
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def events_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase attribution within a 1-hour window — the SAME
    operator `streaming.stream_click_purchase_pairs` runs as a
    watermarked stream-stream join (§2.K); on a batch DataFrame it
    executes as a range self-join, so the oracle gate certifies the
    streaming operator's join semantics. Timestamps emitted as epoch
    micros (determinism contract: never hash raw timestamps)."""
    from polars_gdal_spark.streaming import stream_click_purchase_pairs

    events = load_tables(spark, sf_dir)["events"]
    return stream_click_purchase_pairs(events).select(
        "c_user",
        "click_id",
        "purchase_id",
        F.unix_micros("click_ts").alias("click_us"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
    )


@query(
    "events_funnel",
    oracle="""
    WITH c AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'click' GROUP BY user_id
    ),
    s AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'signup' AND e.ts >= c.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM c) AS n_click,
           (SELECT count(*) FROM s) AS n_signup_after_click,
           (SELECT count(*) FROM p) AS n_purchase_after_signup
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-stage funnel (click -> signup -> purchase): per user,
    the first click, the first signup at-or-after it, the first purchase
    at-or-after that; one row of stage conversion counts. Each stage is
    a user-key aggregate (map-side combined) joined to the previous
    stage's (user, ts) frontier — the frontier is users-sized, far
    smaller than the event stream, and every join is a user-key
    equi-join (no range/window state)."""
    events = load_tables(spark, sf_dir)["events"]
    c = (
        events.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s = (
        events.where(F.col("event_type") == "signup")
        .join(c, "user_id")
        .where(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .where(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        c.agg(F.count("*").alias("n_click"))
        .crossJoin(s.agg(F.count("*").alias("n_signup_after_click")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after_signup")))
    )


@query(
    "events_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events
    )
    SELECT CAST(f.cohort_week AS TIMESTAMP) AS cohort_week,
           CAST(datediff('day', f.cohort_week, a.act_week) // 7 AS BIGINT)
             AS week_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM first_seen f JOIN activity a USING (user_id)
    GROUP BY 1, 2
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: cohort = week of a user's first
    event; one row per (cohort, week offset) with distinct active users.
    Two user-key aggregates (map-side combined) + one user-key equi-join
    — the frontier tables are users-sized, never event-stream-sized."""
    events = load_tables(spark, sf_dir)["events"]
    first_seen = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    return (
        first_seen.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("act_week"), F.col("cohort_week"))
                / F.lit(7)
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@query(
    "asof_click_next_purchase",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id AS click_id, ts FROM events
      WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, event_id AS purchase_id, ts FROM events
      WHERE event_type = 'purchase'
    ),
    j AS (
      SELECT c.click_id, p.purchase_id, c.ts AS cts, p.ts AS pts,
             row_number() OVER (
               PARTITION BY c.click_id ORDER BY p.ts, p.purchase_id
             ) AS rk
      FROM c JOIN p
        ON c.user_id = p.user_id
       AND p.ts >= c.ts
       AND p.ts <= c.ts + INTERVAL 2 HOUR
    )
    SELECT click_id,
           purchase_id,
           epoch_us(pts) - epoch_us(cts) AS wait_us
    FROM j WHERE rk = 1
    """,
)
def asof_click_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: each click's NEXT purchase by the
    same user within 2 hours (union-sort-carry, one user-key shuffle —
    never a range nested loop). Simultaneous purchases tie-break on id,
    matching the oracle's window ordering."""
    from polars_gdal_spark.functions.temporal import as_of_join_forward

    events = load_tables(spark, sf_dir)["events"]
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    j = as_of_join_forward(
        clicks,
        purchases,
        on="user_id",
        time_col="ts",
        right_cols=["purchase_id"],
        tolerance_seconds=7200,
        tiebreak_col="purchase_id",
    )
    return j.where(F.col("purchase_id_next").isNotNull()).select(
        "click_id",
        F.col("purchase_id_next").alias("purchase_id"),
        (F.unix_micros("ts_next") - F.unix_micros("ts")).alias(
            "wait_us"
        ),
    )


@query(
    "events_rolling_distinct",
    oracle="""
    WITH du AS (
      SELECT DISTINCT
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             user_id
      FROM events
    ),
    fanout AS (
      SELECT DISTINCT d + off AS day_num, user_id
      FROM du, (SELECT unnest(generate_series(0, 6)) AS off) o
    ),
    actual AS (SELECT DISTINCT d AS day_num FROM du)
    SELECT f.day_num, count(DISTINCT f.user_id) AS n_users
    FROM fanout f JOIN actual a USING (day_num)
    GROUP BY f.day_num
    """,
)
def events_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the standard WAU
    curve. Exact sliding-window COUNT DISTINCT is not windowable (sets
    don't subtract), so each (day, user) first-class row fans out to the
    ≤7 report days it supports and one groupBy counts per day — the
    scan-once/fan-out-small shape: the distinct (day, user) frontier is
    users×days-sized (map-side combined), the ×7 fan-out multiplies the
    FRONTIER, never the event stream, and days with no events are
    dropped by the semi-join against observed days. Day keys are epoch
    day numbers (exact integers in both engines)."""
    events = load_tables(spark, sf_dir)["events"]
    du = events.select(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d"),
        "user_id",
    ).distinct()
    # no .distinct() here: the fan-out of a distinct (d, user) frontier
    # cannot duplicate (day_num, user) pairs' contribution to
    # count_distinct, whose partial phase performs exactly that dedup —
    # an explicit distinct would duplicate the widest exchange
    fanout = du.select(
        F.explode(F.expr("sequence(d, d + 6)")).alias("day_num"), "user_id"
    )
    actual = du.select(F.col("d").alias("day_num")).distinct()
    return (
        fanout.join(actual, "day_num", "left_semi")
        .groupBy("day_num")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .select(F.col("day_num").cast("bigint").alias("day_num"), "n_users")
    )
