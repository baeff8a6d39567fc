"""User-journey analytics over ``events`` — funnel conversion,
retention cohorts, sequential path mining.

North-star extensions (SURVEY §2 "not present in reference" — window
functions beyond top-1, event-time analytics). The reference's only
per-key temporal pattern is the top-1-per-key state lookup
(nvd2mysqlloader.py:72); these generalize it to the multi-stage
journey shapes every event warehouse needs.

Scale notes (100 TB):
  * every query here shuffles ONCE on ``user_id`` (or a rollup key
    strictly smaller than the input) — user-partitioned windows chain
    on one exchange because each stage reuses the same partitioning;
  * no self-joins of the event stream: stage timestamps derive from
    conditional MIN windows over a single scan, where the naive form
    (events JOIN events ON later-stage) is quadratic in events/user;
  * path mining ranks with a heap (TakeOrderedAndProject), never a
    global sort of the path space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from .registry import query


@query(
    "funnel_conversion",
    oracle="""
    WITH s1 AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'signup' THEN ts END)
               OVER (PARTITION BY user_id) AS signup_ts
      FROM events),
    s2 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts > signup_ts
                         THEN ts END)
                  OVER (PARTITION BY user_id) AS click_ts
      FROM s1),
    s3 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > click_ts
                         THEN ts END)
                  OVER (PARTITION BY user_id) AS purchase_ts
      FROM s2)
    SELECT count(DISTINCT user_id) AS n_users,
           count(DISTINCT CASE WHEN signup_ts IS NOT NULL
                               THEN user_id END) AS n_signup,
           count(DISTINCT CASE WHEN click_ts IS NOT NULL
                               THEN user_id END) AS n_click_after,
           count(DISTINCT CASE WHEN purchase_ts IS NOT NULL
                               THEN user_id END) AS n_purchase_after
    FROM s3
    """,
    doc="3-stage ordered funnel (signup→click→purchase): stage times "
        "via chained conditional-MIN windows on ONE user_id exchange — "
        "never an events-to-events self-join (quadratic per user)",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    # Chained conditional MINs: each stage's earliest qualifying ts
    # references the previous stage's window result. Same partitioning
    # for all three → Catalyst plans one Exchange, three Window ops.
    s1 = events.withColumn(
        "signup_ts",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w))
    s2 = s1.withColumn(
        "click_ts",
        F.min(F.when((F.col("event_type") == "click")
                     & (F.col("ts") > F.col("signup_ts")),
                     F.col("ts"))).over(w))
    s3 = s2.withColumn(
        "purchase_ts",
        F.min(F.when((F.col("event_type") == "purchase")
                     & (F.col("ts") > F.col("click_ts")),
                     F.col("ts"))).over(w))
    return s3.agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count_distinct(
            F.when(F.col("signup_ts").isNotNull(), F.col("user_id")))
        .alias("n_signup"),
        F.count_distinct(
            F.when(F.col("click_ts").isNotNull(), F.col("user_id")))
        .alias("n_click_after"),
        F.count_distinct(
            F.when(F.col("purchase_ts").isNotNull(), F.col("user_id")))
        .alias("n_purchase_after"))


@query(
    "retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, ts,
             date_trunc('week', min(ts) OVER (PARTITION BY user_id))
               AS cohort_week
      FROM events)
    SELECT cohort_week,
           CAST(date_diff('day', cohort_week,
                          date_trunc('week', ts)) / 7 AS BIGINT)
             AS week_offset,
           count(DISTINCT user_id) AS n_active
    FROM firsts
    GROUP BY 1, 2
    """,
    doc="weekly retention cohorts: cohort = week of first activity "
        "(MIN window, one user_id exchange), offset in whole weeks, "
        "distinct actives per (cohort, offset) — rollup output is "
        "|cohorts|x|weeks| rows regardless of input scale",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    # cast to DATE: DuckDB's date_trunc('week') yields DATE, Spark's
    # yields TIMESTAMP — the boundary type must agree for the hash.
    cohort = (F.date_trunc("week", F.min("ts").over(w)).cast("date")
              .alias("cohort_week"))
    withc = events.select("user_id", "ts", cohort)
    # Both week stamps are Monday-truncated, so the day gap is an
    # exact multiple of 7 — integer division is exact in both engines.
    offset = (F.datediff(F.date_trunc("week", F.col("ts")).cast("date"),
                         F.col("cohort_week")) / 7).cast("bigint")
    return (withc
            .groupBy("cohort_week", offset.alias("week_offset"))
            .agg(F.count_distinct("user_id").alias("n_active")))


@query(
    "session_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             lead(event_type, 1) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
             lead(event_type, 2) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      FROM events)
    SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path LIMIT 10
    """,
    doc="sequential path mining: top-10 3-event paths via lead() over "
        "(user, ts, event_id-tiebreak) — one user_id exchange, path "
        "rollup bounded by |event_types|^3 keys, top-k is a heap",
)
def session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # event_id tiebreak makes the per-user order total → lead() is
    # deterministic even with equal timestamps.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"))
    return (seq.filter(F.col("e3").isNotNull())
            .groupBy(F.concat_ws(">", "e1", "e2", "e3").alias("path"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "path")
            .limit(10))
