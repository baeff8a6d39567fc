"""Event-time analytics over ``events`` — the batch twins of the
streaming surface (tumbling windows, sessionization).

The reference has no event-time windows (SURVEY §2 #49); these are the
north-star extensions. The streaming variants (readStream + watermark)
live in ``streaming/``; batch and streaming share the same aggregation
semantics, so the DuckDB oracle checks the batch plan and the streaming
tests assert batch↔stream agreement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from ._helpers import dsum
from ..operators._lineage import cut_lineage as _cut
from .registry import query


@query(
    "tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2
    """,
    doc="tumbling event-time window aggregate (1h) — F.window in Spark; epoch-aligned 1h buckets == date_trunc('hour') (§2 #49)",
)
def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (events
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 dsum("value", 4).alias("sum_value"),
                 F.count_distinct("user_id").alias("n_users"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "sum_value", "n_users"))


@query(
    "sliding_window",
    oracle="""
    WITH starts AS (
      SELECT e.event_id, e.event_type, e.value,
             time_bucket(INTERVAL '15 minutes', e.ts)
               - k.k * INTERVAL '15 minutes' AS window_start
      FROM events e, (SELECT unnest(generate_series(0, 3)) AS k) k
      WHERE time_bucket(INTERVAL '15 minutes', e.ts)
              - k.k * INTERVAL '15 minutes' > e.ts - INTERVAL '1 hour'
    )
    SELECT window_start, event_type, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM starts GROUP BY 1, 2
    """,
    doc="sliding event-time window (1h length, 15min slide): each event lands in 4 windows — F.window(slide) in Spark, explicit window-start expansion as the oracle (§2 #49)",
)
def sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (events
            .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"),
                     "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 dsum("value", 4).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "sum_value"))


@query(
    "value_histogram",
    oracle="""
    SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(min(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS lo,
           CAST(max(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS hi
    FROM events GROUP BY 1
    """,
    doc="fixed-width histogram over event values (width_bucket analog) — single pass, partial-aggregating",
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (events
            .groupBy(F.floor(F.col("value") / 25.0).cast("bigint")
                     .alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min(F.col("value").cast("decimal(18,4)")).cast("double")
                 .alias("lo"),
                 F.max(F.col("value").cast("decimal(18,4)")).cast("double")
                 .alias("hi")))


@query(
    "sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       <= 30 * 60 * 1000000
                  THEN 0 ELSE 1 END AS new_sess
      FROM events
    ), numbered AS (
      SELECT *, CAST(sum(new_sess)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM numbered GROUP BY user_id, session_id
    """,
    doc="sessionization (30-min gap) via lag + cumulative-sum gaps-and-islands — batch twin of session_window (§2 #49); one shuffle on user_id reused by both windows and the final agg",
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond precision on both engines (timestamps carry micros)
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    flagged = events.withColumn(
        "new_sess", F.when(gap <= 30 * 60 * 1_000_000, F.lit(0)).otherwise(F.lit(1)))
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding,
                                             Window.currentRow)))
    return (numbered.groupBy("user_id", "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 dsum("value", 4).alias("sum_value")))


@query(
    "error_window_event_rollup",
    oracle="""
    SELECT i.event_id AS anchor_id, count(*) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') i
    JOIN events e
      ON e.ts >= i.ts AND e.ts < i.ts + INTERVAL 2 HOUR
    GROUP BY i.event_id
    """,
    doc=(
        "range (interval) join: all events inside the 2-hour window "
        "after each error event, rolled up per anchor. The naive "
        "non-equi form is a BroadcastNestedLoopJoin (quadratic); "
        "operators.rangejoin.bucketed_interval_join restructures it "
        "into a 2h-bucket hash equi-join + exact residual (each window "
        "spans exactly 2 buckets, each event one), so at 100 TB it "
        "shuffles and AQE-balances like any equi-join instead of "
        "looping."
    ),
)
def error_window_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import bucketed_interval_join

    ev = load_table(spark, sf_dir, "events")
    points = ev.select("ts", "value")
    anchors = (ev.filter(F.col("event_type") == "error")
               .select(F.col("event_id").alias("anchor_id"),
                       F.col("ts").alias("lo"),
                       (F.col("ts") + F.expr("INTERVAL 2 HOUR")).alias("hi")))
    joined = bucketed_interval_join(points, anchors, "ts", "lo", "hi",
                                    bucket_seconds=7200)
    return (joined.groupBy("anchor_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 dsum("value", 4).alias("sum_value")))


@query(
    "gap_filled_hourly",
    oracle="""
    WITH agg AS (
      SELECT date_trunc('hour', ts) AS hour_start, count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1
    ), bounds AS (
      SELECT min(hour_start) AS lo, max(hour_start) AS hi FROM agg
    ), cal AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
      FROM bounds
    )
    SELECT c.hour_start,
           CAST(COALESCE(a.n_events, 0) AS BIGINT) AS n_events,
           COALESCE(a.sum_value, 0.0) AS sum_value
    FROM cal c LEFT JOIN agg a USING (hour_start)
    """,
    doc=(
        "time-series gap filling: hourly rollup → derive [min,max] "
        "bounds from the rollup itself (ONE fact scan), generate the "
        "dense hour calendar with sequence()+explode, left-join the "
        "rollup back and zero-fill missing buckets. The calendar and "
        "rollup are both tiny post-aggregation — the fill join "
        "broadcasts; at 100 TB the only heavy step stays the "
        "partial-aggregating rollup scan."
    ),
)
def gap_filled_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    agg = (events
           .groupBy(F.date_trunc("hour", "ts").alias("hour_start"))
           .agg(F.count(F.lit(1)).alias("n_events"),
                dsum("value", 4).alias("sum_value"))
           )
    agg = _cut(agg)      # one scan feeds bounds + join
    cal = (agg.agg(F.min("hour_start").alias("lo"),
                   F.max("hour_start").alias("hi"))
           .select(F.explode(F.sequence(
               "lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour_start")))
    return (cal.join(agg, "hour_start", "left")
            .select("hour_start",
                    F.coalesce("n_events", F.lit(0)).cast("bigint")
                    .alias("n_events"),
                    F.coalesce("sum_value", F.lit(0.0)).alias("sum_value")))


@query(
    "salted_skew_rollup",
    oracle="""
    WITH dim(event_type, weight) AS (
      VALUES ('click', 1.0), ('view', 0.1), ('purchase', 10.0),
             ('error', 0.0), ('signup', 0.5)
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(18,4))
                    * CAST(d.weight AS DECIMAL(6,1))) AS DOUBLE)
             AS weighted_value
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY e.event_type
    """,
    doc=(
        "skew-salted dimension join under the oracle gate: event_type "
        "has ~5 values over the whole fact (extreme key skew — the "
        "worst case for a plain shuffle join), so the fact side gets a "
        "deterministic row-hash salt and the 5-row dim is replicated "
        "per salt value (operators.scale.salted_join); a hot key "
        "spreads across 16 partitions instead of melting one. Results "
        "must hash-equal the plain GROUP BY oracle — salting is a "
        "physical rewrite with zero semantic drift."
    ),
)
def salted_skew_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scale import salted_join

    events = load_table(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.1), ("purchase", 10.0),
         ("error", 0.0), ("signup", 0.5)], ["event_type", "weight"])
    joined = salted_join(events, dim, "event_type", salt_buckets=16)
    wv = (F.col("value").cast("decimal(18,4)")
          * F.col("weight").cast("decimal(6,1)"))
    return (joined.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(wv).cast("double").alias("weighted_value")))


_PATTERN = [50.0, 60.0, 70.0, 60.0, 50.0, 40.0, 30.0, 40.0]


def _d2_sql(pat: list[float], elem: str) -> str:
    """Left-to-right nested sum of squared deltas — the SAME expression
    tree in both engines, so the doubles are bit-equal (IEEE ops are
    correctly rounded; equal inputs + equal parenthesization = equal
    bits). ``elem`` is an accessor template ('s[{i}]' for DuckDB's
    1-based subscript, 'element_at(s, {i})' for Spark's 1-based
    element_at — Spark's [] subscript is 0-based)."""
    def t(i, p):
        e = elem.format(i=i + 1)
        return f"(({e} - {p}) * ({e} - {p}))"
    terms = [t(i, p) for i, p in enumerate(pat)]
    out = terms[0]
    for term in terms[1:]:
        out = f"({out} + {term})"
    return out


@query(
    "pattern_match_topk",
    oracle=f"""
    WITH sub AS (
      SELECT user_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS pos,
             list(value) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS BETWEEN CURRENT ROW
                               AND 7 FOLLOWING) AS s
      FROM events
    )
    SELECT user_id, pos, {_d2_sql(_PATTERN, 's[{i}]')} AS d2
    FROM sub WHERE len(s) = 8
    ORDER BY d2, user_id, pos LIMIT 10
    """,
    doc=(
        "time-series subsequence similarity search (pattern matching): "
        "each user's event-value series yields its length-8 "
        "subsequences via a rows-frame collect_list (frame order = "
        "sort order, deterministic), squared euclidean distance to a "
        "fixed pattern as one shared expression tree (bit-equal "
        "doubles across engines), heap top-10 "
        "(TakeOrderedAndProject — never a full sort). One shuffle on "
        "user_id; at 100 TB the pattern scan is embarrassingly "
        "parallel per series partition (cf. distributed subsequence "
        "matching in EDBT'19 streaming-similarity literature)."
    ),
)
def pattern_match_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = order.rowsBetween(Window.currentRow, 7)
    sub = (events.select(
        "user_id",
        F.row_number().over(order).alias("pos"),
        F.collect_list("value").over(frame).alias("s"))
        .filter(F.size("s") == 8))
    d2 = F.expr(_d2_sql(_PATTERN, "element_at(s, {i})"))
    return (sub.select("user_id", "pos", d2.alias("d2"))
            .orderBy(F.asc("d2"), F.asc("user_id"), F.asc("pos"))
            .limit(10))
