"""Extended relational surface — operators absent from the reference
(SURVEY §2 'not present anywhere') that the engine exposes because they
come with Spark SQL: grouping analytics (rollup/cube/grouping sets),
set operations, pivot, as-of join, discrete percentiles, semi/anti
joins. Each with its ANSI oracle so the coverage is hash-verified, not
just claimed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from ._helpers import disc_percentile, dsum
from .registry import query


@query(
    "rollup_revenue",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="ROLLUP hierarchy totals (status → status×priority → grand total); map-side partial aggs per grouping set",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (orders
            .rollup("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 dsum("o_totalprice").alias("sum_price"))
            .select(F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
                    F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
                    "n_orders", "sum_price"))


@query(
    "cube_counts",
    oracle="""
    SELECT coalesce(l_returnflag, '*') AS rf,
           coalesce(l_linestatus, '*') AS ls,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over two dimensions — all 4 grouping sets in one pass",
)
def cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (li.cube("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("l_quantity").alias("qty"))
            .select(F.coalesce("l_returnflag", F.lit("*")).alias("rf"),
                    F.coalesce("l_linestatus", F.lit("*")).alias("ls"),
                    "n", "qty"))


@query(
    "grouping_sets_mix",
    oracle="""
    SELECT coalesce(o_orderstatus, '-') AS status,
           coalesce(o_orderpriority, '-') AS priority,
           count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="explicit GROUPING SETS via the SQL API (spark.sql over registered views)",
)
def grouping_sets_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql("""
        SELECT coalesce(o_orderstatus, '-') AS status,
               coalesce(o_orderpriority, '-') AS priority,
               count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


@query(
    "set_ops_customers",
    oracle="""
    WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                   AND o_orderdate <  TIMESTAMP '1997-01-01'),
         y97 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                   AND o_orderdate <  TIMESTAMP '1998-01-01')
    SELECT 'both' AS cohort, count(*) AS n
      FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)
    UNION ALL
    SELECT 'only_96', count(*) FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)
    UNION ALL
    SELECT 'only_97', count(*) FROM (SELECT * FROM y97 EXCEPT SELECT * FROM y96)
    """,
    doc="INTERSECT / EXCEPT cohort analysis (set operators, SURVEY §2 #34 'none in reference')",
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def year_keys(y0: str, y1: str) -> DataFrame:
        return (orders
                .filter((F.col("o_orderdate") >= F.lit(y0).cast("timestamp"))
                        & (F.col("o_orderdate") < F.lit(y1).cast("timestamp")))
                .select("o_custkey").distinct())

    y96 = year_keys("1996-01-01", "1997-01-01")
    y97 = year_keys("1997-01-01", "1998-01-01")
    rows = [
        y96.intersect(y97).agg(F.count(F.lit(1)).alias("n"))
           .select(F.lit("both").alias("cohort"), "n"),
        y96.exceptAll(y97).agg(F.count(F.lit(1)).alias("n"))
           .select(F.lit("only_96").alias("cohort"), "n"),
        y97.exceptAll(y96).agg(F.count(F.lit(1)).alias("n"))
           .select(F.lit("only_97").alias("cohort"), "n"),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@query(
    "pivot_status_revenue",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN o_orderstatus = 'O'
                THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE)
             AS rev_open,
           CAST(sum(CASE WHEN o_orderstatus = 'F'
                THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE)
             AS rev_filled,
           CAST(sum(CASE WHEN o_orderstatus = 'P'
                THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE)
             AS rev_pending
    FROM orders GROUP BY o_orderpriority
    """,
    doc="pivot (long→wide) of revenue by order status — .pivot() in Spark, portable CASE sums as the oracle",
)
def pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    pivoted = (orders
               .withColumn("p", dec)
               .groupBy("o_orderpriority")
               .pivot("o_orderstatus", ["O", "F", "P"])
               .agg(F.sum("p")))
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).cast("double").alias("rev_open"),
        F.coalesce(F.col("F"), F.lit(0)).cast("double").alias("rev_filled"),
        F.coalesce(F.col("P"), F.lit(0)).cast("double").alias("rev_pending"))


@query(
    "asof_join_events",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts,
           c.ts AS last_click_ts, c.event_id AS last_click_id
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
    doc="as-of join: each error event matched to the user's latest click at-or-before it — single-window-pass implementation (no join), the Spark-native as-of shape",
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    relevant = ev.filter(F.col("event_type").isin("error", "click"))
    # at EQUAL ts the oracle's ASOF condition (e.ts >= c.ts) matches
    # the click, so clicks must sort BEFORE errors in the frame —
    # otherwise a same-microsecond click with a larger event_id would
    # be invisible to the error row (latent only while the fixture has
    # no (user_id, ts) collisions; real event data has them)
    type_rank = F.when(F.col("event_type") == "click", 0).otherwise(1)
    w = (Window.partitionBy("user_id").orderBy("ts", type_rank, "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    enriched = (relevant
                .withColumn("last_click_ts", F.last(click_ts, True).over(w))
                .withColumn("last_click_id", F.last(click_id, True).over(w)))
    return (enriched.filter(F.col("event_type") == "error")
            .select("event_id", "user_id", "ts",
                    "last_click_ts", "last_click_id"))


@query(
    "percentile_disc",
    oracle="""
    SELECT o_orderstatus,
           quantile_disc(o_totalprice, 0.5) AS p50,
           quantile_disc(o_totalprice, 0.9) AS p90,
           count(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
    doc="discrete percentiles (p50/p90) — exact element selection via ranking window, no interpolation arithmetic to diverge between engines",
)
def percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    ranked = (orders
              .withColumn("rn", F.row_number().over(w))
              .withColumn("n", F.count(F.lit(1)).over(
                  Window.partitionBy("o_orderstatus"))))
    # percentile_disc(q) = value at ceil(q·n) in sort order
    def pick(q: float):
        return disc_percentile(q, "o_totalprice")
    return (ranked.groupBy("o_orderstatus")
            .agg(pick(0.5).alias("p50"), pick(0.9).alias("p90"),
                 F.max("n").alias("n")))


@query(
    "anti_semi_customers",
    oracle="""
    SELECT 'never_ordered' AS cohort, count(*) AS n
    FROM customer c WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'big_spender_1997', count(*)
    FROM customer c WHERE EXISTS
      (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
         AND o.o_totalprice > 250000
         AND o.o_orderdate >= TIMESTAMP '1997-01-01'
         AND o.o_orderdate <  TIMESTAMP '1998-01-01')
    """,
    doc="left-anti / left-semi joins — the upsert existence probe generalized (SURVEY §2 #28): NOT EXISTS / EXISTS as one shuffle each",
)
def anti_semi_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    never = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
             .agg(F.count(F.lit(1)).alias("n"))
             .select(F.lit("never_ordered").alias("cohort"), "n"))
    big97 = orders.filter(
        (F.col("o_totalprice") > 250000)
        & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    spender = (cust.join(big97, cust.c_custkey == big97.o_custkey, "left_semi")
               .agg(F.count(F.lit(1)).alias("n"))
               .select(F.lit("big_spender_1997").alias("cohort"), "n"))
    return never.unionByName(spender)


@query(
    "bloom_semi_revenue",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                     AS DECIMAL(38,2)) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc=(
        "bloom-prefiltered existence probe "
        "(operators/scale.bloom_filtered_join): the semi join's dim "
        "keys compress to a 2^17-bit md5-hashed bloom built with a "
        "distributed bit_or word aggregate (driver collect bounded by "
        "FILTER size, never key count) and the fact side is filtered "
        "by pure-JVM bit tests BEFORE the shuffle — the 100 TB "
        "decontamination shape when the key set exceeds the broadcast "
        "threshold: only true matches plus the (1-e^{-kn/m})^k "
        "false-positive sliver pay the exact residual join, which "
        "makes the result IDENTICAL to the plain semi join (blooms "
        "never false-negative) — so the oracle is ordinary SQL with "
        "no bloom in sight, and the hash match proves the rewrite is "
        "transparent. Complements the salting/bucketing scale "
        "toolkit and Spark's runtime row-level bloom conf."
    ),
)
def bloom_semi_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scale import bloom_filtered_join
    orders = load_table(spark, sf_dir, "orders")
    cust = (load_table(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING"))
    hits = bloom_filtered_join(orders, cust, "o_custkey", "c_custkey",
                               "left_semi", m_bits=1 << 17)
    return (hits.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("decimal(38,2)").cast("double").alias("revenue"))
            .orderBy("o_orderpriority"))


@query(
    "unpivot_metrics",
    oracle="""
    WITH a AS (
      SELECT lang, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             count(DISTINCT source) AS n_sources
      FROM documents GROUP BY lang)
    SELECT lang, 'n_docs' AS metric, n_docs AS value FROM a
    UNION ALL
    SELECT lang, 'sum_chars' AS metric, sum_chars AS value FROM a
    UNION ALL
    SELECT lang, 'n_sources' AS metric, n_sources AS value FROM a
    """,
    doc=(
        "wide-to-long unpivot/melt (§2 #33-35 SQL-surface "
        "completeness): a per-lang metrics row melts into "
        "(lang, metric, value) via DataFrame.unpivot — the Spark "
        "native Expand, one row-multiplying projection, no join and "
        "no extra shuffle beyond the agg; the oracle is the "
        "dialect-safe UNION ALL spelling. The long form is what a "
        "metrics sink or a plotting layer ingests."
    ),
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wide = (docs.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("sum_chars"),
                 F.count_distinct("source").alias("n_sources")))
    return wide.unpivot("lang", ["n_docs", "sum_chars", "n_sources"],
                        "metric", "value")


@query(
    "distribution_windows",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           ntile(10) OVER w AS decile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
    doc=(
        "distribution window functions (percent_rank / cume_dist / "
        "ntile) — the remaining §2 #35 window family: all three are "
        "exact ratios of integer ranks and counts, so the doubles are "
        "bit-equal across engines; (o_totalprice, o_orderkey) is a "
        "unique ordering so every rank is deterministic. One exchange "
        "on o_orderpriority shared by all three functions (same "
        "window spec = one Window operator)."
    ),
)
def distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey", "o_orderpriority",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(10).over(w).alias("decile"))


@query(
    "map_roundtrip_counts",
    oracle="""
    SELECT o_custkey, o_orderstatus AS status,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY o_custkey, o_orderstatus
    """,
    doc=(
        "MAP-type surface (§2 #46): per-customer status→count built "
        "with map_from_entries over collected (status, n) structs, then "
        "exploded back to rows. The map is internal state — the output "
        "row-set equals the plain rollup regardless of collect order, "
        "so the oracle is exact; demonstrates map build/explode staying "
        "JVM-side (no UDF) with one extra exchange over the rollup."
    ),
)
def map_roundtrip_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per = (orders.groupBy("o_custkey", "o_orderstatus")
           .agg(F.count(F.lit(1)).alias("n")))
    mapped = (per.groupBy("o_custkey")
              .agg(F.map_from_entries(
                  F.collect_list(F.struct("o_orderstatus", "n")))
                  .alias("status_counts")))
    return (mapped.select(
        "o_custkey",
        F.explode("status_counts").alias("status", "n")))
