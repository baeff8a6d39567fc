"""Reference-parity query surface over the driver's TPC-H-ish tables.

Each query re-expresses one operator row of SURVEY.md §2 (reference
file:line cited per query) as a declarative Spark plan; Catalyst handles
pushdown / pruning / join strategy. The DuckDB oracle string is the
ANSI-SQL statement of the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.incremental import newer_than_high_water_mark
from ..operators.topk import top1_per_key
from ..operators.upsert import last_writer_wins
from ..sources.tpch import load_table
from ._helpers import dsum
from .registry import query

# ---------------------------------------------------------------------------
# Aggregations


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H-Q1-shaped agg; map-side partial aggregation (SURVEY §2 #25-27)",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "tally_count_distinct",
    oracle="SELECT count(DISTINCT o_custkey) AS n_keys, count(*) AS n_rows FROM orders",
    doc="the reference's only analytic query: count(distinct cve_id), nvd2mysqlloader.py:494 (§2 #25)",
)
def tally_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load_table(spark, sf_dir, "orders")
            .agg(F.count_distinct("o_custkey").alias("n_keys"),
                 F.count(F.lit(1)).alias("n_rows")))


# ---------------------------------------------------------------------------
# Filters / scans (the indexed query surface promised to readers, §3 EP3)


@query(
    "point_lookup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderkey = (SELECT min(o_orderkey) FROM orders)
    """,
    doc="point lookup by key — ix_cve analog, nvd2mysqlloader.py:402,456 (§2 #28,#54); pushdown+stats replace the B-tree",
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    min_key = orders.agg(F.min("o_orderkey").alias("k"))
    return (orders.join(F.broadcast(min_key), orders.o_orderkey == F.col("k"))
            .select("o_orderkey", "o_custkey", "o_orderstatus",
                    F.col("o_totalprice").cast("decimal(18,2)").cast("double")
                    .alias("total_price")))


@query(
    "date_range",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY o_orderstatus
    """,
    doc="date-range scan — the `dates` index analog, nvd2mysqlloader.py:400 (§2 #52); partition pruning at scale",
)
def date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             dsum("o_totalprice").alias("sum_price"))
    )


@query(
    "severity_filter",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_high,
           CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
    FROM orders WHERE o_totalprice >= 300000.0
    GROUP BY o_orderpriority
    """,
    doc="threshold filter — `score >= 7.0` severity query, SURVEY §3 EP3.5",
)
def severity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load_table(spark, sf_dir, "orders")
            .filter(F.col("o_totalprice") >= 300000.0)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_high"),
                 F.max(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
                 .alias("max_price")))


@query(
    "like_search",
    oracle="""
    SELECT p_brand, count(*) AS n_parts,
           CAST(min(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price
    FROM part WHERE p_name LIKE '%gre%' OR p_type LIKE 'SMALL%'
    GROUP BY p_brand
    """,
    doc="substring/prefix search — FULLTEXT-index analog for CPE search, nvd2mysqlloader.py:401,168-177 (§2 #53)",
)
def like_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load_table(spark, sf_dir, "part")
            .filter(F.col("p_name").like("%gre%") | F.col("p_type").like("SMALL%"))
            .groupBy("p_brand")
            .agg(F.count(F.lit(1)).alias("n_parts"),
                 F.min(F.col("p_retailprice").cast("decimal(18,2)")).cast("double")
                 .alias("min_price")))


# ---------------------------------------------------------------------------
# Top-1-per-key, window functions


@query(
    "top1_per_key",
    oracle="""
    SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    """,
    doc="latest-state lookup: ORDER BY … DESC LIMIT 1 per key, nvd2mysqlloader.py:72 (§2 #16,#31); max_by partial-aggregates",
)
def q_top1_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return top1_per_key(orders, keys=["o_custkey"], order_col="o_orderdate",
                        payload=["o_orderkey", "o_orderstatus"])


@query(
    "rank_window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    doc="ranking + frame-spec windows (§2 #35; beyond-reference window surface)",
)
def rank_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    wrun = (Window.partitionBy("o_custkey")
            .orderBy("o_orderdate", "o_orderkey")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return orders.select(
        "o_custkey", "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(wrun)
        .cast("double").alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# Upsert / set semantics


@query(
    "upsert_last_writer_wins",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate, 0 AS src
      FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    ), updates AS (
      SELECT o_orderkey, o_custkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)) AS DOUBLE)
               AS o_totalprice,
             o_orderdate, 1 AS src
      FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    ), unioned AS (
      SELECT * FROM base UNION ALL SELECT * FROM updates
    )
    SELECT o_orderkey, o_custkey, o_totalprice, src
    FROM unioned
    QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY src DESC) = 1
    """,
    doc="REPLACE-by-key / MERGE: union overlapping batches, last-writer-wins dedup, nvd2mysqlloader.py:448-468 (§2 #10,#34)",
)
def upsert_last_writer_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    base = (orders.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            .select(*cols).withColumn("src", F.lit(0)))
    updates = (orders.filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
               .select("o_orderkey", "o_custkey",
                       (F.col("o_totalprice").cast("decimal(18,2)")
                        * F.lit("1.1").cast("decimal(2,1)")).cast("double")
                       .alias("o_totalprice"),
                       "o_orderdate")
               .withColumn("src", F.lit(1)))
    merged = last_writer_wins(base.unionByName(updates),
                              keys=["o_orderkey"], order_by=["src"])
    return merged.select("o_orderkey", "o_custkey", "o_totalprice", "src")


# ---------------------------------------------------------------------------
# Flatten with null-safe defaults (the get_data projection shape)


@query(
    "flatten_defaults",
    oracle="""
    SELECT o.o_orderkey,
           coalesce(c.c_name, 'UNKNOWN') AS cust_name,
           coalesce(c.c_mktsegment, 'NONE') AS segment,
           CAST(coalesce(CAST(c.c_acctbal AS DECIMAL(18,2)), 0.0) AS DOUBLE) AS acctbal,
           substr(o.o_orderpriority, 1, 1) AS prio_code,
           CAST(o.o_orderdate AS VARCHAR) AS order_dt_str
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    doc="null-safe flatten projection with per-field defaults — get_data, nvd2mysqlloader.py:193-269 (§2 #19); broadcast dim join",
)
def flatten_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust),
                    orders.o_custkey == cust.c_custkey, "left")
        .select(
            "o_orderkey",
            F.coalesce(F.col("c_name"), F.lit("UNKNOWN")).alias("cust_name"),
            F.coalesce(F.col("c_mktsegment"), F.lit("NONE")).alias("segment"),
            F.coalesce(F.col("c_acctbal").cast("decimal(18,2)"), F.lit(0.0))
            .cast("double").alias("acctbal"),
            F.substring("o_orderpriority", 1, 1).alias("prio_code"),
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("order_dt_str"),
        )
    )


# ---------------------------------------------------------------------------
# Explode + filter + re-aggregate (the CPE-list extraction shape)


@query(
    "explode_filter_reagg",
    oracle="""
    SELECT l_orderkey,
           array_to_string(list_sort(list(DISTINCT CAST(l_partkey AS VARCHAR))), ',')
             AS part_list,
           count(*) AS n_items
    FROM lineitem WHERE l_returnflag = 'R'
    GROUP BY l_orderkey
    """,
    doc="explode→filter(vulnerable)→re-aggregate to joined string — get_vulnerable_software_list, nvd2mysqlloader.py:168-190 (§2 #22,#41); list sorted for determinism (§7.4.1)",
)
def explode_filter_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set(F.col("l_partkey").cast("string"))), ","
            ).alias("part_list"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Joins


@query(
    "star_join_revenue",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="FK star-chain join the reference declares but never populates, nvd2mysqlloader.py:328-365 (§2 #29); dims broadcast, fact never shuffled for the joins",
)
def star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    # dim side of every join broadcast: zero shuffle until the final agg
    dim = (cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
               .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
               .select("c_custkey", "n_name", "r_name"))
    enriched = (li.join(F.broadcast(orders.select("o_orderkey", "o_custkey")),
                        li.l_orderkey == F.col("o_orderkey"))
                  .join(F.broadcast(dim), F.col("o_custkey") == dim.c_custkey))
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return (enriched.groupBy("r_name", "n_name")
            .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_lineitems")))


# ---------------------------------------------------------------------------
# Incremental gate


@query(
    "incremental_gate",
    oracle="""
    SELECT e.event_id, e.ts, e.event_type
    FROM events e
    WHERE e.ts > (SELECT max(ts) FROM events WHERE event_id % 2 = 0)
    """,
    doc="high-water-mark freshness gate: load only rows newer than stored state, nvd2mysqlloader.py:67-99 (§2 #15, §3 EP2)",
)
def incremental_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    state = events.filter(F.col("event_id") % 2 == 0)   # the "already loaded" batch
    fresh = newer_than_high_water_mark(events, state, "ts")
    return fresh.select("event_id", "ts", "event_type")


# ---------------------------------------------------------------------------
# .meta sidecar parse (§2 #2) — literal input, no table


_META_LINES = [
    ("nvdcve-1.1-2024", "lastModifiedDate:2019-10-12T20:07:56-04:00"),
    ("nvdcve-1.1-2024", "size:32169411"),
    ("nvdcve-1.1-2024", "zipSize:1840270"),
    ("nvdcve-1.1-2024", "gzSize:1840126"),
    # sha256 beginning with '6' pins the after-first-colon parse: the
    # reference's lstrip('sha256:') would eat the leading 6 (SURVEY §2 #2)
    ("nvdcve-1.1-2024", "sha256:64310FE691D08F3BCACAA566249195447543A0AA5F3E61CB5FB6F29DC2C9A06F"),
    ("nvdcve-1.1-recent", "lastModifiedDate:2020-01-01T00:00:00-04:00"),
    ("nvdcve-1.1-recent", "sha256:aa00bb11cc22"),
]


@query(
    "meta_parse",
    oracle="""
    SELECT name, regexp_extract(line, '^([^:]+):', 1) AS key,
           regexp_extract(line, '^[^:]+:(.*)$', 1) AS value
    FROM (VALUES {rows}) AS t(name, line)
    """.format(rows=", ".join(f"('{n}', '{li}')" for n, li in _META_LINES)),
    doc=".meta sidecar parse, value = after-first-colon (bug-fixed vs reference lstrip, nvd2mysqlloader.py:57-64, §2 #2,#39)",
)
def meta_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.createDataFrame(_META_LINES, ["name", "line"])
    return df.select(
        "name",
        F.regexp_extract("line", r"^([^:]+):", 1).alias("key"),
        F.regexp_extract("line", r"^[^:]+:(.*)$", 1).alias("value"),
    )


# ---------------------------------------------------------------------------
# JSON extraction (§2 #44)


@query(
    "json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    GROUP BY event_type
    """,
    doc="schema-on-read JSON field extraction — the reference's json column navigation (§2 #44); get_json_object stays JVM-side",
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (events.filter(k > 50)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(k).alias("sum_k")))


# ---------------------------------------------------------------------------
# Classic analytic shapes (TPC-H-style) — exercising the same operator
# families at higher plan complexity: multi-join + filter + agg + top-k


@query(
    "shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
             AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_shipdate  > TIMESTAMP '1997-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H-Q3 shape: selective dim filters pushed through a 3-way join, grouped revenue, global top-10 (TakeOrderedAndProject, no full sort)",
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return (li.filter(F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp"))
            .join(F.broadcast(
                orders.filter(F.col("o_orderdate")
                              < F.lit("1997-01-01").cast("timestamp"))),
                li.l_orderkey == F.col("o_orderkey"))
            .join(F.broadcast(
                cust.filter(F.col("c_mktsegment") == "BUILDING")
                .select("c_custkey")),
                F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.sum(price * (F.lit(1) - disc)).cast("double")
                 .alias("revenue"))
            .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
            .orderBy(F.desc("revenue"), F.asc("o_orderdate"),
                     F.asc("l_orderkey"))
            .limit(10))


@query(
    "shipmode_priority_classes",
    oracle="""
    SELECT l.l_returnflag AS shipclass,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l.l_returnflag
    """,
    doc="TPC-H-Q12 shape: conditional aggregation (CASE-sum) over a filtered fact-dim join",
)
def shipmode_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                      & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
            .join(F.broadcast(orders.select("o_orderkey", "o_orderpriority")),
                  li.l_orderkey == F.col("o_orderkey"))
            .groupBy(F.col("l_returnflag").alias("shipclass"))
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count")))


@query(
    "promo_revenue_share",
    oracle="""
    SELECT CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                 ELSE 0 END) AS DOUBLE) AS promo_revenue,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
             AS total_revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    doc="TPC-H-Q14 shape: conditional share of a measure over a broadcast dim join, single global aggregate",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)")))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(38,6)"))
    return (li.filter((F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
                      & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp")))
            .join(F.broadcast(part.select("p_partkey", "p_type")),
                  li.l_partkey == F.col("p_partkey"))
            .agg(F.sum(promo).cast("double").alias("promo_revenue"),
                 F.sum(rev).cast("double").alias("total_revenue"),
                 F.count(F.lit(1)).alias("n_lines")))


@query(
    "full_outer_reconcile",
    oracle="""
    WITH h1 AS (
      SELECT o_custkey, count(*) AS n1
      FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
      GROUP BY o_custkey
    ), h2 AS (
      SELECT o_custkey, count(*) AS n2
      FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      GROUP BY o_custkey
    )
    SELECT COALESCE(h1.o_custkey, h2.o_custkey) AS custkey,
           CAST(COALESCE(n1, 0) AS BIGINT) AS n_early,
           CAST(COALESCE(n2, 0) AS BIGINT) AS n_late,
           CASE WHEN n1 IS NULL THEN 'late_only'
                WHEN n2 IS NULL THEN 'early_only'
                ELSE 'both' END AS presence
    FROM h1 FULL OUTER JOIN h2 ON h1.o_custkey = h2.o_custkey
    """,
    doc=(
        "FULL OUTER reconciliation (the CDC/set-diff shape): per-key "
        "counts from two disjoint time slices joined full-outer with "
        "zero-fill and a presence tag — how a pipeline diffs snapshots "
        "or validates a migration. Both sides partial-aggregate before "
        "the join, so the full-outer shuffle carries one row per key "
        "per side; completes the join-type surface (inner/semi/anti/"
        "left/right/cross/full) under the oracle."
    ),
)
def full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1996-01-01").cast("timestamp")
    h1 = (orders.filter(F.col("o_orderdate") < cut)
          .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n1")))
    h2 = (orders.filter(F.col("o_orderdate") >= cut)
          .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n2")))
    j = h1.join(h2, "o_custkey", "full_outer")
    return j.select(
        F.col("o_custkey").alias("custkey"),
        F.coalesce("n1", F.lit(0)).cast("bigint").alias("n_early"),
        F.coalesce("n2", F.lit(0)).cast("bigint").alias("n_late"),
        F.when(F.col("n1").isNull(), "late_only")
         .when(F.col("n2").isNull(), "early_only")
         .otherwise("both").alias("presence"))
