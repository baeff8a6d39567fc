"""Advanced analytic query shapes (TPC-H Q4/Q13/Q17/Q18/Q19/Q22
analogs, adapted to the fixture schemas) — each exercises a distinct
plan shape the simpler surface doesn't:

  * correlated EXISTS  -> semi join with a non-equi residual predicate
  * LEFT OUTER + two-level aggregation (count distribution)
  * correlated scalar aggregate -> per-key agg joined back (exchange reuse)
  * HAVING on a grouped sum -> semi join against an aggregate
  * disjunctive OR-of-ANDs predicate spanning both join sides
  * uncorrelated scalar subquery threshold + NOT EXISTS anti join

Reference parity: the reference's query surface is plain SELECTs
(nvd2mysqlloader.py:339-420); these shapes are engine extensions
declared in SURVEY.md §2 rows 29-35 ("not present anywhere" column).

All money/quantity arithmetic follows the registry determinism rules
(DECIMAL partial sums, one final DOUBLE cast) so value hashes match
DuckDB bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from ._helpers import davg, dsum
from .registry import query


@query(
    "late_shipment_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
    doc=(
        "TPC-H Q4 shape: correlated EXISTS becomes a LEFT SEMI join "
        "whose condition carries a non-equi residual (l_shipdate > "
        "o_orderdate + 60d). The date filter is pushed to the orders "
        "scan; the semi join keeps at most one match per order so no "
        "post-join dedup is needed."
    ),
)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = (orders
         .filter((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                 & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))))
    late = (o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "leftsemi"))
    return (late.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders")))


@query(
    "order_count_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
    doc=(
        "TPC-H Q13 shape: LEFT OUTER join preserving zero-order "
        "customers, then a two-level aggregation (per-customer count, "
        "then the distribution of counts). The second groupBy re-shuffles "
        "on a low-cardinality key — map-side partial aggregation absorbs "
        "almost all rows before the exchange."
    ),
)
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "small_qty_revenue",
    oracle="""
    WITH agg AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)
               AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
             AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN agg   ON agg.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12' AND l.l_quantity < 0.2 * agg.avg_qty
    """,
    doc=(
        "TPC-H Q17 shape: the correlated scalar subquery (per-part avg "
        "quantity) is a window aggregate over l_partkey, NOT an "
        "aggregate-then-join-back — one fact scan and one shuffle instead "
        "of two of each. The brand filter broadcasts and runs FIRST, so "
        "only the ~1/N of the fact belonging to brand parts is shuffled; "
        "the semi-joined subset still contains every line of each "
        "surviving part, so the per-part window mean equals the "
        "whole-table mean for those parts."
    ),
)
def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand = part.filter(F.col("p_brand") == "Brand#12").select("p_partkey")
    w = Window.partitionBy("l_partkey")
    avg_qty = (F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w)
               .cast("double") / F.count(F.lit(1)).over(w))
    return (li.select("l_partkey", "l_quantity", "l_extendedprice")
            .join(F.broadcast(brand), li.l_partkey == brand.p_partkey)
            .withColumn("avg_qty", avg_qty)
            .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
            .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"),
                 F.count(F.lit(1)).alias("n_lines")))


@query(
    "large_volume_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150)
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    doc=(
        "TPC-H Q18 shape: HAVING over a grouped DECIMAL sum (exact, so "
        "the >150 cut cannot diverge between engines) feeds a semi join; "
        "the qualifying key set is tiny so it broadcasts, and the final "
        "top-100 is TakeOrderedAndProject (per-partition heaps), never a "
        "global sort. o_orderkey is the unique tie-break."
    ),
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq"))
           .filter(F.col("sq") > 150)
           .select(F.col("l_orderkey").alias("big_orderkey")))
    return (li
            .join(F.broadcast(big), li.l_orderkey == big.big_orderkey, "leftsemi")
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
            .agg(dsum("l_quantity").alias("total_qty"))
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(100))


@query(
    "disjunctive_filter_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
             AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
    doc=(
        "TPC-H Q19 shape: OR-of-ANDs spanning both join sides. Catalyst "
        "factors the single-side conjuncts out of the disjunction "
        "(p_brand IN (...), l_quantity BETWEEN 1 AND 50) and pushes them "
        "below the join as scan filters; only the cross-side residual is "
        "evaluated post-join. The part side shrinks to three brands and "
        "broadcasts."
    ),
)
def disjunctive_filter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,4)")

    def arm(brand: str, s0: int, s1: int, q0: int, q1: int):
        return ((F.col("p_brand") == brand)
                & F.col("p_size").between(s0, s1)
                & F.col("l_quantity").between(q0, q1))

    cond = (arm("Brand#12", 1, 15, 1, 20)
            | arm("Brand#23", 10, 30, 10, 35)
            | arm("Brand#34", 20, 50, 20, 50))
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .filter(cond)
            .agg(F.sum(price * (1 - disc)).cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_lines")))


@query(
    "rich_inactive_customers",
    oracle="""
    SELECT count(*) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / count(*)
        FROM customer c2 WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
    """,
    doc=(
        "TPC-H Q22 shape: uncorrelated scalar subquery (mean positive "
        "balance, computed with the deterministic decimal-sum/count "
        "division) applied via a 1-row broadcast cross join, then NOT "
        "EXISTS as a LEFT ANTI join against orders. At scale the anti "
        "join shuffles on custkey; the threshold side never does."
    ),
)
def rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    thresh = (cust.filter(F.col("c_acctbal") > 0)
              .agg(davg("c_acctbal").alias("bal_thresh")))
    return (cust
            .join(F.broadcast(thresh))
            .filter(F.col("c_acctbal") > F.col("bal_thresh"))
            .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 dsum("c_acctbal").alias("total_bal")))


@query(
    "forecast_revenue_change",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc=(
        "TPC-H Q6 shape (completes the 22-query analog set): pure "
        "scan-aggregate whose entire selectivity lives in three "
        "conjunctive range predicates — all pushed to the parquet "
        "reader (PushedFilters + row-group stats pruning), so at 100 TB "
        "the query reads only row groups overlapping one ship-year. No "
        "join, no hash exchange: partial sums feed a single-partition "
        "final aggregate. Revenue accumulates in DECIMAL, one final "
        "DOUBLE cast."
    ),
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return (li.filter(
                (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
                & F.col("l_discount").between(0.05, 0.07)
                & (F.col("l_quantity") < 24))
            .agg(F.sum(price * disc).cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_items")))
