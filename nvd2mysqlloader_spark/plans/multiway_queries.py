"""Multi-way star/snowflake join shapes (TPC-H Q5/Q7/Q8/Q9/Q10/Q15/Q21
analogs over the fixture schema — no partsupp table, so Q9 uses
p_retailprice*quantity as its cost term and Q21's "late" predicate is
l_shipdate > o_orderdate + 60 days, the fixture having no
commit/receipt dates).

Each exercises a join topology the two-table analytic surface doesn't:

  * Q5  five-way snowflake with a cross-dimension residual
         (customer.nation == supplier.nation) evaluated post-join
  * Q7  dimension applied twice under different roles (supplier
         nation vs customer nation) with a symmetric pair predicate
  * Q8  market-share: conditional numerator over a shared exact
         denominator in one aggregation pass
  * Q9  profit = difference of two independently-exact decimal sums
  * Q10 group-by over a high-cardinality key then global top-k
         (TakeOrderedAndProject, never a full sort)
  * Q15 aggregate feeding a scalar-max equality self-filter
  * Q21 the EXISTS/NOT-EXISTS double correlation collapsed into ONE
         per-order aggregation — 1 fact scan + 1 shuffle where the
         literal SQL plan does 3 scans and 2 self-joins

Reference parity: the reference's surface is single-table SELECTs
(nvd2mysqlloader.py:339-420); these are engine extensions under
SURVEY.md §2 rows 29-35.

Scale notes (the 100 TB plan, asserted in tests/test_plans.py):
dimensions (region, nation, supplier, filtered part) broadcast —
the fact table shuffles only on its join keys (orderkey, custkey),
and per-key partial aggregation runs before every exchange. Money
arithmetic follows the registry determinism rules: DECIMAL partial
sums, one final DOUBLE cast, so value hashes match DuckDB bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from ._helpers import dsum
from .registry import query

# exact decimal revenue term — identical (and hash-verified) to the
# oracle expression CAST(p AS DECIMAL(18,2)) * (1 - CAST(d AS DECIMAL(18,4)));
# built lazily: Column construction needs a live JVM gateway
def _rev():
    return (F.col("l_extendedprice").cast("decimal(18,2)")
            * (1 - F.col("l_discount").cast("decimal(18,4)")))

_REV_SQL = ("CAST(l_extendedprice AS DECIMAL(18,2)) "
            "* (1 - CAST(l_discount AS DECIMAL(18,4)))")


@query(
    "local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    doc=(
        "TPC-H Q5 shape: five-way snowflake where the interesting "
        "predicate (customer and supplier share a nation) crosses two "
        "dimension paths. Plan: the date filter is pushed to the orders "
        "scan; lineitem shuffles once on orderkey and once on custkey; "
        "the ASIA-restricted supplier⋈nation⋈region dim collapses to a "
        "broadcast carrying the residual c_nationkey = s_nationkey, so "
        "no third fact shuffle exists."
    ),
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    asia_supp = (supp
                 .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
                 .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                       nation.n_regionkey == region.r_regionkey)
                 .select("s_suppkey", "s_nationkey", "n_name"))
    return (li
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(cust, o.o_custkey == cust.c_custkey)
            .join(F.broadcast(asia_supp),
                  (li.l_suppkey == asia_supp.s_suppkey)
                  & (cust.c_nationkey == asia_supp.s_nationkey))
            .groupBy("n_name")
            .agg(F.sum(_rev()).cast("double").alias("revenue")))


@query(
    "cross_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
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
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc=(
        "TPC-H Q7 shape: the nation dimension participates twice under "
        "different roles. The two-nation restriction is applied to the "
        "broadcast supplier dim BEFORE the fact join, so only lineitem "
        "rows of those suppliers ever shuffle; the symmetric pair "
        "predicate is finished as a residual after the (broadcast) "
        "customer-nation join."
    ),
)
def cross_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    pair = ["NATION_1", "NATION_2"]
    supp_dim = (supp
                .join(F.broadcast(nation.filter(F.col("n_name").isin(pair))),
                      supp.s_nationkey == nation.n_nationkey)
                .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    cust_dim = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    l = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    return (l
            .join(F.broadcast(supp_dim), l.l_suppkey == supp_dim.s_suppkey)
            .join(orders, l.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(cust_dim), cust.c_nationkey == cust_dim.cn_key)
            .filter(((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
                    | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"))
            .agg(F.sum(_rev()).cast("double").alias("revenue")))


@query(
    "nation_market_share",
    oracle=f"""
    SELECT year(o.o_orderdate) AS o_year,
           CAST(sum(CASE WHEN n2.n_name = 'NATION_2'
                         THEN {_REV_SQL} END) AS DOUBLE)
             / CAST(sum({_REV_SQL}) AS DOUBLE) AS mkt_share
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN region r   ON n1.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY o_year
    """,
    doc=(
        "TPC-H Q8 shape: market share = conditional numerator over a "
        "shared denominator, both exact DECIMAL sums folded in ONE "
        "aggregation pass (sum over a CASE with no ELSE ignores "
        "non-matching rows on both engines) and divided once in DOUBLE. "
        "Part, region-path and supplier-path dimensions all broadcast; "
        "the PROMO part filter prunes the fact before its first shuffle."
    ),
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    promo = part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    asia_nations = (nation
                    .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                          nation.n_regionkey == region.r_regionkey)
                    .select(F.col("n_nationkey").alias("cn_key")))
    supp_dim = (supp
                .join(F.broadcast(nation),
                      supp.s_nationkey == nation.n_nationkey)
                .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    return (li
            .join(F.broadcast(promo), li.l_partkey == promo.p_partkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(cust, o.o_custkey == cust.c_custkey)
            .join(F.broadcast(asia_nations), cust.c_nationkey == F.col("cn_key"))
            .join(F.broadcast(supp_dim), li.l_suppkey == supp_dim.s_suppkey)
            .groupBy(F.year("o_orderdate").alias("o_year"))
            .agg((F.sum(F.when(F.col("supp_nation") == "NATION_2", _rev()))
                  .cast("double")
                  / F.sum(_rev()).cast("double")).alias("mkt_share")))


@query(
    "product_type_profit",
    oracle=f"""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(sum({_REV_SQL}) AS DOUBLE)
             - CAST(sum(CAST(p.p_retailprice AS DECIMAL(18,2))
                        * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_type = 'ECONOMY'
    GROUP BY nation, o_year
    """,
    doc=(
        "TPC-H Q9 shape (no partsupp in the fixture, so the cost term "
        "is retailprice×quantity): profit computed as the DIFFERENCE of "
        "two independently-exact decimal sums, subtracted once in "
        "DOUBLE — never summing a pre-mixed double expression, which "
        "would be order-dependent. Only orders contributes a shuffle; "
        "part/supplier/nation broadcast."
    ),
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    econ = (part.filter(F.col("p_type") == "ECONOMY")
            .select("p_partkey", "p_retailprice"))
    supp_dim = (supp.join(F.broadcast(nation),
                          supp.s_nationkey == nation.n_nationkey)
                .select("s_suppkey", F.col("n_name").alias("nation")))
    cost = (F.col("p_retailprice").cast("decimal(18,2)")
            * F.col("l_quantity").cast("decimal(18,2)"))
    return (li
            .join(F.broadcast(econ), li.l_partkey == econ.p_partkey)
            .join(F.broadcast(supp_dim), li.l_suppkey == supp_dim.s_suppkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("nation", F.year("o_orderdate").alias("o_year"))
            .agg((F.sum(_rev()).cast("double")
                  - F.sum(cost).cast("double")).alias("profit")))


@query(
    "returned_item_revenue",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc=(
        "TPC-H Q10 shape: group-by over a high-cardinality key "
        "(customer) then global top-20 — TakeOrderedAndProject "
        "(per-partition heaps merged on the driver), never a full sort. "
        "Revenue doubles are bit-identical on both engines so the DESC "
        "cut is stable; c_custkey is the unique tie-break. The "
        "returnflag and quarter filters both reach the scans."
    ),
)
def returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp")))
    return (li.filter(F.col("l_returnflag") == "R")
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(cust, o.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(F.sum(_rev()).cast("double").alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20))


@query(
    "top_supplier_revenue",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             sum({_REV_SQL}) AS total_rev_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-07-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_rev_dec AS DOUBLE) AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev_dec = (SELECT max(total_rev_dec) FROM rev)
    """,
    doc=(
        "TPC-H Q15 shape: per-supplier revenue view feeding a scalar "
        "MAX equality filter. The max is taken over the EXACT decimal "
        "sums (comparing doubles rounded from different engines would "
        "be a tie-hazard; exact decimals cannot disagree), broadcast as "
        "a 1-row join. All qualifying suppliers are returned — no "
        "arbitrary tie cut."
    ),
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp")))
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("total_rev_dec")))
    # the scalar max must be computed over the UNJOINED rev rollup,
    # exactly like the oracle's (SELECT max(...) FROM rev) — taking it
    # after the supplier join would diverge whenever the top-revenue
    # suppkey has no supplier row. persist(), not an eager checkpoint:
    # lazy (constructing the DataFrame runs nothing), fault-tolerant
    # (lineage fallback on executor loss), and both the max fork and
    # the join read the one cached rollup instead of re-running the
    # aggregate (the join's pushed isnotnull(l_suppkey) would
    # otherwise de-canonicalize the shared exchange — measured).
    rev = rev.persist()
    top = rev.agg(F.max("total_rev_dec").alias("max_rev"))
    revs = rev.join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
    return (revs
            .join(F.broadcast(top))
            .filter(F.col("total_rev_dec") == F.col("max_rev"))
            .select("s_suppkey", "s_name",
                    F.col("total_rev_dec").cast("double").alias("total_revenue")))


@query(
    "lone_late_supplier",
    oracle="""
    SELECT s.s_name, count(DISTINCT l1.l_orderkey) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
    doc=(
        "TPC-H Q21 shape ('late' = shipped >60d after order date; the "
        "fixture has no commit/receipt dates). The oracle states the "
        "literal EXISTS + NOT-EXISTS double correlation; the Spark plan "
        "collapses both into ONE per-order aggregation — "
        "countDistinct(supplier), countDistinct(late supplier), and "
        "max(late supplier) which is THE late supplier exactly when the "
        "late-count is 1 — so the fact is scanned once and shuffled "
        "once (on orderkey) where the literal plan runs two extra "
        "self-joins. The multi-supplier + lone-late filter then reduces "
        "to two integer comparisons per order."
    ),
)
def lone_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")

    o = (orders.filter(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    per_order = (li.select("l_orderkey", "l_suppkey", "l_shipdate")
                 .join(o, li.l_orderkey == o.o_orderkey)
                 .groupBy("l_orderkey")
                 .agg(F.countDistinct("l_suppkey").alias("n_supp"),
                      F.countDistinct(F.when(late, F.col("l_suppkey")))
                       .alias("n_late_supp"),
                      F.max(F.when(late, F.col("l_suppkey")))
                       .alias("late_suppkey")))
    lone = per_order.filter((F.col("n_supp") >= 2)
                            & (F.col("n_late_supp") == 1))
    return (lone
            .join(F.broadcast(supp), lone.late_suppkey == supp.s_suppkey)
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.desc("numwait"), F.asc("s_name"))
            .limit(10))
