"""Scale-operator tests: salted joins equal plain joins on skewed
data; bucketed joins eliminate the shuffle (asserted on the physical
plan, not just claimed)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nvd2mysqlloader_spark.operators.scale import (bucketed_join,
                                                   salted_join,
                                                   write_bucketed)

from .conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    # 90% of rows share one hot key
    skewed = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 50)
        .cast("long").alias("k"),
        (F.col("id") * 3).alias("payload"))
    dim = spark.range(50).select(F.col("id").alias("k"),
                                 F.concat(F.lit("d"), F.col("id")).alias("name"))
    plain = {(r.k, r.payload, r.name)
             for r in skewed.join(dim, "k").collect()}
    salted = {(r.k, r.payload, r.name)
              for r in salted_join(skewed, dim, "k").collect()}
    assert salted == plain and len(plain) == 2000


def test_salted_join_left_outer(spark):
    skewed = spark.range(100).select((F.col("id") % 5).alias("k"),
                                     F.col("id").alias("v"))
    dim = spark.createDataFrame([(0, "zero"), (1, "one")], ["k", "label"])
    out = salted_join(skewed, dim, "k", how="left")
    assert out.count() == 100
    assert out.filter(F.col("label").isNull()).count() == 60   # keys 2,3,4


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    import shutil
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")
    # a previous session's managed-table dirs survive the catalog:
    # remove the orphaned locations too
    for t in ("bt_orders", "bt_lineitem"):
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    write_bucketed(orders, "bt_orders", "o_orderkey", buckets=8,
                   sort_by=["o_orderkey"])
    write_bucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"),
                   "bt_lineitem", "o_orderkey", buckets=8,
                   sort_by=["o_orderkey"])
    joined = bucketed_join(spark, "bt_orders", "bt_lineitem", "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located buckets: the join itself introduces no shuffle exchange
    assert "Exchange hashpartitioning" not in plan, plan
    assert joined.count() == li.count()


def test_runtime_bloom_filter_prunes_big_shuffle_join(spark):
    """When a join is too big to broadcast but one side is selectively
    filtered, Spark can inject a runtime bloom filter: the filtered
    side builds a bloom_filter_agg and the fact side applies
    might_contain BEFORE its shuffle — row-level semi-join pruning, the
    companion to partition pruning for 100 TB shuffle joins. Pin the
    injection with the thresholds a real deployment would tune."""
    from pyspark.sql import functions as F
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        orders = (spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
                  .filter(F.col("o_orderpriority") == "1-URGENT"))
        j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
             .groupBy("o_orderpriority").count())
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in p       # build on the filtered side
        assert "might_contain" in p          # applied on the fact scan side
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
