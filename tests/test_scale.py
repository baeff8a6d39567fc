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


def test_bloom_filtered_join_equals_plain_semi_and_anti(spark):
    """The bloom prefilter is transparent: semi and anti results equal
    the plain joins even with a deliberately tiny (high-FP) filter,
    because blooms never false-negative and the exact residual join
    removes the false positives. NULL fact keys follow exact-join
    semantics (semi drops, anti keeps)."""
    from nvd2mysqlloader_spark.operators.scale import bloom_filtered_join

    fact = spark.createDataFrame(
        [(i % 40 if i % 7 else None, i) for i in range(300)],
        "k bigint, v bigint")
    dim = spark.createDataFrame([(i,) for i in range(0, 40, 3)],
                                "dk bigint")
    plain_semi = {(r.k, r.v) for r in fact.join(
        dim, fact.k == dim.dk, "left_semi").collect()}
    plain_anti = {(r.k, r.v) for r in fact.join(
        dim, fact.k == dim.dk, "left_anti").collect()}
    for m_bits in (64, 1 << 12):          # high-FP and low-FP regimes
        semi = {(r.k, r.v) for r in bloom_filtered_join(
            fact, dim, "k", "dk", "left_semi", m_bits=m_bits).collect()}
        anti = {(r.k, r.v) for r in bloom_filtered_join(
            fact, dim, "k", "dk", "left_anti", m_bits=m_bits).collect()}
        assert semi == plain_semi, m_bits
        assert anti == plain_anti, m_bits
    assert any(k is None for k, _ in plain_anti)   # nulls kept by anti


def test_bloom_prefilter_actually_prunes(spark):
    """The point of the bloom: far fewer rows reach the residual join
    than the fact has. Measured via the membership words directly —
    a well-sized filter (m >= 10x keys, k=4) passes the true matches
    plus a sub-5%-of-misses FP sliver."""
    from nvd2mysqlloader_spark.operators.scale import (
        bloom_filtered_join, build_bloom_words)

    fact = spark.range(5000).select((F.col("id") % 1000).alias("k"))
    dim = spark.range(50).select((F.col("id") * 20).alias("dk"))
    true_hits = fact.join(dim, fact.k == dim.dk, "left_semi").count()

    # count bloom-positive rows by diffing the anti plan's branches:
    # negatives skipped the join entirely -> positives = fact - negatives
    words = build_bloom_words(dim, "dk", 1 << 13, 4)
    nz = sum(1 for w in words if w)
    assert 0 < nz <= 50 * 4                       # <= k bits per key

    semi = bloom_filtered_join(fact, dim, "k", "dk", "left_semi",
                               m_bits=1 << 13)
    assert semi.count() == true_hits == 250
    # FP sliver: replay the membership filter alone (the semi plan's
    # first stage) and bound what survives
    from nvd2mysqlloader_spark.operators.scale import _bloom_pos, \
        _shiftleft_col
    arr = F.lit(words).cast("array<bigint>")
    member = F.lit(True)
    for i in range(4):
        pos = _bloom_pos(F.col("k"), i, 1 << 13)
        word = F.element_at(arr, F.shiftright(pos, 6).cast("int") + 1)
        member = member & (word.bitwiseAND(_shiftleft_col(pos % 64)) != 0)
    passed = fact.filter(member).count()
    assert true_hits <= passed <= true_hits + int(0.05 * (5000 - true_hits))


def test_bloom_filtered_join_same_key_name(spark):
    """Regression: fact_key == dim_key (user_id vs user_id, the common
    decontamination shape) used to raise AMBIGUOUS_REFERENCE in the
    residual join condition."""
    from nvd2mysqlloader_spark.operators.scale import bloom_filtered_join
    fact = spark.range(100).select((F.col("id") % 20).alias("k"),
                                   F.col("id").alias("v"))
    dim = spark.range(5).select((F.col("id") * 4).alias("k"))
    got = {(r.k, r.v) for r in bloom_filtered_join(
        fact, dim, "k", "k", "left_semi", m_bits=1 << 10).collect()}
    want = {(r.k, r.v) for r in fact.join(
        dim.withColumnRenamed("k", "dk"),
        F.col("k") == F.col("dk"), "left_semi").collect()}
    assert got == want and got


def test_bloom_filtered_join_rejects_payload_shapes(spark):
    import pytest

    from nvd2mysqlloader_spark.operators.scale import bloom_filtered_join
    df = spark.range(4).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="left_semi/left_anti"):
        bloom_filtered_join(df, df, "k", "k", "inner")
