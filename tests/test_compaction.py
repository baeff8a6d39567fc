"""Small-file compaction: fewer files, identical data, stats restored."""

from __future__ import annotations

from pyspark.sql import functions as F

from nvd2mysqlloader_spark.operators.compaction import (
    compact_parquet, list_data_files, plan_compaction)


def _content_hash(df):
    return (df.select(F.md5(F.concat_ws("|", *sorted(df.columns)))
                      .alias("h"))
            .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10)
                       .cast("decimal(38,0)")).alias("s"))
            .first().s)


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "tbl")
    # simulate micro-batch accretion: 40 tiny appends
    for i in range(40):
        (spark.range(i * 100, (i + 1) * 100)
         .selectExpr("id", "id % 7 AS k", "CAST(id AS STRING) AS payload")
         .coalesce(1).write.mode("append").parquet(path))
    before = plan_compaction(path, target_bytes=1 * 1024 * 1024)
    assert before["n_files"] == 40 and before["worth_it"]
    pre_rows = spark.read.parquet(path).count()
    pre_hash = _content_hash(spark.read.parquet(path))

    stats = compact_parquet(spark, path, target_bytes=1 * 1024 * 1024,
                            sort_by=["id"])
    assert stats["after_files"] < stats["before_files"]
    assert len(list_data_files(path)) == stats["after_files"]

    post = spark.read.parquet(path)
    assert post.count() == pre_rows == 4000
    assert _content_hash(post) == pre_hash      # order-insensitive identity
    assert not plan_compaction(path, 1024 * 1024)["worth_it"]


def test_partitioned_compaction_preserves_layout(spark, tmp_path):
    path = str(tmp_path / "ptbl")
    for i in range(12):
        (spark.range(i * 50, (i + 1) * 50)
         .selectExpr("id", "CAST(id % 3 AS INT) AS year")
         .coalesce(1).write.mode("append")
         .partitionBy("year").parquet(path))
    import glob
    import os
    assert len(glob.glob(f"{path}/year=*/")) == 3
    pre = spark.read.parquet(path)
    pre_rows, pre_sum = pre.count(), pre.agg(F.sum("id")).first()[0]
    pre_y1 = pre.filter(F.col("year") == 1).count()

    stats = compact_parquet(spark, path, target_bytes=1024 * 1024)
    assert stats["partitions"] == 3
    assert stats["after_files"] < stats["before_files"]
    # layout intact: same partition dirs, pruning still applies
    assert sorted(os.path.basename(p.rstrip("/"))
                  for p in glob.glob(f"{path}/year=*/")) == \
        ["year=0", "year=1", "year=2"]
    post = spark.read.parquet(path)
    assert post.count() == pre_rows
    assert post.agg(F.sum("id")).first()[0] == pre_sum
    assert post.filter(F.col("year") == 1).count() == pre_y1
