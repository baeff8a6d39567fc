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


def test_compaction_skipped_when_not_worth_it(spark, tmp_path):
    """A table already at target file sizes is not rewritten (the plan
    says not worth_it) — no new version published, files untouched."""
    import os
    path = str(tmp_path / "fine")
    (spark.range(1000).selectExpr("id", "CAST(id AS STRING) AS p")
     .coalesce(1).write.parquet(path))
    before = {p: os.path.getmtime(p) for p, _ in list_data_files(path)}
    stats = compact_parquet(spark, path, target_bytes=128 * 1024 * 1024)
    assert stats.get("skipped") is True
    assert stats["before_files"] == stats["after_files"]
    assert {p: os.path.getmtime(p) for p, _ in list_data_files(path)} == before
    # force overrides the plan
    forced = compact_parquet(spark, path, target_bytes=128 * 1024 * 1024,
                             force=True)
    assert "skipped" not in forced


def test_compaction_recovers_from_stale_debris(spark, tmp_path):
    """Leftover unpublished version dirs / swap links from a crashed
    run are cleaned on the next attempt instead of failing it."""
    import os

    from nvd2mysqlloader_spark.operators import table_io
    path = str(tmp_path / "debris")
    for i in range(10):
        (spark.range(i * 10, (i + 1) * 10).selectExpr("id")
         .coalesce(1).write.mode("append").parquet(path))
    # simulate a crashed prior run: migrate + fabricate an unpublished
    # newer version dir and a dangling swap symlink
    table_io.ensure_versioned(path)
    stale = table_io.next_version_dir(path)
    os.makedirs(stale)
    with open(os.path.join(stale, "part-garbage.parquet"), "w") as fh:
        fh.write("junk")
    os.symlink("nowhere", path + ".__swap")
    # crash debris is old by the time anyone cleans; the sweep
    # age-gates (60s) so it can't race a LIVE publisher's staging link
    old_t = 1_000_000_000
    os.utime(path + ".__swap", (old_t, old_t), follow_symlinks=False)

    stats = compact_parquet(spark, path, target_bytes=1024 * 1024)
    assert stats["after_files"] < stats["before_files"]
    # the fabricated junk never leaks into the published table (the
    # stale dir was removed; its NAME may be reused by the new version)
    assert not os.path.exists(os.path.join(stale, "part-garbage.parquet"))
    assert not os.path.lexists(path + ".__swap")
    assert spark.read.parquet(path).count() == 100


def test_partitioned_compaction_links_not_worth_it_partitions(spark,
                                                              tmp_path):
    """Mixed table: fragmented partitions are rewritten, healthy ones
    are carried into the new version as hardlinks (same inodes)."""
    import glob
    import os
    path = str(tmp_path / "mixed")
    # year=0: one healthy file; year=1: 20 fragments
    (spark.range(1000).selectExpr("id", "CAST(0 AS INT) AS year")
     .coalesce(1).write.partitionBy("year").parquet(path))
    for i in range(20):
        (spark.range(i * 10, (i + 1) * 10)
         .selectExpr("id", "CAST(1 AS INT) AS year")
         .coalesce(1).write.mode("append").partitionBy("year").parquet(path))
    healthy_inodes = {os.stat(p).st_ino
                      for p in glob.glob(f"{path}/year=0/*.parquet")}
    n_frag = len(glob.glob(f"{path}/year=1/*.parquet"))
    assert n_frag == 20

    stats = compact_parquet(spark, path, target_bytes=1024 * 1024)
    assert stats["partitions"] == 2
    # healthy partition: same inodes (hardlinked, not rewritten)
    assert {os.stat(p).st_ino
            for p in glob.glob(f"{path}/year=0/*.parquet")} == healthy_inodes
    # fragmented partition: fewer files now
    assert len(glob.glob(f"{path}/year=1/*.parquet")) < n_frag
    post = spark.read.parquet(path)
    assert post.count() == 1000 + 200


def test_multilevel_partitioned_compaction(spark, tmp_path):
    """year=/month= nesting: leaf partitions compact independently,
    the nested layout (and pruning) survives, data identical
    (regression — one-level listing used to flatten the hierarchy)."""
    import glob
    path = str(tmp_path / "nested")
    for i in range(10):
        (spark.range(i * 20, (i + 1) * 20)
         .selectExpr("id", "CAST(id % 2 AS INT) AS year",
                     "CAST(id % 3 AS INT) AS month")
         .coalesce(1).write.mode("append")
         .partitionBy("year", "month").parquet(path))
    pre = spark.read.parquet(path)
    # materialize BEFORE compaction: a symlink-listed DataFrame is
    # only valid until the next publish (see table_io.read_version)
    pre_rows, pre_sum = pre.count(), pre.agg(F.sum("id")).first()[0]
    pre_y1m2 = pre.filter("year = 1 AND month = 2").count()
    n_leaves = len(glob.glob(f"{path}/year=*/month=*/"))
    assert n_leaves == 6

    stats = compact_parquet(spark, path, target_bytes=1024 * 1024)
    assert stats["partitions"] == 6
    assert stats["after_files"] < stats["before_files"]
    assert len(glob.glob(f"{path}/year=*/month=*/")) == 6
    post = spark.read.parquet(path)
    assert post.count() == pre_rows
    assert post.agg(F.sum("id")).first()[0] == pre_sum
    assert post.filter("year = 1 AND month = 2").count() == pre_y1m2


def test_mixed_string_partitioned_compaction_falls_back(spark, tmp_path):
    """The one-job fast path's partition FILTER is restricted to
    int-valued single-level dirs (dir-name strings round-trip exactly
    through an int cast); a mixed STRING-partitioned table must take
    the per-dir loop and still compact correctly — healthy partition
    hardlinked, fragmented partition rewritten, relation unchanged."""
    import glob
    import os
    path = str(tmp_path / "strmixed")
    (spark.range(500).selectExpr("id", "'aa' AS grp")
     .coalesce(1).write.partitionBy("grp").parquet(path))
    for i in range(12):
        (spark.range(i * 10, (i + 1) * 10)
         .selectExpr("id", "'bb' AS grp")
         .coalesce(1).write.mode("append").partitionBy("grp")
         .parquet(path))
    healthy = {os.stat(p).st_ino
               for p in glob.glob(f"{path}/grp=aa/*.parquet")}
    n_frag = len(glob.glob(f"{path}/grp=bb/*.parquet"))
    assert n_frag == 12

    stats = compact_parquet(spark, path, target_bytes=1024 * 1024)
    assert stats["partitions"] == 2
    assert stats["after_files"] < stats["before_files"]
    assert {os.stat(p).st_ino
            for p in glob.glob(f"{path}/grp=aa/*.parquet")} == healthy
    assert len(glob.glob(f"{path}/grp=bb/*.parquet")) < n_frag
    post = spark.read.parquet(path)
    assert post.count() == 500 + 120
    assert post.filter(F.col("grp") == "bb").count() == 120


def test_leading_zero_int_partition_falls_back_no_data_loss(spark, tmp_path):
    """Zero-padded integer dir values (``month=07``, common in
    externally-written Hive layouts) must NOT take the one-job fast
    path: partition inference reads ``07`` as 7, so the fast path's
    ``cast('string')`` filter would drop the partition entirely
    (silent data loss) and the partitionBy writer would re-render the
    dir as ``month=7``. The per-dir loop preserves rows AND the exact
    dir names."""
    import glob
    import os
    path = str(tmp_path / "zeropad")
    os.makedirs(path)
    # write non-canonical dirs by hand (Spark itself always renders
    # canonically, so build the layout the way an external writer would)
    for val, lo, hi, nfiles in [("07", 0, 120, 12), ("11", 200, 700, 1)]:
        d = os.path.join(path, f"month={val}")
        step = (hi - lo) // nfiles
        for i in range(nfiles):
            (spark.range(lo + i * step, lo + (i + 1) * step)
             .coalesce(1).write.mode("append").parquet(d))
    pre = spark.read.parquet(path)
    pre_rows, pre_sum = pre.count(), pre.agg(F.sum("id")).first()[0]

    stats = compact_parquet(spark, path, target_bytes=1024 * 1024)
    assert stats["partitions"] == 2
    assert stats["after_files"] < stats["before_files"]
    # exact dir names preserved — no month=7 canonicalization, no merge
    dirs = sorted(os.path.basename(p.rstrip("/"))
                  for p in glob.glob(f"{path}/month=*/"))
    assert dirs == ["month=07", "month=11"]
    post = spark.read.parquet(path)
    assert post.count() == pre_rows
    assert post.agg(F.sum("id")).first()[0] == pre_sum


def test_colliding_noncanonical_dirs_preserved(spark, tmp_path):
    """``month=7`` and ``month=07`` in one table: inference maps both
    to 7, so any whole-table rewrite would merge them. The round-trip
    guard must force the per-dir loop, keeping both dirs distinct with
    their own rows."""
    import glob
    import os
    path = str(tmp_path / "collide")
    os.makedirs(path)
    for val, lo, hi, nfiles in [("7", 0, 100, 10), ("07", 1000, 1100, 10)]:
        d = os.path.join(path, f"month={val}")
        step = (hi - lo) // nfiles
        for i in range(nfiles):
            (spark.range(lo + i * step, lo + (i + 1) * step)
             .coalesce(1).write.mode("append").parquet(d))

    compact_parquet(spark, path, target_bytes=1024 * 1024)
    dirs = sorted(os.path.basename(p.rstrip("/"))
                  for p in glob.glob(f"{path}/month=*/"))
    assert dirs == ["month=07", "month=7"]
    assert spark.read.parquet(f"{path}/month=07").count() == 100
    assert spark.read.parquet(f"{path}/month=7").count() == 100


def test_value_round_trips_classifier():
    from nvd2mysqlloader_spark.operators.compaction import \
        _value_round_trips as rt
    assert rt("7") and rt("-7") and rt("0") and rt("123456789012")
    assert rt("aa") and rt("us-east") and rt("a1b2")
    assert not rt("07") and not rt("-0") and not rt("007")
    assert not rt("1.5") and not rt("1.50") and not rt("1e3")
    assert not rt("nan") and not rt("Infinity")
    assert not rt("a%3Ab") and not rt("") and not rt("50%")
    assert not rt("2021-01-01") and not rt("2021-1-1")
    assert not rt("2021-01-01 00:00:00") and not rt("2021-01")
    assert not rt("__HIVE_DEFAULT_PARTITION__")


def test_escaped_string_partition_falls_back_no_data_loss(spark,
                                                          tmp_path):
    """Hive-escaped partition values (dir lang=a%3Ab stores column
    value 'a:b') must NOT take the one-job fast path: the partition
    filter compares raw dir strings against unescaped column values
    (matches nothing — silent loss) and the writer would re-escape.
    The per-dir loop preserves rows and exact dir names."""
    import glob
    import os
    path = str(tmp_path / "escaped")
    (spark.range(10).selectExpr("id", "'a:b' AS lang")
     .coalesce(1).write.partitionBy("lang").parquet(path))
    for i in range(8):
        (spark.range(100 + i * 10, 110 + i * 10)
         .selectExpr("id", "'plain' AS lang")
         .coalesce(1).write.mode("append").partitionBy("lang")
         .parquet(path))
    pre = spark.read.parquet(path)
    pre_rows, pre_sum = pre.count(), pre.agg(F.sum("id")).first()[0]
    assert os.path.isdir(f"{path}/lang=a%3Ab")

    compact_parquet(spark, path, target_bytes=1024 * 1024)
    dirs = sorted(os.path.basename(p.rstrip("/"))
                  for p in glob.glob(f"{path}/lang=*/"))
    assert dirs == ["lang=a%3Ab", "lang=plain"]
    post = spark.read.parquet(path)
    assert post.count() == pre_rows
    assert post.agg(F.sum("id")).first()[0] == pre_sum
    assert post.filter(F.col("lang") == "a:b").count() == 10
