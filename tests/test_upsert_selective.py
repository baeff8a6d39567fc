"""Partition-selective upsert: only partitions named by the update
batch are read or rewritten; untouched partition files stay untouched
on disk (inode-identical), and merge semantics are unchanged."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from nvd2mysqlloader_spark.operators.upsert import write_upsert_parquet


def _files(path: str, part: str) -> dict[str, float]:
    return {p: os.path.getmtime(p)
            for p in glob.glob(f"{path}/{part}/*.parquet")}


def test_selective_upsert_leaves_other_partitions_untouched(spark, tmp_path):
    path = str(tmp_path / "nvd")
    base = spark.createDataFrame(
        [("CVE-2020-1", 2020, "a"), ("CVE-2020-2", 2020, "b"),
         ("CVE-2021-1", 2021, "c")],
        ["cve_id", "published_year", "summary"])
    write_upsert_parquet(path, base, ["cve_id"],
                         partition_by=["published_year"])
    before_2020 = _files(path, "published_year=2020")
    before_2021 = _files(path, "published_year=2021")
    assert before_2020 and before_2021

    # update batch touches ONLY 2021
    upd = spark.createDataFrame(
        [("CVE-2021-1", 2021, "c2"), ("CVE-2021-9", 2021, "new")],
        ["cve_id", "published_year", "summary"])
    write_upsert_parquet(path, upd, ["cve_id"],
                         partition_by=["published_year"])

    # 2020 partition byte-identical (same files, same mtimes)
    assert _files(path, "published_year=2020") == before_2020
    # 2021 rewritten
    assert _files(path, "published_year=2021") != before_2021

    got = {r.cve_id: r.summary
           for r in spark.read.parquet(path).collect()}
    assert got == {"CVE-2020-1": "a", "CVE-2020-2": "b",
                   "CVE-2021-1": "c2", "CVE-2021-9": "new"}


def test_selective_upsert_idempotent(spark, tmp_path):
    path = str(tmp_path / "nvd2")
    rows = [("CVE-2022-1", 2022, "x"), ("CVE-2023-1", 2023, "y")]
    df = spark.createDataFrame(
        rows, ["cve_id", "published_year", "summary"])
    write_upsert_parquet(path, df, ["cve_id"],
                         partition_by=["published_year"])
    write_upsert_parquet(path, df, ["cve_id"],
                         partition_by=["published_year"])
    out = spark.read.parquet(path)
    assert out.count() == 2
    assert out.filter(F.col("published_year") == 2022).count() == 1


def test_upsert_never_exposes_partial_state(spark, tmp_path, monkeypatch):
    """A reader that scans the table at ANY point during an upsert sees
    a complete version — full old before publish, full new after —
    never a partially-written directory. Verified by interposing on
    the publish step (the only state transition) and reading mid-write."""
    from nvd2mysqlloader_spark.operators import table_io

    path = str(tmp_path / "atomic")
    old = spark.createDataFrame(
        [("CVE-2020-1", 2020, "a"), ("CVE-2021-1", 2021, "b")],
        ["cve_id", "published_year", "summary"])
    write_upsert_parquet(path, old, ["cve_id"],
                         partition_by=["published_year"])
    old_rows = {(r.cve_id, r.summary)
                for r in spark.read.parquet(path).collect()}

    seen_mid_write = []
    real_publish = table_io.publish_version

    def spying_publish(p, vdir, keep=2):
        # the new version dir is fully written but NOT yet published:
        # a concurrent reader must still see the complete old table
        seen_mid_write.append({(r.cve_id, r.summary)
                               for r in spark.read.parquet(path).collect()})
        real_publish(p, vdir, keep)

    monkeypatch.setattr(table_io, "publish_version", spying_publish)
    upd = spark.createDataFrame(
        [("CVE-2021-1", 2021, "b2"), ("CVE-2021-2", 2021, "c")],
        ["cve_id", "published_year", "summary"])
    write_upsert_parquet(path, upd, ["cve_id"],
                         partition_by=["published_year"])
    assert seen_mid_write == [old_rows]
    assert {(r.cve_id, r.summary)
            for r in spark.read.parquet(path).collect()} == {
        ("CVE-2020-1", "a"), ("CVE-2021-1", "b2"), ("CVE-2021-2", "c")}


def test_upsert_crash_before_publish_leaves_table_intact(spark, tmp_path,
                                                         monkeypatch):
    """A writer dying before the pointer flip leaves the published
    version untouched; the next upsert cleans the debris and succeeds."""
    from nvd2mysqlloader_spark.operators import table_io

    path = str(tmp_path / "crashy")
    base = spark.createDataFrame([("CVE-2020-1", 2020, "a")],
                                 ["cve_id", "published_year", "summary"])
    write_upsert_parquet(path, base, ["cve_id"],
                         partition_by=["published_year"])

    def boom(p, vdir, keep=2):
        raise RuntimeError("simulated crash before publish")

    monkeypatch.setattr(table_io, "publish_version", boom)
    upd = spark.createDataFrame([("CVE-2020-1", 2020, "CHANGED")],
                                ["cve_id", "published_year", "summary"])
    try:
        write_upsert_parquet(path, upd, ["cve_id"],
                             partition_by=["published_year"])
        raise AssertionError("expected simulated crash")
    except RuntimeError:
        pass
    # reader still sees the old committed state
    assert spark.read.parquet(path).first().summary == "a"
    monkeypatch.undo()
    # next writer cleans the orphaned version dir and lands the update
    write_upsert_parquet(path, upd, ["cve_id"],
                         partition_by=["published_year"])
    assert spark.read.parquet(path).first().summary == "CHANGED"
    # no unpublished version dirs newer than the current one remain
    import os
    cur = os.path.realpath(path)
    vs = table_io.versions(path)
    assert vs[-1][1] == cur, f"stale newer version survived: {vs}"


def test_version_retention_and_pruning(spark, tmp_path):
    """The previous version survives one publish (in-flight reader
    grace) and is pruned on the publish after that."""
    from nvd2mysqlloader_spark.operators import table_io

    path = str(tmp_path / "vers")
    for i in range(4):
        df = spark.createDataFrame([("CVE-2020-1", 2020, f"s{i}")],
                                   ["cve_id", "published_year", "summary"])
        write_upsert_parquet(path, df, ["cve_id"],
                             partition_by=["published_year"])
        vs = table_io.versions(path)
        assert len(vs) <= 2, f"pruning failed: {vs}"
    assert spark.read.parquet(path).first().summary == "s3"


def test_upsert_does_not_mutate_session_conf(spark, tmp_path):
    """Regression (ADVICE r3): the partitioned upsert used to set
    spark.sql.sources.partitionOverwriteMode=dynamic on the shared
    session and never restore it. The versioned-write path doesn't
    need the conf at all — it must stay untouched."""
    key = "spark.sql.sources.partitionOverwriteMode"
    before = spark.conf.get(key)
    df = spark.createDataFrame([("CVE-2020-1", 2020, "a")],
                               ["cve_id", "published_year", "summary"])
    path = str(tmp_path / "conf")
    write_upsert_parquet(path, df, ["cve_id"],
                         partition_by=["published_year"])
    write_upsert_parquet(path, df, ["cve_id"],
                         partition_by=["published_year"])
    assert spark.conf.get(key) == before
