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
