"""End-to-end ingest pipeline tests (EP1/EP2 semantics): incremental
gate, merge-upsert warehouse writes, audit trail, reload-no-duplicate."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from nvd2mysqlloader_spark.ingest import fresh_feeds, run_ingest

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "wh")


def test_ingest_end_to_end(spark, warehouse):
    stats = run_ingest(spark, DATA, warehouse)
    assert stats["feeds"] == 2
    assert stats["cves"] == 6            # 7 raw, 1 deduped last-writer-wins
    assert stats["added"] == 6

    nvd = spark.read.parquet(f"{warehouse}/nvd")
    assert nvd.count() == 6
    r = nvd.filter(F.col("cve_id") == "CVE-2024-0002").first()
    assert float(r.score) == 5.0         # modified feed won
    assert spark.read.parquet(f"{warehouse}/nvd_json").count() == 6
    assert spark.read.parquet(f"{warehouse}/update_history").count() == 2


def test_reload_is_noop(spark, warehouse):
    run_ingest(spark, DATA, warehouse)
    stats2 = run_ingest(spark, DATA, warehouse)   # ref :568-570: delta 0
    assert stats2["feeds"] == 0
    assert stats2["added"] == 0
    assert spark.read.parquet(f"{warehouse}/nvd").count() == 6


def test_gate_admits_newer_meta(spark, warehouse, tmp_path):
    run_ingest(spark, DATA, warehouse)
    # re-deliver 'modified' with a NEWER lastModifiedDate → only it loads
    landing2 = tmp_path / "landing2"
    landing2.mkdir()
    for f in os.listdir(DATA):
        shutil.copy(os.path.join(DATA, f), landing2 / f)
    meta = (landing2 / "nvdcve-1.1-modified.meta").read_text()
    (landing2 / "nvdcve-1.1-modified.meta").write_text(
        meta.replace("2024-07-01T03:00:00-04:00", "2024-08-01T03:00:00-04:00"))
    fresh = fresh_feeds(spark, str(landing2), warehouse)
    assert [r.download_name for r in fresh.collect()] == ["nvdcve-1.1-modified"]
    stats = run_ingest(spark, str(landing2), warehouse)
    assert stats["feeds"] == 1
    assert stats["added"] == 0           # same CVEs, upsert replaces
