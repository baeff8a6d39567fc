"""Statement builders for the MySQL mirror (pure functions — the
connection path needs a real server + driver jar and is gated)."""

from __future__ import annotations

import pytest

from nvd2mysqlloader_spark.sources.jdbc import (create_target_sql,
                                                mirror_to_mysql,
                                                upsert_from_staging_sql)


def test_upsert_sql_shape():
    sql = upsert_from_staging_sql("nvd", "nvd_stage",
                                  ["cve_id", "summary", "score"])
    assert sql == ("INSERT INTO nvd (cve_id, summary, score) "
                   "SELECT cve_id, summary, score FROM nvd_stage "
                   "ON DUPLICATE KEY UPDATE summary=VALUES(summary), "
                   "score=VALUES(score)")


def test_key_not_updated():
    sql = upsert_from_staging_sql("t", "s", ["cve_id", "x"])
    assert "cve_id=VALUES(cve_id)" not in sql


def test_ddl_parity_columns():
    ddl = create_target_sql()
    # every silver column present (nvd2mysqlloader.py:282-300)
    for col in ["cve_id", "summary", "config", "score", "access_vector",
                "access_complexity", "authorize", "availability_impact",
                "confidentiality_impact", "integrity_impact",
                "last_modified_datetime", "published_datetime", "urls",
                "vulnerable_software_list"]:
        assert col in ddl
    assert "utf8mb4" in ddl and "FULLTEXT" in ddl


def test_mirror_raises_cleanly_without_server(spark):
    df = spark.createDataFrame([("CVE-1", "s")], ["cve_id", "summary"])
    with pytest.raises(RuntimeError, match="MySQL mirror unavailable"):
        mirror_to_mysql(df, "jdbc:mysql://127.0.0.1:1/x", "nvd")
