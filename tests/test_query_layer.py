"""EP3 query-surface tests over an ingested warehouse: the five
promised query classes + state lookup, via spark.sql on registered
views — 'the database is the product' parity. Also checks the
partition-pruning layout of the silver table."""

from __future__ import annotations

import os

import pytest

from nvd2mysqlloader_spark.ingest import run_ingest
from nvd2mysqlloader_spark.query_layer import (cpe_search, cve_by_id,
                                               cve_tally,
                                               cves_published_between,
                                               cves_with_min_score,
                                               latest_feed_state,
                                               register_nvd_views)

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("whql") / "wh")
    run_ingest(spark, DATA, wh)
    register_nvd_views(spark, wh)
    return wh


def test_partitioned_layout(spark, warehouse):
    assert os.path.isdir(f"{warehouse}/nvd/published_year=2024")
    # date-range scan prunes to the partition: the executed plan's
    # scan must carry the partition filter (a regression to a full
    # scan of every published_year would still return count 2)
    df = cves_published_between(spark, "2024-01-01T00:00Z", "2024-03-01T00:00Z")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "published_year" in plan, plan
    assert df.count() == 2                      # 0001 (Jan), 0002 (Feb 2)


def test_tally(spark, warehouse):
    assert cve_tally(spark).first().n_cves == 6


def test_cpe_search(spark, warehouse):
    hits = cpe_search(spark, "acme").collect()
    assert {r.cve_id for r in hits} == {"CVE-2024-0001"}
    assert {r.vendor for r in hits} == {"acme"}
    # part-of-a-cpe search (docstring :174-177)
    hits2 = cpe_search(spark, "foo:bar").collect()
    assert {r.cve_id for r in hits2} == {"CVE-2024-0002"}


def test_point_lookup(spark, warehouse):
    r = cve_by_id(spark, "CVE-2024-9999").first()
    assert r is not None and r.summary == "Brand new."
    assert cve_by_id(spark, "CVE-1999-0000").count() == 0


def test_severity_filter(spark, warehouse):
    rows = cves_with_min_score(spark, 5.0).collect()
    assert [r.cve_id for r in rows] == ["CVE-2024-0001", "CVE-2024-0002"]
    assert float(rows[0].score) == 7.5


def test_latest_feed_state(spark, warehouse):
    state = {r.download_name: r.lastModifiedDate
             for r in latest_feed_state(spark).collect()}
    assert state["nvdcve-1.1-2024"] == "2024-06-01T03:00:00-04:00"
    assert state["nvdcve-1.1-modified"] == "2024-07-01T03:00:00-04:00"
