"""bucketed_interval_join must be semantically identical to the naive
non-equi theta join, for every bucket width — including widths that
misalign with the interval length."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nvd2mysqlloader_spark.operators.rangejoin import bucketed_interval_join
from nvd2mysqlloader_spark.sources.tpch import load_table

from .conftest import SF_SMOKE


def _sides(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    points = ev.select(F.col("event_id").alias("pid"), "ts")
    intervals = (ev.filter(F.col("event_type") == "error")
                 .select(F.col("event_id").alias("iid"),
                         F.col("ts").alias("lo"),
                         (F.col("ts") + F.expr("INTERVAL 2 HOUR")).alias("hi")))
    return points, intervals


def _naive(points, intervals):
    return points.join(
        intervals,
        (points.ts >= intervals.lo) & (points.ts < intervals.hi))


@pytest.mark.parametrize("bucket_s", [3600, 7200, 86400, 7000])
def test_matches_naive_theta_join(spark, bucket_s):
    points, intervals = _sides(spark)
    want = {(r.pid, r.iid) for r in _naive(points, intervals).collect()}
    got_rows = bucketed_interval_join(
        points, intervals, "ts", "lo", "hi", bucket_seconds=bucket_s).collect()
    got = [(r.pid, r.iid) for r in got_rows]
    assert len(got) == len(set(got))        # each pair met exactly once
    assert set(got) == want


def test_boundary_semantics(spark):
    # lo inclusive, hi exclusive: an interval anchored at a point's own
    # ts includes it; one ending exactly at a point's ts does not
    points, intervals = _sides(spark)
    anchored = bucketed_interval_join(points, intervals, "ts", "lo", "hi")
    self_hits = anchored.filter(F.col("pid") == F.col("iid"))
    assert self_hits.count() == intervals.count()


def test_hi_boundary_is_exclusive(spark):
    """Handcrafted: a point at EXACTLY lo matches; a point at EXACTLY
    hi does not. The fixture has no point landing on an interval end,
    so without this a <= regression on hi would ship undetected."""
    import datetime
    T = datetime.datetime
    lo, hi = T(2024, 1, 1, 0, 0, 0), T(2024, 1, 1, 2, 0, 0)
    points = spark.createDataFrame(
        [(1, lo), (2, hi), (3, hi - datetime.timedelta(microseconds=1))],
        ["pid", "ts"])
    intervals = spark.createDataFrame([(10, lo, hi)], ["iid", "lo", "hi"])
    got = {(r.pid, r.iid) for r in bucketed_interval_join(
        points, intervals, "ts", "lo", "hi",
        bucket_seconds=3600).collect()}
    assert got == {(1, 10), (3, 10)}        # hi itself excluded
