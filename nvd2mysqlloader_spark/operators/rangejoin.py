"""Bucketized interval (range) join — a non-equi join the optimizer
can't equi-plan, restructured so it CAN.

A naive ``points JOIN intervals ON ts >= lo AND ts < hi`` has no equi
key, so Spark plans a BroadcastNestedLoopJoin (quadratic work, and the
big side must fit the loop). The standard scale-out shape instead maps
both sides onto fixed time buckets:

  * each point lands in exactly one bucket: floor(us(ts) / B);
  * each interval is exploded to every bucket it overlaps
    (floor(us(lo)/B) .. floor((us(hi)-1)/B), end-exclusive);
  * the join becomes a plain hash equi-join on the bucket id, with the
    exact [lo, hi) predicate as a residual filter.

Because a point occupies exactly one bucket, every qualifying
(point, interval) pair meets exactly once — no post-join dedup.

100 TB notes: pick the bucket width near the median interval length —
wider buckets mean fewer interval replicas but a weaker pre-filter;
narrower means more replicas (an interval costs ceil(len/B)+1 rows in
the shuffle). Hot buckets (flash-crowd timestamps) are split by AQE
skew handling like any skewed equi-join; salting composes if needed.
All arithmetic is exact integer microseconds, so the bucket map can
never disagree with the residual predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_interval_join(points: DataFrame, intervals: DataFrame,
                           ts_col: str, lo_col: str, hi_col: str,
                           bucket_seconds: int = 86400) -> DataFrame:
    """Inner-join ``points`` (timestamp ``ts_col``) to ``intervals``
    (end-exclusive ``[lo_col, hi_col)``) via bucket equi-join +
    residual. Returns the joined rows with all columns of both inputs.
    """
    b_us = F.lit(int(bucket_seconds) * 1_000_000)

    def us(c: str):
        # NTZ columns under the pinned-UTC session cast exactly
        return F.unix_micros(F.col(c).cast("timestamp"))

    p = points.withColumn("__bkt", F.floor(us(ts_col) / b_us))
    iv = intervals.withColumn(
        "__bkt",
        F.explode(F.sequence(
            F.floor(us(lo_col) / b_us),
            F.floor((us(hi_col) - 1) / b_us))))
    return (p.join(iv, "__bkt")
            .filter((F.col(ts_col) >= F.col(lo_col))
                    & (F.col(ts_col) < F.col(hi_col)))
            .drop("__bkt"))
