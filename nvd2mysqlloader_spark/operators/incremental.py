"""Incremental-load gate — high-water-mark freshness predicate.

Reference: skip a feed unless ``remote.lastModifiedDate >
stored.lastModifiedDate`` (lexicographic ISO-8601 compare,
nvd2mysqlloader.py:84-99) with a sentinel default meaning "never
loaded ⇒ always load". Spark-first: the stored high-water-mark is a
scalar aggregate of the state table; the gate is a filter against it
(SURVEY.md §2 #15, §3 EP2).

Scale: the state aggregate is tiny → Catalyst broadcasts it as a
scalar/ small build side; the filter on the big batch pushes down to
the scan when the watermark column is a partition or stats column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def newer_than_high_water_mark(batch: DataFrame, state: DataFrame,
                               ts_col: str,
                               sentinel: str = "1970-01-01T00:00:00") -> DataFrame:
    """Rows of ``batch`` strictly newer than ``max(state[ts_col])``.

    Empty state coalesces to ``sentinel`` (⇒ everything loads) — the
    reference's invalid-date sentinel at nvd2mysqlloader.py:89 made
    sane. Works for TimestampType and for ISO-8601 strings alike
    (lexicographic == chronological within one offset).
    """
    hwm = state.agg(F.max(ts_col).alias("__hwm"))
    gated = batch.join(F.broadcast(hwm), how="cross")
    return (gated.filter(
        F.col(ts_col) > F.coalesce(F.col("__hwm"), F.lit(sentinel).cast(batch.schema[ts_col].dataType)))
        .drop("__hwm"))
