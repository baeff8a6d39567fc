"""Pandas GROUPED_AGG UDAF under the DuckDB oracle — the last Arrow
execution shape (scalar pandas_udf, grouped-map applyInPandas,
mapInPandas, and the native UDTF are already oracle-gated elsewhere;
this adds the vectorized custom AGGREGATE). The reference has no UDF
surface at all (plain SELECTs, nvd2mysqlloader.py:339-420).

Exactness contract: the aggregate input is quantized to int64 micros
JVM-side (floor — identical semantics on both engines, no round-half
hazard; NaNs are excluded up front like every exact-sum query here),
so the pandas-side sum is exact order-independent integer arithmetic
and the result hash-matches DuckDB regardless of Arrow batch
boundaries or partitioning.

Registered after every other module: appends must never reshuffle
the harness's fixed-size registry prefix.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from ..sources.tpch import load_table
from .registry import query


# an explicit DataType (not a DDL string) keeps the decorator from
# needing an active SparkContext at import time — plans modules load
# before any session exists
@pandas_udf(LongType())
def _sum_i64(v: pd.Series) -> int:
    """Exact int64 sum as a GROUPED_AGG pandas UDAF — numpy integer
    summation, order-independent (the int64 domain here is |value| ≤
    5e8 micros × ≤ |events| rows, far inside 2^63)."""
    return int(v.sum())


# Spark refuses to mix GROUPED_AGG pandas UDFs with built-in
# aggregates in one agg (INVALID_PANDAS_UDF_PLACEMENT), so the row
# count is a pandas UDAF too.
@pandas_udf(LongType())
def _n(v: pd.Series) -> int:
    return int(len(v))


@query(
    "udaf_event_value_totals",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT))
                AS BIGINT) AS sum_micros,
           round(CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT))
                      AS DOUBLE)
                 / count(*) / 1000000.0, 6) AS mean_value
    FROM events WHERE value IS NOT NULL AND NOT isnan(value)
    GROUP BY event_type
    """,
    doc=(
        "vectorized custom aggregate (pandas GROUPED_AGG UDAF) under "
        "the hash oracle: per-event-type totals where the sum runs "
        "as numpy int64 inside the Arrow worker over JVM-quantized "
        "micros (floor semantics shared with the oracle; NaNs "
        "excluded up front), so the custom-UDAF result is "
        "bit-identical to DuckDB's SQL aggregate under any "
        "partitioning or Arrow batch size. Completes the Python-"
        "boundary taxonomy: scalar pandas_udf, grouped-map "
        "applyInPandas, mapInPandas, native UDTF, and now "
        "GROUPED_AGG are each pinned by an oracle-checked query. "
        "At 100 TB the JVM-side quantization stays in codegen and "
        "only (event_type, int64) pairs cross the Arrow boundary."
    ),
)
def udaf_event_value_totals(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # NULLs filtered explicitly: Spark's ~isnan(NULL) is NULL-kept
    # while DuckDB's NOT isnan(NULL) drops the row, and a kept NULL
    # would make _n count a row that _sum_i64 skips.
    q = (events.filter(F.col("value").isNotNull() & ~F.isnan("value"))
         .select("event_type",
                 F.floor(F.col("value") * 1000000.0)
                 .cast("long").alias("v_us")))
    agg = (q.groupBy("event_type")
           .agg(_n("v_us").alias("n_events"),
                _sum_i64("v_us").alias("sum_micros")))
    mean = F.round(F.col("sum_micros").cast("double")
                   / F.col("n_events") / F.lit(1000000.0), 6)
    return agg.select("event_type", "n_events", "sum_micros",
                      mean.alias("mean_value"))
