"""Loaders for the driver's synthetic parquet tables.

Plain ``spark.read.parquet`` — the vectorized reader plus Catalyst
give predicate pushdown, column pruning, and min/max row-group skipping
for free; at 100 TB the same call reads a partitioned directory tree and
partition pruning replaces the reference's B-tree indexes
(nvd2mysqlloader.py:400-403).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TPCH_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table (``region nation customer supplier part
    orders lineitem events documents embeddings``).

    ``events.parquet`` has shipped with different physical ``ts`` types
    across testdata generations (TIMESTAMP(NANOS); TIMESTAMP(MICROS)
    with isAdjustedToUTC=false → TIMESTAMP_NTZ). Normalize all of them
    to session-UTC TIMESTAMP so every downstream epoch extraction
    (``unix_micros`` & co.) sees one type with DuckDB-identical epoch
    values.
    """
    # pin determinism-relevant confs at call time: the caller's session
    # (driver harness, notebook) may not have been built by session.py
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # nanos-as-long: integer div — ns epochs exceed 2^53, double
            # division drifts 1µs
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # wall-clock == UTC instant under the session tz pinned above,
            # so this cast is epoch-preserving vs the DuckDB oracle
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TPCH_TABLES) -> None:
    """Register every table as a temp view so ``spark.sql`` works over
    the full surface (the engine's answer to 'MySQL is the query API',
    reference README.md:37-39)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
