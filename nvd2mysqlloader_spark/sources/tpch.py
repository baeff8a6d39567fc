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


def _has_nanos_ts(path: str) -> bool:
    """Footer probe: does this parquet file (or any part file of a
    directory) carry a TIMESTAMP(NANOS) ``ts`` column? Falls back to
    True on probe failure — setting the legacy conf unnecessarily is
    harmless for the micros/NTZ generations (their types are
    unaffected), while missing it on a nanos file breaks the read."""
    try:
        import pyarrow.parquet as pq
        target = path
        if os.path.isdir(path):
            parts = [p for p in os.listdir(path)
                     if p.endswith(".parquet") and not p.startswith(".")]
            if not parts:
                return False
            target = os.path.join(path, parts[0])
        schema = pq.read_schema(target)
        if "ts" not in schema.names:
            return False
        return "ns" in str(schema.field("ts").type)
    except Exception:
        return True


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
    # Session-UTC is an ENGINE CONTRACT, pinned at call time because
    # the caller's session (driver harness, notebook) may not have
    # been built by session.py: every oracle comparison and epoch
    # extraction in this repo assumes it. It is deliberately session-
    # global — scoping it per-read is impossible for lazy frames (the
    # conf is consulted at execution, after any restore).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # nanosAsLong is set ONLY when this events file physically carries
    # TIMESTAMP(NANOS) (probed from the footer): the conf is session-
    # global and would silently turn every OTHER nanos-parquet read in
    # the caller's session into LongType columns, so don't flip it for
    # data that doesn't need it.
    if name == "events" and _has_nanos_ts(f"{sf_dir}/{name}.parquet"):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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
