"""Streaming-state observability — read a query's state store as a
DataFrame (`statestore` format, Spark 4).

The reference's only observability is print statements around its poll
loop (nvd2mysqlloader.py:508-531). For a stateful streaming topology
the question that matters at 100 TB is "what lives in the state store,
and is it skewed?" — a hot key family (boilerplate sessions, one
tenant's events) concentrates state in one shuffle partition and that
partition's store becomes the straggler/OOM. Both functions are plain
batch reads over the checkpoint; they never touch the running query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators._lineage import cut_lineage as _cut


def read_state(spark: SparkSession, checkpoint: str,
               batch_id: int | None = None,
               operator_id: int = 0,
               store_name: str | None = None) -> DataFrame:
    """The state store contents as (key struct, value struct,
    partition_id) rows — latest committed batch by default.

    ``operator_id``/``store_name`` select which stateful operator and
    which of its stores to read: windowed aggregations keep one
    'default' store, but a stream-stream join keeps FOUR named stores
    per side and has no 'default' — pass the store name from
    :func:`state_metadata` for those."""
    reader = spark.read.format("statestore")
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    if operator_id:
        reader = reader.option("operatorId", operator_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    return reader.load(checkpoint)


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Operator-level metadata: operator/store names, partition count,
    retained batch range."""
    return spark.read.format("state-metadata").load(checkpoint)


def state_skew_summary(spark: SparkSession, checkpoint: str,
                       operator_id: int = 0,
                       store_name: str | None = None) -> DataFrame:
    """Per-partition state-row counts plus the global max/mean ratio —
    the state-store analog of heavy_hitter_keys: a ratio near 1 means
    balanced state; >>1 names the partition a hot key family lives in.

    The mean divides by the operator's TOTAL partition count (from
    state-metadata), not by the number of partitions that happen to
    hold rows — all-state-in-one-partition is exactly the pathology to
    surface, and averaging over non-empty partitions alone would
    report it as skew_ratio 1.0. The per-partition rollup is
    checkpointed so the state read runs once, not once per consumer.

    ``operator_id``/``store_name`` scope BOTH the state read and the
    partition-count denominator to one operator's store — mixing
    operators would deflate/inflate the ratio."""
    n_parts = (state_metadata(spark, checkpoint)
               .filter(F.col("operatorId") == operator_id)
               .agg(F.max("numPartitions")).first()[0])
    per_part = (read_state(spark, checkpoint, operator_id=operator_id,
                           store_name=store_name)
                .groupBy("partition_id")
                .agg(F.count(F.lit(1)).alias("n_state_rows")))
    per_part = _cut(per_part)
    stats = per_part.agg(
        F.max("n_state_rows").alias("mx"),
        (F.sum("n_state_rows") / F.lit(n_parts)).alias("mean")).select(
        (F.col("mx") / F.col("mean")).alias("skew_ratio"))
    return per_part.crossJoin(F.broadcast(stats))
