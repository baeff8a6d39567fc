"""Lineage-cut helper shared by the iterative operators.

Iterative loops (graph.py label propagation / star contraction,
kmeans.py Lloyd rounds) double their plan every round without a
checkpoint; the choice of WHICH checkpoint is a deployment property:

* local mode / tests: ``localCheckpoint(eager=True)`` — executor-local
  blocks, no external storage needed. Eager, because a lazy checkpoint
  lets concurrent AQE subplans race to be "first use" and recompute
  the upstream pipeline (see operators/dedup.py).
* cluster: set ``spark.checkpoint.dir`` (or call
  ``sparkContext.setCheckpointDir``) and the SAME code paths switch to
  reliable ``checkpoint()`` — iteration state lands in fault-tolerant
  storage and survives executor loss, which localCheckpoint blocks do
  not. conf/spark-defaults-100tb.conf sets this for the 100 TB
  deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and truncate its lineage — reliable
    ``checkpoint()`` when the SparkContext has a checkpoint directory
    configured, else eager ``localCheckpoint()``."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir():
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def persistent_rdd_ids(spark) -> set[int]:
    """IDs of every currently persisted RDD (incl. localCheckpoint
    blocks, which a gc.collect()+System.gc() round NEVER reclaims —
    a JVM-side reference survives py4j detach; pinned by
    tests/test_bench_hygiene.py)."""
    return {int(i) for i in
            spark.sparkContext._jsc.getPersistentRDDs().keySet()}


def reclaim_new_rdds(spark, pre_ids: set[int]) -> int:
    """Deterministically unpersist every RDD not in ``pre_ids`` —
    THE reclaim primitive shared by bench.py's between-entry
    hygiene_sweep and the drained-stream queries whose foreachBatch
    bodies cut lineage per micro-batch. Safe whenever the caller's
    results are already materialized elsewhere (collected, or flushed
    to parquet). Returns the number reclaimed."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    reclaimed = 0
    for rid in list(jmap.keySet()):
        if int(rid) not in pre_ids:
            jmap.get(rid).unpersist(False)
            reclaimed += 1
    return reclaimed
