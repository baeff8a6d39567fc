"""Distributed Lloyd's k-means over an embedding column — the
iterative-algorithm pattern the reference cannot express at all (its
surface is single SELECTs, nvd2mysqlloader.py:339-420) and SQL cannot
either (hence rows-only verification against an exact numpy twin).

Spark-first shape per iteration:
  * ASSIGN is embarrassingly parallel: a vectorized Arrow pandas_udf
    computes argmin distances against the k×d centroid matrix captured
    in the closure (k×d doubles — trivially broadcastable at any
    scale). The corpus is scanned, never shuffled.
  * UPDATE reuses the fixed-point-micros trick from
    `embedding_centroids`: per-(cluster, dim) BIGINT sums are
    order-independent and engine/twin-exact, and after map-side
    partial aggregation only k·d rows cross the wire — the single
    tiny exchange per iteration.
Driver traffic per iteration is k·d longs; at 100 TB the plan is
identical, just wider scans.

Determinism: init picks the k vectors with the smallest
md5(vec_id) (TakeOrdered, reproducible); assignment uses numpy
float64 ops that the test twin replays bit-for-bit; centroid updates
are exact integer arithmetic, so every iteration is reproducible
across partitionings and runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MICROS = 1e6


def _assign_udf(cents: np.ndarray):
    """Arrow-batched argmin assignment against a captured k×d matrix.

    Expanded-form distances: argmin_c ||x−c||² = argmin_c (||c||² −
    2·x·c) — one (n×d)@(d×k) matmul per batch instead of an n×k×d
    broadcast cube (~d× less memory traffic). The numpy twin in
    tests/test_kmeans.py replays this exact expression, so assignments
    stay bit-reproducible."""
    cnorm2 = (cents ** 2).sum(axis=1)

    @F.pandas_udf("int")
    def assign(col: pd.Series) -> pd.Series:
        m = np.array(col.tolist(), dtype=np.float64)        # n × d
        d2 = cnorm2[None, :] - 2.0 * (m @ cents.T)          # n × k (+‖x‖²)
        return pd.Series(d2.argmin(axis=1))

    return assign


def init_centroids(emb: DataFrame, k: int) -> np.ndarray:
    """First k vectors in md5(vec_id) order — a reproducible uniform
    draw (TakeOrderedAndProject: k rows reach the driver)."""
    rows = (emb.select("embedding",
                       F.md5(F.col("vec_id").cast("string")).alias("h"),
                       "vec_id")
            .orderBy("h", "vec_id").limit(k).collect())
    return np.array([r.embedding for r in rows], dtype=np.float64)


def lloyd_assignments(emb: DataFrame, cents: np.ndarray) -> DataFrame:
    return emb.select(
        "vec_id", "embedding",
        _assign_udf(cents)("embedding").alias("cluster"))


def update_centroids(assigned: DataFrame, cents: np.ndarray) -> np.ndarray:
    """Exact M-step: fixed-point micros BIGINT sums per (cluster, dim);
    empty clusters keep their previous centroid."""
    micros = (F.round(F.col("v").cast("double") * _MICROS)
              .cast("bigint"))
    stats = (assigned
             .select("cluster", F.posexplode("embedding").alias("pos", "v"))
             .groupBy("cluster", "pos")
             .agg(F.sum(micros).alias("s"),
                  F.count(F.lit(1)).alias("n"))
             .collect())
    new = cents.copy()
    for r in stats:
        new[r.cluster, r.pos] = (r.s / _MICROS) / r.n
    return new


def kmeans(emb: DataFrame, k: int = 8, iters: int = 3) -> DataFrame:
    """Run ``iters`` Lloyd iterations; return (vec_id, cluster).

    The working set is persisted for the duration: every iteration
    (and the final assignment) re-reads the same (id, vector) rows, so
    caching replaces ``iters + 1`` source scans + decodes with one —
    the canonical Spark iterative-algorithm pattern. MEMORY_AND_DISK
    so a 100 TB corpus degrades to spill, not recompute."""
    from pyspark import StorageLevel

    emb = emb.select("vec_id", "embedding") \
             .persist(StorageLevel.MEMORY_AND_DISK)
    try:
        cents = init_centroids(emb, k)
        for _ in range(iters):
            cents = update_centroids(lloyd_assignments(emb, cents), cents)
        out = lloyd_assignments(emb, cents).select("vec_id", "cluster")
        from ._lineage import cut_lineage
        out = cut_lineage(out)  # materialize before unpersist
    finally:
        emb.unpersist()
    return out
