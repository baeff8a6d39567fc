"""Keyed upsert — the reference's REPLACE-by-key loop, batched.

The reference probes + INSERTs/REPLACEs one row at a time with a commit
per row (~6 MySQL round-trips per CVE, nvd2mysqlloader.py:448-486).
Spark-first equivalent: dedup the incoming batch last-writer-wins, then
MERGE. Without Delta on the classpath, MERGE over parquet is emulated as
``target ANTI-JOIN updates  UNION  updates`` — one shuffle on the key,
one atomic directory overwrite, idempotent under task retries (key-based,
so re-execution cannot duplicate — SURVEY.md §7.4.5).

Scale notes (100 TB): both the anti-join and the window dedup hash-
partition by the key — co-partitioned, no extra shuffle between them.
With a huge target and a small update batch, AQE turns the anti-join
build side into a broadcast; with a partitioned target (year(published)),
dynamic partition pruning limits the rewrite to touched partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def last_writer_wins(df: DataFrame, keys: Sequence[str],
                     order_by: Sequence[Column | str]) -> DataFrame:
    """Keep exactly one row per key: the greatest under ``order_by``.

    This is the reference's REPLACE semantics (last writer wins,
    nvd2mysqlloader.py:449-464) expressed as a ranking window. Callers
    must make ``order_by`` a total order (include a unique tie-break)
    for deterministic output.
    """
    w = Window.partitionBy(*keys).orderBy(*[
        F.desc(c) if isinstance(c, str) else c for c in order_by])
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1)
              .drop("__rn"))


def merge_upsert(target: DataFrame, updates: DataFrame,
                 keys: Sequence[str]) -> DataFrame:
    """MERGE emulation: matched → take update row, not-matched → keep
    target row; updates themselves deduped upstream.

    Equivalent to ``MERGE INTO target USING updates ON keys WHEN MATCHED
    THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`` (SURVEY.md §2 #10).
    """
    keep = target.join(updates.select(*keys), on=list(keys), how="left_anti")
    return keep.unionByName(updates)


def write_upsert_parquet(target_path: str, updates: DataFrame,
                         keys: Sequence[str],
                         partition_by: Sequence[str] | None = None) -> None:
    """Apply ``merge_upsert`` against a parquet table on disk.

    One atomic overwrite per batch replaces the reference's per-row
    commits (nvd2mysqlloader.py:460-482). On a real deployment this is a
    Delta/Iceberg MERGE; the emulation keeps identical semantics.

    ``partition_by`` lays the table out for partition pruning (the
    silver warehouse partitions by published year — the replacement for
    the reference's ``dates`` index, nvd2mysqlloader.py:400) AND makes
    the merge **partition-selective**: the affected partition values
    are collected from the update batch (tiny distinct), only those
    partitions of the target are read (partition-pruned scan), and the
    write uses dynamic partition overwrite so untouched partitions are
    neither read nor rewritten. At 100 TB this is the difference
    between rewriting the table and rewriting this year's slice — the
    parquet-level equivalent of a Delta/Iceberg MERGE touching only
    matching files. Assumes the partition column derives from an
    immutable attribute of the key (published year of a CVE), so an
    updated key cannot migrate between partitions.
    """
    import os

    spark = updates.sparkSession
    if partition_by:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                       "dynamic")
        merged = None
        if os.path.exists(target_path):  # skip partition census on first load
            affected = [tuple(r) for r in
                        updates.select(*partition_by).distinct().collect()]
            pred = None
            for vals in affected:
                clause = F.lit(True)
                for c, v in zip(partition_by, vals):
                    clause = clause & (F.col(c) == F.lit(v))
                pred = clause if pred is None else (pred | clause)
            try:
                target = spark.read.parquet(target_path).filter(pred)
                merged = merge_upsert(target, updates, keys)
            except Exception:  # unreadable/empty target dir
                merged = None
        if merged is None:
            merged = updates
        # materialize before overwrite (read and write same path)
        merged.cache()
        merged.count()
        # cluster rows by the partition key before the partitioned
        # write: one file per partition instead of (shuffle-partitions
        # × partitions) tiny files — the small-file explosion is a real
        # cost locally and a catastrophic one on a 100 TB object store
        out = merged.repartition(*[F.col(c) for c in partition_by])
        out.write.mode("overwrite").partitionBy(*partition_by) \
            .parquet(target_path)
        merged.unpersist()
        return
    merged = updates
    if os.path.exists(target_path):  # avoid noisy first-load read probe
        try:
            target = spark.read.parquet(target_path)
            merged = merge_upsert(target, updates, keys)
        except Exception:  # unreadable/empty target dir
            merged = updates
    merged.cache()
    merged.count()
    merged.write.mode("overwrite").parquet(target_path)
    merged.unpersist()
