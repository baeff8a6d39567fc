"""Small-file compaction — table maintenance for the parquet warehouse.

The ingest pipeline (like any streaming/micro-batch writer) accretes
many small files per table over time; at 100 TB small files are a
first-order performance problem (footer/open overhead per file, tiny
row groups defeat the vectorized reader and min/max skipping, driver
memory for file listings). The reference has no notion of this — its
"storage" is MySQL — so this is engine-side operational surface, the
parquet analog of OPTIMIZE/rewrite_data_files.

Spark-first shape: one distributed read → ``repartition(n)`` sized so
output files land near ``target_bytes`` → atomic swap via a temp dir.
The rewrite is a single narrow+shuffle job regardless of input file
count; partitioned tables compact per partition directory so partition
pruning is untouched.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def list_data_files(path: str) -> list[tuple[str, int]]:
    """(file, bytes) for every parquet data file under ``path``."""
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith("_"):
                p = os.path.join(root, f)
                out.append((p, os.path.getsize(p)))
    return sorted(out)


def plan_compaction(path: str, target_bytes: int = 128 * 1024 * 1024,
                    small_ratio: float = 0.5) -> dict:
    """Decide whether ``path`` needs compaction.

    Returns {n_files, total_bytes, n_small, n_target}: a table wants
    compaction when more than half its files are under
    ``small_ratio * target_bytes`` and the rewrite would reduce the
    file count. Pure metadata — no data read.
    """
    files = list_data_files(path)
    total = sum(s for _, s in files)
    n_target = max(1, math.ceil(total / target_bytes))
    n_small = sum(1 for _, s in files if s < small_ratio * target_bytes)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "n_small": n_small,
        "n_target": n_target,
        "worth_it": len(files) > n_target and n_small > len(files) // 2,
    }


def compact_parquet(spark: SparkSession, path: str,
                    target_bytes: int = 128 * 1024 * 1024,
                    sort_by: list[str] | None = None) -> dict:
    """Rewrite ``path`` into ~``target_bytes`` files; atomic swap.

    ``sort_by``: optional columns to ``sortWithinPartitions`` during the
    rewrite — restores min/max-stat locality (the cheap cousin of the
    Z-order layout in ``plans.curation_queries.zorder_locality``) so
    range predicates skip row groups again after many unordered
    appends.

    Hive-partitioned tables (``col=val`` subdirectories) are compacted
    per partition directory, so the layout — and partition pruning —
    is preserved and each partition's rewrite is independent (at scale:
    trivially parallel and restartable per partition).
    """
    part_dirs = sorted(
        os.path.join(path, d) for d in os.listdir(path)
        if "=" in d and os.path.isdir(os.path.join(path, d)))
    if part_dirs:
        before = after = 0
        total = 0
        for sub in part_dirs:
            stats = compact_parquet(spark, sub, target_bytes, sort_by)
            before += stats["before_files"]
            after += stats["after_files"]
            total += stats["bytes"]
        return {"before_files": before, "after_files": after,
                "bytes": total, "partitions": len(part_dirs)}
    plan = plan_compaction(path, target_bytes)
    df = spark.read.parquet(path)
    if sort_by:
        df = df.repartition(plan["n_target"], *sort_by) \
               .sortWithinPartitions(*sort_by)
    else:
        df = df.repartition(plan["n_target"])
    tmp = path.rstrip("/") + "._compact_tmp"
    df.write.mode("overwrite").parquet(tmp)
    # local-FS swap; on an object store this is a manifest/metadata swap
    # (table formats make it a transaction — same two-phase shape)
    old = path.rstrip("/") + "._compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    after = plan_compaction(path, target_bytes)
    return {"before_files": plan["n_files"], "after_files": after["n_files"],
            "bytes": after["total_bytes"]}
