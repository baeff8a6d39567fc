"""Training-corpus export sink — sharded JSONL with a manifest.

The last stage of a curation pipeline hands the corpus to a training
job, which almost universally consumes newline-delimited JSON shards
with a manifest (row counts per shard for planning/verification).
The reference's only sink is MySQL; this is the engine-side export
surface, designed for the 100 TB case:

* **Deterministic sharding** — shard = xxhash64(key) mod shards, a
  pure column expression: membership is a function of the key alone,
  so re-running the export (or exporting from a re-partitioned copy
  of the table) produces identical shard contents. No RoundRobin, no
  dependence on input split order.
* **Deterministic order within a shard** — rows sort by key inside
  each shard file, so shard bytes are reproducible end-to-end and
  diffs between two exports are meaningful.
* **One distributed write** — repartition on the shard column +
  sortWithinPartitions + partitionBy(shard): each shard is one
  directory of line-JSON, written in parallel, no driver involvement.
* **Manifest** — per-shard row counts + total, counted from the
  WRITTEN shards (one cheap scan of the output, never a re-execution
  of the input lineage — which for a curation pipeline would mean
  re-running every upstream stage) and written as a single JSON file
  the trainer can verify against.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHARD_COL = "shard"


def export_jsonl(df: DataFrame, path: str, key: str,
                 shards: int = 8, compression: str | None = "gzip") -> dict:
    """Write ``df`` as ``shards`` deterministic JSONL shards under
    ``path`` (dirs ``shard=N/``), plus a ``_manifest.json``.

    Returns the manifest dict: {"shards": {shard: rows}, "total": n,
    "columns": [...]}. ``key`` must be a unique column — it defines
    both shard membership (hash) and within-shard order (sort).
    """
    spark = df.sparkSession
    sharded = df.withColumn(
        SHARD_COL, F.pmod(F.xxhash64(F.col(key)), F.lit(shards)))
    (sharded
     # range-partition on the shard id: with `shards` distinct integer
     # values this maps shards ~1:1 onto tasks, so every task writes
     # one shard's worth — plain repartition hashes the shard VALUE
     # and collides several shards into one task (stragglers) while
     # leaving others empty. Output bytes are unaffected either way
     # (partitionBy splits the dirs; the within-partition sort fixes
     # the row order).
     .repartitionByRange(shards, F.col(SHARD_COL))
     .sortWithinPartitions(SHARD_COL, key)
     .write.mode("overwrite")
     .partitionBy(SHARD_COL)
     .option("compression", compression or "none")
     .json(path))

    # count the WRITTEN shards with a text read (one pass, no schema
    # inference — read.json would scan the corpus twice); partition
    # discovery supplies the shard column from the dir names. Guarded
    # ONLY for the genuinely-empty export (no shard dirs) — any other
    # read failure must propagate, not degrade to an all-zero manifest.
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jvm_path.getFileSystem(
        spark._jsc.hadoopConfiguration())
    shard_dirs = [st.getPath().getName()
                  for st in fs.listStatus(jvm_path)
                  if st.isDirectory()
                  and st.getPath().getName().startswith(f"{SHARD_COL}=")]
    if shard_dirs:
        counts = {int(r[SHARD_COL]): r["n"] for r in
                  spark.read.text(path)
                  .groupBy(SHARD_COL).agg(F.count("*").alias("n"))
                  .collect()}
    else:
        counts = {}
    manifest = {
        "shards": {str(s): counts.get(s, 0) for s in range(shards)},
        "total": sum(counts.values()),
        "columns": df.columns,
        "key": key,
    }
    # write the manifest through the Hadoop FS layer, same as the data:
    # a local open() would fail (or silently write elsewhere) for
    # hdfs:// / s3a:// export paths after the expensive distributed
    # write already succeeded
    out = fs.create(
        spark._jvm.org.apache.hadoop.fs.Path(path, "_manifest.json"),
        True)
    try:
        out.write(bytearray(json.dumps(manifest, indent=1,
                                       sort_keys=True).encode("utf-8")))
    finally:
        out.close()
    return manifest
