"""Streaming ingest — the scheduled-refresh mode (EP2) as a
checkpointed file stream.

The reference polls `modified`/`recent` feeds and gates on the stored
high-water mark (nvd2mysqlloader.py:126-165, 508-531) — a hand-rolled
file-source checkpoint. Structured Streaming's file source subsumes it:
new feed files in the landing dir are discovered exactly once
(checkpoint), ``Trigger.AvailableNow`` drains what's there and stops —
the batch-on-schedule shape — and ``foreachBatch`` applies the same
last-writer-wins MERGE the batch path uses. ``update_history`` remains
as an explicit audit table (SURVEY §4.2 'incremental file discovery').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.flatten import flatten_cve
from ..operators.upsert import last_writer_wins, write_upsert_parquet
from ..schemas import CVE_FEED_SCHEMA
from ..sources.cve_feed import explode_items


def stream_ingest_available_now(spark: SparkSession, landing: str,
                                warehouse: str, checkpoint: str) -> None:
    """Drain all unseen feed files from ``landing`` into the silver
    warehouse, exactly once per file, then stop."""
    from pyspark.sql import types as T
    schema = T.StructType(list(CVE_FEED_SCHEMA.fields)) \
        .add("_corrupt_record", "string")
    feed = (spark.readStream
            .schema(schema)
            .option("multiLine", True)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .option("maxFilesPerTrigger", 8)
            .json(f"{landing}/*.json"))

    def upsert_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import functions as F
        # corrupt feeds must not vanish silently: the file-source
        # checkpoint marks every file consumed, so a malformed feed
        # dropped here would never be re-read even after a fix. Same
        # PERMISSIVE surfacing as the batch reader (sources/cve_feed) —
        # quarantined to an audit table instead of the reference's
        # silent `except: pass`.
        corrupt = batch_df.filter(F.col("_corrupt_record").isNotNull())
        if corrupt.limit(1).count() > 0:
            (corrupt.select(F.col("_corrupt_record").alias("raw_head"),
                            F.lit(epoch_id).alias("epoch_id"))
             .write.mode("append")
             .parquet(f"{warehouse}/quarantine"))
        batch_df = batch_df.filter(F.col("_corrupt_record").isNull()) \
                           .drop("_corrupt_record")
        silver = last_writer_wins(
            flatten_cve(explode_items(batch_df)),
            ["cve_id"], ["last_modified_datetime"]
        ).withColumn(       # same layout as the batch path (ingest.py):
            # try_cast because a missing publishedDate flattens to ''
            # and ANSI mode makes cast('' as int) an error — one
            # undated CVE must not kill the stream
            "published_year",
            F.coalesce(F.substring("published_datetime", 1, 4)
                       .try_cast("int"),
                       F.lit(0)))
        # conditional merge on last_modified: maxFilesPerTrigger can
        # split one drain into several ordered micro-batches, and a
        # later batch may carry an OLDER record of a key (re-downloaded
        # yearly file after modified/recent) — take-the-update would
        # let it overwrite the fresher row
        write_upsert_parquet(f"{warehouse}/nvd", silver, ["cve_id"],
                             partition_by=["published_year"],
                             order_col="last_modified_datetime")

    q = (feed.writeStream
         .foreachBatch(upsert_batch)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
