"""Ingest pipeline — the reference's ``main()`` path (EP1, SURVEY §3)
re-expressed as one batched Spark job per run.

Reference flow (nvd2mysqlloader.py:508-531): per feed, sequentially —
HTTP .meta → freshness gate → download zip → unzip → json.loads →
row-at-a-time INSERT/REPLACE with per-row commits. Here:

  landing dir (pre-downloaded feed JSON + .meta sidecars)
      │ parse_meta ─ anti-join vs update_history high-water-mark  (gate, #15/#16)
      │ read_feed(all fresh feeds at once) ─ explode ─ flatten    (#5,#6,#19-23)
      │ last_writer_wins dedup (modified/recent overlap years)    (#34)
      │ merge_upsert into silver parquet  +  bronze raw copy      (#10,#11)
      └ append update_history audit rows                          (#9)

One atomic write per table per run replaces ~6 MySQL round-trips per
CVE. The download/unzip edge (network) stays a thin driver-side helper
(``fetch.py``) exactly as the reference keeps it outside the data plane.

At scale: silver is partitioned by ``year(published)`` — the partition-
pruning replacement for the reference's ``dates`` index (:400); feeds
parallelize by file; the MERGE shuffles once on cve_id.

CLI:  python -m nvd2mysqlloader_spark.ingest --landing DIR --warehouse DIR
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.flatten import flatten_cve
from .operators.upsert import last_writer_wins, write_upsert_parquet
from .schemas import UPDATE_HISTORY_SCHEMA
from .sources.cve_feed import explode_items, read_feed
from .sources.meta_file import parse_meta


def fresh_feeds(spark: SparkSession, landing: str, warehouse: str) -> DataFrame:
    """Feeds whose remote .meta is newer than the stored high-water
    mark — the incremental gate (nvd2mysqlloader.py:67-99). Missing
    state ⇒ everything is fresh (the sentinel-date semantics, :89)."""
    import os
    meta = parse_meta(spark, f"{landing}/*.meta")
    if not os.path.exists(f"{warehouse}/update_history"):
        return meta                  # no history yet: load everything
    # deliberately NO blanket except here: a corrupt/unreadable
    # update_history must raise, not silently degrade to "reload
    # everything" — the idempotent upsert would make that safe but it
    # masks real state corruption the operator needs to see (same
    # genus as round 4's silent-except purge)
    hist = spark.read.parquet(f"{warehouse}/update_history")
    hwm = (hist.groupBy("download_name")
           .agg(F.max_by("lastModifiedDate", "downloadedDate")
                .alias("stored_lmd")))
    return (meta.join(hwm, "download_name", "left")
            .filter((F.col("stored_lmd").isNull())
                    | (F.col("lastModifiedDate") > F.col("stored_lmd")))
            .drop("stored_lmd"))


def run_ingest(spark: SparkSession, landing: str, warehouse: str,
               maintain: bool = False,
               include_children_cpes: bool = False) -> dict:
    """One incremental batch. Returns counts (the reference's tally
    delta report, nvd2mysqlloader.py:562-573).

    ``maintain=True`` runs the table-maintenance pass after the load:
    small-file compaction of both warehouse tables (each incremental
    batch adds a file per touched partition; compaction is a no-op
    until `plan_compaction` says the rewrite pays — the OPTIMIZE-after-
    ingest pattern every streaming/micro-batch warehouse needs).

    ``include_children_cpes=True`` opts into depth-2 CPE extraction
    (operators.flatten.cpe_uris): vulnerable CPEs nested under AND
    nodes' ``children[*].cpe_match``, which the reference silently
    drops (nvd2mysqlloader.py:180-185), land in
    ``vulnerable_software_list`` and therefore in the derived cve2cpe
    view and ``query_layer.cpe_search``. Default is reference parity.
    Flipping the flag on an EXISTING warehouse only affects newly
    ingested batches — reload (fresh warehouse or bumped .meta marks)
    to re-extract old feeds."""
    def tally(path: str) -> int:            # count(distinct cve_id), ref :494
        import os
        if not os.path.exists(path):        # avoid noisy first-load probes
            return 0
        try:
            return (spark.read.parquet(path)
                    .select(F.count_distinct("cve_id")).first()[0])
        except Exception:
            return 0

    silver_path = f"{warehouse}/nvd"
    bronze_path = f"{warehouse}/nvd_json"
    before = tally(silver_path)

    # every exit path (empty batch, write failure, success) drops the
    # cached blocks via the try/finally — a long-lived scheduler
    # session must not accumulate pinned storage across runs
    fresh = fresh_feeds(spark, landing, warehouse).cache()
    items = None
    try:
        names = [r.download_name
                 for r in fresh.select("download_name").collect()]
        if not names:
            return {"feeds": 0, "cves": 0, "tally_before": before,
                    "tally_after": before, "added": 0}

        paths = [f"{landing}/{n}.json" for n in names]
        # cache the exploded items: silver and bronze both consume
        # them, and multiLine JSON parsing is the most expensive stage.
        # Repartition BY CVE ID first: a multiLine feed is one
        # unsplittable file = one scan partition, so without this the
        # largest feed's entire downstream (flatten, to_json, both
        # dedup shuffles' map sides) runs in a single straggler task —
        # bisected in scripts/stress_ingest_parallelism.py (ramped-25
        # 58.2 s vs equal-25 10.0 s on identical bytes). Hashing on
        # cve_id (not round-robin) makes the one exchange do double
        # duty: it balances the skew AND already satisfies both
        # last_writer_wins windows' partitionBy(cve_id) distribution,
        # so Catalyst inserts no further exchange for the dedups.
        items = (explode_items(read_feed(spark, paths))
                 .repartition(spark.sparkContext.defaultParallelism,
                              F.col("cve.cve.CVE_data_meta.ID"))
                 .cache())
        return _ingest_batch(spark, warehouse, fresh, items, names,
                             silver_path, bronze_path, before, tally,
                             maintain, include_children_cpes)
    finally:
        fresh.unpersist()
        if items is not None:
            items.unpersist()


def _ingest_batch(spark, warehouse, fresh, items, names,
                  silver_path, bronze_path, before, tally, maintain,
                  include_children_cpes=False):
    # modified/recent feeds overlap yearly ones by design — dedup the
    # batch last-writer-wins on (lastModifiedDate, cve_id) before MERGE.
    # published_year partitions the silver table: Catalyst partition
    # pruning replaces the reference's `dates` index (:400)
    silver = last_writer_wins(
        flatten_cve(items, include_children_cpes=include_children_cpes),
        ["cve_id"], ["last_modified_datetime"]
    ).withColumn(
        "published_year",
        # try_cast, NOT cast: a missing publishedDate flattens to ''
        # and ANSI mode (Spark 4 default) makes cast('' as int) an
        # ERROR, not NULL — the coalesce fallback would be dead code
        # and one undated CVE would abort the whole batch
        F.coalesce(F.substring("published_datetime", 1, 4)
                   .try_cast("int"),
                   F.lit(0)))
    # bronze dedups independently on the raw record's own
    # lastModifiedDate — joining back to silver would recompute the
    # whole flatten pipeline a second time
    bronze_src = items.select(
        F.col("cve.cve.CVE_data_meta.ID").alias("cve_id"),
        F.to_json(F.col("cve")).alias("cve_item"),
        F.col("cve.lastModifiedDate").alias("__lmd"))
    # bronze partitions by the CVE id's own year ("CVE-2024-0001" →
    # 2024 — the NVD yearly-feed partitioning itself): derived from
    # the immutable key, so an updated record can never migrate
    # partitions, and a purge/delete against bronze rewrites only the
    # touched years instead of the whole raw-JSON table
    bronze = (last_writer_wins(bronze_src, ["cve_id"], ["__lmd"])
              .drop("__lmd")
              .withColumn("feed_year", _bronze_feed_year()))

    # batch row count observed on the write pass itself — no separate
    # count() action re-running the whole flatten (ref's cvecount loop,
    # :448-453, for free)
    from pyspark.sql import Observation
    obs = Observation("ingest_metrics")
    silver = silver.observe(obs, F.count(F.lit(1)).alias("n_cves"))
    write_upsert_parquet(silver_path, silver, ["cve_id"],
                         partition_by=["published_year"])
    n_cves = obs.get["n_cves"]
    _migrate_legacy_bronze(spark, bronze_path)
    write_upsert_parquet(bronze_path, bronze, ["cve_id"],
                         partition_by=["feed_year"])

    # audit append — one row per ingested feed (ref :441-447)
    audit = (fresh.withColumn("downloadedDate",
                              F.date_format(F.current_timestamp(),
                                            "yyyy-MM-dd'T'HH:mm:ss"))
             .select(*[f.name for f in UPDATE_HISTORY_SCHEMA.fields]))
    audit.write.mode("append").parquet(f"{warehouse}/update_history")

    stats = {"feeds": len(names), "cves": n_cves, "tally_before": before,
             "tally_after": tally(silver_path)}
    stats["added"] = stats["tally_after"] - before
    if maintain:
        from .operators.compaction import compact_parquet
        stats["compaction"] = {
            "nvd": compact_parquet(spark, silver_path),
            "nvd_json": compact_parquet(spark, bronze_path),
        }
    return stats


def _bronze_feed_year(col: str = "cve_id"):
    """feed_year derivation shared by ingest and migration: the CVE
    id's own year ("CVE-2024-0001" → 2024), 0 for malformed ids."""
    return F.coalesce(F.substring(col, 5, 4).try_cast("int"), F.lit(0))


def _migrate_legacy_bronze(spark: SparkSession, bronze_path: str) -> bool:
    """One-time in-place migration of a pre-``feed_year`` bronze table
    (written before bronze was partitioned): derive the partition
    column for every existing row from its cve_id and rewrite the
    table partitioned, via the same atomic-publish upsert (the whole
    re-derived table is the update batch, so the evolve-schema full
    rewrite replaces every row — no NULL-partition stragglers).
    Without this, the partition-selective merge/delete would crash on
    the missing column and brick an upgraded deployment. Returns True
    when a migration ran."""
    import os

    from pyspark.errors import AnalysisException

    from .operators import table_io

    if not os.path.exists(bronze_path):
        return False
    # read the PINNED current version dir, not the table symlink: the
    # rewrite below migrates a legacy plain dir (rename + symlink) and
    # publishes a new version while this plan executes, and version
    # dirs are immutable — so the lazy read stays valid for the whole
    # job with no driver-side materialization (a localCheckpoint here
    # would copy the entire bronze table once per migration)
    table_io.ensure_versioned(bronze_path)
    table_io.cleanup_stale(bronze_path)
    cur = table_io.current_version(bronze_path)
    if cur is None:
        return False
    try:
        existing = spark.read.parquet(cur)
    except AnalysisException:
        return False
    if "feed_year" in existing.columns:
        return False
    migrated = existing.withColumn("feed_year", _bronze_feed_year())
    write_upsert_parquet(bronze_path, migrated, ["cve_id"],
                         partition_by=["feed_year"], evolve_schema=True)
    return True


def purge_rejected(spark: SparkSession, warehouse: str) -> int:
    """Remove withdrawn CVEs from the warehouse — NVD marks them with
    a summary beginning ``** REJECT **``; the reference loads and keeps
    them forever (no delete path exists in its REPLACE-only loop,
    nvd2mysqlloader.py:448-486). One partition-pruned scan finds the
    rejected ids; ``write_delete_parquet`` removes them from silver
    (partition-selective on published_year) and bronze (partition-
    selective on feed_year — the CVE id's own year) with atomic
    snapshot publishes: a one-CVE purge rewrites one partition of
    each table, never the whole table.
    Returns the number of CVEs purged. Idempotent: a second run finds
    nothing and publishes nothing."""
    import os

    from .operators.upsert import write_delete_parquet

    from .operators._lineage import cut_lineage

    silver_path = f"{warehouse}/nvd"
    if not os.path.exists(silver_path):
        return 0
    # MATERIALIZE the id set before any delete: a lazy plan would
    # re-scan silver for the later pass and find nothing after the
    # first publish
    rejected = cut_lineage(
        spark.read.parquet(silver_path)
        .filter(F.col("summary").startswith("** REJECT **"))
        .select("cve_id"))
    if rejected.isEmpty():
        return 0
    # bronze FIRST, silver second: the id set is derived from silver,
    # so a crash between the two publishes must leave silver intact —
    # the retry rediscovers the ids and finishes bronze+silver. The
    # reverse order would strand the withdrawn CVEs' raw JSON in
    # bronze forever (silver purged → nothing to rediscover).
    # a legacy (pre-feed_year) bronze is migrated before the
    # partition-selective delete would touch the missing column
    _migrate_legacy_bronze(spark, f"{warehouse}/nvd_json")
    write_delete_parquet(f"{warehouse}/nvd_json", rejected, ["cve_id"],
                         partition_by=["feed_year"])
    return write_delete_parquet(silver_path, rejected, ["cve_id"],
                                partition_by=["published_year"])


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="NVD feed → parquet warehouse ingest")
    ap.add_argument("--landing", required=True, help="dir of feed .json + .meta files")
    ap.add_argument("--warehouse", required=True, help="output parquet warehouse dir")
    ap.add_argument("--maintain", action="store_true",
                    help="run small-file compaction after the load")
    ap.add_argument("--children-cpes", action="store_true",
                    help="extract depth-2 children CPEs the reference "
                         "drops (match-and-exceed; default is parity)")
    ap.add_argument("--purge-rejected", action="store_true",
                    help="after the load, delete withdrawn "
                         "('** REJECT **') CVEs from silver and bronze")
    args = ap.parse_args(argv)

    from .session import get_spark
    spark = get_spark("nvd_ingest")
    stats = run_ingest(spark, args.landing, args.warehouse,
                       maintain=args.maintain,
                       include_children_cpes=args.children_cpes)
    if args.purge_rejected:
        n_purged = purge_rejected(spark, args.warehouse)
        print(f"rejected CVEs purged: {n_purged}")
    print(f"feeds loaded: {stats['feeds']}  cves in batch: {stats['cves']}")
    print(f"tally before: {stats['tally_before']}  after: {stats['tally_after']}"
          f"  added: {stats['added']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
