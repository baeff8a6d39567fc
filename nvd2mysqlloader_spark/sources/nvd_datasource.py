"""NVD feed as a first-class Spark data source: ``spark.read
.format("nvdfeed").option("path", landing_dir)``.

The reference's ingest edge is a driver-side Python loop —
``json.loads`` the whole feed, iterate ``CVE_Items``, fetch the
``.meta`` sidecar separately (nvd2mysqlloader.py:524, 452, 46-64).
This module re-expresses that edge through Spark 4's Python DataSource
API so the feed participates in ordinary query planning:

* **Partitioning**: one input partition per feed FILE — the natural
  parallel unit (a feed is one multiLine JSON document; it cannot be
  split, but the corpus of yearly files fans out across executors).
* **Sidecar join for free**: each row carries the feed's ``.meta``
  fields (lastModifiedDate, sha256), read once per file in the same
  task — no separate join against a meta table.
* **Filter pushdown**: ``feed_name`` equality prunes FILES before any
  byte is parsed (the custom-source analog of partition pruning);
  every other predicate stays with Spark.
* **Corrupt tolerance**: an unparseable feed yields one row with
  ``corrupt = true`` and the raw head of the file, mirroring the
  PERMISSIVE ``_corrupt_record`` behavior of sources/cve_feed.py
  rather than the reference's silent ``except: pass``.

Rows deliberately carry the per-CVE payload as a raw JSON string
(``cve_json``) plus the extracted join keys: the typed deep schema
lives in schemas.CVE_FEED_SCHEMA, and downstream re-enters the typed
path with ``from_json(cve_json, CVE_ITEM_SCHEMA)`` — tests prove that
route row-equivalent to read_feed + explode_items. At 100 TB the
format registers once per session and the landing zone scans like any
other table.
"""

from __future__ import annotations

import json
import os
import warnings

from pyspark.sql.datasource import (DataSource, DataSourceReader, EqualTo,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)
from pyspark.sql import types as T

from .meta_file import parse_meta_text

SCHEMA = T.StructType([
    T.StructField("feed_name", T.StringType()),
    T.StructField("cve_id", T.StringType()),
    T.StructField("last_modified", T.StringType()),
    T.StructField("published", T.StringType()),
    T.StructField("cve_json", T.StringType()),
    T.StructField("meta_last_modified", T.StringType()),
    T.StructField("meta_sha256", T.StringType()),
    T.StructField("corrupt", T.BooleanType()),
])


class _FeedFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _read_meta(path: str) -> tuple[str | None, str | None]:
    """Best-effort sidecar read: ``(None, None)`` for a missing,
    vanished, unreadable, or non-UTF-8 ``.meta`` — sidecar problems
    must never affect feed-row emission (they would otherwise bubble
    into ``_feed_rows``' feed-level handlers and either crash the task
    with an UnboundLocalError or silently drop a valid feed's rows)."""
    meta_path = path[:-len(".json")] + ".meta"
    try:
        with open(meta_path, encoding="utf-8") as fh:
            meta = parse_meta_text(fh.read())
    except (OSError, UnicodeDecodeError):
        return None, None
    return meta.get("lastModifiedDate"), meta.get("sha256")


def _feed_rows(path: str):
    """Yield SCHEMA-shaped tuples for one feed file — shared by the
    batch reader's task and the streaming reader's replay.

    A file that vanished between listing and read yields NOTHING (the
    batch sees current state; for streaming recovery this means landing
    retention must cover the checkpoint-replay window — true of any
    file-backed source). A file whose JSON parses but is not the
    expected object shape yields one ``corrupt`` row, same as
    unparseable bytes — never a task failure."""
    feed_name = os.path.basename(path)[:-len(".json")]
    meta_lm, meta_sha = _read_meta(path)
    try:
        with open(path, encoding="utf-8") as fh:
            doc = json.load(fh)
        if not isinstance(doc, dict):
            raise json.JSONDecodeError("feed is not a JSON object", "", 0)
        items = doc.get("CVE_Items") or []
        if not isinstance(items, list):
            raise json.JSONDecodeError("CVE_Items is not an array", "", 0)
    except FileNotFoundError:
        return
    except (json.JSONDecodeError, UnicodeDecodeError):
        try:
            with open(path, "rb") as fh:
                head = fh.read(256).decode("utf-8", "replace")
        except OSError:
            return
        yield (feed_name, None, None, None, head, meta_lm, meta_sha, True)
        return
    for item in items:
        cve_id = last_mod = published = None
        if isinstance(item, dict):
            cve_id = (item.get("cve", {}).get("CVE_data_meta", {})
                      .get("ID"))
            last_mod = item.get("lastModifiedDate")
            published = item.get("publishedDate")
        yield (feed_name, cve_id, last_mod, published,
               json.dumps(item, separators=(",", ":"), sort_keys=True),
               meta_lm, meta_sha, False)


class NvdFeedReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("nvdfeed: option 'path' (landing dir) is required")
        self.landing = path
        self.feed_name_filters: set[str] | None = None

    def pushFilters(self, filters):
        for f in filters:
            # file-level pruning: feed_name equality selects files by
            # name without opening them. The filter is FULLY handled
            # here (each file yields rows of exactly one feed_name),
            # so it is not returned to Spark. The filter list is a
            # CONJUNCTION, so multiple feed_name equalities intersect —
            # contradictory values correctly select zero files.
            if isinstance(f, EqualTo) and f.attribute == ("feed_name",):
                mine = {f.value}
                self.feed_name_filters = (
                    mine if self.feed_name_filters is None
                    else self.feed_name_filters & mine)
            else:
                yield f

    def _files(self) -> list[str]:
        names = sorted(n for n in os.listdir(self.landing)
                       if n.endswith(".json"))
        if self.feed_name_filters is not None:
            names = [n for n in names
                     if n[:-len(".json")] in self.feed_name_filters]
        return names

    def partitions(self):
        return [_FeedFilePartition(os.path.join(self.landing, n))
                for n in self._files()]

    def read(self, partition: _FeedFilePartition):
        yield from _feed_rows(partition.path)


class NvdFeedStreamReader(SimpleDataSourceStreamReader):
    """The reference's polling loop (nvd2mysqlloader.py:508-531) as a
    Structured-Streaming source: each micro-batch picks up feeds whose
    ``.meta`` ``lastModifiedDate`` advanced past the stream's offset —
    the same ISO-8601 string-ordered high-water mark the reference
    keeps in ``update_history`` (SURVEY §2 #15), but checkpointed by
    the engine, so exactly-once emission under restart is Spark's
    guarantee rather than hand-rolled bookkeeping.

    Offset = ``{feed_name: meta_lastModifiedDate}``. A feed with no
    sidecar never fires (matching the reference: no .meta, no
    freshness signal). ``readBetweenOffsets`` deterministically
    replays a committed range from the files for recovery."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("nvdfeed: option 'path' (landing dir) is required")
        self.landing = path
        # opt-in: verify the sidecar's sha256 against the actual file
        # bytes during REPLAY — catches a feed replaced in-place
        # WITHOUT its sidecar (torn landing state the mark comparison
        # cannot see). Off by default because the sidecar sha covers
        # the uncompressed NVD feed, which only equals the landed
        # .json when the fetcher stores feeds uncompressed (ours does;
        # synthetic test fixtures carry non-matching shas).
        self.verify_sha = str(options.get("verifySha", "false")
                              ).lower() == "true"

    def _current(self) -> dict:
        marks = {}
        for n in sorted(os.listdir(self.landing)):
            if not n.endswith(".json"):
                continue
            lm, _ = _read_meta(os.path.join(self.landing, n))
            if lm is not None:
                marks[n[:-len(".json")]] = lm
        return marks

    def initialOffset(self) -> dict:
        # start empty: everything currently in the landing dir is "new"
        # (sentinel-date semantics, nvd2mysqlloader.py:89)
        return {}

    def _fresh(self, start: dict, end: dict) -> list[str]:
        return [f for f, lm in sorted(end.items())
                if f not in start or start[f] < lm]

    def read(self, start: dict):
        end = self._current()
        # the offset is a HIGH-WATER mark and must be monotone: take
        # the max per feed, so a regressed .meta (restored backup,
        # partial re-download) can neither emit nor lower the mark —
        # otherwise the later re-advance would replay rows a second
        # time into an append sink. Feeds that vanished from the
        # landing dir keep their mark for the same reason.
        merged = {**start}
        for f, lm in end.items():
            if f not in merged or merged[f] < lm:
                merged[f] = lm
        # a LIST iterator, not a generator: the runner both advances it
        # (next()) and pickles the prefetched batch for replay —
        # list_iterator supports both, generators pickle neither
        rows = [row for f in self._fresh(start, end)
                for row in _feed_rows(os.path.join(self.landing,
                                                   f + ".json"))]
        return iter(rows), merged

    def readBetweenOffsets(self, start: dict, end: dict):
        """Deterministic replay of a committed range for recovery.

        Replay re-reads the CURRENT file contents, so exactly-once
        recovery requires the landing zone's replay contract: a feed
        file at a given ``.meta`` ``lastModifiedDate`` is IMMUTABLE
        (the fetcher only ever replaces file+sidecar together, moving
        the mark forward — sources/fetch.py). Two documented departures
        when that contract is broken out-of-band:

        * **vanished file** — replays nothing for that feed (landing
          retention must cover the checkpoint-replay window);
        * **grown file** — a feed rewritten after the batch committed
          without its mark moving past ``end`` replays the NEWER
          contents, i.e. more/different rows than originally emitted.
          Detected here via the sidecar: if the current ``.meta`` mark
          no longer matches the committed ``end`` mark, the feed is
          flagged loudly (warning, not failure — the downstream keyed
          upsert is idempotent, so over-replay converges; a raise
          would brick recovery on a condition the source cannot mend);
        * **replaced in-place without its sidecar** (mark unchanged,
          content different) — invisible to the mark comparison; with
          ``verifySha=true`` the file's sha256 is checked against the
          sidecar's claim and a mismatching feed is WARNED about and
          DROPPED from the replay (its bytes are not what the
          committed batch read; the fetcher re-landing file+sidecar
          together mends it).
        """
        for f in self._fresh(start, end):
            path = os.path.join(self.landing, f + ".json")
            lm_now, sha_now = _read_meta(path)
            if lm_now is not None and lm_now != end.get(f):
                warnings.warn(
                    f"nvdfeed replay: feed '{f}' .meta mark is {lm_now!r} "
                    f"but the committed offset is {end.get(f)!r}; the "
                    "landing file changed after commit — replaying "
                    "current contents (exactly-once not reconstructible; "
                    "downstream keyed upsert makes this converge)")
            elif self.verify_sha and sha_now is not None:
                # mark UNCHANGED but content possibly replaced without
                # the sidecar (torn replacement): hash the file and
                # compare to the sidecar's claim. A mismatch means the
                # bytes on disk are NOT what the committed batch read —
                # replaying them would emit rows that never belonged to
                # this offset range, so the feed is DROPPED from the
                # replay (warn; the fetcher re-landing file+sidecar
                # together mends it and the mark-advance picks it up).
                import hashlib
                try:
                    with open(path, "rb") as fh:
                        # chunked: yearly feeds run to hundreds of MB
                        # uncompressed — never slurp the whole file
                        # just to hash it
                        h = hashlib.sha256()
                        for chunk in iter(lambda: fh.read(1 << 20), b""):
                            h.update(chunk)
                        digest = h.hexdigest()
                except OSError:
                    continue                  # vanished: replays nothing
                if digest.lower() != sha_now.lower():
                    warnings.warn(
                        f"nvdfeed replay: feed '{f}' content sha256 "
                        f"{digest[:12]}… does not match its sidecar's "
                        f"{sha_now[:12]}… while the committed mark is "
                        "unchanged — the file was replaced in-place "
                        "without its sidecar; dropping this feed from "
                        "the replay (its bytes are not the committed "
                        "batch)")
                    continue
            yield from _feed_rows(path)

    def commit(self, end: dict) -> None:
        pass  # no source-side bookkeeping: offsets live in the checkpoint


class NvdFeedDataSource(DataSource):
    """``spark.dataSource.register(NvdFeedDataSource)`` then
    ``spark.read.format("nvdfeed").option("path", dir).load()`` for
    batch, or ``spark.readStream`` with the same format for the
    polling incremental source."""

    @classmethod
    def name(cls) -> str:
        return "nvdfeed"

    def schema(self):
        return SCHEMA

    def reader(self, schema) -> NvdFeedReader:
        return NvdFeedReader(self.options)

    def simpleStreamReader(self, schema) -> NvdFeedStreamReader:
        return NvdFeedStreamReader(self.options)


def register(spark) -> None:
    """Idempotent format registration for the session. Also enables
    Python-source filter pushdown (off by default in Spark 4.1) so the
    feed_name file pruning actually reaches ``pushFilters``."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(NvdFeedDataSource)
