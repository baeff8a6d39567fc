"""Versioned parquet table directories with an atomic pointer swap.

The reference's storage is MySQL, where REPLACE gives it row-level
atomic visibility for free (nvd2mysqlloader.py:448-486). A parquet
warehouse has no such luxury: overwriting the directory a reader is
scanning exposes partial state, and the naive rename dance
(``mv table table.old && mv tmp table``) has a crash window where the
table does not exist at all.

This module gives every managed table the shape real table formats
(Delta/Iceberg) use, scaled down to a local filesystem:

* data lives in immutable version directories ``<table>.__v<N>``;
* ``<table>`` itself is a SYMLINK to the current version — the analog
  of the manifest/metadata pointer;
* publishing a new version is ``os.replace`` of a fresh symlink —
  atomic on POSIX, so every reader that lists the table sees exactly
  one complete version, never a mix and never a missing table;
* the PREVIOUS version directory is retained until the next publish,
  so a VERSION-PINNED reader (``read_version`` — file paths resolved
  into the version dir) finishes its scan across a publish; a reader
  that listed through the symlink must complete before the next
  publish (its recorded paths re-resolve). Older versions are pruned;
* unchanged partitions are carried across versions as hardlinks —
  O(metadata) per file, no data copied — the local analog of a new
  Iceberg snapshot reusing the manifests of untouched partitions.

Crash safety: a writer that dies before ``publish_version`` leaves the
current pointer untouched (readers never saw the partial version);
``cleanup_stale`` removes the orphaned newer-than-current directories
on the next write. Single concurrent writer per table is assumed
(same as the reference's single loader process).

On an object store the same protocol is a manifest write + pointer
CAS; the directory/symlink form is the local[–] stand-in with
identical visibility semantics.
"""

from __future__ import annotations

import os
import re
import shutil

_V_RE = re.compile(r"\.__v(\d+)$")
_V_SUFFIX = ".__v"


def versions(path: str) -> list[tuple[int, str]]:
    """Sorted (N, absolute dir) for every version dir of ``path``."""
    path = path.rstrip("/")
    parent, base = os.path.dirname(path) or ".", os.path.basename(path)
    out = []
    for name in os.listdir(parent) if os.path.isdir(parent) else []:
        if name.startswith(base + _V_SUFFIX):
            m = _V_RE.search(name)
            if m:
                out.append((int(m.group(1)), os.path.join(parent, name)))
    return sorted(out)


def current_version(path: str) -> str | None:
    """Absolute dir of the published version, or None if unpublished."""
    path = path.rstrip("/")
    if os.path.islink(path):
        return os.path.realpath(path)
    if os.path.isdir(path):
        return path                      # legacy plain directory
    return None


def ensure_versioned(path: str) -> None:
    """One-time migration of a legacy plain-directory table into the
    versioned layout (rename to ``.__v0`` + symlink). The rename→link
    gap is the only non-atomic window and exists once per table's
    lifetime; tables created through this module never pass through it.
    """
    path = path.rstrip("/")
    if os.path.islink(path) or not os.path.exists(path):
        return
    v0 = path + _V_SUFFIX + "0"
    os.rename(path, v0)
    os.symlink(os.path.basename(v0), path)


def cleanup_stale(path: str) -> None:
    """Remove crash debris: version dirs NEWER than the published one
    (a writer died before publishing them — no reader ever saw them)
    and any leftover swap symlink."""
    path = path.rstrip("/")
    parent = os.path.dirname(path) or "."
    base = os.path.basename(path)
    if os.path.isdir(parent):
        import time
        for name in os.listdir(parent):
            if not name.startswith(base + ".__swap"):
                continue
            full = os.path.join(parent, name)
            try:
                # age-gate the sweep: a swap link younger than a minute
                # may belong to a LIVE publisher mid-flip (unique names
                # make collisions impossible, but deleting one between
                # its symlink and os.replace would fail that publish);
                # genuine crash debris is old by the time anyone cleans
                if time.time() - os.lstat(full).st_mtime > 60:
                    os.remove(full)
            except FileNotFoundError:
                pass                     # the publisher just consumed it
    cur = current_version(path)
    if cur is None:
        vs = versions(path)
        if any(n == 0 for n, _ in vs):
            # an interrupted ensure_versioned migration: the legacy
            # table was renamed to .__v0 but the symlink never landed.
            # That directory holds COMMITTED data — repair the pointer
            # (completing the migration) instead of deleting it; any
            # higher-numbered dirs are then ordinary unpublished
            # debris handled below. Deleting on cur-is-None would
            # destroy the whole table in this crash window.
            v0 = next(d for n, d in vs if n == 0)
            os.symlink(os.path.basename(v0), path)
            cur = current_version(path)
        else:
            # never-published table: no reader ever saw these dirs
            for _, d in vs:
                shutil.rmtree(d, ignore_errors=True)
            return
    m = _V_RE.search(cur)
    cur_n = int(m.group(1)) if m else -1
    for n, d in versions(path):
        if n > cur_n:
            shutil.rmtree(d, ignore_errors=True)


def next_version_dir(path: str) -> str:
    """Path of the next (unpublished) version directory."""
    path = path.rstrip("/")
    vs = versions(path)
    n = vs[-1][0] + 1 if vs else 1
    return path + _V_SUFFIX + str(n)


def publish_version(path: str, vdir: str, keep: int = 2) -> None:
    """Atomically point ``path`` at ``vdir``; prune all but the newest
    ``keep`` versions (current + previous by default, so in-flight
    readers of the just-replaced version finish their scan).

    The staging symlink name is unique per publisher (pid + thread), so
    concurrent publishers cannot collide on it — each stages its own
    link and the ``os.replace`` flips are serialized by the filesystem:
    last writer wins, and a reader always resolves a complete version."""
    import threading

    path = path.rstrip("/")
    ensure_versioned(path)
    swap = f"{path}.__swap.{os.getpid()}.{threading.get_ident()}"
    if os.path.lexists(swap):
        os.remove(swap)
    os.symlink(os.path.basename(vdir), swap)
    os.replace(swap, path)               # atomic pointer flip
    vs = versions(path)
    for _n, d in vs[:-keep] if len(vs) > keep else []:
        shutil.rmtree(d, ignore_errors=True)


def read_version(spark, path: str, n: int | None = None):
    """Time-travel read: DataFrame over version ``n`` of the table
    (default: the published current). Retained versions only — by
    default current and previous (see ``publish_version``/``vacuum``);
    the Delta/Iceberg analog is VERSION AS OF over unexpired
    snapshots.

    The returned DataFrame is VERSION-PINNED: it reads the resolved
    version directory, not the symlink, so its recorded file paths
    stay valid across a concurrent publish (for as long as the version
    is retained). A plain ``spark.read.parquet(table)`` through the
    symlink is re-resolved at execution time and is only safe for
    reads that complete before the next publish — use this function
    for any handle held across writes."""
    path = path.rstrip("/")
    if n is None:
        cur = current_version(path)
        if cur is None:
            raise ValueError(f"no table at {path}")
        return spark.read.parquet(cur)
    found = dict(versions(path))
    if n not in found:
        raise ValueError(
            f"version {n} of {path} not retained; available: "
            f"{sorted(found)}")
    return spark.read.parquet(found[n])


def table_changes(spark, path: str, keys: list[str]):
    """Change feed between the previous retained version and the
    current one: (keys..., change ∈ insert|delete|update) — the
    versioned layout's analog of Delta's CDF, derived rather than
    stored. Rows are compared on the columns common to both versions
    (an evolve_schema rewrite adds/drops columns; value changes in
    shared columns still surface as updates). Plan shape: two
    anti-joins + one exceptAll/semi-join, all hash-partitioned on the
    key — three key-shuffles over exactly two table scans, no
    driver-side diffing.
    """
    from pyspark.sql import functions as F

    vs = versions(path.rstrip("/"))
    cur = read_version(spark, path)
    k = list(keys)
    if len(vs) < 2:
        return cur.select(*k).withColumn("change", F.lit("insert"))
    prev = spark.read.parquet(vs[-2][1])
    common = [c for c in cur.columns if c in set(prev.columns)]
    cur_c, prev_c = cur.select(*common), prev.select(*common)
    ins = (cur_c.join(prev_c.select(*k), k, "left_anti")
           .select(*k).withColumn("change", F.lit("insert")))
    dele = (prev_c.join(cur_c.select(*k), k, "left_anti")
            .select(*k).withColumn("change", F.lit("delete")))
    upd = (cur_c.exceptAll(prev_c)
           .join(prev_c.select(*k), k, "left_semi")
           .select(*k).distinct().withColumn("change", F.lit("update")))
    return ins.unionByName(dele).unionByName(upd)


def vacuum(path: str, keep: int = 1) -> list[int]:
    """Drop retained historical versions beyond the newest ``keep``
    (the published one is always kept). Returns the dropped version
    numbers. The explicit form of the retention `publish_version`
    applies automatically; run after in-flight readers of old
    versions are known to be done.

    Crash debris (unpublished versions NEWER than the pointer) is
    cleaned first — otherwise it would count toward ``keep`` and the
    newest-N window could swallow the published version itself."""
    path = path.rstrip("/")
    keep = max(1, keep)
    cleanup_stale(path)
    cur = current_version(path)
    vs = versions(path)
    drop = [(n, d) for n, d in (vs[:-keep] if len(vs) > keep else [])
            if d != cur]                  # never the published version
    for _n, d in drop:
        shutil.rmtree(d, ignore_errors=True)
    return [n for n, _d in drop]


def link_tree(src: str, dst: str) -> None:
    """Mirror ``src`` into ``dst`` with hardlinks (no data copied)."""
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(out, exist_ok=True)
        for f in files:
            os.link(os.path.join(root, f), os.path.join(out, f))


def leaf_partition_dirs(root: str) -> list[str]:
    """Relative paths of Hive-style leaf partition dirs under ``root``
    (every component ``col=val``, contains at least one data file)."""
    out = set()
    for r, _dirs, files in os.walk(root):
        rel = os.path.relpath(r, root)
        if rel == "." or not all("=" in c for c in rel.split(os.sep)):
            continue
        if any(not f.startswith("_") and not f.startswith(".") for f in files):
            out.add(rel)
    return sorted(out)


def history(spark, path: str):
    """Retained-version metadata as a DataFrame — the DESCRIBE HISTORY
    analog: (version, published, n_files, total_bytes, modified_at
    epoch seconds). Pure directory-metadata walk on the driver (a few
    retained versions × file stats), no data read."""
    import datetime

    path = path.rstrip("/")
    cur = current_version(path)
    cur = os.path.realpath(cur) if cur else None
    rows = []
    for n, d in versions(path):
        n_files = total = 0
        mtime = 0.0
        for root, _dirs, files in os.walk(d):
            for f in files:
                if f.startswith("_") or f.startswith("."):
                    continue
                st = os.stat(os.path.join(root, f))
                n_files += 1
                total += st.st_size
                mtime = max(mtime, st.st_mtime)
        rows.append((n, os.path.realpath(d) == cur, n_files, total,
                     datetime.datetime.fromtimestamp(
                         mtime, tz=datetime.timezone.utc)))
    return spark.createDataFrame(
        rows, "version INT, published BOOLEAN, n_files BIGINT, "
              "total_bytes BIGINT, modified_at TIMESTAMP")


def clone(path: str, dst: str) -> str:
    """Zero-copy snapshot clone: hardlink the CURRENT version of
    ``path`` into a new version-1 directory of ``dst`` and publish it.
    The clone shares data file inodes (immutable by construction —
    writers always produce NEW version dirs) but has its own version
    lineage: writes to either table never touch the other. The dev/
    test-sandbox primitive every table format grows (Delta SHALLOW
    CLONE); at 100 TB on an object store the analog is manifest copy.
    """
    src_v = current_version(path)
    if src_v is None:
        raise FileNotFoundError(f"no published version to clone: {path}")
    dst = dst.rstrip("/")
    if current_version(dst) is not None:
        raise FileExistsError(f"clone target already exists: {dst}")
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    vdir = dst + _V_SUFFIX + "1"
    # a clone interrupted between link_tree and publish leaves an
    # unpublished vdir; re-linking into it would FileExistsError, so a
    # retry clears the debris first (dst has no published pointer, so
    # no reader can be inside it)
    if os.path.exists(vdir):
        shutil.rmtree(vdir)
    link_tree(src_v, vdir)
    publish_version(dst, vdir)
    return vdir
