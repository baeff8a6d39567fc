"""JSONL training-export sink: deterministic shards, faithful
round-trip, manifest counts."""

from __future__ import annotations

import glob
import gzip
import hashlib
import json
import os

from pyspark.sql import functions as F

from nvd2mysqlloader_spark.sources.export import export_jsonl

from .conftest import SF_SMOKE


def _shard_hashes(path: str) -> dict[str, str]:
    """sha256 of each shard's DECOMPRESSED concatenated lines (gzip
    headers may embed metadata; content is the contract)."""
    out = {}
    for d in sorted(glob.glob(f"{path}/shard=*")):
        h = hashlib.sha256()
        for f in sorted(glob.glob(f"{d}/part-*")):
            opener = gzip.open if f.endswith(".gz") else open
            with opener(f, "rb") as fh:
                h.update(fh.read())
        out[os.path.basename(d)] = h.hexdigest()
    return out


def test_export_roundtrip_and_manifest(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet") \
        .select("doc_id", "text", "lang")
    path = str(tmp_path / "corpus")
    manifest = export_jsonl(docs, path, key="doc_id", shards=4)

    n = docs.count()
    assert manifest["total"] == n
    assert sum(manifest["shards"].values()) == n
    assert manifest["columns"] == ["doc_id", "text", "lang"]
    on_disk = json.load(open(f"{path}/_manifest.json"))
    assert on_disk == manifest

    back = spark.read.json(path)
    assert back.count() == n
    # full-fidelity round trip (shard is a derived partition column)
    a = {(r.doc_id, r.text, r.lang) for r in docs.collect()}
    b = {(r.doc_id, r.text, r.lang) for r in back.collect()}
    assert a == b
    # per-shard dir row counts match the manifest
    for s, cnt in manifest["shards"].items():
        got = back.filter(F.col("shard") == int(s)).count()
        assert got == cnt, (s, got, cnt)


def test_export_is_deterministic(spark, tmp_path):
    """Same input → byte-identical shard contents, regardless of the
    input's partitioning (shard membership is a key hash, order within
    a shard is a key sort)."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet") \
        .select("doc_id", "text")
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    export_jsonl(docs, p1, key="doc_id", shards=3)
    export_jsonl(docs.repartition(17), p2, key="doc_id", shards=3)
    h1, h2 = _shard_hashes(p1), _shard_hashes(p2)
    assert h1 == h2 and len(h1) == 3
