#!/usr/bin/env python
"""Deterministic sf1-scale probe dataset (VERDICT r12 ask #6).

The driver ships read-only test data up to sf0.1, where the r12
8-vs-32-core block showed the whole suite is scheduler-overhead-bound
(ratios 0.70-1.37 — local walls cannot evidence parallel scaling).
This generates a ~10x-sf0.1 dataset with the SAME schemas and
distribution SHAPES as the driver's generator (same vocab style for
documents, same key fan-outs for the TPC-H-ish tables, same
column types), purely for a one-off 8-vs-32-core scaling PROBE of the
heaviest entries — it is NOT driver data, is never used by bench.py
or the oracle gate, and lives under /tmp.

Usage: python scripts/gen_scaling_data.py [outdir] [scale_vs_sf01]
"""

from __future__ import annotations

import datetime
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ["vector", "column", "customer", "table", "scan", "spark",
         "value", "data", "join", "big", "batch", "part", "line",
         "order", "small", "sort", "fast", "query", "agg", "hash",
         "key", "group", "stream", "filter", "slow", "index", "merge",
         "shuffle", "cache", "read", "write"]
LANGS = (["en"] * 2 + ["zh", "fr", "es", "de"])
EPOCH = datetime.datetime(1970, 1, 1)


def _write(path, name, cols):
    t = pa.table(cols)
    pq.write_table(t, os.path.join(path, name + ".parquet"))
    print(name, t.num_rows)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfprobe1.0"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    n_docs = int(5000 * scale)
    n_li = int(600_000 * scale)
    n_ord = int(150_000 * scale)
    n_cust = int(15_000 * scale)
    n_part = int(20_000 * scale)
    n_supp = int(1_000 * scale)
    n_emb = int(2_000 * scale)
    n_ev = int(100_000 * scale)

    # documents: word streams, 10-100 words; ~5% exact dups and ~10%
    # shared-prefix pairs (mirrors the driver corpus's dup structure,
    # which the dedup/CC entries need to produce non-trivial graphs)
    lens = rng.integers(10, 101, n_docs)
    texts = []
    for i in range(n_docs):
        w = rng.integers(0, len(VOCAB), lens[i])
        texts.append(" ".join(VOCAB[j] for j in w))
    for i in rng.choice(n_docs, n_docs // 20, replace=False):
        texts[i] = texts[(i * 7 + 1) % n_docs]          # exact dup
    for i in rng.choice(n_docs, n_docs // 10, replace=False):
        donor = texts[(i * 13 + 3) % n_docs]
        texts[i] = donor[:64] + " " + texts[i][:40]     # prefix dup
    _write(out, "documents", {
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array([LANGS[i % len(LANGS)] for i in range(n_docs)]),
        "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
        "n_chars": pa.array(np.array([len(t) for t in texts]),
                            pa.int64())})

    def ts(year_lo, year_hi, n):
        base = datetime.datetime(year_lo, 1, 1)
        span = (datetime.datetime(year_hi, 12, 31) - base).days
        d = rng.integers(0, span + 1, n)
        return pa.array([base + datetime.timedelta(days=int(x))
                         for x in d], pa.timestamp("us"))

    _write(out, "orders", {
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["O", "F", "P"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": pa.array(
            np.round(rng.uniform(1000, 200000, n_ord), 2)),
        "o_orderdate": ts(1992, 1998, n_ord),
        "o_orderpriority": pa.array(
            np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT",
                      "5-LOW"])[rng.integers(0, 5, n_ord)])})

    _write(out, "lineitem", {
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, n_li)
                               .astype(np.float64)),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(900, 105000, n_li), 2)),
        "l_discount": pa.array(
            np.round(rng.integers(0, 11, n_li) / 100.0, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) / 100.0, 2)),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(
            np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": ts(1992, 1998, n_li)})

    _write(out, "customer", {
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_cust), 2)),
        "c_mktsegment": pa.array(
            np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY",
                      "HOUSEHOLD"])[rng.integers(0, 5, n_cust)])})

    _write(out, "part", {
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array([f"part {VOCAB[i % len(VOCAB)]} {i}"
                            for i in range(n_part)]),
        "p_brand": pa.array([f"Brand#{i % 25}" for i in range(n_part)]),
        "p_type": pa.array([f"TYPE{i % 30}" for i in range(n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": pa.array(
            np.round(rng.uniform(900, 2000, n_part), 2))})

    _write(out, "supplier", {
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": pa.array(
            np.round(rng.uniform(-999, 9999, n_supp), 2))})

    _write(out, "nation", {
        "n_nationkey": pa.array(np.arange(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array(np.arange(25) % 5, pa.int32())})
    _write(out, "region", {
        "r_regionkey": pa.array(np.arange(5), pa.int32()),
        "r_name": pa.array([f"REGION_{i}" for i in range(5)])})

    emb = rng.normal(0, 1, (n_emb, 64)).astype(np.float32)
    # plant some near-dup vectors so cosine entries have structure
    for i in rng.choice(n_emb, n_emb // 20, replace=False):
        j = (i * 11 + 5) % n_emb
        emb[i] = emb[j] + rng.normal(0, 0.01, 64).astype(np.float32)
    _write(out, "embeddings", {
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 8, n_emb), pa.int32())})

    base = datetime.datetime(2024, 1, 1)
    secs = np.sort(rng.uniform(0, 90 * 86400, n_ev))
    _write(out, "events", {
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array([base + datetime.timedelta(seconds=float(s))
                        for s in secs], pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, int(300 * scale), n_ev),
                            pa.int64()),
        "event_type": pa.array(
            np.array(["view", "click", "purchase", "error",
                      "login"])[rng.integers(0, 5, n_ev)]),
        "value": pa.array(np.round(rng.uniform(0, 100, n_ev), 2)),
        "props": pa.array([f'{{"k": {int(k)}}}'
                           for k in rng.integers(0, 100, n_ev)])})


if __name__ == "__main__":
    main()
