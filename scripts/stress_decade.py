#!/usr/bin/env python
"""Stress decade for the r7 operator families (VERDICT r7 ask #3):
measure prefix_filter_jaccard_join, containment_dup_pairs,
copurchase_triangles, copurchase_kcore and textrank_keywords one
decade beyond the fixtures, with the named scaling-axis counts
(candidate pairs / wedges / edges) beside wall time.

Replication preserves DUP DENSITY (the axis the r7 verdict names:
candidate-pair growth is linear in corpus at constant dup density):

* documents ×F: replica k offsets doc_id by k·1e7 and prefixes every
  token with ``r{k}x`` — replicas share NO shingles/words across
  universes, so each replica carries its own copy of the original
  pair structure (a same-text replica would instead create ~F²/2
  TRUE near-dup pairs per document — the construction artifact the
  r6 decade documented for cosine_near_dup).
* lineitem ×F: replica k offsets l_orderkey AND l_partkey by k·1e7 —
  F disjoint copies of the co-purchase graph (offsetting only the
  order key would stack edge weights across replicas and move the
  w >= 2 threshold, changing the graph rather than scaling it).

Usage: python scripts/stress_decade.py [factor] (default 10; data is
built under a /tmp dir, removed on exit). Runs each query 1 warmup +
3 timed reps (median) at the fixture SF and at ×factor in ONE
session, so the ratio is same-conditions.
"""

from __future__ import annotations

import atexit
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F                     # noqa: E402

from nvd2mysqlloader_spark.plans import QUERIES            # noqa: E402
from nvd2mysqlloader_spark.session import get_spark        # noqa: E402
from nvd2mysqlloader_spark.sources.tpch import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
TARGETS = ["prefix_filter_jaccard_join", "containment_dup_pairs",
           "copurchase_triangles", "copurchase_kcore",
           "textrank_keywords"]
_OFF = 10_000_000


def build_replica(spark, factor: int) -> str:
    out = tempfile.mkdtemp(prefix=f"stress_x{factor}_")
    atexit.register(shutil.rmtree, out, ignore_errors=True)

    docs = load_table(spark, SF_DIR, "documents")
    parts = []
    for k in range(factor):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * _OFF))
        if k > 0:
            # split on \s+ and drop empties, mirroring functions.text
            # tokens()/shingle3: a literal single-space split would
            # leave tab/newline-separated words unprefixed and turn
            # multi-space runs into bare 'r{k}x' tokens, letting
            # replica universes share shingles with the base corpus
            # and corrupt the constant-dup-density construction
            pre = F.lit(f"r{k}x")
            d = d.withColumn(
                "text",
                F.concat_ws(" ", F.transform(
                    F.filter(F.split(F.col("text"), r"\s+"),
                             lambda t: t != ""),
                    lambda t: F.concat(pre, t))))
        parts.append(d)
    rep = parts[0]
    for p in parts[1:]:
        rep = rep.unionAll(p)
    rep.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    li = load_table(spark, SF_DIR, "lineitem")
    lparts = [li.withColumn("l_orderkey",
                            F.col("l_orderkey") + F.lit(k * _OFF))
              .withColumn("l_partkey",
                          F.col("l_partkey") + F.lit(k * _OFF))
              for k in range(factor)]
    lrep = lparts[0]
    for p in lparts[1:]:
        lrep = lrep.unionAll(p)
    lrep.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    for t in TABLES:
        if t in ("documents", "lineitem"):
            continue
        os.symlink(f"{SF_DIR}/{t}.parquet", f"{out}/{t}.parquet")
    return out


def axis_counts(spark, sf_dir: str) -> dict:
    """The named scaling-axis sizes for each target family."""
    from nvd2mysqlloader_spark.plans.mining_queries import \
        _copurchase_edges
    from nvd2mysqlloader_spark.plans.setsim_queries import (
        containment_candidates, prefix_filter_candidates)

    docs = load_table(spark, sf_dir, "documents")
    _, jac_cand = prefix_filter_candidates(docs)
    _, con_cand = containment_candidates(docs)
    edges = _copurchase_edges(spark, sf_dir)
    # wedge count = sum over nodes of C(outdeg, 2) under the
    # degree-ordering orientation — the triangle join's fan-out axis
    e = edges.select(F.col("x"), F.col("y"))
    deg = (e.select(F.col("x").alias("n"))
           .unionAll(e.select(F.col("y").alias("n")))
           .groupBy("n").agg(F.count(F.lit(1)).alias("d")))
    dx = deg.select(F.col("n").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("n").alias("y"), F.col("d").alias("dy"))
    ex = e.join(dx, "x").join(dy, "y")
    lower_first = ((F.col("dx") < F.col("dy"))
                   | ((F.col("dx") == F.col("dy"))
                      & (F.col("x") < F.col("y"))))
    od = (ex.select(F.when(lower_first, F.col("x"))
                    .otherwise(F.col("y")).alias("u"))
          .groupBy("u").agg(F.count(F.lit(1)).alias("od")))
    wedges = od.agg(F.sum(F.expr("od * (od - 1) div 2"))
                    .alias("w")).first()["w"] or 0
    # textrank axis: distinct co-occurrence edges (window 2, directed
    # both ways after symmetrization — count the undirected base)
    from nvd2mysqlloader_spark.functions.text import tokens
    from nvd2mysqlloader_spark.plans.mining_queries import \
        _TEXTRANK_WINDOW
    tok = (docs.select("doc_id", tokens("text").alias("t"))
           .select("doc_id", F.posexplode("t").alias("pos0", "w")))
    a, b = tok.alias("a"), tok.alias("b")
    cooc = (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                   & (F.col("b.pos0") - F.col("a.pos0"))
                   .between(1, _TEXTRANK_WINDOW)
                   & (F.col("a.w") != F.col("b.w")))
            .select(F.col("a.w").alias("src"), F.col("b.w").alias("dst"))
            .distinct())
    return {
        "jaccard_candidates": jac_cand.count(),
        "containment_candidates": con_cand.count(),
        "copurchase_edges": e.count(),
        "triangle_wedges": int(wedges),
        "textrank_cooc_edges": cooc.count(),
    }


def timed(spark, name: str, sf_dir: str, reps: int = 3) -> float:
    q = QUERIES[name]
    times = []
    for r in range(1 + reps):
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        if r > 0:
            times.append(dt)
        import gc
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    return round(statistics.median(times), 3)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("stress_decade")
    spark.range(1000).selectExpr("sum(id)").collect()

    rep_dir = build_replica(spark, factor)
    out: dict = {"factor": factor, "sf_dir": SF_DIR}
    for label, d in (("base", SF_DIR), (f"x{factor}", rep_dir)):
        out[label] = {"axis": axis_counts(spark, d), "sec": {}}
        for name in TARGETS:
            out[label]["sec"][name] = timed(spark, name, d)
            print(f"# {label} {name}: {out[label]['sec'][name]}s",
                  file=sys.stderr)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
