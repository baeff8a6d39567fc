#!/usr/bin/env python
"""Heavy-hitter (skew) evidence for the graph family (VERDICT r10 ask
#4): the dedup path has planted-skew proofs; this gives pagerank/HITS
the same treatment on a Zipf-out-degree planted link graph.

The skew surface: both iterative scores join the |E| edge relation to
the |V| rank/score relation ON THE SOURCE KEY every iteration
(operators/graph.py pagerank:330, hits:410-414). A Zipf link graph —
the realistic shape: web hosts, citation graphs, co-purchase — puts a
constant fraction of ALL edges on a handful of hub sources, so the
hub's hash partition is a straggler: one task carries top-share·|E|
rows while the median task carries |E|/P.

Three remedies measured on the SAME per-iteration core (one contrib
join + dst-sum — the loop body both algorithms repeat):

* ``pinned``  — the shipped shape: edges persisted PRE-PARTITIONED on
  src + shuffle_hash hint. The |E| side never re-exchanges (the
  design win), but a cached partitioning is invisible to AQE — a
  ReusedExchange/InMemoryRelation has no live ShuffleQueryStage to
  re-split, so the hub partition CANNOT be skew-split. Stragglers are
  bounded by top-share·|E| per iteration.
* ``aqe``     — the plain shuffle join (both sides live exchanges)
  with spark.sql.adaptive.skewJoin: AQE splits the hub partition into
  advisory-sized chunks and duplicates the matching rank rows. The
  executed plan is pinned to contain a skew-split AQEShuffleRead.
  Costs re-exchanging |E| every iteration — exactly what the pinned
  shape exists to avoid. MEASURED RESTRICTION (pinned negatively in
  the bisect below and positively in tests/test_graph.py):
  OptimizeSkewedJoin pattern-matches SMJ(Sort(ShuffleStage),
  Sort(ShuffleStage)) — an aggregate or WINDOW between the shuffle
  and the join defeats it silently. The loop's natural expression
  (wsum = COUNT over Window(src), ranks derived per iteration)
  therefore NEVER gets skew-split; to use the AQE remedy at all, the
  degree-annotated edge relation must first be MATERIALIZED to a
  leaf (checkpoint/parquet) so each iteration's join re-shuffles it
  fresh.
* ``salted``  — explicit salting on the PRE-PARTITIONED shape: edges
  keyed (src, salt=xxhash64(dst) % S), ranks exploded ×S; the hub's
  rows spread over S partitions while the |E| side stays cached. The
  dst-sum is skew-immune either way (partial aggregation collapses
  heavy dst keys map-side before the shuffle).

The verdict this script demonstrates (table committed in PLANS.md):
SALTING is the remedy that fits the shipped shape — it composes with
the cached pre-partitioning, keeps the O(|E|)-once exchange, and
bounds the straggler at top-share·|E|/S — while AQE requires BOTH
giving up the cache win (|E| re-exchange per iteration) AND
restructuring the loop so the annotated edges are a materialized
leaf, or its skew rule never fires. At fixture scale the join is too small
for production skew thresholds, so the ``aqe`` leg force-lowers
skewedPartitionThresholdInBytes/advisoryPartitionSizeInBytes to
demonstrate the MECHANISM (at 100 TB the default 256 MB thresholds
trigger naturally); walls are medians of 3, and the plan pin — the
part that cannot be faked by timing noise — lives in
tests/test_graph.py::test_aqe_skew_join_splits_hub_partition too.

Usage: python scripts/stress_graph_skew.py [n_edges]  (default 2e6)
Prints ONE JSON dict.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import Window                             # noqa: E402
from pyspark.sql import functions as F                     # noqa: E402

from nvd2mysqlloader_spark.operators.graph import (        # noqa: E402
    hits, pagerank)
from nvd2mysqlloader_spark.session import get_spark        # noqa: E402

REPEATS = 3
SALT = 16


def zipf_graph(spark, n_edges: int):
    """Deterministic Zipf-out-degree directed graph: src rank drawn
    via the inverse CDF of Zipf(s=1) (r = N^u — the harmonic CDF is
    ~ln r/ln N), dst uniform. No Python randomness: hashes of the
    edge index seed both draws."""
    n_nodes = max(1000, n_edges // 50)
    u = (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000))
         / F.lit(1_000_000.0))
    src = F.least(F.pow(F.lit(float(n_nodes)), u).cast("long"),
                  F.lit(n_nodes - 1))
    dst = F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n_nodes))
    return (spark.range(n_edges)
            .select(src.alias("src"), dst.alias("dst")), n_nodes)


def timed(fn) -> tuple[float, object]:
    times, out = [], None
    for r in range(1 + REPEATS):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        if r > 0:
            times.append(dt)
    return round(statistics.median(times), 3), out


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("stress_graph_skew")
    spark.range(1000).selectExpr("sum(id)").collect()
    sc = spark.sparkContext
    report: dict = {"metric": "graph_skew", "unit": "sec",
                    "n_edges": n_edges}

    edges, n_nodes = zipf_graph(spark, n_edges)
    edges = edges.persist()
    deg = (edges.groupBy("src").count()
           .orderBy(F.desc("count")).limit(5).collect())
    top_share = deg[0]["count"] / n_edges
    report.update(n_nodes=n_nodes,
                  top1_out_degree=deg[0]["count"],
                  top1_share=round(top_share, 4),
                  top5_out_degrees=[r["count"] for r in deg])

    ranks = (edges.select(F.col("src").alias("node"))
             .union(edges.select("dst")).distinct()
             .withColumn("rank_fp", F.lit(10_000).cast("long"))
             .persist())
    ranks.count()

    def core_sum(joined):
        return (joined
                .select(F.col("dst").alias("node"),
                        F.expr("rank_fp div wsum").alias("c"))
                .groupBy("node").agg(F.sum("c").alias("inc"))
                .agg(F.count(F.lit(1)), F.sum("inc")).collect())

    # --- pinned: the shipped per-iteration shape --------------------
    edeg = (edges.withColumn(
        "wsum", F.count(F.lit(1)).over(Window.partitionBy("src")))
        .persist())
    edeg.count()
    w_pinned, _ = timed(lambda: core_sum(
        edeg.hint("shuffle_hash")
        .join(ranks, edeg["src"] == ranks["node"])))
    report["pinned_join_sec"] = w_pinned

    # --- aqe: live shuffles + forced skew thresholds ----------------
    conf = spark.conf
    saved = {k: conf.get(k, None) for k in (
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold")}

    # the AQE legs need the annotated edges as a MATERIALIZED LEAF
    # with UNKNOWN partitioning: (a) with the COUNT-over-Window(src)
    # inline, OptimizeSkewedJoin's SMJ(Sort(ShuffleStage),
    # Sort(ShuffleStage)) pattern never matches (bisected: inline
    # window or a derived ranks side -> nosplit); (b) a
    # checkpoint/cache leaf PRESERVES the window's src-partitioning,
    # so the join plans with no live exchange on the skewed side and
    # there is nothing for AQE to re-split. Parquet is the
    # production materialize: the scan's partitioning is unknown, so
    # each iteration's join re-exchanges |E| — the price of the AQE
    # remedy this script exists to measure.
    import atexit
    import shutil
    import tempfile
    mat = tempfile.mkdtemp(prefix="skew_mat_")
    atexit.register(shutil.rmtree, mat, ignore_errors=True)
    (edges.withColumn(
        "wsum", F.count(F.lit(1)).over(Window.partitionBy("src")))
     .write.mode("overwrite").parquet(mat + "/edeg"))
    ranks.write.mode("overwrite").parquet(mat + "/ranks")
    eleaf = spark.read.parquet(mat + "/edeg")
    rleaf = spark.read.parquet(mat + "/ranks")

    def aqe_join(skew_on: bool):
        conf.set("spark.sql.adaptive.skewJoin.enabled",
                 "true" if skew_on else "false")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                 "2")
        conf.set("spark.sql.adaptive.skewJoin."
                 "skewedPartitionThresholdInBytes", "1m")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                 "1m")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = eleaf.join(rleaf.hint("merge"),
                            eleaf["src"] == rleaf["node"])
        out = (joined.select(F.col("dst").alias("node"),
                             F.expr("rank_fp div wsum").alias("c"))
               .groupBy("node").agg(F.sum("c").alias("inc")))
        out.collect()
        return out._jdf.queryExecution().executedPlan().toString()

    w_aqe_off, _ = timed(lambda: aqe_join(False))
    w_aqe_on, plan = timed(lambda: aqe_join(True))
    skew_split = "skew" in plan.lower()
    for k, v in saved.items():
        if v is None:
            conf.unset(k)
        else:
            conf.set(k, v)
    report["aqe_off_join_sec"] = w_aqe_off
    report["aqe_on_join_sec"] = w_aqe_on
    report["aqe_plan_skew_split"] = skew_split

    # --- salted: cached pre-partitioning + salt ---------------------
    esalt = (edges.withColumn(
        "wsum", F.count(F.lit(1)).over(Window.partitionBy("src")))
        .withColumn("salt",
                    F.pmod(F.xxhash64("dst"), F.lit(SALT)).cast("int"))
        .persist())
    esalt.count()
    ranks_x = ranks.crossJoin(
        spark.range(SALT).select(F.col("id").cast("int")
                                 .alias("salt")))
    w_salted, _ = timed(lambda: core_sum(
        esalt.hint("shuffle_hash")
        .join(ranks_x, (esalt["src"] == ranks_x["node"])
              & (esalt["salt"] == ranks_x["salt"]))))
    report["salted_join_sec"] = w_salted

    # --- full algorithms on the skewed graph, as shipped ------------
    w_pr, _ = timed(lambda: pagerank(None, edges, iters=4).count())
    report["pagerank_iters4_sec"] = w_pr
    w_hits, _ = timed(lambda: hits(edges, iters=4).count())
    report["hits_iters4_sec"] = w_hits

    edges.unpersist()
    ranks.unpersist()
    edeg.unpersist()
    esalt.unpersist()
    spark.stop()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
