#!/usr/bin/env python
"""Per-entry profiler for the optimization rounds (guide §1).

Times named registry entries exactly like bench.py (1 untimed warmup
+ 3 timed repetitions, median; the same `.count()` action) but in
ISOLATION, labels the jobs (spark.sparkContext.setJobDescription),
and writes `.explain('formatted')` for each entry to
plans/r12/<name>_<tag>.txt so before/after plan shapes are a
committed artifact the judge can diff.

Usage:
    python scripts/profile_entry.py [--tag before] [--sf DIR]
        [--noop] [--reps 3] name [name ...]

`--noop` times `df.write.format('noop')` instead of `.count()`
(guide §1.4) as a second opinion — the committed bench methodology
stays `.count()` for round-over-round comparability.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nvd2mysqlloader_spark.plans import QUERIES            # noqa: E402
from nvd2mysqlloader_spark.session import get_spark        # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default=None,
                    help="write plans/<round>/<name>_<tag>.txt explains")
    ap.add_argument("--round", default="r13",
                    help="plans/<round>/ subdir for --tag output")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("profile_entry")
    spark.range(1000).selectExpr("sum(id)").collect()
    from nvd2mysqlloader_spark.functions.text import shingle3_udf
    spark.createDataFrame([("warm up the arrow workers",)], ["text"]) \
        .select(shingle3_udf()("text")).count()

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.round)
    if args.tag:
        os.makedirs(plans_dir, exist_ok=True)

    for name in args.names:
        q = QUERIES[name]
        times, n = [], 0
        for r in range(1 + args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.perf_counter()
            df = q.fn(spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            dt = time.perf_counter() - t0
            if r > 0:
                times.append(dt)
            spark.sparkContext.setJobDescription(None)
        med = statistics.median(times)
        print(f"{name}: median {med:.3f}s reps="
              f"{[round(t, 3) for t in times]} ({n} rows)", flush=True)
        from nvd2mysqlloader_spark.plans import _phases
        split = _phases.last().get(name)
        if split:
            print(f"  phases: {split}", flush=True)
        if args.tag:
            df = q.fn(spark, args.sf)
            out = os.path.join(plans_dir, f"{name}_{args.tag}.txt")
            with open(out, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
            print(f"  plan -> {out}", flush=True)
        import gc
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    spark.stop()


if __name__ == "__main__":
    main()
