#!/usr/bin/env python
"""×N stress point for the streaming drains (r8 supplement to
scripts/stress_decade.py): replicate events at constant event-time
range — replica k offsets event_id and user_id by k·1e8, timestamps
unchanged — so the watermark horizon is identical and ONLY the state
width (keys in flight) and row volume grow. Measures the four
heaviest streaming HEADLINE entries end-to-end (stage → drain →
sink) at base and ×N in one session, 3-rep medians.

The scaling claim under test: a drained topology's cost is linear in
rows, and its state is bounded by (watermark horizon × key arrival
rate) — ×10 keys at the same horizon means ×10 state, never more.
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
TARGETS = ["stream_tumbling_window", "stream_interval_join",
           "stream_left_outer_join", "stream_cms_heavy_hitters"]
_OFF = 100_000_000


def build_replica(spark, factor: int) -> str:
    out = tempfile.mkdtemp(prefix=f"stress_stream_x{factor}_")
    atexit.register(shutil.rmtree, out, ignore_errors=True)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    parts = [ev.withColumn("event_id", F.col("event_id") + F.lit(k * _OFF))
             .withColumn("user_id", F.col("user_id") + F.lit(k * _OFF))
             for k in range(factor)]
    rep = parts[0]
    for p in parts[1:]:
        rep = rep.unionAll(p)
    # the streaming stages treat events.parquet as a single FILE (the
    # testdata layout); emit one part and move it into place
    tmp = f"{out}/_events_build"
    rep.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp)
            if f.endswith(".parquet") and not f.startswith("_")][0]
    shutil.move(f"{tmp}/{part}", f"{out}/events.parquet")
    shutil.rmtree(tmp, ignore_errors=True)
    for t in TABLES:
        if t != "events":
            os.symlink(f"{SF_DIR}/{t}.parquet", f"{out}/{t}.parquet")
    return out


def timed(spark, name: str, sf_dir: str, reps: int = 3) -> float:
    q, times = QUERIES[name], []
    for r in range(1 + reps):
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        if r > 0:
            times.append(dt)
        import gc
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet()):
            jmap.get(rid).unpersist(False)
    return round(statistics.median(times), 3)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("stress_streaming")
    spark.range(1000).selectExpr("sum(id)").collect()
    rep = build_replica(spark, factor)
    base_rows = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    out = {"factor": factor, "events_rows": [base_rows,
                                             base_rows * factor]}
    for label, d in (("base", SF_DIR), (f"x{factor}", rep)):
        out[label] = {}
        for name in TARGETS:
            out[label][name] = timed(spark, name, d)
            print(f"# {label} {name}: {out[label][name]}s",
                  file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
