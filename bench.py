#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed as a full action (plan + execute + collect-count);
the Spark session is warmed up with a trivial job first so JVM startup
isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nvd2mysqlloader_spark.plans import QUERIES            # noqa: E402
from nvd2mysqlloader_spark.session import get_spark        # noqa: E402

HEADLINE = [
    "pricing_summary",
    "star_join_revenue",
    "top1_per_key",
    "upsert_last_writer_wins",
    "rank_window",
    "explode_filter_reagg",
    "date_range",
    "tally_count_distinct",
    "incremental_gate",
    "json_extract",
    "tumbling_window",
    "sessionization",
    "dedup_exact",
    "token_stats",
    "text_quality",
    "lang_id",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "rollup_revenue",
    "pivot_status_revenue",
    "asof_join_events",
    "percentile_disc",
    "anti_semi_customers",
    "minhash_near_dup",
    "simhash_near_dup",
    "ann_topk_lsh",
    "multimodal_inventory",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    # warm up: JVM + parquet footers + Python/Arrow workers out of the
    # timed path (several queries use pandas_udf / mapInPandas)
    spark.range(1000).selectExpr("sum(id)").collect()
    from nvd2mysqlloader_spark.functions.text import shingle3_udf
    spark.createDataFrame([("warm up the arrow workers",)], ["text"]) \
        .select(shingle3_udf()("text")).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = QUERIES[name]
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "headline_suite_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
