#!/usr/bin/env python
"""Ingest-parallelism bisect (round 12): the ×10 full-corpus ramp
measured cold-load throughput ×0.59 at data ×10
(PLANS.md §Round-12), with the hypothesis that the FORMAT is the
bound — Spark cannot split a multiLine JSON document, so scan
parallelism is capped at the feed-file count and the largest
(year-ramped) feed is the straggler task. This script tests that
hypothesis directly: the SAME total corpus volume is landed at three
feed granularities and cold-loaded with the identical pipeline
(`run_ingest` — scan → explode → flatten → MERGE):

* ``ramped-25``  — 25 feeds, year-ramped sizes (the real corpus /
  stress_full_corpus shape; the largest feed holds ~8% of all CVEs),
* ``equal-25``   — 25 feeds, equal sizes (same file count, no
  straggler),
* ``equal-100``  — 100 feeds, equal sizes (4× the parallelism cap).

If the hypothesis is right: equal-25 beats ramped-25 (straggler
eliminated at the same file count) and equal-100 beats both (cap
lifted past the core count matters less at 32 cores / 100 files,
but packing improves). If it were the PLAN instead (per-row work,
shuffle, MERGE), the three walls would be ~equal — the downstream
stages see the same rows either way.

Prints ONE JSON dict; the committed table lives in PLANS.md
(§Round-12). Usage: python scripts/stress_ingest_parallelism.py
[total_cves]   (default 800_000)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import synth_cve_feed                           # noqa: E402
from nvd2mysqlloader_spark.ingest import run_ingest        # noqa: E402
from nvd2mysqlloader_spark.session import get_spark        # noqa: E402

DESC_PAD = 2048                 # same JSON-volume band as the stress


def ramped_counts(total: int, years: list[int]) -> dict[int, int]:
    w = {y: i + 1 for i, y in enumerate(years)}
    s = sum(w.values())
    return {y: max(200, total * wy // s) for y, wy in w.items()}


def equal_counts(total: int, years: list[int]) -> dict[int, int]:
    return {y: total // len(years) for y in years}


def main() -> None:
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    spark = get_spark("stress_ingest_parallelism")
    spark.range(1000).selectExpr("sum(id)").collect()       # warm JVM
    configs = [
        ("ramped-25", ramped_counts(total, list(range(2002, 2027)))),
        ("equal-25", equal_counts(total, list(range(2002, 2027)))),
        # 100 synthetic "years" — the feed file is keyed by year, so
        # distinct years = distinct feeds; CVE ids stay unique
        ("equal-100", equal_counts(total, list(range(1927, 2027)))),
    ]
    report: dict = {"metric": "ingest_parallelism_bisect",
                    "unit": "sec", "total_cves_requested": total,
                    "configs": {}}
    for name, counts in configs:
        tmp = tempfile.mkdtemp(prefix=f"ingest_par_{name}_")
        try:
            t0 = time.perf_counter()
            for y, n in counts.items():
                synth_cve_feed(f"{tmp}/landing", n, year=y,
                               desc_pad=DESC_PAD)
            gen = time.perf_counter() - t0
            landing = f"{tmp}/landing"
            json_gb = sum(
                os.path.getsize(os.path.join(landing, f))
                for f in os.listdir(landing)
                if f.endswith(".json")) / 1e9
            n_total = sum(counts.values())
            t0 = time.perf_counter()
            stats = run_ingest(spark, landing, f"{tmp}/wh")
            cold = time.perf_counter() - t0
            assert stats["tally_after"] == n_total, stats
            report["configs"][name] = {
                "feeds": len(counts), "cves": n_total,
                "json_gb": round(json_gb, 3),
                "largest_feed_cves": max(counts.values()),
                "gen_sec": round(gen, 1),
                "cold_ingest_sec": round(cold, 1),
                "cves_per_sec": round(n_total / cold),
            }
            print(f"# {name}: {cold:.1f}s "
                  f"({n_total / cold:.0f} CVEs/s)", file=sys.stderr)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
