#!/usr/bin/env python
"""Per-job-description structure metrics from a Spark event log.

The optimization rounds' wall clocks are hostage to hypervisor
co-tenant bandwidth contention (bench.py's membw probe has read
0.1-4.0 GB/s across sessions), so A/B evidence for plan-shape changes
is taken from the event log instead: job/stage/task counts, executor
CPU time, and shuffle bytes per labelled repetition are EXACT and
window-independent.

Usage:
    python scripts/eventlog_stats.py EVENTLOG [--by-desc PREFIX]

Groups jobs by their `spark.job.description` property (set by
scripts/profile_entry.py as "<entry> rep<r>"); prints per-group
jobs / stages / tasks / executor-CPU-seconds / shuffle read+write MB.
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("eventlog")
    ap.add_argument("--by-desc", default=None,
                    help="only groups whose description starts with this")
    args = ap.parse_args()

    job_desc: dict[int, str] = {}
    stage_job: dict[int, int] = {}
    agg = defaultdict(lambda: {"jobs": set(), "stages": set(), "tasks": 0,
                               "cpu_ns": 0, "sh_read": 0, "sh_write": 0})

    with open(args.eventlog) as fh:
        for line in fh:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jid = e["Job ID"]
                props = e.get("Properties") or {}
                desc = props.get("spark.job.description") or "<none>"
                job_desc[jid] = desc
                for sid in e.get("Stage IDs", []):
                    stage_job[sid] = jid
                agg[desc]["jobs"].add(jid)
            elif ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                desc = job_desc.get(stage_job.get(sid, -1), "<none>")
                a = agg[desc]
                a["stages"].add(sid)
                a["tasks"] += 1
                m = e.get("Task Metrics") or {}
                a["cpu_ns"] += m.get("Executor CPU Time", 0)
                srm = m.get("Shuffle Read Metrics") or {}
                a["sh_read"] += (srm.get("Remote Bytes Read", 0)
                                 + srm.get("Local Bytes Read", 0))
                swm = m.get("Shuffle Write Metrics") or {}
                a["sh_write"] += swm.get("Shuffle Bytes Written", 0)

    for desc in sorted(agg):
        if args.by_desc and not desc.startswith(args.by_desc):
            continue
        a = agg[desc]
        print(f"{desc}: jobs={len(a['jobs'])} stages={len(a['stages'])} "
              f"tasks={a['tasks']} cpu={a['cpu_ns'] / 1e9:.1f}s "
              f"shread={a['sh_read'] / 1e6:.1f}MB "
              f"shwrite={a['sh_write'] / 1e6:.1f}MB")


if __name__ == "__main__":
    main()
