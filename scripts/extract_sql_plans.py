#!/usr/bin/env python
"""Extract executed (AQE-final) physical plans from a Spark event log.

The iterative graph/dedup operators checkpoint every round, so the
`.explain()` of an entry's RETURNED DataFrame shows only the tail past
the last lineage cut — the per-iteration join shape (the part the r12
optimizations changed) never appears in it. The event log, however,
records `physicalPlanDescription` for every SQL execution that actually
ran, including each loop iteration. This script filters those to the
executions matching a pattern and writes the first match to a file —
honest, machine-captured evidence of the loop-body plan shape.

Usage:
    python scripts/extract_sql_plans.py EVENTLOG PATTERN [PATTERN...] \
        --out plans/r12/<name>_loop_after.txt [--all-patterns] [--nth 0]

PATTERNs are plain substrings that must ALL occur in the plan text
(e.g. 'ShuffledHashJoin' 'auth_fp' 'isFinalPlan=true').
"""

from __future__ import annotations

import argparse
import json


def iter_plans(eventlog: str):
    with open(eventlog) as fh:
        for line in fh:
            if "physicalPlanDescription" not in line:
                continue
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            d = e.get("physicalPlanDescription", "")
            if d:
                yield e.get("executionId"), d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("eventlog")
    ap.add_argument("patterns", nargs="+")
    ap.add_argument("--out", required=True)
    ap.add_argument("--nth", type=int, default=0,
                    help="write the nth match (default first)")
    args = ap.parse_args()

    matches = [(i, d) for i, d in iter_plans(args.eventlog)
               if all(p in d for p in args.patterns)]
    if not matches:
        raise SystemExit(f"no plan matches {args.patterns} in "
                         f"{args.eventlog}")
    exec_id, plan = matches[args.nth]
    with open(args.out, "w") as fh:
        fh.write(f"# source event log: {args.eventlog}\n"
                 f"# SQL executionId: {exec_id}  "
                 f"(match {args.nth + 1}/{len(matches)} for "
                 f"{args.patterns})\n\n")
        fh.write(plan)
    print(f"wrote {args.out} (executionId {exec_id}, "
          f"{len(matches)} total matches)")


if __name__ == "__main__":
    main()
