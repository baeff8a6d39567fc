#!/usr/bin/env python
"""Targeted DuckDB-oracle re-verification for named registry entries —
the per-change gate of the optimization rounds: every touched entry is
re-compared with the driver's own harness (tests/oracle_harness.compare
at sf0.01) before its change is committed.

Usage: python scripts/oracle_check.py name [name ...]
       SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.01
Rows-only entries (no oracle) run twice and must be hash-stable.
Exit 1 on any mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nvd2mysqlloader_spark.plans import QUERIES            # noqa: E402
from nvd2mysqlloader_spark.plans.registry import oracle_map  # noqa: E402
from nvd2mysqlloader_spark.session import get_spark        # noqa: E402
from tests.oracle_harness import _hash_lines, _lines, compare  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    spark = get_spark("oracle_check")
    oracles = oracle_map()
    bad = []
    for name in names:
        q = QUERIES[name]
        sql = oracles.get(name)
        if sql is None:
            def _h():
                df = q.fn(spark, sf)
                return _hash_lines(_lines(
                    df.columns, [tuple(r) for r in df.collect()]))
            h1, h2 = _h(), _h()
            ok = h1 == h2
            print(f"{name}: rows-only hash_stable={ok} ({h1[:12]})",
                  flush=True)
        else:
            ok, msg = compare(spark, sf, q.fn, sql)
            print(f"{name}: {'OK' if ok else 'MISMATCH ' + msg}",
                  flush=True)
        if not ok:
            bad.append(name)
    spark.stop()
    if bad:
        print(f"FAILED: {bad}")
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
