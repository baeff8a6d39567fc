"""Query registry — the engine's public query surface.

Each entry pairs a PySpark plan (``fn(spark, sf_dir) -> DataFrame``)
with the ANSI-SQL oracle DuckDB runs over the same parquet tables.
Entries with ``oracle=None`` are genuinely non-SQL-expressible
(approximate sketches, ML-pipeline ops) and get a rows-only check.

Determinism rules every query follows so value-hashes match the oracle:
  * money/quantity sums aggregate in DECIMAL (exact, order-independent)
    and only the final scalar is cast to DOUBLE;
  * averages are computed as exact-decimal-sum / count in one double
    division, never ``avg()`` over doubles (order-dependent);
  * collected lists are sorted before joining to strings;
  * every ORDER BY used for ranking carries a unique tie-break key;
  * column names are aliased identically in the Spark plan and the SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None          # ANSI SQL for DuckDB, or None → rows-only
    doc: str                    # what it exercises (SURVEY.md §2 row)


QUERIES: dict[str, Query] = {}


def query(name: str, oracle: str | None, doc: str = ""):
    """Decorator registering a query-surface entry."""
    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn
    return wrap


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: q.fn for n, q in QUERIES.items()}


def oracle_map() -> dict[str, str]:
    return {n: q.oracle for n, q in QUERIES.items() if q.oracle is not None}
