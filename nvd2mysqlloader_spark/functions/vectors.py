"""Vector math over ``array<float>`` columns — pure higher-order
functions, JVM-side, no UDF.

``aggregate`` folds left-to-right sequentially, so the double summation
order is deterministic (same order the DuckDB oracle's list functions
use) — required for hash-stable cosine scores.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ))


def cosine(a: Column, b: Column) -> Column:
    """NULL (not an error) when either vector has zero norm: a plain
    division throws DIVIDE_BY_ZERO under ANSI mode (Spark 4 default),
    so one all-zero embedding would abort a whole similarity job."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))
