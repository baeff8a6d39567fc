"""Shared expression helpers keeping Spark plans hash-identical to the
DuckDB oracle (see registry docstring for the determinism rules)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent sum of a double column: aggregate exactly in
    DECIMAL, cast the final scalar to DOUBLE. Oracle twin:
    ``CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Deterministic mean: exact decimal sum, one double division.
    Oracle twin: ``CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / count(*)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(F.lit(1))
