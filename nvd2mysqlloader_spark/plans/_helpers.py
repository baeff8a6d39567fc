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


def disc_percentile(q: float, value_col: str,
                    rn_col: str = "rn", n_col: str = "n") -> Column:
    """Discrete percentile as an aggregate over a ranked frame: the
    value at rank ceil(q·n) (DuckDB ``quantile_disc`` convention —
    shared by percentile_disc and quality_band_filter so the boundary
    semantics can never drift between them). Callers provide a
    row_number column ordered by the value and a per-group count."""
    target = F.greatest(F.lit(1), F.ceil(F.lit(q) * F.col(n_col)))
    return F.max(F.when(F.col(rn_col) == target, F.col(value_col)))
