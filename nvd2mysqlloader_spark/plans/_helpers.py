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


# ---------------------------------------------------------------------------
# Session-scoped prebuilt artifact cache (VERDICT r10 ask #1).
#
# A handful of verify queries exercise a PERSISTED artifact — banded
# signature tables, PQ codes — whose operating mode at 100 TB is
# build-once/probe-many, but whose registered query used to build the
# artifact fresh on every call: a bench sweep (1 warmup + 3 timed
# repetitions per entry) paid the construction four times and charged
# three of them to query wall, so the committed record conflated
# one-time index construction with the per-probe cost that actually
# recurs at scale. The cache keys each artifact on (name, sf_dir[,
# geometry...]) and builds it ONCE per process — the warmup
# repetition — so every timed repetition probes the prebuilt
# artifact, exactly like the operating mode. The build still runs and
# is still reported (queries pass its cost to plans._phases as
# build_sec, flagging reuse with build_cached=1), it just stops
# recurring. Queries that MUTATE their artifact (compaction,
# rebucketing) take a cheap per-call private copy via fresh_copy() so
# the cached pristine state is never touched; the copy cost is
# reported as copy_sec and the mutation itself stays in the wall —
# it IS the operator under test.
#
# Correctness is unaffected: artifacts are deterministic functions of
# (sf_dir, geometry), probes never write to them, and the oracle
# surface compares query OUTPUTS, which are identical whether the
# artifact was built this call or three calls ago.

import atexit as _atexit
import shutil as _shutil
import tempfile as _tempfile
import time as _time
from typing import Any, Callable

_ARTIFACTS: dict[tuple, tuple[str, Any, float]] = {}


def _tmp_root(prefix: str) -> str:
    d = _tempfile.mkdtemp(prefix=prefix)
    _atexit.register(_shutil.rmtree, d, ignore_errors=True)
    return d


def session_artifact(key: tuple, build: Callable[[str], Any]
                     ) -> tuple[str, Any, float, bool]:
    """Build-once artifact keyed on ``key`` (must include sf_dir and
    any geometry the layout depends on). ``build(path)`` constructs
    the artifact at ``path`` and may return driver-side aux state
    (e.g. PQ codebooks). Returns (path, aux, build_sec, cached);
    ``build_sec`` is always the REAL construction cost (the building
    call's, preserved across hits) so phase reporting stays honest."""
    hit = _ARTIFACTS.get(key)
    if hit is not None:
        return hit[0], hit[1], hit[2], True
    path = _tmp_root(str(key[0]) + "_") + "/index"
    t0 = _time.perf_counter()
    aux = build(path)
    build_sec = _time.perf_counter() - t0
    _ARTIFACTS[key] = (path, aux, build_sec)
    return path, aux, build_sec, False


def one_row(*aggs):
    """Assemble single-row GLOBAL aggregates into one row.

    CONTRACT (ADVICE r12 #3): every input must be a GLOBAL aggregate
    or literal-select — a frame that yields EXACTLY ONE ROW even on
    empty input. A grouped aggregate (or any multi-row frame) passed
    here would silently contribute an arbitrary first(ignorenulls)
    value per column where the old cross-join shape surfaced the
    mistake as visible row multiplication; the assert below checks
    the statically-checkable half (column disjointness), the
    row-count half is the caller's obligation (pinned for all current
    callers by their oracle rows).

    Union skeleton, not a broadcast cross-join chain: each input's
    row is padded with typed nulls to the combined schema, the pads
    are unioned, and one ``first(ignorenulls)`` aggregate per column
    re-assembles the row. The old shape materialized every aggregate
    as its own BroadcastExchange job before the final collect; the
    union makes the aggregate subtrees parallel stages of ONE job
    and drops the N−1 broadcasts. Equivalent by construction: every
    input is a global aggregate or literal (exactly one row each)
    with column names disjoint across inputs (the callers'
    unqualified selects already require that), so a column's only
    non-null row is its own aggregate's — first(ignorenulls) returns
    exactly the cross-join's value, and a genuinely NULL aggregate
    stays NULL (no other row carries its column non-null)."""
    if len(aggs) == 1:
        return aggs[0]
    fields = []
    for a in aggs:
        fields.extend(a.schema.fields)
    names = [f.name for f in fields]
    assert len(set(names)) == len(names), (
        "one_row inputs must have pairwise-disjoint column names AND "
        "be single-row global aggregates/literals (multi-row inputs "
        f"return arbitrary values silently): {names}")
    padded = []
    for a in aggs:
        have = set(a.columns)
        padded.append(a.select(*[
            F.col(f.name) if f.name in have
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in fields]))
    out = padded[0]
    for p in padded[1:]:
        out = out.unionAll(p)
    return out.agg(*[F.first(f.name, ignorenulls=True).alias(f.name)
                     for f in fields])


def multiset_diff_count(a, b, alias: str, one_way: bool = False):
    """Single-pass multiset-difference count as a 1-row aggregate —
    the r13 replacement for the verdicts' convergence/invariance
    probes of the shape ``a.exceptAll(b).unionAll(b.exceptAll(a))
    → count`` (and the one-way ``a.exceptAll(b) → count``).

    VALUE-IDENTICAL, not merely equi-zero: Spark's EXCEPT ALL emits
    ``max(cnt_a(v) − cnt_b(v), 0)`` copies of each row value v, so
    the both-ways count is exactly ``Σ_v |cnt_a(v) − cnt_b(v)|`` and
    the one-way count exactly ``Σ_v max(cnt_a(v) − cnt_b(v), 0)`` —
    which is what this computes directly from a signed union: tag a
    with +1 and b with −1, sum the sign per row value, then sum
    |d| (or greatest(d, 0)). Grouping equality semantics are the
    SAME machinery ExceptAll itself lowers to (union → aggregate →
    generate), so NULL/NaN handling is identical; this shape just
    skips the generate re-expansion and the SECOND shuffle of both
    inputs that the two exceptAll subtrees paid (guide §2.4 — one
    exchange of each input instead of two, and one plan branch
    instead of two for AQE to materialize)."""
    cols = list(a.columns)
    tagged = (a.select(*cols, F.lit(1).alias("__sgn"))
              .unionAll(b.select(*cols, F.lit(-1).alias("__sgn"))))
    per_val = tagged.groupBy(*cols).agg(F.sum("__sgn").alias("__d"))
    mag = (F.greatest(F.col("__d"), F.lit(0)) if one_way
           else F.abs(F.col("__d")))
    return per_val.agg(F.coalesce(F.sum(mag), F.lit(0))
                       .cast("long").alias(alias))


def fresh_copy(path: str, prefix: str) -> tuple[str, float]:
    """Per-call private copy of a cached artifact for queries that
    MUTATE it (compaction, rebucket): a driver-side copytree — tens
    of MB at bench scale, orders cheaper than re-deriving the
    artifact from corpus text through shingle/minhash jobs. Returns
    (copy_path, copy_sec)."""
    dst = _tmp_root(prefix + "_") + "/index"
    t0 = _time.perf_counter()
    _shutil.copytree(path, dst, symlinks=True)
    return dst, _time.perf_counter() - t0
