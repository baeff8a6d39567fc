"""Per-query phase split reporting — measurement bookkeeping only.

A few verify queries construct their artifact (signature table, PQ
index) INSIDE the query function, so the bench suite's wall time
charges index construction to query cost (r9 verdict ask #2's last
leg). Those queries report their build span here; ``bench.py`` reads
the last-run split after timing each entry and records it in
``bench_detail.json`` under ``phase_split`` — the committed record
can then separate build-once artifact cost from the per-probe cost
that actually recurs at 100 TB. Reporting is wall-clock bookkeeping
around existing statements; it never changes what a query computes
(oracle outputs are unaffected).
"""

from __future__ import annotations

_LAST: dict[str, dict[str, float]] = {}


def report(query: str, **phases: float) -> None:
    """Record the most recent run's phase durations for ``query``
    (seconds per named phase, e.g. ``build_sec=...``). Overwritten on
    every execution — consumers want the run they just timed."""
    _LAST[query] = {k: round(v, 4) for k, v in phases.items()}


def last() -> dict[str, dict[str, float]]:
    return {k: dict(v) for k, v in _LAST.items()}
