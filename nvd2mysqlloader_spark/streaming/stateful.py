"""Custom stateful streaming operator — ``applyInPandasWithState``.

The remaining Structured-Streaming API family the engine exposes:
arbitrary per-key state beyond what windows/dedup cover. Demonstrated
operator: per-user running counters + exponentially-weighted mean of
event values, emitting one row per micro-batch per active key with the
state carried across batches.

At 100 TB the state store shards by key across executors; the timeout
(``ProcessingTimeTimeout``) bounds state for keys that go quiet —
the same state-hygiene principle as watermarks on windows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),      # lifetime count
    T.StructField("batch_events", T.LongType()),  # this micro-batch
    T.StructField("ewm_value", T.DoubleType()),   # running EW mean
])

STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("ewm", T.DoubleType()),
])

_ALPHA = 0.1


def _make_update(timeout_ms: int):
    """Build the state-update function with the timeout captured BY
    VALUE in the closure: the function is cloudpickled to executor
    Python workers, so a module-global flag mutated on the driver
    would never reach them (workers re-import the module and see the
    default) — the timeout would silently never be registered."""

    def update(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if timeout_ms and state.hasTimedOut:
            state.remove()              # quiet key: drop its state,
            return                      # emit nothing
        (user_id,) = key
        n, ewm = state.get if state.exists else (0, None)
        batch_n = 0
        for pdf in pdfs:
            # deterministic state evolution: fold in event order.
            # NULL/NaN values are SKIPPED entirely: one NaN folded
            # into the EW mean would poison the state forever
            # ((1-a)*NaN + a*v stays NaN for every later batch)
            for v in pdf.sort_values(["ts", "event_id"])["value"]:
                if v is None or v != v:          # NaN != NaN
                    continue
                ewm = (float(v) if ewm is None
                       else (1 - _ALPHA) * ewm + _ALPHA * float(v))
                n += 1
                batch_n += 1
        state.update((n, ewm))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)   # quiet keys expire
        yield pd.DataFrame([{"user_id": user_id, "n_events": n,
                             "batch_events": batch_n, "ewm_value": ewm}])

    return update


def stream_user_running_stats(events: DataFrame,
                              state_timeout_ms: int = 0) -> DataFrame:
    """events stream → one (user_id, lifetime count, batch count, EW
    mean) row per user per micro-batch, state carried across batches.

    ``state_timeout_ms`` > 0 expires quiet keys (long-lived streams);
    0 = NoTimeout, required for bounded ``Trigger.AvailableNow`` drains
    — a processing-time timer re-triggers batches forever there.
    """
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if state_timeout_ms > 0 else GroupStateTimeout.NoTimeout)
    return (events
            .select("user_id", "ts", "event_id", "value")
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_update(state_timeout_ms),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=timeout))


# ---------------------------------------------------------------------------
# transformWithStateInPandas — Spark 4's arbitrary-state API (the
# successor to applyInPandasWithState): typed named state slots
# (Value/List/Map) on a StatefulProcessor object plus first-class
# timers. Demonstrated operator: per-user lifetime totals with EXACT
# integer accumulation (value quantized to micros before summing, so
# the streamed result is order- and batch-boundary-independent and
# bit-equal to the batch groupBy twin).

try:  # Spark >= 4.0, and the TWS state server needs protobuf at
    # runtime (its driver worker imports google.protobuf.descriptor) —
    # probe both so HAS_TWS means "will actually run here"
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401
    HAS_TWS = True
except ImportError:  # pragma: no cover
    StatefulProcessor = object
    HAS_TWS = False

TWS_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value_micros", T.LongType()),
])

_TWS_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("s", T.LongType()),
])


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key (n_events, exact micro-quantized value sum), carried in
    a ValueState slot across micro-batches; emits the running totals
    for the key once per batch it appears in (Update mode)."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._totals = handle.getValueState("totals", _TWS_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n, s = self._totals.get() if self._totals.exists() else (0, 0)
        import numpy as _np
        for pdf in rows:
            # quantize each value to micros BEFORE summing: integer adds
            # commute exactly across rows, batches, and partitions.
            # NaN (a NULL value) must be dropped BEFORE the int cast —
            # np.round(NaN).astype(int64) silently yields INT64_MIN,
            # which would corrupt the "exact" sum with no error
            vals = pdf["value"].to_numpy(dtype="float64")
            vals = vals[~_np.isnan(vals)]
            n += len(vals)
            s += int(_np.round(vals * 1e6).astype("int64").sum())
        self._totals.update((n, s))
        import pandas as _pd
        yield _pd.DataFrame([{"user_id": key[0], "n_events": n,
                              "sum_value_micros": s}])

    def close(self) -> None:
        pass


def stream_user_totals_tws(events: DataFrame) -> DataFrame:
    """events stream → running per-user totals via
    ``transformWithStateInPandas`` (timeMode none: bounded availableNow
    drains; switch to processingTime + registerTimer for expiry on
    long-lived streams — same state-hygiene role as watermarks)."""
    return (events
            .select("user_id", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                RunningTotalsProcessor(),
                outputStructType=TWS_OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None"))
