"""Stream-stream joins — the watermark-bounded interval join.

The reference's closest shape is its row-at-a-time "look up what we
already stored" probe (nvd2mysqlloader.py:456-467); in Structured
Streaming the equivalent correlation of two live streams needs BOTH
sides watermarked and a time-range join condition, which is what lets
the engine expire per-key state: a click older than
``error_ts - bound - watermark`` can never match a future error, so
its state is dropped.

At 100 TB/day the state store only ever holds ``watermark + bound``
worth of each stream per key — the join condition, not the data
volume, bounds memory. The same function applied to batch DataFrames
produces the identical result (withWatermark is a no-op in batch);
tests assert stream output == batch output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_error_click_interval_join(events: DataFrame,
                                     bound: str = "1 hour",
                                     watermark: str = "2 hours",
                                     how: str = "inner") -> DataFrame:
    """Each error event joined to the same user's clicks in the
    ``bound`` interval before it (inclusive) — append-mode capable.
    ``events`` may be streaming or batch.

    ``how="left_outer"`` additionally emits errors with NO click in
    their window, null-padded — but only once the watermark passes the
    error's match window (before that a matching click could still
    arrive), so a finite drain needs the source's watermark to close
    over the data (see plans.streaming_queries
    ._stream_events_with_horizon). ``how="full_outer"`` does the same
    on BOTH sides (unmatched clicks too; their user_id is carried by
    the coalesce below). State bounds are identical to the inner
    join: watermark + bound per key per side."""
    errors = (events.filter(F.col("event_type") == "error")
              .select(F.col("event_id").alias("error_id"),
                      "user_id",
                      F.col("ts").alias("error_ts"))
              .withWatermark("error_ts", watermark))
    clicks = (events.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"),
                      F.col("user_id").alias("click_user_id"),
                      F.col("ts").alias("click_ts"))
              .withWatermark("click_ts", watermark))
    cond = F.expr(f"""
        user_id = click_user_id
        AND click_ts >= error_ts - INTERVAL {bound}
        AND click_ts <= error_ts
    """)
    # coalesce is a no-op for inner/left (the errors side always has
    # user_id); for full_outer it carries the key of unmatched CLICKS
    return (errors.join(clicks, cond, how)
            .select("error_id",
                    F.coalesce("user_id", "click_user_id")
                    .alias("user_id"),
                    "error_ts", "click_id", "click_ts"))


def stream_static_enrich(events: DataFrame, dim: DataFrame,
                         key: str = "event_type") -> DataFrame:
    """Stream-static enrichment join: the unbounded side joins a
    static dimension on ``key`` — Spark re-plans the static side per
    micro-batch and broadcasts it, so NO streaming state is kept for
    the join at all (unlike stream-stream joins, which must buffer
    within the watermark). The canonical lookup-table pattern: at
    100 TB of stream the dim is still a broadcast, and dim updates are
    picked up on the next micro-batch when the static source is a
    table/path re-read.

    The reference's closest shape is its unpopulated FK star model
    (nvd2mysqlloader.py:328-365) — this is that join surface in
    streaming form.
    """
    return (events.join(F.broadcast(dim), key, "left")
            .select(key, "event_id", "ts", "value",
                    F.coalesce("weight", F.lit(0.0)).alias("weight")))
