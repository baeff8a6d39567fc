"""Structured-Streaming event-time operators over the ``events`` shape.

The reference has no streams (SURVEY §2 #47-49) — its `modified`/
`recent` polling loop is a hand-rolled micro-batch pipeline. These are
the north-star event-time extensions, built so the batch plans in
``plans.event_queries`` and the streaming plans here share semantics:
the tests assert stream output == batch output on the same input.

Watermarks bound state: late rows beyond the horizon are dropped and
windows older than it are finalized — at 100 TB the watermark is what
keeps shuffle/state stores from growing without bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_tumbling_counts(events: DataFrame, window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of plans.event_queries.tumbling_window: per
    (1h window × event_type) counts + exact decimal sums."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
                 .alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "sum_value"))


def stream_session_aggregates(events: DataFrame, gap: str = "30 minutes",
                              watermark: str = "2 hours") -> DataFrame:
    """Native session windows (``session_window``) — the streaming
    stateful form of the batch gaps-and-islands sessionization."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
                 .alias("sum_value"))
            .select("user_id", F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"), "n_events",
                    "sum_value"))


def stream_dedup_within_watermark(events: DataFrame, key: str = "event_id",
                                  watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-per-key within the watermark horizon —
    ``dropDuplicates`` with bounded state; the streaming counterpart of
    the reference's REPLACE-idempotency (re-delivered rows ignored)."""
    return (events.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark([key]))
