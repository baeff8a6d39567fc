"""Structured-Streaming queries under the DuckDB-oracle gate.

Everything else in ``streaming/`` is verified by stream==batch tests;
these entries go further and put an actual streaming drain —
``readStream`` → watermark → event-time window/join → ``availableNow``
micro-batches → memory sink — behind the same value-hash oracle as the
batch queries. The streamed result must match ANSI SQL run by another
engine, not just our own batch plan.

The reference's closest concept is its hand-rolled polling loop
(nvd2mysqlloader.py:508-531); event-time windows are the north-star
streaming surface (SURVEY §2 #47-49).

At 100 TB the same topology runs continuously: the file source becomes
a bucketed landing zone or Kafka, ``availableNow`` becomes a real
trigger, and the watermark is what bounds the state store — the drain
here exercises exactly that plan, just to exhaustion of the input.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ._helpers import dsum
from .registry import query


def _normalize_ts(stream: DataFrame, ts_type) -> DataFrame:
    """The same ts normalization the batch loader applies (NTZ/nanos →
    session-UTC TIMESTAMP, see sources.tpch.load_table)."""
    if isinstance(ts_type, T.LongType):
        return stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        return stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as an unbounded source."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    # the file stream source wants a directory: stream the sf dir with a
    # glob pinned to the events file
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "events.parquet")
              .parquet(sf_dir))
    return _normalize_ts(stream, schema["ts"].dataType)


def _stream_events_with_horizon(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """events.parquet staged alongside a far-future SENTINEL pair
    (user_id = -1, one 'error' + one 'click', ts = max + ~10 years) so
    the final watermark passes every real row. Outer stream-stream
    joins only emit their null-padded side once the watermark CLOSES a
    row's match window — with a source that simply ends, rows near the
    tail would sit in state forever and an availableNow drain would
    under-produce. In production the stream never ends, so the
    watermark keeps advancing on its own; the sentinel reproduces that
    inside a finite fixture (the streaming analog of the feed marks
    the reference polls at nvd2mysqlloader.py:508-531 going quiet).
    Consumers must drop user_id < 0 rows after the drain."""
    import atexit
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = f"{sf_dir}/events.parquet"
    stage = tempfile.mkdtemp(prefix="stream_horizon_")
    # bench loops / oracle sweeps call this repeatedly — without the
    # atexit hook each call leaks a full events.parquet copy in /tmp
    # (same discipline as stream_latest_state_upsert's staging dir)
    atexit.register(shutil.rmtree, stage, ignore_errors=True)
    shutil.copy(src, f"{stage}/events.parquet")

    t = pq.read_table(src)
    arrow_schema = t.schema
    ts_field = arrow_schema.field("ts")
    import pyarrow.compute as pc
    tmax = pc.max(t.column("ts")).as_py()
    import datetime
    # the fixture's ts can also land as int64 epoch-nanos (the shape
    # _normalize_ts supports for every streaming helper) — as_py() then
    # yields a plain int, and int + timedelta raises TypeError, so add
    # the 3650 days in the column's native unit instead
    if isinstance(tmax, int):
        unit_per_sec = {"s": 1, "ms": 10**3, "us": 10**6,
                        "ns": 10**9}.get(getattr(ts_field.type, "unit",
                                                 None), 10**9)
        horizon = tmax + 3650 * 86400 * unit_per_sec
    else:
        horizon = tmax + datetime.timedelta(days=3650)
    cols = {}
    for field in arrow_schema:
        if field.name == "event_id":
            vals = [-1, -2]
        elif field.name == "ts":
            vals = [horizon, horizon]
        elif field.name == "user_id":
            vals = [-1, -1]
        elif field.name == "event_type":
            vals = ["error", "click"]
        elif field.name == "value":
            vals = [0.0, 0.0]
        else:
            vals = [None, None]
        cols[field.name] = pa.array(vals, type=field.type)
    pq.write_table(pa.table(cols, schema=arrow_schema),
                   f"{stage}/zz_watermark_sentinel.parquet")

    schema = spark.read.parquet(stage).schema
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "*.parquet")
              .parquet(stage))
    return _normalize_ts(stream, schema["ts"].dataType)


def _drain(spark: SparkSession, stream_df: DataFrame,
           mode: str = "complete",
           state_partitions: int | None = 8) -> DataFrame:
    """Run the stream to exhaustion (availableNow) into a memory sink;
    return the final table. Unique sink name per run — the driver and
    bench may invoke one query several times in a session.
    ``mode="append"`` for unaggregated/join topologies.

    ``state_partitions`` pins the stateful-operator partition count for
    the drain: every state store instance writes a delta file to the
    checkpoint per micro-batch (a stream-stream join keeps FOUR stores
    per partition), so the partition count should be sized to the STATE
    volume, not inherited from the batch shuffle setting — at these SFs
    8 partitions cut the drain's fixed IO ~3× (measured 5.3s → 1.8s for
    stream_interval_join at sf0.1); at 100 TB the same knob scales the
    state store OUT instead. The session conf is captured at query
    start, so it is set around ``start()`` and restored immediately
    after — batch queries in the same session never see it."""
    name = f"stream_q_{uuid.uuid4().hex[:12]}"
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    if state_partitions is not None:
        spark.conf.set(key, str(state_partitions))
    try:
        q = (stream_df.writeStream.outputMode(mode)
             .format("memory").queryName(name)
             .trigger(availableNow=True).start())
    finally:
        spark.conf.set(key, prev)
    q.awaitTermination()
    return spark.table(name)


@query(
    "stream_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc=(
        "STREAMING tumbling window under the value-hash oracle: "
        "readStream file source → withWatermark(2h) → 1h F.window agg "
        "→ availableNow drain → memory sink; the streamed output must "
        "hash-equal DuckDB's date_trunc GROUP BY over the same rows. "
        "Same shuffle shape as the batch twin — partial aggregation "
        "into the state store keyed by (window, event_type)."
    ),
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (_stream_events(spark, sf_dir)
           .withWatermark("ts", "2 hours")
           .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
           .agg(F.count(F.lit(1)).alias("n_events"),
                dsum("value", 4).alias("sum_value"))
           .select(F.col("w.start").alias("window_start"), "event_type",
                   "n_events", "sum_value"))
    return _drain(spark, agg)


@query(
    "stream_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       <= 30 * 60 * 1000000
                  THEN 0 ELSE 1 END AS new_sess
      FROM events
    ), numbered AS (
      SELECT *, CAST(sum(new_sess)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, max(ts) AS session_last,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM numbered GROUP BY user_id, session_id
    """,
    doc=(
        "STREAMING native session windows (30-min gap) under the "
        "oracle: session_window groupBy with watermarked state, drained "
        "availableNow; hash-compared against the DuckDB gaps-and-"
        "islands twin (a gap of EXACTLY 30 min still merges — "
        "verified empirically: session_window(30m) keeps an event at "
        "last+gap in-session and splits at last+gap+1µs, so the "
        "oracle's <= is exact). session_last = max(ts) (Spark's "
        "window end is last+gap, so the portable column is the max "
        "event time)."
    ),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (_stream_events(spark, sf_dir)
           .withWatermark("ts", "2 hours")
           .groupBy(F.session_window("ts", "30 minutes").alias("w"),
                    "user_id")
           .agg(F.min("ts").alias("session_start"),
                F.max("ts").alias("session_last"),
                F.count(F.lit(1)).alias("n_events"),
                dsum("value", 4).alias("sum_value"))
           .select("user_id", "session_start", "session_last",
                   "n_events", "sum_value"))
    return _drain(spark, agg)


@query(
    "stream_interval_join",
    oracle="""
    SELECT e.event_id AS error_id, e.user_id, e.ts AS error_ts,
           c.event_id AS click_id, c.ts AS click_ts
    FROM events e
    JOIN events c
      ON c.user_id = e.user_id
     AND c.ts >= e.ts - INTERVAL 1 HOUR AND c.ts <= e.ts
    WHERE e.event_type = 'error' AND c.event_type = 'click'
    """,
    doc=(
        "STREAMING stream-stream interval join under the value-hash "
        "oracle: errors and clicks both watermarked, joined on user + "
        "a 1-hour time-range condition (streaming/joins.py), drained "
        "availableNow in APPEND mode; must hash-equal DuckDB's batch "
        "theta join over the same rows. The drain watermark exceeds "
        "the dataset's time span so no row is dropped mid-drain; in "
        "production the watermark+bound is exactly what caps per-key "
        "join state (a click older than error_ts-bound-watermark can "
        "never match and its state is evicted) — TEST-ENFORCED under "
        "a tight 1h watermark by tests/test_streaming.py::"
        "test_stream_interval_join_tight_watermark_evicts_state, "
        "which asserts via the statestore reader that pre-horizon "
        "rows leave the store and an evicted error cannot be matched "
        "late."
    ),
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.joins import stream_error_click_interval_join
    joined = stream_error_click_interval_join(
        _stream_events(spark, sf_dir), bound="1 hour",
        watermark="87600 hours")
    return _drain(spark, joined, mode="append")


@query(
    "stream_left_outer_join",
    oracle="""
    SELECT e.event_id AS error_id, e.user_id, e.ts AS error_ts,
           c.event_id AS click_id, c.ts AS click_ts
    FROM events e
    LEFT JOIN events c
      ON c.user_id = e.user_id
     AND c.event_type = 'click'
     AND c.ts >= e.ts - INTERVAL 1 HOUR AND c.ts <= e.ts
    WHERE e.event_type = 'error'
    """,
    doc=(
        "STREAMING stream-stream LEFT OUTER interval join under the "
        "value-hash oracle — the 7th drained topology, completing the "
        "join family: errors with no click in their 1-hour window "
        "emit null-padded, which in streaming happens only when the "
        "WATERMARK closes the error's match window (a future click "
        "could otherwise still arrive). A finite fixture would strand "
        "the tail's unmatched errors in state forever, so the staged "
        "source appends a far-future watermark-horizon sentinel "
        "(_stream_events_with_horizon) — the drain's output must then "
        "hash-equal DuckDB's batch LEFT JOIN exactly: matched AND "
        "unmatched rows, proving the null-emission path, not just the "
        "inner matches. State bounds are the inner join's: "
        "watermark + bound per key per side."
    ),
)
def stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.joins import stream_error_click_interval_join
    joined = stream_error_click_interval_join(
        _stream_events_with_horizon(spark, sf_dir), bound="1 hour",
        watermark="1 hour", how="left_outer")
    drained = _drain(spark, joined, mode="append")
    # the sentinel pair exists only to advance the watermark
    return drained.filter(F.col("user_id") >= 0)


@query(
    "stream_full_outer_join",
    oracle="""
    SELECT e.event_id AS error_id,
           coalesce(e.user_id, c.user_id) AS user_id,
           e.ts AS error_ts, c.event_id AS click_id, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = e.user_id
     AND c.ts >= e.ts - INTERVAL 1 HOUR AND c.ts <= e.ts
    """,
    doc=(
        "STREAMING stream-stream FULL OUTER interval join under the "
        "value-hash oracle — null emission on BOTH sides: unmatched "
        "errors AND clicks that preceded no error each flush when the "
        "watermark closes their window (same horizon-sentinel staging "
        "as the left-outer drain). Hash-equals DuckDB's batch FULL "
        "JOIN over the same rows; with the inner and left-outer "
        "drains this completes the watermarked stream-stream join "
        "family."
    ),
)
def stream_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.joins import stream_error_click_interval_join
    joined = stream_error_click_interval_join(
        _stream_events_with_horizon(spark, sf_dir), bound="1 hour",
        watermark="1 hour", how="full_outer")
    drained = _drain(spark, joined, mode="append")
    return drained.filter(F.col("user_id") >= 0)


@query(
    "stream_static_enrich",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           date_trunc('hour', e.ts) AS window_start,
           count(*) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    doc=(
        "STREAMING stream-static enrichment under the value-hash "
        "oracle: the event stream broadcast-joins a STATIC dimension "
        "(customer) before the watermarked window agg — the canonical "
        "100 TB/day topology (facts stream, dims are a table; the dim "
        "is re-read per micro-batch, so a published dim update is "
        "picked up without restarting the stream). The static side "
        "broadcasts: NO state store grows with the dim, and the only "
        "stateful operator is the downstream window agg keyed by "
        "(segment, window). Drained availableNow, hash-equal to "
        "DuckDB's batch join+rollup."
    ),
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = (spark.read.parquet(f"{sf_dir}/customer.parquet")
           .select(F.col("c_custkey").alias("user_id"), "c_mktsegment"))
    enriched = (_stream_events(spark, sf_dir)
                .withWatermark("ts", "2 hours")
                .join(F.broadcast(dim), "user_id")
                .groupBy(F.col("c_mktsegment").alias("segment"),
                         F.window("ts", "1 hour").alias("w"))
                .agg(F.count(F.lit(1)).alias("n_events"),
                     dsum("value", 4).alias("sum_value"))
                .select("segment", F.col("w.start").alias("window_start"),
                        "n_events", "sum_value"))
    return _drain(spark, enriched)


@query(
    "stream_dedup",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(value AS DOUBLE) AS value
    FROM events
    """,
    doc=(
        "STREAMING exactly-once dedup under the value-hash oracle: the "
        "event source is UNIONED WITH ITSELF (every row delivered "
        "twice — the at-least-once delivery a real bus gives you) and "
        "dropDuplicatesWithinWatermark(event_id) collapses redeliveries "
        "across micro-batches; the drained append output must "
        "hash-equal the events table with each row EXACTLY once. The "
        "watermark is what bounds the dedup state store at 100 TB/day: "
        "a key older than the watermark can be evicted because a "
        "redelivery that late is dropped by the watermark itself — "
        "TEST-ENFORCED under a tight 1h watermark by tests/"
        "test_streaming.py::"
        "test_stream_dedup_tight_watermark_drops_late_and_evicts "
        "(late redelivery dropped, evicted keys absent from the "
        "statestore read)."
    ),
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    def leg():
        return (_stream_events(spark, sf_dir)
                .select("event_id", "user_id", "event_type", "value", "ts"))
    doubled = leg().union(leg())
    deduped = (doubled.withWatermark("ts", "87600 hours")
               .dropDuplicatesWithinWatermark(["event_id"])
               .drop("ts"))
    return _drain(spark, deduped, mode="append")


@query(
    "stream_latest_state_upsert",
    oracle="""
    SELECT user_id, event_id AS last_event_id, ts AS last_ts,
           CAST(value AS DOUBLE) AS last_value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
    doc=(
        "STREAMING continuous MERGE materialization under the "
        "value-hash oracle — the CDC/latest-state-per-key topology: "
        "the event stream drains through foreachBatch into the "
        "engine's own keyed upsert (write_upsert_parquet, "
        "order_col-conditional so a late or replayed batch can never "
        "overwrite a fresher row — the struct(ts, event_id) total "
        "order makes ties deterministic), and the materialized table "
        "read back must hash-equal DuckDB's top-1-per-user over the "
        "same events. At 100 TB/day this is exactly how a silver "
        "'current state' table is maintained: per micro-batch "
        "last-writer-wins dedup, then an atomic-publish MERGE whose "
        "rewrite is bounded by touched partitions, with readers "
        "always seeing a complete snapshot."
    ),
)
def stream_latest_state_upsert(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from ..operators.upsert import last_writer_wins, write_upsert_parquet

    root = tempfile.mkdtemp(prefix="stream_upsert_")
    atexit.register(shutil.rmtree, root, True)
    tbl = f"{root}/latest_state"
    stream = (_stream_events(spark, sf_dir)
              .select("event_id", "user_id", "value", "ts"))

    def sink(batch_df, batch_id):
        batch = (last_writer_wins(
                     batch_df, ["user_id"],
                     [F.struct("ts", "event_id").desc()])
                 .withColumn("__ord", F.struct("ts", "event_id")))
        write_upsert_parquet(tbl, batch, ["user_id"], order_col="__ord")

    q = (stream.writeStream.foreachBatch(sink)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.read.parquet(tbl)
            .select("user_id",
                    F.col("event_id").alias("last_event_id"),
                    F.col("ts").alias("last_ts"),
                    F.col("value").alias("last_value")))


from .registry import QUERIES as _REGISTERED  # noqa: E402


@query(
    "stream_cms_heavy_hitters",
    oracle=_REGISTERED["cms_heavy_hitters"].oracle,
    doc=(
        "STREAMING sketch maintenance under the value-hash oracle: "
        "the event stream drains through foreachBatch into "
        "operators/sketches.write_cms_sketch (each micro-batch "
        "appends its ≤ depth·width partial CMS rows), and the "
        "persisted table — merged by groupBy-sum, CMS linearity — "
        "must produce estimates hash-equal to the BATCH-built sketch "
        "of cms_heavy_hitters (the SQL is shared verbatim): batch "
        "boundaries are provably invisible. This is the 100 TB/day "
        "frequency-tracking shape — each arriving partition "
        "contributes a kilobyte-scale sketch append, never a rescan "
        "of history, and 'top talkers so far' is answered by merging "
        "≤ depth·width rows per batch. Multi-batch merge + geometry "
        "refusal pinned by tests/test_streaming.py::"
        "test_stream_cms_multi_batch_merge_equals_batch_sketch."
    ),
)
def stream_cms_heavy_hitters(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from ..operators.sketches import cms_point_estimate, write_cms_sketch
    from ..sources.tpch import load_table

    depth, width = 4, 256
    root = tempfile.mkdtemp(prefix="stream_cms_")
    atexit.register(shutil.rmtree, root, True)
    tbl = f"{root}/cms"
    stream = _stream_events(spark, sf_dir).select("user_id")

    def sink(batch_df, batch_id):
        # batch_id makes redelivered epochs overwrite their own
        # partition — foreachBatch is at-least-once, and a blind
        # append would double-count the retried batch's partials
        write_cms_sketch(batch_df, tbl, "user_id",
                         depth=depth, width=width, batch_id=batch_id)

    q = (stream.writeStream.foreachBatch(sink)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    events = load_table(spark, sf_dir, "events")
    top10 = (events.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("exact_cnt"))
             .orderBy(F.desc("exact_cnt"), "user_id").limit(10))
    est = cms_point_estimate(spark, tbl, top10, "user_id")
    return (est.select("user_id", "exact_cnt",
                       F.col("est_count").alias("cms_est"))
            .orderBy(F.desc("exact_cnt"), "user_id"))


@query(
    "stream_distinct_maintenance",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           CAST(count(*) AS BIGINT) AS n_rows,
           TRUE AS within_bound
    FROM events GROUP BY event_type
    """,
    doc=(
        "STREAMING distinct-count maintenance (the HLL companion to "
        "stream_cms_heavy_hitters, completing streaming×sketches for "
        "both mergeable families): each micro-batch appends ONE "
        "DataSketches-HLL row per event_type "
        "(operators/sketches.write_distinct_sketch), and 'distinct "
        "users so far' is answered by union-merging the kilobyte "
        "sketch table — never by rescanning history. The sketch "
        "binary is engine-specific, so the oracle uses the "
        "bound-verdict pattern (hll_mergeable_tally): the query "
        "emits DuckDB-checkable exact anchors (per-type exact "
        "distinct + row counts) beside a within_bound verdict "
        "pinning the merged estimate inside the lgk=14 ±3σ≈2.5% "
        "band, which the oracle requires TRUE. Batch-boundary "
        "independence of the MERGE is DataSketches' union "
        "semantics; the row-count anchor additionally proves no "
        "batch was dropped or double-counted."
    ),
)
def stream_distinct_maintenance(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from ..operators.sketches import distinct_estimate, write_distinct_sketch
    from ..sources.tpch import load_table

    root = tempfile.mkdtemp(prefix="stream_hll_")
    atexit.register(shutil.rmtree, root, True)
    tbl = f"{root}/hll"
    stream = _stream_events(spark, sf_dir).select("event_type", "user_id")

    def sink(batch_df, batch_id):
        write_distinct_sketch(batch_df, tbl, "user_id",
                              group_cols=("event_type",), lgk=14,
                              batch_id=batch_id)

    q = (stream.writeStream.foreachBatch(sink)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    est = distinct_estimate(spark, tbl, group_cols=("event_type",))
    exact = (load_table(spark, sf_dir, "events")
             .groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("exact_distinct")))
    bound = (F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
             <= F.greatest(F.lit(1.0),
                           F.lit(0.025) * F.col("exact_distinct")))
    return (est.join(F.broadcast(exact), "event_type")
            .select("event_type", "exact_distinct", "n_rows",
                    bound.alias("within_bound")))
