"""Persisted mergeable distinct-count sketches (Apache DataSketches
HLL, built into Spark 4 as ``hll_sketch_agg``/``hll_union_agg``).

The reference's tally is an exact ``count(distinct cve_id)`` rescan
per poll (nvd2mysqlloader.py:494). At 100 TB the incremental form is
the only affordable one: each ingested batch contributes one
kilobyte-scale sketch ROW per group (a binary column in a tiny
parquet table), and "how many distinct keys so far" is a sketch-merge
over that table — no raw-data rescan, ever. This mirrors the repo's
other persisted-index surfaces (MinHash signatures, LSH/IVF/PQ
indexes): build per batch, append-only, query by merge.

Unlike ``approx_count_distinct`` (whose HLL++ buffer is not a
first-class value), the DataSketches functions expose the sketch as a
column, which is what makes it persistable and mergeable across
batches, jobs, and even engines that speak the DataSketches format.

``lgk`` must match across batches — ``hll_union_agg`` is called
strict (allowDifferentLgConfigK=False), so a mismatched append fails
at merge time rather than silently degrading precision; the writer
also stamps lgk per row and refuses an append that contradicts the
table's existing configuration, failing at WRITE time where the
mistake is made.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def cms_bucket(value_col: str, d: int, width: int):
    """Count-min-sketch bucket for hash row ``d``: 52 bits of
    md5("{d}:{value}") mod width. md5 over the value's string form is
    the repo's shared cross-engine hash (weighted_sample,
    training_order): DuckDB computes the IDENTICAL bucket with
    ``('0x' || substr(md5(...), 1, 13))::BIGINT % width``, so CMS
    estimates — unlike library sketches whose serialized form is
    engine-specific — are exactly reproducible by the oracle."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{d}:"),
                           F.col(value_col).cast("string"))), 1, 13),
        16, 10).cast("bigint")
    return h % width


def cms_rows(df: DataFrame, value_col: str,
             group_cols: Sequence[str] = (),
             depth: int = 4, width: int = 1024,
             weight_col: str | None = None) -> DataFrame:
    """Count-min sketch of ``value_col`` frequencies as a SPARSE keyed
    table: (group..., d, bucket, cnt) with ≤ depth·width rows per
    group REGARDLESS of input volume — the bound is by construction,
    so at 100 TB the rollup's map-side combine collapses each task to
    at most depth·width partial rows before the (tiny) shuffle.

    ``weight_col`` switches the sketch from occurrence counting to
    WEIGHTED frequency (e.g. total bytes per key, revenue per
    customer) — CMS supports any non-negative additive weight with
    the same overshoot-only guarantee; negative weights would break
    the min-over-rows bound, so they are the caller's contract.

    The sparse form makes merging trivially Spark-shaped: CMS is
    linear, so union+groupBy-sum of two sketch tables IS the merged
    sketch (see write_cms_sketch / cms_point_estimate)."""
    entries = F.array(*[
        F.struct(F.lit(d).alias("d"),
                 cms_bucket(value_col, d, width).alias("bucket"))
        for d in range(depth)])
    agg = (F.sum(weight_col).alias("cnt") if weight_col
           else F.count(F.lit(1)).alias("cnt"))
    cols = [*group_cols] + ([weight_col] if weight_col else [])
    return (df.select(*cols, F.explode(entries).alias("e"))
            .groupBy(*group_cols, F.col("e.d").alias("d"),
                     F.col("e.bucket").alias("bucket"))
            .agg(agg))


def _write_sketch_rows(rows: DataFrame, path: str,
                       batch_id: int | None, stream_id: str) -> None:
    """Shared sketch-row landing: plain append, or — when the caller
    is a streaming foreachBatch sink — an IDEMPOTENT per-batch
    partition write. foreachBatch delivers AT-LEAST-ONCE: after a
    sink failure the same epoch is re-invoked with the same
    ``batch_id``, and a blind append would double-count that batch's
    partials, silently inflating every downstream estimate. Stamping
    the rows with (stream, epoch) and dynamically OVERWRITING only
    that partition makes redelivery replace-not-duplicate — the
    standard idempotent-sink contract, scoped to this write (no
    session conf mutation).

    ``stream_id`` scopes the epoch numbering: foreachBatch batch ids
    restart at 0 for every new checkpoint, so two runs sharing one
    long-lived sketch table would otherwise overwrite each other's
    ``batch=N`` partitions. Contract: resume the SAME checkpoint with
    the same stream_id (redelivered epochs replace themselves,
    exactly-once); reprocess-from-scratch with the same stream_id
    (old partials are progressively replaced by the recompute); a
    genuinely NEW incremental stream over the same table needs a NEW
    stream_id or it will clobber history.

    Mixing a non-batch append and batch-partitioned writes on one
    table would corrupt the parquet layout (conflicting directory
    structures) — the geometry guard in the callers refuses it."""
    if batch_id is None:
        rows.write.mode("append").parquet(path)
    else:
        (rows.withColumn("stream", F.lit(stream_id))
         .withColumn("batch", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("stream", "batch").parquet(path))


def _check_sketch_layout(existing_cols, batch_id: int | None,
                         fn: str) -> None:
    """Refuse a write whose layout (flat append vs (stream, batch)
    partitions) disagrees with the existing table — the mix would
    leave the directory unreadable (conflicting structures), a far
    worse failure than this early ValueError."""
    has_batch = "batch" in existing_cols
    if has_batch and batch_id is None:
        raise ValueError(
            f"{fn}: table is (stream, batch)-partitioned (streaming "
            "sink layout) but this write has batch_id=None — a flat "
            "append would corrupt the layout; pass the epoch's "
            "batch_id (and stream_id)")
    if not has_batch and batch_id is not None:
        raise ValueError(
            f"{fn}: table is a flat append table but this write has "
            "batch_id set — a partitioned write would corrupt the "
            "layout; use batch_id=None or rebuild the table")


def write_cms_sketch(df: DataFrame, path: str, value_col: str,
                     group_cols: Sequence[str] = (),
                     depth: int = 4, width: int = 1024,
                     weight_col: str | None = None,
                     batch_id: int | None = None,
                     stream_id: str = "default") -> None:
    """Append this batch's CMS rows: (group..., d, bucket, cnt,
    depth, width). Like write_distinct_sketch, the geometry is
    stamped per row and a mismatched append is refused at WRITE time:
    sketches of different (depth, width) do not merge. ``weight_col``
    appends a weighted sketch (see cms_rows); counted and weighted
    batches must not share a table. From a streaming foreachBatch
    sink, pass the epoch's ``batch_id``: redelivered epochs then
    overwrite their own partition instead of double-appending
    (see _write_sketch_rows)."""
    spark = df.sparkSession
    try:
        ex_df = spark.read.parquet(path)
        existing = ex_df.select("depth", "width").first()
        _check_sketch_layout(ex_df.columns, batch_id, "write_cms_sketch")
    except AnalysisException:
        existing = None
    if existing is not None and (existing["depth"] != depth
                                 or existing["width"] != width):
        raise ValueError(
            f"write_cms_sketch: table at {path} was built with "
            f"depth={existing['depth']}, width={existing['width']} but "
            f"the batch was encoded with depth={depth}, width={width} — "
            "mixed geometries cannot merge; match the table's shape or "
            "rebuild")
    rows = (cms_rows(df, value_col, group_cols, depth, width, weight_col)
            .withColumn("depth", F.lit(depth))
            .withColumn("width", F.lit(width)))
    _write_sketch_rows(rows, path, batch_id, stream_id)


def cms_point_estimate(spark: SparkSession, path: str, probes: DataFrame,
                       probe_col: str,
                       group_cols: Sequence[str] = ()) -> DataFrame:
    """Estimated frequency of each probe key from the persisted sketch
    table: merge = groupBy-sum over the appended batches (CMS
    linearity), estimate = min over the depth hash rows of the probe's
    bucket counters (0 when a bucket was never touched). The merged
    sketch is ≤ depth·width rows per group — broadcast-joined, so the
    probe never shuffles. Estimates are biased high only:
    est ≥ true count always; E[overshoot] ≤ Σcnt / width per hash row."""
    sk = spark.read.parquet(path)
    geo = sk.select("depth", "width").first()
    depth, width = geo["depth"], geo["width"]
    merged = (sk.groupBy(*group_cols, "d", "bucket")
              .agg(F.sum("cnt").alias("cnt")))
    return cms_estimate_from(merged, probes, probe_col, depth, width,
                             group_cols)


def cms_estimate_from(merged: DataFrame, probes: DataFrame,
                      probe_col: str, depth: int, width: int,
                      group_cols: Sequence[str] = ()) -> DataFrame:
    """The probe against an in-plan merged sketch (group..., d,
    bucket, cnt) — shared by the persisted-table path above and the
    oracle-checked cms_heavy_hitters query, so the estimation
    algorithm exists exactly once."""
    entries = F.array(*[
        F.struct(F.lit(d).alias("d"),
                 cms_bucket(probe_col, d, width).alias("bucket"))
        for d in range(depth)])
    exploded = (probes
                .select(*probes.columns, F.explode(entries).alias("e"))
                .alias("p"))
    cond = ((F.col("p.e.d") == F.col("m.d"))
            & (F.col("p.e.bucket") == F.col("m.bucket")))
    for g in group_cols:
        cond = cond & (F.col(f"p.{g}") == F.col(f"m.{g}"))
    probed = exploded.join(F.broadcast(merged.alias("m")), cond, "left")
    keep = [c for c in probes.columns
            if c != probe_col and c not in group_cols]
    return (probed.groupBy(*[F.col(f"p.{g}").alias(g) for g in group_cols],
                           F.col(f"p.{probe_col}").alias(probe_col),
                           *[F.col(f"p.{c}").alias(c) for c in keep])
            .agg(F.min(F.coalesce(F.col("m.cnt"), F.lit(0)))
                 .alias("est_count")))


def hist_bin(value_col: str, scale_bits: int):
    """Fixed-width histogram bin: floor(value · 2^scale_bits). The
    scale is a power of two, so the product is EXACT in IEEE doubles
    and the bin id is engine-independent — no boundary drift (the
    zorder/winnow determinism discipline applied to binning)."""
    return F.floor(F.col(value_col) * float(1 << scale_bits))


def write_histogram_sketch(df: DataFrame, path: str, value_col: str,
                           group_cols: Sequence[str] = (),
                           scale_bits: int = 4) -> None:
    """Append this batch's histogram rows: (group..., bin, cnt,
    scale_bits). The mergeable-quantile member of the sketch family
    (HLL = distinct, CMS = frequency, histogram = quantiles): bin
    counts are linear, so merge = groupBy-sum, and the per-batch
    contribution is bounded by the VALUE RANGE / bin width, never the
    row count. Quantile estimates from the merged table carry a hard
    ±2^-scale_bits error bound (the answer lies inside its bin). A
    mismatched scale_bits append is refused at write time."""
    spark = df.sparkSession
    try:
        existing = spark.read.parquet(path).select("scale_bits").first()
    except AnalysisException:
        existing = None
    if existing is not None and existing["scale_bits"] != scale_bits:
        raise ValueError(
            f"write_histogram_sketch: table at {path} was built with "
            f"scale_bits={existing['scale_bits']} but the batch was "
            f"encoded with scale_bits={scale_bits} — mixed bin widths "
            "cannot merge; match the table's scale or rebuild")
    # NULLs are excluded like percentile_disc excludes them: a null
    # bin would sort first, inflate n and every cumulative count, and
    # silently break the containment bound the sketch advertises
    (df.filter(F.col(value_col).isNotNull())
       .groupBy(*group_cols, hist_bin(value_col, scale_bits).alias("bin"))
       .agg(F.count(F.lit(1)).alias("cnt"),
            F.lit(scale_bits).alias("scale_bits"))
       .write.mode("append").parquet(path))


def histogram_quantile(spark: SparkSession, path: str,
                       quantiles: Sequence[float],
                       group_cols: Sequence[str] = ()) -> DataFrame:
    """Quantile estimates from the persisted histogram: merge the
    appended batches (groupBy-sum), walk each group's cumulative
    counts, and return the LOWER EDGE of the first bin whose
    cumulative count reaches ceil(q·n): (group..., q, est). The true
    percentile_disc(q) lies in that bin, so
    est <= exact < est + 2^-scale_bits — a hard bound, not
    probabilistic. The scan reads only the sketch table."""
    sk = spark.read.parquet(path)
    bits = sk.select("scale_bits").first()["scale_bits"]
    merged = (sk.groupBy(*group_cols, "bin")
              .agg(F.sum("cnt").alias("cnt")))
    return histogram_quantile_from(merged, quantiles, bits, group_cols)


def histogram_quantile_from(merged: DataFrame,
                            quantiles: Sequence[float], scale_bits: int,
                            group_cols: Sequence[str] = ()) -> DataFrame:
    """The cumulative walk against an in-plan merged histogram
    (group..., bin, cnt) — shared by the persisted-table path above
    and the oracle-checked histogram_quantile_sketch query, so the
    pick-first-bin-at-ceil(q·n) algorithm exists exactly once."""
    from pyspark.sql import Window
    spark = merged.sparkSession
    w = (Window.partitionBy(*group_cols).orderBy("bin")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = merged.withColumn("cum", F.sum("cnt").over(w))
    tot = merged.groupBy(*group_cols).agg(F.sum("cnt").alias("n"))
    qdf = spark.createDataFrame([(float(q),) for q in quantiles],
                                "q double")
    joined = (cum.join(tot, list(group_cols)) if group_cols
              else cum.crossJoin(F.broadcast(tot)))
    return (joined.crossJoin(F.broadcast(qdf))
            .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
            .groupBy(*group_cols, "q")
            .agg((F.min("bin") / float(1 << scale_bits)).alias("est")))


def write_distinct_sketch(df: DataFrame, path: str, value_col: str,
                          group_cols: Sequence[str] = (),
                          lgk: int = 14,
                          batch_id: int | None = None,
                          stream_id: str = "default") -> None:
    """Append one sketch row per group for this batch:
    (group..., sketch binary, n_rows bigint, lgk int).

    ``n_rows`` is the batch's exact row contribution (not distinct) —
    a free exactness anchor for monitoring merge results. From a
    streaming foreachBatch sink, pass the epoch's ``batch_id``:
    redelivered epochs then overwrite their own partition instead of
    double-appending (see _write_sketch_rows; HLL union absorbs
    duplicate sketches, but n_rows would double-count)."""
    spark = df.sparkSession
    try:
        ex_df = spark.read.parquet(path)
        existing = ex_df.select("lgk").first()
        _check_sketch_layout(ex_df.columns, batch_id,
                             "write_distinct_sketch")
    except AnalysisException:
        existing = None
    if existing is not None and existing["lgk"] != lgk:
        raise ValueError(
            f"write_distinct_sketch: table at {path} was built with "
            f"lgk={existing['lgk']} but the batch was encoded with "
            f"lgk={lgk} — mixed precisions cannot merge; match the "
            "table's lgk or rebuild")
    rows = (df.groupBy(*group_cols)
            .agg(F.hll_sketch_agg(value_col, lgk).alias("sketch"),
                 F.count(F.lit(1)).alias("n_rows"),
                 F.lit(lgk).alias("lgk")))
    _write_sketch_rows(rows, path, batch_id, stream_id)


def distinct_estimate(spark: SparkSession, path: str,
                      group_cols: Sequence[str] = ()) -> DataFrame:
    """Merge every persisted sketch row per group and estimate:
    (group..., approx_distinct bigint, n_rows bigint). The scan reads
    only the sketch table — O(batches · groups) kilobyte rows — never
    the raw data the sketches were built from."""
    sk = spark.read.parquet(path)
    return (sk.groupBy(*group_cols)
            .agg(F.hll_sketch_estimate(
                     F.hll_union_agg("sketch", False))
                 .alias("approx_distinct"),
                 F.sum("n_rows").alias("n_rows")))
