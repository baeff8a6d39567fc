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


def write_distinct_sketch(df: DataFrame, path: str, value_col: str,
                          group_cols: Sequence[str] = (),
                          lgk: int = 14) -> None:
    """Append one sketch row per group for this batch:
    (group..., sketch binary, n_rows bigint, lgk int).

    ``n_rows`` is the batch's exact row contribution (not distinct) —
    a free exactness anchor for monitoring merge results."""
    spark = df.sparkSession
    try:
        existing = spark.read.parquet(path).select("lgk").first()
    except AnalysisException:
        existing = None
    if existing is not None and existing["lgk"] != lgk:
        raise ValueError(
            f"write_distinct_sketch: table at {path} was built with "
            f"lgk={existing['lgk']} but the batch was encoded with "
            f"lgk={lgk} — mixed precisions cannot merge; match the "
            "table's lgk or rebuild")
    (df.groupBy(*group_cols)
       .agg(F.hll_sketch_agg(value_col, lgk).alias("sketch"),
            F.count(F.lit(1)).alias("n_rows"),
            F.lit(lgk).alias("lgk"))
       .write.mode("append").parquet(path))


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
