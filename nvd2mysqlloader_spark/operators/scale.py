"""Scale utilities — skew-join salting and bucketed co-located joins.

AQE handles moderate skew (``skewJoin.enabled`` splits oversized
partitions after the map stage); these helpers cover the cases AQE
can't: extreme single-key skew where even a split partition's build
side is hot (salting), and repeated joins on the same key where paying
one bucketed write amortizes every later shuffle away (bucketing).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(skewed: DataFrame, small: DataFrame, key: str,
                salt_buckets: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join robust to extreme key skew: the skewed side gets a
    deterministic salt (hash of the whole row mod buckets), the small
    side is replicated once per salt value, and the join key becomes
    (key, salt) — a hot key now spreads over ``salt_buckets``
    partitions instead of melting one.

    Deterministic (no rand()): task retries produce identical salt
    assignments, so the join is exactly-once-safe.

    Only ``inner`` and ``left`` (outer on the SKEWED side) are valid:
    for right/full outer, the replicated small side would surface one
    null-padded row per unmatched (key, salt) replica — up to
    ``salt_buckets`` spurious copies. Use a plain join (or AQE skew
    handling) for those shapes.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "the salt-replicated small side makes right/full outer "
            "emit one spurious row per unmatched replica")
    # salt from rand(seed), NOT a hash of the row: extreme single-key
    # skew usually comes from byte-identical duplicate rows (repeated
    # boilerplate/log events), and a content hash would assign every
    # duplicate the SAME salt — the straggler partition survives
    # untouched. rand(seed) is seeded per partition+row offset, so it
    # is stable under task retry, spreads identical rows uniformly,
    # and the salt never affects the join RESULT (any salt value
    # matches the replicated small side).
    salt = F.floor(F.rand(42) * salt_buckets).cast("int")
    left = skewed.withColumn("__salt", salt)
    right = (small.join(
        small.sparkSession.range(salt_buckets)
        .select(F.col("id").cast("int").alias("__salt")), how="cross"))
    out = left.join(right, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def write_bucketed(df: DataFrame, table: str, key: str,
                   buckets: int = 16,
                   sort_by: Sequence[str] | None = None) -> None:
    """Persist as a bucketed (optionally sorted) table: later joins and
    aggregations on ``key`` read co-located buckets and skip their
    shuffle entirely — the amortized answer to 'this join runs every
    hour on the same key'."""
    writer = (df.write.mode("overwrite")
              .bucketBy(buckets, key))
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key — with equal
    bucket counts Catalyst plans a shuffle-free SortMergeJoin (no
    Exchange on either side; verify with .explain)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
