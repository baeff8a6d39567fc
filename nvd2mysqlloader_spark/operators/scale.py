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


def _bloom_pos(key, i: int, m_bits: int):
    """Bit position for hash row ``i``: 52 bits of md5("{i}:{key}")
    mod m_bits — the repo's shared cross-engine hash family, and
    identical arithmetic on the build and probe sides (which is all a
    bloom filter needs for zero false negatives)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{i}:"), key.cast("string"))),
                    1, 13), 16, 10).cast("bigint")
    return h % m_bits


def build_bloom_words(keys: DataFrame, key: str, m_bits: int,
                      k_hashes: int) -> list[int]:
    """Distributed bloom-filter build: every key sets ``k_hashes`` bit
    positions; positions fold into 64-bit words with a bit_or
    aggregate (map-side combine collapses each task to ≤ m_bits/64
    partial words). The driver collect is bounded by the FILTER SIZE
    (m_bits/64 words — 16 KiB at the default 2^20 bits), never by the
    key count: that asymmetry is the whole point — a dim side too big
    to broadcast raw still compresses to a constant-size bit array."""
    if m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    entries = F.array(*[_bloom_pos(F.col(key), i, m_bits)
                        for i in range(k_hashes)])
    words = (keys.filter(F.col(key).isNotNull())
             .select(F.explode(entries).alias("pos"))
             .select(F.shiftright("pos", 6).alias("w"),
                     F.expr("shiftleft(CAST(1 AS BIGINT), "
                            "CAST(pos % 64 AS INT))").alias("mask"))
             .groupBy("w").agg(F.bit_or("mask").alias("bits"))
             .collect())
    dense = [0] * (m_bits // 64)
    for r in words:
        dense[r["w"]] = r["bits"]
    return dense


def bloom_filtered_join(fact: DataFrame, dim: DataFrame, fact_key: str,
                        dim_key: str, how: str = "left_semi",
                        m_bits: int = 1 << 20,
                        k_hashes: int = 4) -> DataFrame:
    """Semi/anti join where the fact side is pre-filtered by a bloom
    filter of the dim keys BEFORE any shuffle — the 100 TB
    decontamination/existence-probe shape when the dim side exceeds
    the broadcast threshold: the bit array (m_bits/8 bytes, key-count
    independent) rides to every task where the raw key set cannot, and
    only bloom-positive rows (true matches + the ~(1-e^{-kn/m})^k
    false-positive sliver) reach the exact residual join. Results are
    IDENTICAL to a plain semi/anti join: blooms have no false
    negatives, and the residual join removes the false positives.

    Membership is pure JVM expressions (element_at on an array
    literal + bit masks) — no Python in the per-row path. The literal
    array ships inside the plan like a broadcast; at the default 2^20
    bits that is 128 KiB. Size m_bits ≳ 10×|dim keys| for a sub-1% FP
    rate at k=4; past ~2^26 bits prefer Spark's runtime row-level
    bloom (spark.sql.optimizer.runtime.bloomFilter.enabled), which
    this operator complements for the explicit, reusable case.

    NULL fact keys are routed to the exact join unconditionally (their
    md5 is NULL, not a bit position), preserving null semantics: a
    semi join drops them, an anti join keeps them."""
    if how not in ("left_semi", "left_anti"):
        raise ValueError(
            f"bloom_filtered_join supports left_semi/left_anti, got "
            f"{how!r}: outer/inner shapes need the dim PAYLOAD, which "
            "a bloom filter cannot carry — broadcast or shuffle those")
    dense = build_bloom_words(dim.select(dim_key), dim_key,
                              m_bits, k_hashes)
    # the literal rides as a parsed SQL array, NOT F.lit(list):
    # Py4J converts python lists element-by-element (~1 s of SERIAL
    # driver time for 2^17 bits, at any data scale), while parsing a
    # numeric array() string is milliseconds and constant-folds to
    # the same array<bigint> literal
    arr = F.expr("cast(array(" + ",".join(map(str, dense))
                 + ") as array<bigint>)")
    key = F.col(fact_key)
    member = F.lit(True)
    for i in range(k_hashes):
        pos = _bloom_pos(key, i, m_bits)
        word = F.element_at(arr, F.shiftright(pos, 6).cast("int") + 1)
        member = member & (word.bitwiseAND(
            _shiftleft_col(pos % 64)) != 0)
    # NULL key -> NULL membership -> route to the exact join
    maybe = F.coalesce(member, F.lit(True))
    # rename the dim key: with fact_key == dim_key (the common shape —
    # user_id vs user_id) two bare F.col references would be ambiguous
    dim_keys = dim.select(F.col(dim_key).alias("__bloom_dim_key"))
    cond = F.col(fact_key) == F.col("__bloom_dim_key")
    if how == "left_semi":
        return fact.filter(maybe).join(dim_keys, cond, "left_semi")
    # anti: bloom-negative rows are DEFINITELY absent -> keep outright;
    # only the bloom-positive sliver pays the exact anti join. This IS
    # two scans of the fact (Spark does not CSE across union branches
    # without materialization) — deliberately: two pruned columnar
    # reads beat one full-fact shuffle, which is what a single-pass
    # left_anti with the membership folded into the condition would
    # cost once the dim side exceeds broadcast. Callers with the fact
    # already cached pay nothing extra.
    negatives = fact.filter(~maybe)
    positives = fact.filter(maybe).join(dim_keys, cond, "left_anti")
    return negatives.unionByName(positives)


def _shiftleft_col(nbits_col):
    """shiftleft with a COLUMN bit count (the pyspark function only
    accepts a literal): SQL-side shiftleft accepts expressions."""
    from pyspark.sql import Column
    assert isinstance(nbits_col, Column)
    return F.call_function(
        "shiftleft", F.lit(1).cast("bigint"), nbits_col.cast("int"))


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key — with equal
    bucket counts Catalyst plans a shuffle-free SortMergeJoin (no
    Exchange on either side; verify with .explain)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
