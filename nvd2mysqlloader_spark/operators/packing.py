"""Best-fit-decreasing sequence packing — the padding-minimizing
context-window assembly used for LLM training batches.

The registry's ``sequence_packing`` is the streaming fill-then-
overflow packer (one window + integer division, zero per-item logic);
this operator is its quality-optimizing sibling: BFD places each
item (largest first) into the fullest bin it still fits, which wastes
far less capacity when document lengths are heterogeneous. The
guarantee that makes it verifiable: after BFD, at most ONE bin per
packing domain is ≤ half full — so the bin count is bounded by
``2·total/capacity + 1`` per domain.

100 TB design: global BFD is inherently sequential, so the corpus is
split into DETERMINISTIC shards (md5 of the id — reproducible under
any partitioning, the repo's standard trick) and BFD runs
independently per shard via applyInPandas — embarrassingly parallel,
one exchange on the shard key. With shards ≫ capacity the extra bins
vs a global pack are at most one per shard (the half-full bound is
per shard), a vanishing fraction. Oversized items are refused: a doc
longer than the context window should have been chunked upstream
(plans/chunking_queries.py), not silently truncated here.
"""

from __future__ import annotations

import bisect

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHARD_BITS = 32          # pack_id = shard << SHARD_BITS | local index


def bfd_pack(df: DataFrame, id_col: str, size_col: str,
             capacity: int, n_shards: int = 16) -> DataFrame:
    """Pack items into bins of ``capacity`` with best-fit-decreasing.
    Returns (id_col, size_col, pack_id) — pack_id globally unique and
    deterministic (shard from md5(id), BFD order (size desc, id)).
    Raises inside the job if any item exceeds ``capacity``."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([size_col, id_col],
                              ascending=[False, True])
        sizes = pdf[size_col].to_numpy()
        if len(sizes) and sizes[0] > capacity:
            raise ValueError(
                f"bfd_pack: item of size {int(sizes[0])} exceeds "
                f"capacity {capacity} — chunk oversized documents "
                "before packing")
        shard = int(pdf["__shard"].iloc[0])
        # sorted (remaining, bin_index) slots: the tuple order makes
        # the tie-break DETERMINISTIC AND CANONICAL — among bins with
        # equal remaining capacity, the lowest bin index wins, exactly
        # what a linear best-fit scan picks (pinned against the
        # quadratic twin in tests, including tie-heavy inputs)
        slots: list[tuple[int, int]] = []
        fills: list[int] = []         # remaining capacity per bin id
        assigned = []
        for s in sizes:
            s = int(s)
            # best fit = the TIGHTEST remaining capacity that fits
            k = bisect.bisect_left(slots, (s, -1))
            if k < len(slots):
                b = slots[k][1]
                del slots[k]
            else:
                b = len(fills)
                fills.append(capacity)
            fills[b] -= s
            bisect.insort(slots, (fills[b], b))
            assigned.append(b)
        return pd.DataFrame({
            id_col: pdf[id_col].to_numpy(),
            size_col: pdf[size_col].to_numpy(),
            "pack_id": [(shard << SHARD_BITS) | b for b in assigned]})

    shard = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 13),
                    16, 10).cast("bigint") % n_shards).cast("int")
    out_schema = (f"{id_col} bigint, {size_col} bigint, "
                  "pack_id bigint")
    return (df.select(F.col(id_col).cast("bigint").alias(id_col),
                      F.col(size_col).cast("bigint").alias(size_col))
            .withColumn("__shard", shard)
            .groupBy("__shard").applyInPandas(pack, out_schema))
