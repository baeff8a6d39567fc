"""Graph-operator queries — the O(log n) connected-components variant
under the SAME DuckDB recursive-CTE oracle and query body as the
propagation-based ``dedup_cluster_sizes`` (both are shared from
plans/chunking_queries.py, so the two variants can never drift apart).

Registered AFTER every other module so existing registry positions are
stable (the external harness samples a fixed-size prefix; appends must
never reshuffle it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.graph import connected_components_alternating
from .chunking_queries import CLUSTER_SIZE_ORACLE, cluster_size_rollup
from .registry import query


@query(
    "dedup_cluster_sizes_logn",
    oracle=CLUSTER_SIZE_ORACLE,
    doc=(
        "same near-dup clustering as dedup_cluster_sizes but via "
        "alternating large-star/small-star contraction "
        "(operators/graph.connected_components_alternating, Kiveris "
        "SoCC'14): O(log n) rounds regardless of graph diameter — the "
        "variant to reach for when edge relations chain deeply "
        "(transitive record linkage) rather than forming shallow "
        "dedup-bucket stars. Must hash-match the recursive-CTE oracle "
        "AND therefore the propagation variant."
    ),
)
def dedup_cluster_sizes_logn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cluster_size_rollup(spark, sf_dir,
                               connected_components_alternating)
