"""Unit tests for operators/graph.connected_components — handcrafted
graphs exercising the shapes the dedup-cluster query can't guarantee
to hit in synthetic data (deep chains needing multiple propagation
rounds, isolated vertices, reversed edge orientation, merging stars)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nvd2mysqlloader_spark.operators.graph import connected_components


def _cc(spark, nodes, edges):
    ndf = spark.createDataFrame([(n,) for n in nodes], ["id"])
    edf = (spark.createDataFrame([(s, d) for s, d in edges], ["src", "dst"])
           if edges else
           spark.createDataFrame([], "src BIGINT, dst BIGINT"))
    out = connected_components(ndf, edf).collect()
    return {r["id"]: r["component"] for r in out}


def test_chain_propagates_min_to_far_end(spark):
    # 1-2-3-4-5-6-7: diameter 6 -> several propagation rounds
    got = _cc(spark, range(1, 8), [(i, i + 1) for i in range(1, 7)])
    assert got == {i: 1 for i in range(1, 8)}


def test_two_components_and_isolated_vertex(spark):
    got = _cc(spark, [1, 2, 3, 10, 11, 99],
              [(2, 1), (3, 2), (11, 10)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_edge_orientation_irrelevant(spark):
    fwd = _cc(spark, [1, 2, 3], [(1, 2), (2, 3)])
    rev = _cc(spark, [1, 2, 3], [(2, 1), (3, 2)])
    assert fwd == rev == {1: 1, 2: 1, 3: 1}


def test_two_stars_merged_by_bridge(spark):
    # stars around 1 and 10 merge through the 5-10 bridge -- the
    # exact+prefix two-relation merge the dedup query relies on
    edges = [(2, 1), (3, 1), (4, 1), (11, 10), (12, 10), (5, 1), (5, 10)]
    got = _cc(spark, [1, 2, 3, 4, 5, 10, 11, 12], edges)
    assert set(got.values()) == {1}


def test_self_loops_and_duplicate_edges_tolerated(spark):
    got = _cc(spark, [1, 2], [(1, 1), (2, 1), (1, 2), (2, 1)])
    assert got == {1: 1, 2: 1}
