"""Lloyd k-means verified bit-for-bit against a numpy twin.

The twin replays the exact same arithmetic the Spark operator uses:
float64 argmin distances (same numpy ops as the pandas_udf) and the
fixed-point-micros integer M-step — so assignments and centroids must
match EXACTLY, not approximately. Also pins the operator's invariants:
reproducibility across partitionings and k-row init traffic.
"""

from __future__ import annotations

import numpy as np
import pytest

from nvd2mysqlloader_spark.operators.kmeans import (
    init_centroids, kmeans, lloyd_assignments, update_centroids)
from nvd2mysqlloader_spark.sources.tpch import load_table

from .conftest import SF_SMOKE

K, ITERS = 8, 3


def _numpy_twin(vecs: dict[int, np.ndarray], cents: np.ndarray,
                iters: int) -> dict[int, int]:
    ids = sorted(vecs)
    m = np.array([vecs[i] for i in ids], dtype=np.float64)

    def assign(c):
        # identical expression to operators.kmeans._assign_udf
        d2 = (c ** 2).sum(axis=1)[None, :] - 2.0 * (m @ c.T)
        return d2.argmin(axis=1)

    for _ in range(iters):
        a = assign(cents)
        new = cents.copy()
        for cl in range(len(cents)):
            rows = m[a == cl]
            if len(rows):
                micros = np.round(rows * 1e6).astype(np.int64)
                new[cl] = (micros.sum(axis=0) / 1e6) / len(rows)
        cents = new
    return dict(zip(ids, assign(cents)))


@pytest.fixture(scope="module")
def emb(spark):
    df = load_table(spark, SF_SMOKE, "embeddings").cache()
    yield df
    df.unpersist()


def test_kmeans_matches_numpy_twin_exactly(spark, emb):
    cents = init_centroids(emb, K)
    got = {r.vec_id: r.cluster
           for r in kmeans(emb, k=K, iters=ITERS).collect()}
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    want = _numpy_twin(vecs, cents, ITERS)
    assert got == want


def test_kmeans_invariant_under_repartitioning(spark, emb):
    a = {r.vec_id: r.cluster for r in kmeans(emb, k=K, iters=1).collect()}
    b = {r.vec_id: r.cluster
         for r in kmeans(emb.repartition(13), k=K, iters=1).collect()}
    assert a == b


def test_update_keeps_empty_cluster_centroid(spark, emb):
    cents = init_centroids(emb, K)
    # force an unreachable centroid: nothing assigns to a far point
    far = cents.copy()
    far[0] = 1e9
    assigned = lloyd_assignments(emb, far)
    new = update_centroids(assigned, far)
    assert (new[0] == far[0]).all()          # untouched, not NaN
    assert not np.isnan(new).any()


def test_init_is_k_rows_and_deterministic(spark, emb):
    c1 = init_centroids(emb, K)
    c2 = init_centroids(emb.repartition(7), K)
    assert c1.shape == (K, 64)
    assert (c1 == c2).all()
