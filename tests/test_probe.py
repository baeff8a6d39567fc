"""Linear probe (ridge) — the distributed closed-form trainer must be
bit-identical to a local numpy twin (exact integer Gram accumulation
makes the weights partitioning-independent), and its guarantees
(never loses to the mean predictor; JVM-side scoring matches numpy)
hold on real fixture embeddings."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nvd2mysqlloader_spark.operators.linear_probe import (SCALE, ridge_fit,
                                                          ridge_predict)
from nvd2mysqlloader_spark.sources.tpch import load_table

from .conftest import SF_ORACLE


def _numpy_twin(X: np.ndarray, y: np.ndarray, l2: float):
    n, d = X.shape
    xq = np.rint(X * SCALE).astype(np.int64)
    xq = np.hstack([xq, np.full((n, 1), SCALE, dtype=np.int64)])
    yq = np.rint(y * SCALE).astype(np.int64)
    g = (xq.T @ xq).astype(np.float64) / (SCALE * SCALE)
    b = (xq.T @ yq).astype(np.float64) / (SCALE * SCALE)
    reg = np.eye(d + 1) * (l2 * n)
    reg[-1, -1] = 0.0
    w = np.linalg.solve(g + reg, b)
    return w[:-1], float(w[-1])


def _fixture(spark):
    emb = (load_table(spark, SF_ORACLE, "embeddings")
           .select("vec_id", "embedding",
                   F.col("label").cast("double").alias("y")))
    rows = emb.orderBy("vec_id").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    y = np.array([r["y"] for r in rows], dtype=np.float64)
    return emb, X, y


def test_ridge_fit_matches_numpy_twin_bitexact(spark):
    emb, X, y = _fixture(spark)
    for parts in (3, 16):
        w, bias = ridge_fit(emb.repartition(parts), "embedding", "y")
        tw, tb = _numpy_twin(X, y, 1e-3)
        # exact integer partials -> identical float64 normal equations
        # -> identical LAPACK solve, under ANY partitioning
        assert bias == tb, parts
        assert np.array_equal(w, tw), parts


def test_ridge_never_loses_to_mean_and_jvm_scoring_matches(spark):
    emb, X, y = _fixture(spark)
    w, bias = ridge_fit(emb, "embedding", "y")
    pred = X @ w + bias
    sse = ((y - pred) ** 2).sum()
    ssm = ((y - y.mean()) ** 2).sum()
    assert sse <= ssm * (1 + 1e-9)
    # the fixture embeddings carry real label signal — the probe
    # should beat the mean by a clear margin, not epsilon
    assert sse < 0.95 * ssm

    got = (emb.select("vec_id",
                      ridge_predict("embedding", w, bias).alias("p"))
           .orderBy("vec_id").collect())
    jvm = np.array([r["p"] for r in got])
    assert np.allclose(jvm, pred, rtol=1e-12, atol=1e-12)


def test_ridge_exact_at_bound_magnitudes_single_partition(spark):
    """Regression: per-chunk partials must EMIT per chunk, not
    accumulate across a whole Arrow batch in int64 — 10k rows at the
    guard-edge magnitudes (|x|=8, |y|=128) in ONE partition used to
    wrap b past 2^63 and return garbage weights silently."""
    rows = [([8.0 if i % 2 else -8.0, -8.0 if i % 2 else 8.0],
             128.0 if i % 2 else -128.0) for i in range(10_000)]
    df = (spark.createDataFrame(rows, "embedding: array<double>, y: double")
          .coalesce(1))
    w, bias = ridge_fit(df, "embedding", "y")
    # y = 8*x0 exactly (x1 = -x0): the fit must recover a perfect
    # predictor (up to ridge shrinkage), nowhere near sign-flipped
    pred0 = w[0] * 8.0 + w[1] * -8.0 + bias
    assert abs(pred0 - 128.0) < 1.0, (w, bias)


def test_ridge_rejects_non_finite(spark):
    bad = spark.createDataFrame(
        [([1.0, float("nan")], 1.0), ([0.5, 0.5], 2.0)],
        "embedding: array<double>, y: double")
    with pytest.raises(Exception, match="non-finite"):
        ridge_fit(bad, "embedding", "y")
    bad_y = spark.createDataFrame(
        [([1.0, 0.0], None), ([0.5, 0.5], 2.0)],
        "embedding: array<double>, y: double")
    with pytest.raises(Exception, match="non-finite"):
        ridge_fit(bad_y, "embedding", "y")


def test_ridge_fit_guards(spark):
    bad = spark.createDataFrame([([100.0, 0.0], 1.0)], "embedding: array<double>, y: double")
    with pytest.raises(Exception, match="exact-arithmetic bound"):
        ridge_fit(bad, "embedding", "y")
    empty = spark.createDataFrame([], "embedding: array<double>, y: double")
    with pytest.raises(ValueError, match="empty input"):
        ridge_fit(empty, "embedding", "y")
