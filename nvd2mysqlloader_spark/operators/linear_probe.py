"""Linear probe (ridge regression) over an embedding column —
closed-form distributed training, the standard "is this signal
linearly decodable from the embeddings?" curation tool (and the
quality-classifier shape: score = w·x applied corpus-wide).

The reference has no ML loop at all (nvd2mysqlloader.py is a loader);
this extends the engine's iterative family (operators/kmeans.py) with
the CLOSED-FORM member: normal equations mean training is ONE
aggregation pass, no iteration.

100 TB design:
  * the corpus contributes only Gram partials — each task emits at
    most (d+1)² + (d+1) rows regardless of row count (map-side
    combine), and the driver solve touches a (d+1)×(d+1) matrix,
    never data. Training cost is one scan + one kilobyte-scale
    shuffle; the corpus is never collected, sampled, or shuffled.
  * accumulation is EXACT: features quantize to fixed-point ints
    (scale 2^20 — the kmeans/embedding_centroids discipline), per-task
    partials are int64 numpy matmuls (element products ≤ 2^40-ish,
    chunked so sums stay far from 2^63), and cross-task sums ride in
    DECIMAL(38,0). The trained weights are therefore bit-identical
    under any partitioning — reruns and cluster topologies agree.
  * scoring stays JVM-side: w broadcasts as an array literal and the
    prediction is a zip_with/aggregate fold — no Python in the
    corpus-wide path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1 << 20          # fixed-point feature scale (micros-like)
_CHUNK = 4096            # rows per exact int64 partial matmul
_MAX_ABS = 8.0           # |feature| bound keeping int64 partials exact


def _gram_partials(df: DataFrame, feature_col: str,
                   target_col: str) -> DataFrame:
    """Per-task exact Gram partials: (i, j, v) for the augmented
    [x, 1] design matrix (j == d+1 column is the target moment row
    X'y; i == j == d is the bias/count block). v is int64 exact."""

    def emit(batches):
        for pdf in batches:
            x = np.array(pdf[feature_col].tolist(), dtype=np.float64)
            y = pdf[target_col].to_numpy(dtype=np.float64)
            if x.size == 0:
                continue
            # isfinite also rejects NaN/None rows: NaN slides past a
            # plain > comparison and np.rint(nan) lands INT64_MIN —
            # silent garbage where the module promises exactness
            if not (np.isfinite(x).all() and np.isfinite(y).all()):
                raise ValueError(
                    "linear_probe: non-finite feature/target — clean "
                    "NaN/NULL rows before fitting")
            if np.abs(x).max() > _MAX_ABS or np.abs(y).max() > _MAX_ABS * 16:
                raise ValueError(
                    "linear_probe: feature/target magnitude exceeds the "
                    f"exact-arithmetic bound (|x|<={_MAX_ABS}) — "
                    "normalize inputs first")
            n, d = x.shape
            xq = np.rint(x * SCALE).astype(np.int64)
            xq = np.hstack([xq, np.full((n, 1), SCALE, dtype=np.int64)])
            yq = np.rint(y * SCALE).astype(np.int64)
            # one partial EMISSION per chunk: accumulating chunks into
            # a batch-level int64 would overflow silently at the bound
            # magnitudes (b element worst case per chunk is already
            # ~2^62); the groupBy below sums chunk partials in
            # DECIMAL(38,0), which is where cross-chunk growth belongs
            idx = np.indices((d + 1, d + 1)).reshape(2, -1)
            parts = []
            for lo in range(0, n, _CHUNK):
                cx, cy = xq[lo:lo + _CHUNK], yq[lo:lo + _CHUNK]
                g = cx.T @ cx
                b = (cx * cy[:, None]).sum(axis=0)
                parts.append(pd.DataFrame(
                    {"i": idx[0], "j": idx[1], "v": g.ravel()}))
                parts.append(pd.DataFrame(
                    {"i": np.arange(d + 1),
                     "j": np.full(d + 1, d + 1), "v": b}))
            yield pd.concat(parts, ignore_index=True)

    return (df.select(feature_col, target_col)
            .mapInPandas(emit, "i int, j int, v long")
            .groupBy("i", "j")
            .agg(F.sum(F.col("v").cast("decimal(38,0)")).alias("v")))


def ridge_fit(df: DataFrame, feature_col: str, target_col: str,
              l2: float = 1e-3) -> tuple[np.ndarray, float]:
    """Train ridge weights in one distributed pass. Returns (w, bias)
    with w of length d. The L2 penalty applies to w only (bias
    unpenalized, so the fit can never lose to the mean predictor:
    at the optimum SSE(w*) + λ||w*||² <= SSE(mean baseline))."""
    rows = _gram_partials(df, feature_col, target_col).collect()
    if not rows:
        raise ValueError("ridge_fit: empty input")
    dim = max(r["i"] for r in rows) + 1          # d + 1 (bias-augmented)
    g = np.zeros((dim, dim), dtype=np.float64)
    b = np.zeros(dim, dtype=np.float64)
    for r in rows:
        v = float(r["v"]) / (SCALE * SCALE)
        if r["j"] == dim:
            b[r["i"]] = v
        else:
            g[r["i"], r["j"]] = v
    n = g[dim - 1, dim - 1]                      # bias·bias block == count
    reg = np.eye(dim) * (l2 * n)
    reg[dim - 1, dim - 1] = 0.0                  # bias unpenalized
    w = np.linalg.solve(g + reg, b)
    return w[:-1], float(w[-1])


def ridge_predict(feature_col: str | Column, w: np.ndarray,
                  bias: float) -> Column:
    """w·x + b as a pure-JVM fold (zip_with + aggregate HOFs): the
    weights travel as an array literal inside the plan, so corpus-wide
    scoring is a narrow map with whole-stage codegen — no UDF."""
    col = F.col(feature_col) if isinstance(feature_col, str) else feature_col
    wl = F.lit([float(x) for x in w]).cast("array<double>")
    prods = F.zip_with(col.cast("array<double>"), wl,
                       lambda x, y: x * y)
    return F.aggregate(prods, F.lit(float(bias)),
                       lambda acc, p: acc + p)
