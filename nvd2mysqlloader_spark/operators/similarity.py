"""Approximate nearest-neighbor search over embedding columns.

Brute-force cosine top-k (plans.vector_queries.cosine_topk) is the
exact baseline; this module is the scale path: random-hyperplane
(sign-bit) signatures, banded into LSH tables — candidates share at
least one full band with the query — then exact cosine only on the
candidate set and a ranking window for top-k.

Cost model at 100 TB: signature computation is one narrow map over the
corpus (64 bits/vector); the band join shuffles (band_idx, band_hash)
pairs instead of raw vectors; exact scoring touches only candidates.
Recall tunes with (bits per band, number of bands) exactly like
MinHash banding — more bands = higher recall, more candidates.

The multi-plane projection is a vectorized Arrow UDF (one numpy
matmul per batch): measured orders faster than 64 interpreted
``aggregate`` folds per row, and the hyperplanes are a deterministic
seeded matrix so results are stable across runs and executors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._lineage import cut_lineage
from pyspark.sql import types as T

from ..functions.vectors import cosine


def _planes(dim: int, n_bits: int, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def hyperplane_bits_udf(dim: int, n_bits: int = 64, seed: int = 11):
    """array<float> → bigint whose low ``n_bits`` are sign bits of the
    projections onto the seeded hyperplanes."""
    planes = _planes(dim, n_bits, seed)
    weights = (1 << np.arange(n_bits, dtype=np.uint64))

    @F.pandas_udf(T.LongType())
    def bits(embs: pd.Series) -> pd.Series:
        x = np.stack(embs.to_numpy())                  # (batch, dim)
        signs = (x @ planes.T) > 0                     # (batch, n_bits)
        packed = (signs.astype(np.uint64) * weights).sum(axis=1)
        return pd.Series(packed.astype(np.int64))

    return bits


def _banded(df: DataFrame, id_col: str, sig_col: str, bands: int,
            bits_per_band: int) -> DataFrame:
    mask = (1 << bits_per_band) - 1
    return df.select(
        id_col,
        F.posexplode(F.array(*[
            F.shiftright(F.col(sig_col), b * bits_per_band)
             .bitwiseAND(F.lit(mask))
            for b in range(bands)]))
        .alias("band_idx", "band_val"))



def _rescore_topk(corpus: DataFrame, cand: DataFrame, q_sig: DataFrame,
                  k: int, id_col: str, emb_col: str, query_id_col: str,
                  exclude_self: bool) -> DataFrame:
    """Shared tail of every ANN path: broadcast the candidate ids and
    query vectors into the corpus scan, exact-cosine score, window-rank
    to top k. ``exclude_self`` drops neighbor_id == query_id — correct
    when queries are drawn FROM the corpus (shared id namespace); pass
    False when query ids are an independent namespace, or a legitimate
    neighbor that happens to share the id number would be lost."""
    scored = (corpus.select(id_col, emb_col)
              .join(F.broadcast(cand), id_col)
              .join(F.broadcast(q_sig.select(query_id_col, "q_emb")),
                    query_id_col))
    if exclude_self:
        scored = scored.filter(F.col(id_col) != F.col(query_id_col))
    scored = scored.select(
        query_id_col, F.col(id_col).alias("neighbor_id"),
        cosine(F.col("q_emb"), F.col(emb_col)).alias("cos_sim"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"),
                                                 F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def ann_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", emb_col: str = "embedding",
             query_id_col: str = "query_id",
             bands: int = 16, bits_per_band: int = 4,
             seed: int = 11, exclude_self: bool = True) -> DataFrame:
    """LSH-bucketed approximate top-k: (query_id, neighbor_id, cos_sim,
    rank) for each query, neighbors drawn from corpus rows sharing ≥1
    signature band with the query.

    ``queries`` needs (query_id_col, emb_col); ``corpus`` needs
    (id_col, emb_col). Exact cosine is computed only for candidates.

    Default banding (16 bands × 4 bits) is tuned for weakly-correlated
    corpora (top-neighbor cosine ≈ 0.3-0.4 in the synthetic embeddings
    — per-bit agreement ~0.62): measured recall@10 = 0.9 vs the exact
    baseline. For high-similarity corpora (near-dup embeddings) use
    fewer, wider bands (8×8) to cut the candidate count.
    """
    dim = len(corpus.select(emb_col).first()[0])
    n_bits = bands * bits_per_band
    bits = hyperplane_bits_udf(dim, n_bits, seed)

    c_sig = corpus.select(id_col, emb_col, bits(emb_col).alias("sig"))
    q_sig = queries.select(query_id_col, F.col(emb_col).alias("q_emb"),
                           bits(emb_col).alias("sig"))

    # query side is tiny → broadcast its bands and its vectors so the
    # corpus is scanned once and NEVER shuffled: the only wide exchange
    # is the distinct over candidate id pairs (ids, not vectors)
    cb = _banded(c_sig, id_col, "sig", bands, bits_per_band)
    qb = _banded(q_sig, query_id_col, "sig", bands, bits_per_band)
    cand = (cb.join(F.broadcast(qb), ["band_idx", "band_val"])
            .select(query_id_col, id_col).distinct())
    return _rescore_topk(c_sig, cand, q_sig, k, id_col, emb_col,
                         query_id_col, exclude_self)


# ---------------------------------------------------------------------------
# Incremental ANN maintenance — the 100 TB operating mode (mirror of
# operators.dedup's persisted MinHash signature table): hyperplane
# signatures are computed ONCE per corpus vector and persisted; every
# query batch probes the table — no per-query re-encoding of the
# corpus, and new corpus batches append their own signatures.


def write_ann_signature_table(corpus: DataFrame, path: str,
                              id_col: str = "vec_id",
                              emb_col: str = "embedding",
                              n_bits: int = 64, seed: int = 11,
                              mode: str = "append") -> None:
    """Persist (id, sig) hyperplane signatures for a corpus batch.

    Banding happens at probe time so (bands × bits_per_band) can be
    retuned without rebuilding; ``seed`` must match between build and
    probe (same hyperplanes)."""
    dim = len(corpus.select(emb_col).first()[0])
    bits = hyperplane_bits_udf(dim, n_bits, seed)
    corpus.select(id_col, bits(emb_col).alias("sig")) \
          .write.mode(mode).parquet(path)


def ann_topk_from_signatures(corpus: DataFrame, sig_path: str,
                             queries: DataFrame, k: int = 10,
                             id_col: str = "vec_id",
                             emb_col: str = "embedding",
                             query_id_col: str = "query_id",
                             bands: int = 16, bits_per_band: int = 4,
                             seed: int = 11,
                             exclude_self: bool = True) -> DataFrame:
    """``ann_topk`` against a PERSISTED signature table: identical
    results (same hyperplanes → same bands → same candidates → same
    exact-cosine ranking), but the corpus-side encode is a parquet
    scan of k-longs-per-doc instead of an Arrow matmul over raw
    vectors. ``corpus`` supplies vectors only for the exact rescore of
    candidates (broadcast-joined — the corpus is scanned, never
    shuffled)."""
    spark = corpus.sparkSession
    c_sig = spark.read.parquet(sig_path)
    dim = len(queries.select(emb_col).first()[0])
    bits = hyperplane_bits_udf(dim, bands * bits_per_band, seed)
    q_sig = queries.select(query_id_col, F.col(emb_col).alias("q_emb"),
                           bits(emb_col).alias("sig"))
    cb = _banded(c_sig, id_col, "sig", bands, bits_per_band)
    qb = _banded(q_sig, query_id_col, "sig", bands, bits_per_band)
    cand = (cb.join(F.broadcast(qb), ["band_idx", "band_val"])
            .select(query_id_col, id_col).distinct())
    return _rescore_topk(corpus, cand, q_sig, k, id_col, emb_col,
                         query_id_col, exclude_self)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the scale path for corpora where hyperplane
# LSH degenerates (weak similarity structure → near-uniform sign bits).


def _centroids_from_corpus(corpus: DataFrame, emb_col: str, id_col: str,
                           nlist: int) -> np.ndarray:
    """Deterministic centroid set: an evenly-strided sample of corpus
    vectors by id rank (no RNG, no k-means iterations — at 100 TB a
    one-pass strided sample is the pragmatic seeding; swap in k-means||
    via pyspark.ml.clustering.KMeans when iterative refinement pays)."""
    n = corpus.count()
    stride = max(1, n // nlist)
    rows = (corpus.select(id_col, emb_col)
            .filter((F.col(id_col) % stride) == 0)
            .orderBy(id_col).limit(nlist).collect())
    return np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])


def _assign_udf(centroids: np.ndarray, top: int = 1):
    """array<float> → int list id(s): argmax cosine against the
    centroid matrix, one numpy matmul per Arrow batch."""
    norm_c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(embs: pd.Series) -> pd.Series:
        x = np.stack(embs.to_numpy()).astype(np.float64)
        x = x / np.clip(np.linalg.norm(x, axis=1, keepdims=True), 1e-12, None)
        sims = x @ norm_c.T                          # (batch, nlist)
        idx = np.argsort(-sims, axis=1)[:, :top]
        return pd.Series([row.astype("int32").tolist() for row in idx])

    return assign


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", emb_col: str = "embedding",
             query_id_col: str = "query_id",
             nlist: int = 16, nprobe: int = 4,
             centroids: "np.ndarray | None" = None,
             exclude_self: bool = True) -> DataFrame:
    """IVF approximate top-k: corpus vectors assigned to their nearest
    centroid (inverted lists); each query probes its ``nprobe`` nearest
    lists; exact cosine over ~nprobe/nlist of the corpus.

    Same no-corpus-shuffle discipline as ann_topk: assignments are a
    narrow map, query probes broadcast, the corpus is scanned once.

    Measured on the synthetic (weakly-structured) embeddings:
    nlist=16/nprobe=4 scans 25% of the corpus for recall@10 ≈ 0.6 —
    ~2.5× better than the scanned fraction. On clustered real-world
    embeddings the gap widens; on adversarially-uniform ones no
    partition-based ANN beats the scan fraction by much (use the
    brute-force path there).

    ``centroids``: pass a trained (nlist×d) matrix — e.g. from
    ``operators.kmeans.kmeans`` Lloyd iterations — to replace the
    strided seed; measured +0.06 recall at the same scan fraction on
    the synthetic embeddings (0.56 → 0.62), more on clustered data.
    """
    cents = (centroids if centroids is not None
             else _centroids_from_corpus(corpus, emb_col, id_col, nlist))
    c_list = (corpus.select(id_col, emb_col,
                            F.element_at(_assign_udf(cents, 1)(emb_col), 1)
                            .alias("list_id")))
    q_probe = (queries.select(query_id_col, F.col(emb_col).alias("q_emb"),
                              F.explode(_assign_udf(cents, nprobe)(emb_col))
                              .alias("list_id")))
    scored = c_list.join(F.broadcast(q_probe), "list_id")
    if exclude_self:        # queries drawn from the corpus (shared ids)
        scored = scored.filter(F.col(id_col) != F.col(query_id_col))
    scored = scored.select(
        query_id_col, F.col(id_col).alias("neighbor_id"),
        cosine(F.col("q_emb"), F.col(emb_col)).alias("cos_sim"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"),
                                                 F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN — the compressed-scan path. At 100 TB
# raw float32 embeddings are the storage/IO bottleneck; PQ stores m
# bytes per vector (here m=8 → 32-64× smaller than the raw column) and
# scans codes with per-query lookup tables (ADC), so the whole corpus
# pass is a narrow map over a tiny column with NO shuffle of vectors.
# Candidates are exact-rescored like every other ANN path here.


def pq_train(mat: np.ndarray, m: int = 8, ksub: int = 16,
             iters: int = 5) -> list[np.ndarray]:
    """Per-subspace k-means codebooks over an (n × d) float64 matrix.

    Deterministic: init takes an evenly-strided sample of the rows in
    norm-sorted stable order; Lloyd updates are plain numpy means. At
    100 TB this trains on a driver-side sample (codebooks are m·ksub·d
    doubles — broadcastable); training cost is independent of corpus
    size.
    """
    n = mat.shape[0]
    books = []
    for sub in np.array_split(mat, m, axis=1):
        order = np.argsort(np.linalg.norm(sub, axis=1), kind="stable")
        cents = sub[order[::max(1, n // ksub)][:ksub]].copy()
        if cents.shape[0] < ksub:                     # tiny corpora
            reps = -(-ksub // cents.shape[0])
            cents = np.tile(cents, (reps, 1))[:ksub]
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                pts = sub[assign == c]
                if len(pts):
                    cents[c] = pts.mean(axis=0)
        books.append(cents)
    return books


def pq_encode_udf(books: list[np.ndarray], splits: list[int]):
    """array<float> → array<int> of m codebook indices (the PQ code)."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(embs: pd.Series) -> pd.Series:
        x = np.stack(embs.to_numpy()).astype(np.float64)
        x = x / np.clip(np.linalg.norm(x, axis=1, keepdims=True), 1e-12, None)
        subs = np.split(x, splits, axis=1)
        codes = np.stack([
            ((s[:, None, :] - b[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
            for s, b in zip(subs, books)], axis=1)    # (batch, m)
        return pd.Series([row.astype("int32").tolist() for row in codes])

    return encode


def pq_training_sample(corpus: DataFrame, emb_col: str = "embedding",
                       id_col: str = "vec_id",
                       train_n: int = 100_000) -> np.ndarray:
    """Bounded deterministic training sample: the ``train_n`` corpus
    vectors with the smallest md5(id) (same reproducible-uniform-draw
    pattern as operators.kmeans.init_centroids). TakeOrdered brings
    exactly min(n, train_n) rows to the driver — the driver-side
    matrix is bounded regardless of corpus size, which is all codebook
    training needs (quality comes from a sample, not the corpus)."""
    rows = (corpus
            .select(emb_col, F.md5(F.col(id_col).cast("string")).alias("h"),
                    id_col)
            .orderBy("h", id_col).limit(train_n).collect())
    mat = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    return mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True),
                         1e-12, None)


def pq_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
            id_col: str = "vec_id", emb_col: str = "embedding",
            query_id_col: str = "query_id",
            m: int = 8, ksub: int = 16, fetch_k: int | None = None,
            train_n: int = 100_000, exclude_self: bool = True,
            max_queries: int = 65_536,
            gather_bytes: int = 256 << 20,
            books: "list[np.ndarray] | None" = None) -> DataFrame:
    """PQ/ADC approximate top-k with exact rescoring.

    Plan shape: train codebooks on a bounded driver-side sample
    (``pq_training_sample``, ≤ ``train_n`` rows whatever the corpus
    size) → encode corpus (narrow Arrow map, m small ints per vector)
    → ADC scan: every partition scores its codes against per-query
    distance lookup tables (m × ksub doubles per query,
    closure-broadcast) and emits only its LOCAL top ``fetch_k`` per
    query — the shuffle carries O(partitions · queries · fetch_k)
    id/score pairs, never vectors — → global rank → exact-cosine
    rescore of candidates → top k.

    The query side is BROADCAST (every ANN path here assumes a small
    query batch vs a huge corpus), and that assumption is enforced:
    more than ``max_queries`` rows raises instead of OOMing the driver
    — at the default 65 536 the collected vectors are ≤ 0.5 GB even at
    d=1024, and the per-task LUT closure is nq·m·ksub doubles (64 MB
    at the defaults). For larger query sets, chunk the callers' side
    or join query↔corpus roles.

    On unit vectors ADC approximates L2² = 2 − 2·cos, so ascending ADC
    order is descending approximate cosine.

    ``books``: pass pre-trained codebooks (e.g. loaded from a
    persisted index, :func:`write_pq_index`) to skip training — the
    build-once/query-many path; otherwise codebooks are trained on a
    bounded corpus sample per call.
    """
    if books is None:
        mat = pq_training_sample(corpus, emb_col, id_col, train_n)
        books = pq_train(mat, m, ksub)
    splits = _book_splits(books)
    encoded = corpus.select(
        id_col, pq_encode_udf(books, splits)(emb_col).alias("code"))
    return _pq_adc_rescore(corpus, encoded, books, queries, k, fetch_k,
                           id_col, emb_col, query_id_col, exclude_self,
                           max_queries, gather_bytes)


def _book_splits(books: list[np.ndarray]) -> list[int]:
    """Column split points of the full vector into the codebooks'
    subspaces (np.split convention: cumulative, last omitted)."""
    return np.cumsum([b.shape[1] for b in books])[:-1].tolist()


_ADC_SCHEMA = T.StructType([
    T.StructField("query_id", T.LongType()),
    T.StructField("neighbor_id", T.LongType()),
    T.StructField("adc_d2", T.DoubleType()),
])


def _collect_query_batch(queries: DataFrame, query_id_col: str,
                         emb_col: str, max_queries: int,
                         caller: str) -> tuple[np.ndarray, np.ndarray]:
    """Bounded driver-side query collection shared by every ADC path:
    (ids, L2-normalized float64 matrix). limit(max+1) bounds the
    transfer even when the check fails — the driver never materializes
    an unbounded query set."""
    q_rows = (queries.select(query_id_col, emb_col)
              .limit(max_queries + 1).collect())
    if len(q_rows) > max_queries:
        raise ValueError(
            f"{caller}: query batch exceeds max_queries={max_queries} "
            "(the query side is driver-collected and closure-broadcast; "
            "chunk the query set or raise max_queries deliberately)")
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    q_mat = q_mat / np.clip(np.linalg.norm(q_mat, axis=1, keepdims=True),
                            1e-12, None)
    return q_ids, q_mat


def _adc_gather(luts: np.ndarray, g_ids: np.ndarray, codes: np.ndarray,
                ids: np.ndarray, fetch_k: int, gather_bytes: int):
    """ONE vectorized gather per (code block, query chunk):
    lut_c[:, jj, codes] broadcasts the (n, m) code matrix against the
    chunk's (c, m, ksub) LUTs into a (c, n, m) gather summed over
    subspaces; queries are chunked so the gather stays under the byte
    budget. Yields local-top candidate frames. Shared by the flat-PQ
    and IVF-PQ scans so the budget discipline cannot drift."""
    n, m = codes.shape
    jj = np.arange(m)
    k_eff = min(fetch_k, n)
    chunk = max(1, gather_bytes // (8 * n * m))
    for s in range(0, len(g_ids), chunk):
        lut_c = luts[s:s + chunk]                     # (c, m, ksub)
        d2 = lut_c[:, jj[None, :], codes].sum(axis=2)  # (c, n)
        top = np.argsort(d2, axis=1, kind="stable")[:, :k_eff]
        yield pd.DataFrame({
            "query_id": np.repeat(g_ids[s:s + chunk], k_eff),
            "neighbor_id": ids[top].ravel(),
            "adc_d2": np.take_along_axis(d2, top, axis=1).ravel()})


def _rank_and_rescore(cand: DataFrame, corpus: DataFrame,
                      queries: DataFrame, k: int, fetch_k: int,
                      id_col: str, emb_col: str, query_id_col: str,
                      exclude_self: bool) -> DataFrame:
    """Shared candidate tail of every ADC path: global rank of the
    local-top (id, adc_d2) pairs, then broadcast exact-cosine rescore
    against the corpus and final top-k."""
    if exclude_self:        # queries drawn from the corpus (shared ids)
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    wq = Window.partitionBy("query_id").orderBy(F.asc("adc_d2"),
                                                F.asc("neighbor_id"))
    cand = (cand.withColumn("r", F.row_number().over(wq))
            .filter(F.col("r") <= fetch_k).drop("r", "adc_d2"))
    q_emb = queries.select(F.col(query_id_col).alias("query_id"),
                           F.col(emb_col).alias("q_emb"))
    scored = (corpus.select(F.col(id_col).alias("neighbor_id"), emb_col)
              .join(F.broadcast(cand), "neighbor_id")
              .join(F.broadcast(q_emb), "query_id")
              .select("query_id", "neighbor_id",
                      cosine(F.col("q_emb"), F.col(emb_col)).alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _pq_adc_rescore(corpus: DataFrame, encoded: DataFrame,
                    books: list[np.ndarray], queries: DataFrame,
                    k: int, fetch_k: int | None, id_col: str,
                    emb_col: str, query_id_col: str, exclude_self: bool,
                    max_queries: int, gather_bytes: int,
                    scan_count_df: DataFrame | None = None) -> DataFrame:
    """Shared ADC tail of pq_topk and pq_topk_from_index: collect the
    (bounded) query batch, build per-query LUTs, scan the codes with
    one vectorized gather per (batch, query-chunk), rank, exact-cosine
    rescore candidates against the corpus."""
    m = len(books)
    # the candidate budget is the recall knob and must scale as a
    # corpus FRACTION at small corpora, not a constant: a fixed 50
    # candidates was 10% of a 500-vector corpus (recall 0.76) but
    # 2.5% of the 2000-vector sf0.1 one (recall 0.36 — measured; the
    # sf0.1 oracle sweep caught it). A 10% rescore fraction holds
    # recall at 0.76 on both fixture scales (8-byte m=8/ksub=16 codes
    # over d=64 are coarse — the ADC ranking needs that margin). The
    # fraction is CAPPED at 4096: the candidate relation downstream
    # is broadcast (nq · fetch_k rows), so an uncapped linear default
    # would trade the recall cliff for a driver-OOM cliff at 10^8+
    # vectors. Past ~40k vectors the default stops growing and recall
    # becomes an explicit choice: raise fetch_k, use finer codes
    # (m/ksub), or the composed IVF-PQ index. The count() here is one
    # extra metadata-cheap job, default path only. The denominator is
    # the relation the ADC actually SCANS (``scan_count_df``, i.e. the
    # persisted codes table in the from-index path — which can be
    # larger than a filtered rescore ``corpus``); sizing it from
    # ``corpus`` would silently shrink the budget fraction.
    if fetch_k is None:
        n_scan = (scan_count_df if scan_count_df is not None
                  else corpus).count()
        fetch_k = max(4 * k, 50, min(4096, -(-n_scan // 10)))
    splits = _book_splits(books)

    q_ids, q_mat = _collect_query_batch(queries, query_id_col, emb_col,
                                        max_queries, "pq_topk")
    # LUT[q, j, c] = ||q_sub_j − books[j][c]||²
    q_subs = np.split(q_mat, splits, axis=1)          # m × (nq, dsub_j)
    luts = np.stack([
        np.stack([((q_subs[j][i] - books[j]) ** 2).sum(axis=1)
                  for j in range(m)])
        for i in range(len(q_ids))])                  # (nq, m, ksub)

    def scan(batches):
        for b in batches:
            if len(b) == 0:
                continue
            codes = np.stack(b["code"].to_numpy())            # (n, m)
            ids = b[id_col].to_numpy()
            yield from _adc_gather(luts, q_ids, codes, ids,
                                   fetch_k, gather_bytes)

    cand = encoded.mapInPandas(scan, _ADC_SCHEMA)
    return _rank_and_rescore(cand, corpus, queries, k, fetch_k,
                             id_col, emb_col, query_id_col, exclude_self)


def semantic_dedup(corpus: DataFrame, k: int = 8, threshold: float = 0.9,
                   iters: int = 3, id_col: str = "vec_id",
                   emb_col: str = "embedding", margin: float = 1e-6,
                   max_cluster_rows: int = 200_000) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540 — public): k-means cluster the embedding space,
    search for near-duplicate pairs ONLY within each cluster, collapse
    pair groups transitively, keep one representative per group.

    Returns (``id_col``, cluster, rep_id, keep): ``keep`` is True for
    exactly one row per semantic-duplicate group — the min-id member —
    and for every non-duplicated row; filtering on it IS the dedup.

    Scale shape: the clustering is what bounds the quadratic — k
    clusters turn the all-pairs O(n²) into O(Σ|c|²) ≈ O(n²/k), and at
    100 TB ``k`` scales with the corpus so cluster sizes stay bounded
    (a cluster above ``max_cluster_rows`` raises with instructions to
    raise k rather than silently building an n²-sized task). Stages:
    kmeans (broadcast-closure argmin, corpus never shuffled; see
    operators.kmeans) → ONE shuffle grouping vectors by cluster → per-
    cluster Arrow matmul prefilter (margin-padded, provably lossless
    like cosine_candidate_pairs) → exact-fold rescore of candidates
    (ids broadcast into two corpus scans, no vector shuffle) →
    min-label connected components over the id-only pair edges.

    The emitted pair relation is EXACT: {(a,b) in the same cluster :
    cosine(a,b) >= threshold} — the "semantic" approximation relative
    to a full near-dup pass is only that cross-cluster pairs are not
    searched, which is SemDeDup's documented trade.
    """
    from .graph import connected_components_alternating
    from .kmeans import kmeans

    work = corpus.select(F.col(id_col).alias("vec_id"),
                         F.col(emb_col).alias("embedding"))
    assigned = kmeans(work, k=k, iters=iters)          # (vec_id, cluster)
    clustered = work.join(assigned, "vec_id")
    cut = threshold - margin

    def pairs_in_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_cluster_rows:
            raise ValueError(
                f"semantic_dedup: cluster of {len(pdf)} rows exceeds "
                f"max_cluster_rows={max_cluster_rows} — raise k so "
                "per-cluster pair search stays bounded")
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        ids = pdf["vec_id"].to_numpy()
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        mat /= np.clip(np.linalg.norm(mat, axis=1, keepdims=True),
                       1e-12, None)
        # CHUNKED matmul: a dense |c|×|c| similarity matrix is
        # |c|²·8 bytes (320 GB at the 200k row cap) — the row guard
        # bounds rows, this bounds the scoring buffer. Each block of
        # rows scores against the whole cluster under a 256 MB
        # budget; results are identical to the one-shot product.
        n = len(ids)
        block = max(1, (256 << 20) // (8 * n))
        outs_a, outs_b = [], []
        for s in range(0, n, block):
            ii, jj = np.nonzero(mat[s:s + block] @ mat.T >= cut)
            ia, jb = ids[s + ii], ids[jj]
            keep = ia < jb
            outs_a.append(ia[keep])
            outs_b.append(jb[keep])
        return pd.DataFrame(
            {"id_a": np.concatenate(outs_a).astype("int64"),
             "id_b": np.concatenate(outs_b).astype("int64")})

    cand = (clustered.groupBy("cluster")
            .applyInPandas(pairs_in_cluster, "id_a long, id_b long"))
    # exact rescore with the bit-deterministic fold + exact threshold
    # (the matmul margin only widens the candidate set, never the
    # result); candidates broadcast into both corpus scans
    exact = (work.select(F.col("vec_id").alias("id_a"),
                         F.col("embedding").alias("emb_a"))
             .join(F.broadcast(cand), "id_a")
             .join(work.select(F.col("vec_id").alias("id_b"),
                               F.col("embedding").alias("emb_b")), "id_b")
             .select("id_a", "id_b",
                     cosine(F.col("emb_a"), F.col("emb_b"))
                     .alias("cos_sim"))
             .filter(F.col("cos_sim") >= threshold))
    # CC only over EDGE ENDPOINTS: component propagation costs
    # O(rounds · touched-nodes), and a node with no near-dup edge is
    # trivially its own component — running CC over the full corpus
    # spine would scale the iterative joins with corpus size instead
    # of duplicate count. Non-endpoint rows rejoin via the coalesce
    # below. The alternating (large-star/small-star) variant bounds
    # rounds at O(log n) — near-dup chains would give min-label
    # propagation diameter-many rounds, and each round is a fixed
    # scheduling cost that dominates on the pruned graph (measured
    # 6.7 s → 4.1 s at sf0.1 for the CC stage alone).
    edges = exact.select(F.col("id_a").alias("src"),
                         F.col("id_b").alias("dst"))
    endpoints = (edges.select(F.col("src").alias("id"))
                 .union(edges.select(F.col("dst").alias("id")))
                 .distinct())
    comps = connected_components_alternating(endpoints, edges)
    return (clustered.select("vec_id", "cluster")
            .join(comps, F.col("vec_id") == F.col("id"), "left")
            .select(F.col("vec_id").alias(id_col), "cluster",
                    F.coalesce("component", F.col("vec_id"))
                    .alias("rep_id"),
                    (F.col("vec_id")
                     == F.coalesce("component", F.col("vec_id")))
                    .alias("keep")))


# ---------------------------------------------------------------------------
# Persisted IVF / PQ indexes — build-once/query-many (VERDICT r5 #2),
# completing the persisted-index story LSH (write_ann_signature_table)
# and MinHash (dedup.write_signature_table) already have. At 100 TB
# you train centroids/codebooks once, encode each corpus batch as it
# arrives (append-only), and every query batch probes the persisted
# index — no per-query re-derivation of anything corpus-sized.


def _read_centroids(spark, cdir: str) -> "np.ndarray | None":
    """Load a persisted (list_id, centroid) table as an ordered matrix;
    None when the index doesn't exist yet. Bounded collect: nlist rows."""
    try:
        rows = spark.read.parquet(cdir).orderBy("list_id").collect()
    except AnalysisException:
        return None
    return np.stack([np.asarray(r["centroid"], dtype=np.float64)
                     for r in rows])


def _write_centroids(spark, cdir: str, cents: np.ndarray) -> None:
    """Persist the coarse centroid matrix (one tiny single-file table
    — shared by the IVF and IVF-PQ builders)."""
    spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)],
        "list_id int, centroid array<double>"
    ).coalesce(1).write.parquet(cdir)


def _write_books(spark, bdir: str, books: list[np.ndarray]) -> None:
    """Persist PQ codebooks (m·ksub rows — shared by the flat-PQ and
    IVF-PQ builders)."""
    spark.createDataFrame(
        [(j, c, [float(x) for x in books[j][c]])
         for j in range(len(books)) for c in range(books[0].shape[0])],
        "sub_idx int, code_idx int, centroid array<double>"
    ).coalesce(1).write.parquet(bdir)


def write_ivf_index(corpus: DataFrame, path: str,
                    id_col: str = "vec_id", emb_col: str = "embedding",
                    nlist: int = 16,
                    centroids: "np.ndarray | None" = None) -> np.ndarray:
    """Build or extend a persisted IVF index at ``path``.

    Layout — the inverted file IS the storage layout:

    * ``{path}/centroids``: (list_id, centroid array<double>), written
      once at build time;
    * ``{path}/lists``: (id, embedding) PARTITIONED BY list_id — the
      corpus vectors clustered by their nearest centroid, so a probe
      with ``nprobe`` lists is a PARTITION-PRUNED scan of
      ~nprobe/nlist of the data, never a full corpus pass.

    First call trains/accepts centroids and creates both; later calls
    APPEND the new batch's vectors to their lists using the PERSISTED
    centroids (append-only incremental contract, mirror of
    dedup.write_signature_table). Passing ``centroids`` that differ
    from the persisted ones raises — mixed-centroid lists would make
    probes silently miss neighbors. Returns the centroid matrix in
    effect."""
    spark = corpus.sparkSession
    cdir, ldir = f"{path}/centroids", f"{path}/lists"
    existing = _read_centroids(spark, cdir)
    if existing is not None:
        if centroids is not None and not np.array_equal(
                np.asarray(centroids, dtype=np.float64), existing):
            raise ValueError(
                f"write_ivf_index: index at {path} was built with "
                "different centroids — appending under new centroids "
                "would split each logical list across incompatible "
                "layouts; rebuild the index instead")
        if centroids is None and nlist != existing.shape[0]:
            # mirror write_pq_index's shape check: silently appending
            # under the persisted 16 lists when the caller asked for
            # 32 would hand back an index whose scan fraction and
            # recall differ from what the caller tuned nprobe for
            raise ValueError(
                f"write_ivf_index: index at {path} has "
                f"nlist={existing.shape[0]} but the call asked for "
                f"nlist={nlist} — pass the matching nlist (appends "
                "always use the persisted centroids) or rebuild")
        cents = existing
    else:
        cents = np.asarray(
            centroids if centroids is not None
            else _centroids_from_corpus(corpus, emb_col, id_col, nlist),
            dtype=np.float64)
        _write_centroids(spark, cdir, cents)
    (corpus.select(
        id_col, emb_col,
        F.element_at(_assign_udf(cents, 1)(emb_col), 1).alias("list_id"))
     .repartition("list_id")      # one file per list, not per task
     .write.mode("append").partitionBy("list_id").parquet(ldir))
    return cents


def ivf_topk_from_index(index_path: str, queries: DataFrame, k: int = 10,
                        id_col: str = "vec_id",
                        emb_col: str = "embedding",
                        query_id_col: str = "query_id",
                        nprobe: int = 4,
                        exclude_self: bool = True) -> DataFrame:
    """``ivf_topk`` against a persisted index: identical results to the
    direct call with the same centroids (same assignment → same probed
    lists → same exact-cosine ranking), but the corpus side is a
    partition-pruned read of the probed lists only — the index layout,
    not a runtime filter, is what skips 1 − nprobe/nlist of the data.
    No corpus DataFrame needed: the inverted file carries the vectors."""
    spark = queries.sparkSession
    cents = _read_centroids(spark, f"{index_path}/centroids")
    if cents is None:
        raise ValueError(f"ivf_topk_from_index: no index at {index_path}")
    lists = spark.read.parquet(f"{index_path}/lists")
    q_probe = (queries.select(query_id_col, F.col(emb_col).alias("q_emb"),
                              F.explode(_assign_udf(cents, nprobe)(emb_col))
                              .alias("list_id")))
    scored = lists.join(F.broadcast(q_probe), "list_id")
    if exclude_self:
        scored = scored.filter(F.col(id_col) != F.col(query_id_col))
    scored = scored.select(
        query_id_col, F.col(id_col).alias("neighbor_id"),
        cosine(F.col("q_emb"), F.col(emb_col)).alias("cos_sim"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"),
                                                 F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _read_books(spark, bdir: str) -> "list[np.ndarray] | None":
    """Load persisted PQ codebooks as the ordered list-of-matrices
    pq_train produces; None when absent. Bounded collect: m·ksub rows."""
    try:
        rows = spark.read.parquet(bdir).orderBy("sub_idx",
                                                "code_idx").collect()
    except AnalysisException:
        return None
    books: dict[int, list] = {}
    for r in rows:
        books.setdefault(r["sub_idx"], []).append(
            np.asarray(r["centroid"], dtype=np.float64))
    return [np.stack(books[j]) for j in sorted(books)]


def write_pq_index(corpus: DataFrame, path: str,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   m: int = 8, ksub: int = 16,
                   train_n: int = 100_000) -> list[np.ndarray]:
    """Build or extend a persisted PQ index at ``path``.

    Layout: ``{path}/codebooks`` (sub_idx, code_idx, centroid
    array<double>) written once; ``{path}/codes`` (id, code
    array<int>) — m bytes of information per vector, appended per
    corpus batch. First call trains codebooks on a bounded sample of
    THIS batch; later calls encode with the PERSISTED codebooks
    (training again would silently make old and new codes mutually
    unreadable) and refuse an ``m``/``ksub`` that contradicts the
    persisted shape. Returns the codebooks in effect."""
    spark = corpus.sparkSession
    bdir, codir = f"{path}/codebooks", f"{path}/codes"
    books = _read_books(spark, bdir)
    if books is not None:
        if len(books) != m or books[0].shape[0] != ksub:
            raise ValueError(
                f"write_pq_index: index at {path} has m={len(books)}, "
                f"ksub={books[0].shape[0]} but the call asked for "
                f"m={m}, ksub={ksub} — codes would be mutually "
                "unreadable; match the persisted shape or rebuild")
    else:
        mat = pq_training_sample(corpus, emb_col, id_col, train_n)
        books = pq_train(mat, m, ksub)
        _write_books(spark, bdir, books)
    enc = pq_encode_udf(books, _book_splits(books))
    (corpus.select(id_col, enc(emb_col).alias("code"))
     .write.mode("append").parquet(codir))
    return books


def pq_topk_from_index(corpus: DataFrame, index_path: str,
                       queries: DataFrame, k: int = 10,
                       id_col: str = "vec_id", emb_col: str = "embedding",
                       query_id_col: str = "query_id",
                       fetch_k: int | None = None,
                       exclude_self: bool = True,
                       max_queries: int = 65_536,
                       gather_bytes: int = 256 << 20) -> DataFrame:
    """``pq_topk`` against a persisted index: identical results to the
    direct call with the same codebooks, but the ADC scan reads the
    persisted code column (m small ints per vector — the only
    corpus-sized thing touched) instead of re-encoding raw vectors.
    ``corpus`` supplies vectors ONLY for the exact rescore of
    candidates (broadcast-joined, never shuffled) — it MUST cover
    every indexed id (candidates whose id is absent from ``corpus``
    would silently vanish in the rescore join; to search a subset,
    filter the candidates, not the rescore relation). The default
    candidate budget is sized from the persisted codes relation (the
    thing actually scanned), so a ``corpus`` narrower than the index
    cannot shrink the recall fraction."""
    spark = corpus.sparkSession
    books = _read_books(spark, f"{index_path}/codebooks")
    if books is None:
        raise ValueError(f"pq_topk_from_index: no index at {index_path}")
    encoded = spark.read.parquet(f"{index_path}/codes")
    return _pq_adc_rescore(corpus, encoded, books, queries, k, fetch_k,
                           id_col, emb_col, query_id_col, exclude_self,
                           max_queries, gather_bytes,
                           scan_count_df=encoded)


# ---------------------------------------------------------------------------
# IVF-PQ — the composed billion-scale ANN structure (coarse inverted
# lists + product-quantized RESIDUALS): the coarse centroid absorbs
# the vector's position so the PQ codebooks only need to cover the
# residual neighborhood (tighter cells than flat PQ at the same m),
# and a probe touches nprobe/nlist of the codes — a partition-pruned
# scan of m-byte codes, the FAISS IVFPQ layout re-expressed as
# parquet tables.


def write_ivfpq_index(corpus: DataFrame, path: str,
                      id_col: str = "vec_id", emb_col: str = "embedding",
                      nlist: int = 16, m: int = 8, ksub: int = 16,
                      train_n: int = 100_000) -> None:
    """Build or extend a persisted IVF-PQ index at ``path``.

    Layout: ``{path}/centroids`` (coarse, as write_ivf_index),
    ``{path}/codebooks`` (trained on RESIDUALS x̂ − c_list of a
    bounded sample), ``{path}/codes`` (id, code) PARTITIONED BY
    list_id — probes prune to nprobe lists and read m small ints per
    vector. Appends reuse the persisted centroids AND codebooks
    (mismatched nlist/m/ksub refused), so incremental batches encode
    consistently forever."""
    spark = corpus.sparkSession
    cdir, bdir = f"{path}/centroids", f"{path}/codebooks"
    codir = f"{path}/codes"
    existing = _read_centroids(spark, cdir)
    if existing is not None and nlist != existing.shape[0]:
        raise ValueError(
            f"write_ivfpq_index: index at {path} has "
            f"nlist={existing.shape[0]}, call asked nlist={nlist}")
    if existing is None:
        cents = np.asarray(_centroids_from_corpus(
            corpus, emb_col, id_col, nlist), dtype=np.float64)
        cents /= np.clip(np.linalg.norm(cents, axis=1, keepdims=True),
                         1e-12, None)
        _write_centroids(spark, cdir, cents)
    else:
        cents = existing

    books = _read_books(spark, bdir)
    if books is not None and (len(books) != m
                              or books[0].shape[0] != ksub):
        raise ValueError(
            f"write_ivfpq_index: index at {path} has m={len(books)}, "
            f"ksub={books[0].shape[0]}; call asked m={m}, ksub={ksub}")
    if books is None:
        sample = pq_training_sample(corpus, emb_col, id_col, train_n)
        assign = np.argmax(sample @ cents.T, axis=1)
        books = pq_train(sample - cents[assign], m, ksub)
        _write_books(spark, bdir, books)

    splits = _book_splits(books)

    @F.pandas_udf("struct<list_id: int, code: array<int>>")
    def encode(embs: pd.Series) -> pd.DataFrame:
        x = np.stack(embs.to_numpy()).astype(np.float64)
        x /= np.clip(np.linalg.norm(x, axis=1, keepdims=True),
                     1e-12, None)
        lists = np.argmax(x @ cents.T, axis=1)
        resid = x - cents[lists]
        subs = np.split(resid, splits, axis=1)
        codes = np.stack([
            ((s[:, None, :] - b[None, :, :]) ** 2).sum(axis=2)
            .argmin(axis=1)
            for s, b in zip(subs, books)], axis=1)
        return pd.DataFrame({
            "list_id": lists.astype("int32"),
            "code": [row.astype("int32").tolist() for row in codes]})

    (corpus.select(id_col, encode(emb_col).alias("e"))
     .select(id_col, F.col("e.list_id").alias("list_id"),
             F.col("e.code").alias("code"))
     .repartition("list_id")
     .write.mode("append").partitionBy("list_id").parquet(codir))


def ivfpq_topk(corpus: DataFrame, index_path: str, queries: DataFrame,
               k: int = 10, id_col: str = "vec_id",
               emb_col: str = "embedding",
               query_id_col: str = "query_id",
               nprobe: int = 4, fetch_k: int | None = None,
               exclude_self: bool = True,
               max_queries: int = 65_536,
               gather_bytes: int = 256 << 20) -> DataFrame:
    """IVF-PQ probe: queries assign to their ``nprobe`` nearest coarse
    lists, the pruned codes scan is ADC-scored against PER-(query,
    list) residual LUTs (the query's residual differs per probed
    list), local top ``fetch_k`` per partition, global rank, exact
    rescore against the corpus. The query side is bounded by
    ``max_queries`` and the per-task gather by ``gather_bytes``,
    through the same shared helpers pq_topk uses — the disciplines
    cannot drift apart."""
    spark = corpus.sparkSession
    cents = _read_centroids(spark, f"{index_path}/centroids")
    books = _read_books(spark, f"{index_path}/codebooks")
    if cents is None or books is None:
        raise ValueError(f"ivfpq_topk: no index at {index_path}")
    m = len(books)
    # like flat PQ's fetch_k, the candidate budget scales as a
    # FRACTION — here of the SCANNED codes, estimated as
    # n·nprobe/nlist (uniform-list approximation; skewed argmax
    # assignments make this an estimate, and the cap below bounds the
    # error's blast radius). A fixed 50 was 40% of the scanned
    # sf0.01 codes (recall 0.46) but 10% at sf0.1 (recall 0.24 —
    # measured); half the scanned codes rescored holds recall at
    # 0.5-0.58 across both scales (residual-quantized ADC ranks are
    # noisier than flat PQ's, hence the larger fraction). Scanned
    # volume is sublinear in n only when nlist grows with the corpus
    # (production IVF sizing, nlist ~ sqrt(n)); with a FIXED nlist it
    # is linear, so the same 4096 cap as flat PQ bounds the broadcast
    # candidate relation — past that, recall is an explicit knob.
    # denominator = the persisted codes relation (what the probe
    # actually scans), NOT ``corpus`` — the rescore relation can be a
    # filtered subset and must not shrink the budget (same contract
    # as pq_topk_from_index).
    if fetch_k is None:
        n_indexed = spark.read.parquet(f"{index_path}/codes").count()
        scanned = n_indexed * nprobe // cents.shape[0]
        fetch_k = max(4 * k, 50, min(4096, -(-scanned // 2)))
    splits = _book_splits(books)

    q_ids, q_mat = _collect_query_batch(queries, query_id_col, emb_col,
                                        max_queries, "ivfpq_topk")
    probe_lists = np.argsort(-(q_mat @ cents.T), axis=1)[:, :nprobe]
    # LUTs per (query, probed list): residual q − c_list vs codebooks
    luts: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for li in np.unique(probe_lists):
        qi = np.nonzero((probe_lists == li).any(axis=1))[0]
        resid = q_mat[qi] - cents[li]
        r_subs = np.split(resid, splits, axis=1)
        lut = np.stack([
            np.stack([((r_subs[j][t] - books[j]) ** 2).sum(axis=1)
                      for j in range(m)])
            for t in range(len(qi))])                # (nq_l, m, ksub)
        luts[int(li)] = (q_ids[qi], lut)

    probed = sorted(int(x) for x in np.unique(probe_lists))
    codes_df = (spark.read.parquet(f"{index_path}/codes")
                .filter(F.col("list_id").isin(probed)))

    def scan(batches):
        for b in batches:
            if len(b) == 0:
                continue
            for li, grp in b.groupby("list_id"):
                ent = luts.get(int(li))
                if ent is None:
                    continue
                gq_ids, lut = ent
                codes = np.stack(grp["code"].to_numpy())     # (n, m)
                ids = grp[id_col].to_numpy()
                yield from _adc_gather(lut, gq_ids, codes, ids,
                                       fetch_k, gather_bytes)

    cand = codes_df.mapInPandas(scan, _ADC_SCHEMA)
    return _rank_and_rescore(cand, corpus, queries, k, fetch_k,
                             id_col, emb_col, query_id_col, exclude_self)


_PAIR_SCHEMA = T.StructType([T.StructField("id_a", T.LongType()),
                             T.StructField("id_b", T.LongType())])


def effective_block_rows(dim: int, block_rows: int = 200_000,
                         block_bytes: int = 256 << 20) -> int:
    """Rows per packed block for ``cosine_candidate_pairs``: the
    byte-budget bound ``block_bytes // (8·dim)`` (one block row is
    rows·dim float64s in a single JVM array, hard-capped at 2 GB),
    capped by ``block_rows`` for low dimensions."""
    return max(1, min(block_rows, block_bytes // (8 * max(1, dim))))


def cosine_candidate_pairs(corpus: DataFrame, threshold: float,
                           id_col: str = "vec_id",
                           emb_col: str = "embedding",
                           margin: float = 1e-6,
                           blocks: int | None = None,
                           block_rows: int = 200_000,
                           block_bytes: int = 256 << 20) -> DataFrame:
    """Candidate (id_a, id_b) pairs with cosine >= threshold - margin,
    id_a < id_b — the vectorized prefilter for exact near-dup search.

    Two physical strategies, same contract:

    * **broadcast** (n ≤ ``block_rows``, or ``blocks=1``): gather the
      L2-normalized corpus matrix once, broadcast it, and run one
      float64 numpy matmul per Arrow batch against it — measured ~25×
      faster than |corpus|² interpreted ``aggregate`` folds at 2k
      vectors. Fine to ~10^6×d of executor memory.
    * **blocked** (larger corpora, or explicit ``blocks=B>1``): rows
      are hashed into B buckets, each bucket packed into one block row
      (ids + matrix), and the B·(B+1)/2 bucket pairs b1 ≤ b2 become
      independent tasks — each multiplies ONE block pair, so driver
      and task memory are bounded by the block size, never n·d.
      Every unordered row pair lands in exactly one bucket pair, so
      no distinct is needed. The shuffle moves each block B/2 times
      (the unavoidable replication of all-pairs comparison); at 100 TB
      the LSH/ANN paths prune first and this runs on the pruned set.

    Block sizing is DIMENSION-AWARE: one packed block row holds
    ``rows·d`` float64s inside a single collect_list value, and the
    JVM caps any one array at 2 GB — a fixed 200k-row block is ~51 MB
    at d=32 but ~1.2 GB at d=768. The effective rows-per-block is
    ``min(block_rows, block_bytes // (8·d))`` (default budget 256 MB:
    two blocks coexisting per task stay ~0.5 GB, far from the
    ceiling); ``block_rows`` remains the low-dim cap.

    The margin covers the (≈1e-15 relative) accumulation-order
    difference between BLAS and the left-to-right fold, so no true
    pair can be lost; callers MUST rescore candidates with the exact
    fold and re-apply the threshold (see
    plans.vector_queries.cosine_near_dup).
    """
    if blocks is None:
        # dimension probe skips NULL embeddings; an empty (or all-null)
        # corpus short-circuits to an empty pair set — _pairs_broadcast
        # would np.stack an empty matrix and crash
        first = (corpus.select(emb_col)
                 .where(F.col(emb_col).isNotNull()).first())
        if first is None:
            return corpus.sparkSession.createDataFrame([], _PAIR_SCHEMA)
        d = len(first[0])
        eff_rows = effective_block_rows(d, block_rows, block_bytes)
        n = corpus.count()
        blocks = max(1, -(-n // eff_rows))
    if blocks <= 1:
        return _pairs_broadcast(corpus, threshold, id_col, emb_col, margin)
    return _pairs_blocked(corpus, threshold, id_col, emb_col, margin, blocks)


def _pairs_broadcast(corpus: DataFrame, threshold: float, id_col: str,
                     emb_col: str, margin: float) -> DataFrame:
    # reachable only when blocks <= 1, i.e. n <= effective_block_rows(d)
    # — so this toPandas() transfer is bounded by the same block_bytes
    # budget (default 256 MB) that sizes the blocked path's blocks
    pdf = corpus.select(id_col, emb_col).toPandas()
    ids_all = pdf[id_col].to_numpy()
    mat = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
    mat /= np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
    bc = corpus.sparkSession.sparkContext.broadcast((ids_all, mat))
    cut = threshold - margin

    def gen(batches):
        ref_ids, ref = bc.value
        for b in batches:
            if len(b) == 0:
                continue
            x = np.stack(b[emb_col].to_numpy()).astype(np.float64)
            x /= np.clip(np.linalg.norm(x, axis=1, keepdims=True),
                         1e-12, None)
            ii, jj = np.nonzero(x @ ref.T >= cut)
            ia, jb = b[id_col].to_numpy()[ii], ref_ids[jj]
            keep = ia < jb
            yield pd.DataFrame({"id_a": ia[keep], "id_b": jb[keep]})

    return corpus.mapInPandas(gen, _PAIR_SCHEMA)


def _pairs_blocked(corpus: DataFrame, threshold: float, id_col: str,
                   emb_col: str, margin: float, blocks: int) -> DataFrame:
    """Block-pair matmul: bucket rows, pack each bucket into one block
    row, cross-join bucket pairs b1 ≤ b2, one numpy multiply per task."""
    cut = threshold - margin
    bucketed = corpus.select(
        F.col(id_col).alias("_id"), F.col(emb_col).alias("_emb"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(blocks)).alias("_bkt"))
    # one pack for BOTH join sides: without the lineage cut the
    # corpus scan + shuffle into blocks executes twice (measured —
    # same ReuseExchange defeat operators/dedup.py documents);
    # cut_lineage upgrades to reliable checkpoint on a cluster
    blk = cut_lineage(
        bucketed.groupBy("_bkt")
        .agg(F.collect_list(F.struct("_id", "_emb")).alias("_rows")))
    pairs = (blk.select(F.col("_bkt").alias("b1"), F.col("_rows").alias("r1"))
             .join(blk.select(F.col("_bkt").alias("b2"),
                              F.col("_rows").alias("r2")),
                   F.col("b1") <= F.col("b2")))

    def unpack(rows) -> tuple[np.ndarray, np.ndarray]:
        ids = np.array([r["_id"] for r in rows], dtype=np.int64)
        mat = np.stack([np.asarray(r["_emb"], dtype=np.float64)
                        for r in rows])
        mat /= np.clip(np.linalg.norm(mat, axis=1, keepdims=True),
                       1e-12, None)
        return ids, mat

    def gen(batches):
        for b in batches:
            for _, row in b.iterrows():
                same = row["b1"] == row["b2"]
                ids1, m1 = unpack(row["r1"])
                ids2, m2 = (ids1, m1) if same else unpack(row["r2"])
                ii, jj = np.nonzero(m1 @ m2.T >= cut)
                ia, jb = ids1[ii], ids2[jj]
                if same:
                    keep = ia < jb          # each pair appears (i,j),(j,i)
                    ia, jb = ia[keep], jb[keep]
                else:                       # cross pair appears once
                    mask = ia != jb
                    ia, jb = ia[mask], jb[mask]
                    ia, jb = np.minimum(ia, jb), np.maximum(ia, jb)
                yield pd.DataFrame({"id_a": ia, "id_b": jb})

    return pairs.mapInPandas(gen, _PAIR_SCHEMA)
