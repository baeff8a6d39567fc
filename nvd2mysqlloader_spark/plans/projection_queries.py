"""Random-projection (Johnson–Lindenstrauss) dimensionality reduction
over ``embeddings`` — the standard cheap preprocessing step before
billion-scale ANN (project 64-d → 16-d with a ±1 matrix, index the
short vectors, rescore survivors at full width). North-star
extension; the reference has no vector surface at all.

Engine-exactness: the projection matrix is DETERMINISTIC — entry
(o, i) is ±1 from one md5 nibble (the repo's shared cross-engine hash
arithmetic) — and every projected coordinate and squared distance is
a left-to-right double fold (Spark ``aggregate`` HOF == DuckDB
``list_sum`` — the cosine_topk contract), so distortion ratios are
bit-identical and the JL guarantee is pinned as a hash-checked
verdict column, not narration.

Registered after every other module: appends must never reshuffle
the harness's fixed-size registry prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from .registry import query

_D = 64      # input dimensionality of the synthetic embeddings
_P = 16      # projected dimensionality
_NV = 10     # vec_id < _NV → 45 sample pairs
_LO, _HI = 0.1, 3.0   # pinned distortion band for the verdict

# ±1 from one md5 nibble of "jl:<out>:<in>" — E[||Rx||²] = P·||x||²
_SIGN_SQL = ("(CAST(('0x' || substr(md5('jl:' || o || ':' || i), 1, 1)) "
             "AS INT) % 2 * 2 - 1)")

_PROJ_SQL = f"""list_transform(range(0, {_P}), o ->
      list_sum(list_transform(range(0, {_D}), i ->
        CAST({_SIGN_SQL} AS DOUBLE)
        * CAST(embedding[i + 1] AS DOUBLE))))"""

_D2_SQL = """list_sum(list_transform(list_zip({a}, {b}), p ->
      (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
      * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"""


def _sign(o, i):
    return (F.conv(F.substring(F.md5(F.concat(
        F.lit("jl:"), o.cast("string"), F.lit(":"),
        i.cast("string"))), 1, 1), 16, 10).cast("int")
        % 2 * 2 - 1)


def _proj_col():
    return F.transform(
        F.sequence(F.lit(0), F.lit(_P - 1)),
        lambda o: F.aggregate(
            F.sequence(F.lit(0), F.lit(_D - 1)),
            F.lit(0.0),
            lambda acc, i: acc + _sign(o, i).cast("double")
            * F.element_at("embedding", i + F.lit(1)).cast("double")))


def _d2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double")
                                       - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0), lambda acc, v: acc + v)


@query(
    "jl_projection_distortion",
    oracle=f"""
    WITH pr AS MATERIALIZED (
      SELECT vec_id, embedding, {_PROJ_SQL} AS proj
      FROM embeddings WHERE vec_id < {_NV})
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_D2_SQL.format(a="a.embedding", b="b.embedding")} AS d2_orig,
           {_D2_SQL.format(a="a.proj", b="b.proj")} AS d2_proj,
           round({_D2_SQL.format(a="a.proj", b="b.proj")}
                 / ({_P} * {_D2_SQL.format(a="a.embedding",
                                           b="b.embedding")}), 6)
             AS distortion,
           {_D2_SQL.format(a="a.proj", b="b.proj")}
             / ({_P} * {_D2_SQL.format(a="a.embedding", b="b.embedding")})
             BETWEEN {_LO} AND {_HI} AS within_band
    FROM pr a JOIN pr b ON a.vec_id < b.vec_id
    """,
    doc=(
        "Johnson–Lindenstrauss projection distortion audit: project "
        "64-d embeddings to 16-d with the deterministic ±1 md5 "
        "matrix, then for every sample pair compare projected vs "
        "original squared distance (normalized by E[||Rx||²] = "
        "P·||x||²). Every coordinate is a left-to-right double fold "
        "shared bit-for-bit with the oracle, so the distortion "
        "ratios hash-match exactly and the JL band (0.1–3.0 at "
        "P=16) is a checked verdict column. At 100 TB the "
        "projection is a narrow map fused into the scan (no "
        "shuffle, no UDF) — the cheap front half of a "
        "project→index→rescore ANN pipeline; this query is the "
        "audit that the projection preserves geometry before the "
        "index is built on it."
    ),
)
def jl_projection_distortion(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pr = (emb.filter(F.col("vec_id") < _NV)
          .select("vec_id", "embedding", _proj_col().alias("proj")))
    a = pr.select(F.col("vec_id").alias("id_a"),
                  F.col("embedding").alias("emb_a"),
                  F.col("proj").alias("proj_a"))
    b = pr.select(F.col("vec_id").alias("id_b"),
                  F.col("embedding").alias("emb_b"),
                  F.col("proj").alias("proj_b"))
    d2o = _d2(F.col("emb_a"), F.col("emb_b"))
    d2p = _d2(F.col("proj_a"), F.col("proj_b"))
    ratio = d2p / (_P * d2o)
    return (a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", d2o.alias("d2_orig"),
                    d2p.alias("d2_proj"),
                    F.round(ratio, 6).alias("distortion"),
                    ratio.between(_LO, _HI).alias("within_band")))
