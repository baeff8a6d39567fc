"""Link-graph analytics over the transaction graph — PageRank and the
degree profile, the web-graph curation ops (Common Crawl ranks its
host link graph to decide what to crawl/keep; pretraining pipelines
reuse the score as a document-quality prior).

Graph: supplier↔customer transaction links from lineitem⋈orders —
node ``'s'||suppkey`` / ``'c'||custkey`` (prefix-disjoint ids), one
directed edge EACH WAY per distinct trading pair, so the chain is
ergodic and the fixture exercises real degree skew. At 100 TB the
same derivation is a distinct-pair rollup of a trillion-row fact —
itself a scale-relevant step (one shuffle on the join key, then the
distinct partial-aggregates map-side).

PageRank is exactly oracle-checked: integer fixed-point arithmetic
(operators/graph.pagerank) makes every rank a BIGINT that DuckDB
reproduces bit-for-bit by unrolling the same recurrence — a hash
match on the scores themselves, not a bound verdict. The reference
has no graph surface at all (nvd2mysqlloader.py:452-506).

Registered after every other module: appends must never reshuffle
the harness's fixed-size registry prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import pagerank
from ..sources.tpch import load_table
from .registry import query

_PR_ITERS = 6
_PR_TOTAL = 1_000_000_000_000

# Shared CTE prologue: the derived link graph. UNION ALL is dupe-free
# because the 's'/'c' prefixes make the two orientations disjoint.
_GRAPH_CTES = """
    pairs AS (
      SELECT DISTINCT 's' || CAST(l.l_suppkey AS VARCHAR) AS src,
                      'c' || CAST(o.o_custkey AS VARCHAR) AS dst
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
    edges AS (SELECT src, dst FROM pairs
              UNION ALL
              SELECT dst AS src, src AS dst FROM pairs),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)"""


def _link_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    pairs = (li.join(od, li["l_orderkey"] == od["o_orderkey"])
             .select(F.concat(F.lit("s"),
                              F.col("l_suppkey").cast("string")).alias("src"),
                     F.concat(F.lit("c"),
                              F.col("o_custkey").cast("string")).alias("dst"))
             .distinct())
    return pairs.union(pairs.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))


def _pagerank_oracle(iters: int = _PR_ITERS) -> str:
    """Unroll the integer-fixed-point recurrence as chained CTEs —
    fixed iteration count makes PageRank plain (non-recursive) SQL,
    and BIGINT arithmetic makes it bit-identical to the Spark loop.
    CASTs pin DuckDB's HUGEINT sum results back to BIGINT so the
    result schema matches Spark's LONG."""
    parts = ["WITH" + _GRAPH_CTES + f""",
    nn AS (SELECT count(*) AS n
           FROM (SELECT DISTINCT src FROM edges)),
    r0 AS (SELECT e.src AS node,
                  CAST({_PR_TOTAL} // nn.n AS BIGINT) AS rank_fp
           FROM (SELECT DISTINCT src FROM edges) e CROSS JOIN nn)"""]
    for i in range(1, iters + 1):
        p = f"r{i - 1}"
        parts.append(f""",
    inc{i} AS (SELECT e.dst AS node,
                      CAST(sum(r.rank_fp // d.outdeg) AS BIGINT) AS inc
               FROM {p} r JOIN edges e ON e.src = r.node
                          JOIN deg d ON d.src = r.node
               GROUP BY e.dst),
    dang{i} AS (SELECT CAST(COALESCE(sum(r.rank_fp), 0) AS BIGINT) AS dang
                FROM {p} r
                WHERE NOT EXISTS (SELECT 1 FROM deg d
                                  WHERE d.src = r.node)),
    r{i} AS (SELECT b.node,
                    CAST((15 * ({_PR_TOTAL} // nn.n)) // 100
                         + (85 * (COALESCE(i.inc, 0)
                                  + dg.dang // nn.n)) // 100
                         AS BIGINT) AS rank_fp
             FROM r0 b LEFT JOIN inc{i} i ON i.node = b.node
             CROSS JOIN nn CROSS JOIN dang{i} dg)""")
    parts.append(f"""
    SELECT node, rank_fp FROM r{iters}
    ORDER BY rank_fp DESC, node LIMIT 25""")
    return "".join(parts)


@query(
    "pagerank_scores",
    oracle=_pagerank_oracle(),
    doc=(
        "PageRank over the supplier↔customer link graph "
        "(operators/graph.pagerank): 6 damped power-iteration steps in "
        "exact BIGINT fixed-point (rank mass 1e12, per-edge "
        "contribution rank div outdeg, dangling mass teleported "
        "uniformly), top-25 nodes with node-id tie-break. Integer "
        "arithmetic is order-independent, so the scores hash-match a "
        "DuckDB oracle that unrolls the identical recurrence as "
        "chained CTEs — exact cross-engine agreement on an iterative "
        "graph algorithm, not a bound verdict. Per iteration: one "
        "|E|-linear join keyed on src + one sum keyed on dst + a "
        "broadcast dangling singleton; lineage cut per round. The "
        "web-graph document-importance score of Common-Crawl-style "
        "curation, absent from the reference (its query layer is "
        "single-table SELECTs, nvd2mysqlloader.py:452-506)."
    ),
)
def pagerank_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    pr = pagerank(None, _link_edges(spark, sf_dir), id_col="id",
                  iters=_PR_ITERS, total=_PR_TOTAL)
    return (pr.select(F.col("id").alias("node"), "rank_fp")
            .orderBy(F.col("rank_fp").desc(), "node").limit(25))


@query(
    "link_degree_profile",
    oracle="WITH" + _GRAPH_CTES + """
    SELECT outdeg AS degree, count(*) AS n_nodes,
           min(src) AS min_node
    FROM deg GROUP BY outdeg
    """,
    doc=(
        "degree distribution of the same link graph (graph-shape "
        "profiling — the first thing run on any new web-graph crawl to "
        "see skew/hubs before ranking it): distinct trading pairs in "
        "both orientations, per-node out-degree, histogram with a "
        "min-node witness per degree. The distinct pair rollup "
        "partial-aggregates map-side; the degree histogram is a "
        "two-level groupBy on already-shuffled keys."
    ),
)
def link_degree_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    deg = (_link_edges(spark, sf_dir)
           .groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")))
    return (deg.groupBy(F.col("outdeg").alias("degree"))
            .agg(F.count(F.lit(1)).alias("n_nodes"),
                 F.min("src").alias("min_node")))
