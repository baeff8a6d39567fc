"""Silver flatten — the reference's ``get_data`` 15-column projection
(nvd2mysqlloader.py:193-269) as one declarative ``select``.

Every per-field try/except-with-default of the reference becomes a
``coalesce`` over a nullable struct path; the nested-array logic
(descriptions, references, CPE extraction) becomes higher-order
functions over the typed arrays. Zero UDFs — the whole projection is
one whole-stage-codegen span, column-prunable and pushdown-friendly.

Column-by-column parity map (reference line → expression):
  215  raw JSON copy           → to_json(cve)            [bronze table]
  216  cve_id                  → cve.cve.CVE_data_meta.ID
  217  publishedDate           → cve.publishedDate
  218  lastModifiedDate        → cve.lastModifiedDate
  219  summary (all langs,     → array_join(transform(description_data,
       concatenated, no sep)       x -> x.value), '')
  222  config JSON string      → to_json(cve.configurations)
  226  vulnerable_software_list→ see cpe_uris() below
  233  score (cvssV2.baseScore,→ coalesce(..., 0.0) cast decimal(3,1)
       default 0.0)
  238  urls (comma-join at     → transform(reference_data, x -> x.url)
       sink boundary)              kept as array internally
  245-268 six CVSS v2 enums    → coalesce(path, '') each
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_EMPTY_STR_ARRAY = "array()"


def _vulnerable_uris(matches) -> Column:
    """cpe_match array → vulnerable cpe23Uri array (order-preserving,
    null-safe: a missing cpe_match yields [])."""
    return F.coalesce(
        F.transform(
            F.filter(matches,
                     lambda c: F.coalesce(c["vulnerable"], F.lit(False))),
            lambda c: c["cpe23Uri"]),
        F.expr(_EMPTY_STR_ARRAY).cast("array<string>"))


def cpe_uris(cve: str = "cve", include_children: bool = False) -> Column:
    """Vulnerable CPE URIs — the reference's
    ``get_vulnerable_software_list`` (nvd2mysqlloader.py:168-190):
    walk ``configurations.nodes[*].cpe_match[*]``, keep entries with
    ``vulnerable = true``, project ``cpe23Uri``.

    Parity notes: node ``operator`` AND/OR logic deliberately ignored
    ("just going to use the 'or' logic", :170); by default ``children``
    sub-nodes are NOT recursed — matching the reference exactly, which
    reads top-level ``cpe_match`` only (:180-185).

    ``include_children=True`` is the match-and-exceed extension
    (SURVEY §7.4.4): real NVD data nests vulnerable CPEs under AND
    nodes' ``children[*].cpe_match`` (depth 2, the feed schema's
    maximum), which the reference silently drops. Per node, top-level
    URIs come first, then each child's, preserving feed order.

    Order-preserving (array HOFs, not explode+collect — SURVEY §7.4.1).
    """
    nodes = F.col(f"{cve}.configurations.nodes")

    def per_node(n):
        top = _vulnerable_uris(n["cpe_match"])
        if not include_children:
            return top
        child = F.coalesce(
            F.flatten(F.transform(
                n["children"], lambda ch: _vulnerable_uris(ch["cpe_match"]))),
            F.expr(_EMPTY_STR_ARRAY).cast("array<string>"))
        return F.concat(top, child)

    return F.coalesce(F.flatten(F.transform(nodes, per_node)),
                      F.expr(_EMPTY_STR_ARRAY).cast("array<string>"))


def _cvss2(field: str, cve: str = "cve") -> Column:
    return F.coalesce(
        F.col(f"{cve}.impact.baseMetricV2.cvssV2.{field}"), F.lit(""))


def flatten_cve(items: DataFrame, cve: str = "cve",
                include_children_cpes: bool = False) -> DataFrame:
    """Exploded CVE items → silver ``nvd`` rows (NVD_SILVER_SCHEMA).

    Multi-valued columns stay ArrayType internally;
    ``to_mysql_boundary`` comma-joins them for byte-parity with the
    reference's mediumtext columns. ``include_children_cpes`` opts
    into depth-2 CPE extraction (see ``cpe_uris``); the default is
    reference parity.
    """
    c = cve
    return items.select(
        F.col(f"{c}.cve.CVE_data_meta.ID").alias("cve_id"),                      # :216
        F.coalesce(
            F.array_join(
                F.transform(F.col(f"{c}.cve.description.description_data"),
                            lambda x: x["value"]), ""),
            F.lit("")).alias("summary"),                                          # :219-221
        F.coalesce(F.to_json(F.col(f"{c}.configurations")), F.lit("{}"))
        .alias("config"),                                                         # :222-225
        F.coalesce(F.col(f"{c}.impact.baseMetricV2.cvssV2.baseScore"),
                   F.lit(0.0)).cast("decimal(3,1)").alias("score"),               # :233-236
        _cvss2("accessVector", c).alias("access_vector"),                         # :245-248
        _cvss2("accessComplexity", c).alias("access_complexity"),                 # :249-252
        _cvss2("authentication", c).alias("authorize"),                           # :253-256
        _cvss2("availabilityImpact", c).alias("availability_impact"),             # :261-264
        _cvss2("confidentialityImpact", c).alias("confidentiality_impact"),       # :257-260
        _cvss2("integrityImpact", c).alias("integrity_impact"),                   # :265-268
        F.coalesce(F.col(f"{c}.lastModifiedDate"), F.lit("")).alias(
            "last_modified_datetime"),                                            # :218
        F.coalesce(F.col(f"{c}.publishedDate"), F.lit("")).alias(
            "published_datetime"),                                                # :217
        F.coalesce(
            F.transform(F.col(f"{c}.cve.references.reference_data"),
                        lambda x: x["url"]),
            F.expr("array()").cast("array<string>")).alias("urls"),               # :238-244
        cpe_uris(c, include_children_cpes).alias("vulnerable_software_list"),     # :226-232
        # CVSS v3 extension — present in NVD 1.1 feeds but unread by the
        # reference (nvd.sql:34-38 documents the v2-only gap; SURVEY §1.4
        # directs carrying v3): nullable, no defaults — absence is data
        F.col(f"{c}.impact.baseMetricV3.cvssV3.baseScore")
        .cast("decimal(3,1)").alias("score_v3"),
        F.col(f"{c}.impact.baseMetricV3.cvssV3.baseSeverity").alias("severity_v3"),
        F.col(f"{c}.impact.baseMetricV3.cvssV3.scope").alias("scope_v3"),
    )


def flatten_cve_bronze(items: DataFrame, cve: str = "cve") -> DataFrame:
    """Bronze raw-copy table — the reference's ``nvd_json``
    (nvd2mysqlloader.py:305-312, insert at :451): (cve_id, whole record
    re-serialized). ``to_json`` field order differs from Python's
    ``json.dumps`` — semantic JSON equality, not byte equality
    (SURVEY §7.4.2)."""
    return items.select(
        F.col(f"{cve}.cve.CVE_data_meta.ID").alias("cve_id"),
        F.to_json(F.col(cve)).alias("cve_item"),
    )


def to_mysql_boundary(silver: DataFrame) -> DataFrame:
    """Comma-join array columns — byte-parity with the reference's
    mediumtext ``urls`` / ``vulnerable_software_list``
    (nvd2mysqlloader.py:190, 242) at the JDBC sink boundary only."""
    return (silver
            .withColumn("urls", F.array_join("urls", ","))
            .withColumn("vulnerable_software_list",
                        F.array_join("vulnerable_software_list", ",")))


def extract_cve2cpe(silver: DataFrame) -> DataFrame:
    """Populate the normalized CPE model the reference declares but
    never fills (nvd2mysqlloader.py:328-365, nvd.sql:97-131): explode
    the per-CVE URI array and split vendor/product/version — this is
    the query-surface realization of the FULLTEXT CPE search promise
    (:401, docstring :174-177)."""
    from ..functions.cpe import split_cpe23
    ex = silver.select(
        "cve_id", F.explode("vulnerable_software_list").alias("cpe23Uri"))
    parts = split_cpe23("cpe23Uri")
    return ex.select("cve_id", "cpe23Uri",
                     parts["part"].alias("part"),
                     parts["vendor"].alias("vendor"),
                     parts["product"].alias("product"),
                     parts["version"].alias("version"))
