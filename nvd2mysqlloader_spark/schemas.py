"""Explicit schemas — nothing in this engine infers schema at runtime.

The reference navigates untyped dicts with try/except-per-field
(nvd2mysqlloader.py:222-268); here every absent field is simply a
nullable StructField, so the same null-tolerance falls out of the type
system and Catalyst can prune/push down against a known shape.

CVE feed shape per FIXTURES.md §A1 (fields the reference reads, each
cited); ``nodes.children`` is bounded at depth 2 — Spark schemas cannot
recurse, the reference reads depth 1 only (nvd2mysqlloader.py:180-185),
real NVD 1.1 data nests at most 2.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _cpe_match() -> T.ArrayType:
    return T.ArrayType(T.StructType([
        T.StructField("vulnerable", T.BooleanType()),          # :184
        T.StructField("cpe23Uri", T.StringType()),             # :185
        T.StructField("versionStartIncluding", T.StringType()),
        T.StructField("versionEndExcluding", T.StringType()),
    ]))


_CVSS_V2 = T.StructType([                                      # :233-268
    T.StructField("version", T.StringType()),
    T.StructField("vectorString", T.StringType()),
    T.StructField("accessVector", T.StringType()),
    T.StructField("accessComplexity", T.StringType()),
    T.StructField("authentication", T.StringType()),
    T.StructField("confidentialityImpact", T.StringType()),
    T.StructField("integrityImpact", T.StringType()),
    T.StructField("availabilityImpact", T.StringType()),
    T.StructField("baseScore", T.DoubleType()),
])

_CVSS_V3 = T.StructType([      # unread by reference (nvd.sql:34-38) — extension surface
    T.StructField("version", T.StringType()),
    T.StructField("vectorString", T.StringType()),
    T.StructField("attackVector", T.StringType()),
    T.StructField("attackComplexity", T.StringType()),
    T.StructField("privilegesRequired", T.StringType()),
    T.StructField("userInteraction", T.StringType()),
    T.StructField("scope", T.StringType()),
    T.StructField("confidentialityImpact", T.StringType()),
    T.StructField("integrityImpact", T.StringType()),
    T.StructField("availabilityImpact", T.StringType()),
    T.StructField("baseScore", T.DoubleType()),
    T.StructField("baseSeverity", T.StringType()),
])

CVE_ITEM_SCHEMA = T.StructType([
    T.StructField("cve", T.StructType([
        T.StructField("CVE_data_meta", T.StructType([
            T.StructField("ID", T.StringType()),               # :216
        ])),
        T.StructField("description", T.StructType([
            T.StructField("description_data", T.ArrayType(T.StructType([
                T.StructField("lang", T.StringType()),
                T.StructField("value", T.StringType()),        # :219-221
            ]))),
        ])),
        T.StructField("references", T.StructType([
            T.StructField("reference_data", T.ArrayType(T.StructType([
                T.StructField("url", T.StringType()),          # :238-241
                T.StructField("name", T.StringType()),
                T.StructField("refsource", T.StringType()),
                T.StructField("tags", T.ArrayType(T.StringType())),
            ]))),
        ])),
    ])),
    T.StructField("configurations", T.StructType([             # :222-232
        T.StructField("CVE_data_version", T.StringType()),
        T.StructField("nodes", T.ArrayType(T.StructType([
            T.StructField("operator", T.StringType()),         # ignored (:170)
            T.StructField("cpe_match", _cpe_match()),
            T.StructField("children", T.ArrayType(T.StructType([
                T.StructField("operator", T.StringType()),
                T.StructField("cpe_match", _cpe_match()),
            ]))),
        ]))),
    ])),
    T.StructField("impact", T.StructType([
        T.StructField("baseMetricV2", T.StructType([
            T.StructField("cvssV2", _CVSS_V2),
        ])),
        T.StructField("baseMetricV3", T.StructType([
            T.StructField("cvssV3", _CVSS_V3),
        ])),
    ])),
    T.StructField("publishedDate", T.StringType()),            # :217
    T.StructField("lastModifiedDate", T.StringType()),         # :218
])

# one JSON document per feed file; CVE_Items is the record array (:452)
CVE_FEED_SCHEMA = T.StructType([
    T.StructField("CVE_data_numberOfCVEs", T.StringType()),
    T.StructField("CVE_data_timestamp", T.StringType()),
    T.StructField("CVE_Items", T.ArrayType(CVE_ITEM_SCHEMA)),
])

# silver `nvd` (nvd2mysqlloader.py:282-300); multi-valued columns kept
# as arrays internally, comma-joined only at the MySQL sink boundary
NVD_SILVER_SCHEMA = T.StructType([
    T.StructField("cve_id", T.StringType()),
    T.StructField("summary", T.StringType()),
    T.StructField("config", T.StringType()),                   # JSON-as-string
    T.StructField("score", T.DecimalType(3, 1)),               # real(3,1) :288
    T.StructField("access_vector", T.StringType()),
    T.StructField("access_complexity", T.StringType()),
    T.StructField("authorize", T.StringType()),
    T.StructField("availability_impact", T.StringType()),
    T.StructField("confidentiality_impact", T.StringType()),
    T.StructField("integrity_impact", T.StringType()),
    T.StructField("last_modified_datetime", T.StringType()),   # varchar in ref :295
    T.StructField("published_datetime", T.StringType()),
    T.StructField("urls", T.ArrayType(T.StringType())),
    T.StructField("vulnerable_software_list", T.ArrayType(T.StringType())),
    # CVSS v3 extension columns (SURVEY §1.4; unread by the reference)
    T.StructField("score_v3", T.DecimalType(3, 1)),
    T.StructField("severity_v3", T.StringType()),
    T.StructField("scope_v3", T.StringType()),
])

# bronze raw-copy table (nvd2mysqlloader.py:305-312); partitioned by
# the CVE id's own year so bronze deletes are partition-selective
NVD_JSON_SCHEMA = T.StructType([
    T.StructField("cve_id", T.StringType()),
    T.StructField("cve_item", T.StringType()),                 # raw JSON
    T.StructField("feed_year", T.IntegerType()),               # partition
])

# load-state / lineage table (nvd2mysqlloader.py:314-327)
UPDATE_HISTORY_SCHEMA = T.StructType([
    T.StructField("download_name", T.StringType()),
    T.StructField("lastModifiedDate", T.StringType()),
    T.StructField("downloadedDate", T.StringType()),
    T.StructField("size", T.LongType()),
    T.StructField("zipSize", T.LongType()),
    T.StructField("gzSize", T.LongType()),
    T.StructField("sha256", T.StringType()),
])

# normalized CPE model the reference declares but never populates
# (nvd2mysqlloader.py:328-365, nvd.sql:97-131) — our explode populates it
CVE2CPE_SCHEMA = T.StructType([
    T.StructField("cve_id", T.StringType()),
    T.StructField("cpe23Uri", T.StringType()),
    T.StructField("part", T.StringType()),
    T.StructField("vendor", T.StringType()),
    T.StructField("product", T.StringType()),
    T.StructField("version", T.StringType()),
])

# .meta sidecar parse target (nvd2mysqlloader.py:46-64)
META_SCHEMA = T.StructType([
    T.StructField("download_name", T.StringType()),
    T.StructField("lastModifiedDate", T.StringType()),
    T.StructField("size", T.LongType()),
    T.StructField("zipSize", T.LongType()),
    T.StructField("gzSize", T.LongType()),
    T.StructField("sha256", T.StringType()),
])

TPCH_TABLES = ("region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events", "documents", "embeddings")
