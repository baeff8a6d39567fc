"""CPE 2.3 URI handling.

``cpe:2.3:part:vendor:product:version:…`` — colon-delimited positions
2-5 hold part/vendor/product/version. The reference stores whole URIs
comma-joined (nvd2mysqlloader.py:190) and promises FULLTEXT search over
them (:401); splitting into typed columns realizes the normalized model
its unpopulated `software_*` tables intended (nvd2mysqlloader.py:328-365).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_cpe23(uri: Column | str) -> Column:
    """Struct(part, vendor, product, version) from a cpe23Uri string.

    ``try_element_at``: a truncated/malformed URI yields NULL fields
    (the reference's null-tolerance discipline) instead of an
    out-of-bounds error under ANSI mode — one bad URI in a feed must
    not abort the cve2cpe view."""
    c = F.col(uri) if isinstance(uri, str) else uri
    parts = F.split(c, ":")
    return F.struct(
        F.try_element_at(parts, F.lit(3)).alias("part"),
        F.try_element_at(parts, F.lit(4)).alias("vendor"),
        F.try_element_at(parts, F.lit(5)).alias("product"),
        F.try_element_at(parts, F.lit(6)).alias("version"),
    )
