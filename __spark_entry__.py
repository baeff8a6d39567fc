"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship star-join query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full registered query
surface (see ``nvd2mysqlloader_spark/plans/``) for the DuckDB-oracle
correctness gate at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# robust under file-spec imports (driver may not have the repo on sys.path)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from nvd2mysqlloader_spark.plans import oracle_map, spark_queries
from nvd2mysqlloader_spark.plans.reference_queries import star_join_revenue


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return star_join_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return oracle_map()
