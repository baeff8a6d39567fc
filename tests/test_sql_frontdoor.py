"""The engine's answer to 'MySQL is the query API' (reference
README.md:37-39): every table registered as a view, arbitrary ANSI SQL
through spark.sql, results matching DuckDB on dialect-shared SQL."""

from __future__ import annotations

import duckdb

from nvd2mysqlloader_spark.schemas import TPCH_TABLES
from nvd2mysqlloader_spark.sources.tpch import register_views

from .conftest import SF_ORACLE

# dialect-shared ANSI statements (run verbatim on BOTH engines)
SHARED_SQL = [
    "SELECT count(*) AS n FROM lineitem",
    """SELECT o_orderstatus, count(*) AS n, count(DISTINCT o_custkey) AS k
       FROM orders GROUP BY o_orderstatus""",
    """SELECT r_name, count(*) AS n
       FROM region JOIN nation ON r_regionkey = n_regionkey
       GROUP BY r_name""",
    """SELECT l_returnflag,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
       FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'
       GROUP BY l_returnflag""",
    """SELECT p_brand, count(*) AS n FROM part
       WHERE p_name LIKE '%gre%' GROUP BY p_brand""",
]


def test_sql_frontdoor_matches_duckdb(spark):
    register_views(spark, SF_ORACLE)
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_ORACLE}/{t}.parquet')")
    for sql in SHARED_SQL:
        got = sorted(map(str, (tuple(r) for r in spark.sql(sql).collect())))
        want = sorted(map(str, con.execute(sql).fetchall()))
        assert got == want, f"mismatch for: {sql}\n{got[:3]} vs {want[:3]}"
    con.close()
