"""MySQL mirror sink — the reference's output database as an optional
JDBC target.

The reference upserts row-at-a-time with REPLACE + per-row commits
(~6 round-trips/CVE, nvd2mysqlloader.py:448-486). Spark's JDBC writer
has no upsert mode (SURVEY §4.2), so the mirror is written as:

  1. ``df.write.jdbc`` the batch into a staging table (bulk, batched
     statements, one transaction per partition,
     ``rewriteBatchedStatements=true`` — per BASELINE.json "better via
     JDBC bulk insert than streaming row-by-row");
  2. one server-side ``INSERT … SELECT … ON DUPLICATE KEY UPDATE``
     from staging into the target (set-based REPLACE semantics,
     last-writer-wins, idempotent under Spark task retries);
  3. drop staging.

No MySQL server (or JDBC driver jar) ships in this container, so the
connection path is import/connect-gated; the statement builders are
pure and unit-tested, and ``mirror_to_mysql`` is the production entry.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

DEFAULT_JDBC_OPTS = {
    # batched inserts: one multi-row statement per batch, one txn per partition
    "rewriteBatchedStatements": "true",
    "batchsize": "10000",
    # utf8mb4 parity with the reference's charset (nvd2mysqlloader.py:275-278)
    "characterEncoding": "utf-8",
}


def staging_column_types(df: DataFrame, key: str = "cve_id") -> str:
    """``createTableColumnTypes`` DDL for the staging table's STRING
    columns: Spark's MySQL dialect maps StringType to TEXT (64 KB),
    which would truncate the MEDIUMTEXT columns the target schema
    deliberately uses (config/vulnerable_software_list routinely
    exceed 64 KB — the reason the reference picked MEDIUMTEXT,
    nvd2mysqlloader.py:282-300). The key keeps its VARCHAR(20) to stay
    index-compatible with the target's UNIQUE key; non-string columns
    keep the dialect's default mapping."""
    from pyspark.sql import types as T

    parts = []
    for f in df.schema.fields:
        if f.name == key:
            parts.append(f"{f.name} VARCHAR(20)")
        elif isinstance(f.dataType, T.StringType):
            parts.append(f"{f.name} MEDIUMTEXT")
    return ", ".join(parts)


def upsert_from_staging_sql(target: str, staging: str,
                            columns: Sequence[str],
                            key: str = "cve_id") -> str:
    """The set-based REPLACE: one statement for the whole batch.

    ``INSERT … ON DUPLICATE KEY UPDATE`` preserves the surrogate
    auto-increment id on update — exactly what the reference's
    probe-then-REPLACE dance was for (nvd2mysqlloader.py:449, 463).
    """
    cols = ", ".join(columns)
    updates = ", ".join(f"{c}=VALUES({c})" for c in columns if c != key)
    return (f"INSERT INTO {target} ({cols}) "
            f"SELECT {cols} FROM {staging} "
            f"ON DUPLICATE KEY UPDATE {updates}")


def create_target_sql(table: str = "nvd") -> str:
    """Idempotent DDL for the mirror (columns per
    nvd2mysqlloader.py:282-300 plus the engine's CVSS v3 extension —
    the sink df from flatten_cve carries score_v3/severity_v3/scope_v3,
    and the upsert statement names every df column, so the target MUST
    declare them; utf8mb4 per :275-278)."""
    return f"""CREATE TABLE IF NOT EXISTS {table} (
  id INT NOT NULL AUTO_INCREMENT PRIMARY KEY,
  cve_id VARCHAR(20) UNIQUE,
  summary MEDIUMTEXT,
  config MEDIUMTEXT,
  score REAL(3,1),
  access_vector VARCHAR(16),
  access_complexity VARCHAR(16),
  authorize VARCHAR(32),
  availability_impact VARCHAR(8),
  confidentiality_impact VARCHAR(8),
  integrity_impact VARCHAR(8),
  last_modified_datetime VARCHAR(64),
  published_datetime VARCHAR(64),
  urls MEDIUMTEXT,
  vulnerable_software_list MEDIUMTEXT,
  score_v3 REAL(3,1),
  severity_v3 VARCHAR(16),
  scope_v3 VARCHAR(16),
  FULLTEXT KEY vuln_sw (vulnerable_software_list)
) CHARACTER SET utf8mb4 COLLATE utf8mb4_unicode_ci"""


def mirror_statement_plan(columns: Sequence[str], target: str,
                          key: str = "cve_id") -> list[tuple[str, str]]:
    """The full server-side mirror protocol as an ordered statement
    plan: (phase, sql) pairs. ``mirror_to_mysql`` executes exactly this
    plan after the bulk staging write, and the serverless protocol test
    (tests/test_jdbc_sql.py) replays the SAME plan statement-for-
    statement against DuckDB — what is verified is what runs.

    Phases: ``create_target`` (idempotent DDL) → ``upsert`` (set-based
    INSERT … ON DUPLICATE KEY UPDATE from staging) → ``drop_staging``
    (cleanup; failure here is non-fatal, the target is already
    committed)."""
    staging = f"{target}_stage"
    return [
        ("create_target", create_target_sql(target)),
        ("upsert", upsert_from_staging_sql(target, staging, columns, key)),
        ("drop_staging", f"DROP TABLE {staging}"),
    ]


def mirror_to_mysql(df: DataFrame, url: str, target: str, key: str = "cve_id",
                    user: str | None = None, password: str | None = None,
                    options: dict | None = None) -> None:
    """Write ``df`` into the MySQL mirror with upsert semantics.

    Requires a reachable MySQL and the Connector/J jar on the Spark
    classpath; raises RuntimeError otherwise. The df should already be
    at the sink boundary (arrays comma-joined via
    ``operators.flatten.to_mysql_boundary``).
    """
    staging = f"{target}_stage"
    opts = dict(DEFAULT_JDBC_OPTS, **(options or {}))
    props = {k: v for k, v in {"user": user, "password": password,
                               **opts}.items() if v is not None}
    plan = dict(mirror_statement_plan(df.columns, target, key))
    try:
        (df.write.mode("overwrite")
         .options(**opts)
         .option("createTableColumnTypes",
                 staging_column_types(df, key))
         .jdbc(url, staging, properties=props))
        spark = df.sparkSession
        # server-side set-based upsert through the JVM driver connection
        jvm = spark._sc._jvm
        conn = jvm.java.sql.DriverManager.getConnection(url, user, password)
        try:
            stmt = conn.createStatement()
            stmt.execute(plan["create_target"])
            stmt.execute(plan["upsert"])
        finally:
            conn.close()
    except Exception as exc:  # no driver jar / unreachable server
        raise RuntimeError(
            "MySQL mirror unavailable (needs mysql-connector-j on the "
            "classpath and a reachable server); parquet warehouse remains "
            f"the canonical store: {exc}") from exc
    # staging cleanup AFTER the committed upsert: a failure here (e.g.
    # missing DROP privilege) must not report the mirror as unwritten —
    # the target IS up to date; the leftover staging table is re-created
    # mode('overwrite') on the next batch anyway
    try:
        conn = jvm.java.sql.DriverManager.getConnection(url, user, password)
        try:
            conn.createStatement().execute(plan["drop_staging"])
        finally:
            conn.close()
    except Exception as exc:
        import warnings
        warnings.warn(f"mirror upsert committed but staging table "
                      f"{staging} could not be dropped: {exc}")
