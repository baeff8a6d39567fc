"""Local mirror of the driver's DuckDB-oracle comparison: run the Spark
plan and the oracle SQL on the same parquet, compare row count, sorted
column names, and an order-insensitive value hash."""

from __future__ import annotations

import datetime
import math

import duckdb

from nvd2mysqlloader_spark.schemas import TPCH_TABLES

# unit separator + escape: a printable '|' join would let different
# row splits canonicalize identically ('a|b','c' vs 'a','b|c'); the
# sentinels carry \x00 so no real string column can collide with
# NULL/NaN markers
_SEP = "\x1f"
_NULL = "\x00null\x00"
_NAN = "\x00nan\x00"


def _canon(v, localize: bool = False):
    if v is None:
        return _NULL
    if isinstance(v, float):
        if math.isnan(v):
            return _NAN
        # repr of the exact double — any bit difference shows up
        return repr(v)
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, datetime.datetime) and localize and v.tzinfo is None:
        # Spark's collect() renders TimestampType in the DRIVER
        # MACHINE's local timezone (session timeZone does not apply to
        # fromInternal); DuckDB returns naive UTC. Re-interpret the
        # Spark value as machine-local and convert to naive UTC so the
        # comparison is machine-timezone-independent (this host is
        # UTC, so the conversion is a no-op here — the guard is for
        # running the suite elsewhere). ``localize`` is only set for
        # columns whose SPARK type is the tz-aware TimestampType:
        # TIMESTAMP_NTZ values also collect as naive datetimes but
        # have no local-zone semantics and must pass through verbatim
        # (events.ts is NTZ — converting it would spuriously mismatch
        # on any non-UTC host).
        return str(v.astimezone(datetime.timezone.utc)
                    .replace(tzinfo=None))
    s = str(v)
    return s.replace(_SEP, "\\x1f") if _SEP in s else s


def _lines(cols, rows, localize_idx: frozenset = frozenset()):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(_SEP.join(_canon(r[i], i in localize_idx) for i in order)
                  for r in rows)


def _hash_lines(lines):
    import hashlib
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _type_hazards(rel) -> list[tuple[str, str]]:
    """Driver-unsafe DuckDB output types, including NESTED occurrences:
    the driver fetches oracle results via Arrow, where HUGEINT (sum of
    any integer type) lands as decimal128(38,0) and FLOAT stays
    float32 — both canonicalize differently from Spark's BIGINT/DOUBLE
    and hash-mismatch driver-side even when values agree (observed
    rounds 1-2). Substring matching catches FLOAT[] / STRUCT(...
    HUGEINT) shapes an exact top-level match would miss."""
    out = []
    for name, t in zip(rel.columns, rel.types):
        ts = str(t)
        if ("HUGEINT" in ts or "DECIMAL(38,0)" in ts.replace(" ", "")
                or ts == "FLOAT" or "FLOAT[" in ts or "FLOAT)" in ts
                or "FLOAT," in ts):
            out.append((name, ts))
    return out


def compare(spark, sf_dir: str, fn, oracle: str) -> tuple[bool, str]:
    sdf = fn(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = sdf.columns
    con = duck_con(sf_dir)
    try:
        rel = con.sql(oracle)          # binds once; no double execution
        hazards = _type_hazards(rel)
        if hazards:
            return False, (f"driver-unsafe oracle output types "
                           f"(wrap in CAST): {hazards}")
        d_cols = list(rel.columns)
        d_rows = rel.fetchall()
    finally:
        con.close()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"rowcount mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    from pyspark.sql.types import TimestampType
    tz_idx = frozenset(i for i, f in enumerate(sdf.schema.fields)
                       if isinstance(f.dataType, TimestampType))
    ls = _lines(s_cols, s_rows, localize_idx=tz_idx)
    ld = _lines(d_cols, d_rows)
    if _hash_lines(ls) != _hash_lines(ld):
        diffs = [f"  spark: {a}\n  duck : {b}"
                 for a, b in zip(ls, ld) if a != b][:3]
        return False, "value-hash mismatch\n" + "\n".join(diffs)
    return True, "ok"
