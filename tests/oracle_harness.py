"""Local mirror of the driver's DuckDB-oracle comparison: run the Spark
plan and the oracle SQL on the same parquet, compare row count, sorted
column names, and an order-insensitive value hash."""

from __future__ import annotations

import math

import duckdb

from nvd2mysqlloader_spark.schemas import TPCH_TABLES


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr of the exact double — any bit difference shows up
        return repr(v)
    if isinstance(v, bool):
        return str(bool(v)).lower()
    return str(v)


def _hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
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


def compare(spark, sf_dir: str, fn, oracle: str) -> tuple[bool, str]:
    sdf = fn(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = sdf.columns
    con = duck_con(sf_dir)
    # Arrow-type guard: the driver fetches DuckDB results via Arrow, where
    # HUGEINT (sum of any integer type) lands as decimal128(38,0) and
    # FLOAT stays float32 — both canonicalize differently from Spark's
    # BIGINT/DOUBLE and hash-mismatch driver-side even when values agree
    # (observed rounds 1-2). Oracles must CAST such columns explicitly.
    tbl = con.execute(oracle).arrow()
    hazards = [(f.name, str(f.type)) for f in tbl.schema
               if str(f.type) in ("decimal128(38, 0)", "decimal256(76, 0)",
                                  "float", "halffloat")]
    if hazards:
        con.close()
        return False, f"driver-unsafe oracle output types (wrap in CAST): {hazards}"
    res = con.execute(oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    con.close()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"rowcount mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    hs, hd = _hash_rows(s_cols, s_rows), _hash_rows(d_cols, d_rows)
    if hs != hd:
        # show a few differing lines to debug
        order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
        order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
        ls = sorted("|".join(_canon(r[i]) for i in order_s) for r in s_rows)
        ld = sorted("|".join(_canon(r[i]) for i in order_d) for r in d_rows)
        diffs = [f"  spark: {a}\n  duck : {b}" for a, b in zip(ls, ld) if a != b][:3]
        return False, "value-hash mismatch\n" + "\n".join(diffs)
    return True, "ok"
