"""Local replica of the driver's correctness gate: run a Spark query
and its DuckDB oracle over the same parquet, compare row count, sorted
column names, and order-insensitive values (floats to 1e-6 rel tol).
"""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = match)."""
    errors: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        errors.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return errors
    if len(s_rows) != len(d_rows):
        errors.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
    if errors:
        return errors
    sc, s_norm = _norm_rows(s_cols, s_rows)
    _, d_norm = _norm_rows(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(s_norm, d_norm)):
        if a == b:
            continue
        for c, x, y in zip(sc, a, b):
            if x != y and not _close(x, y):
                errors.append(f"row {i} col {c}: spark={x!r} duckdb={y!r}")
        if len(errors) > 5:
            break
    return errors


def _close(x, y) -> bool:
    try:
        return math.isclose(float(x), float(y), rel_tol=1e-6, abs_tol=2e-6)
    except (TypeError, ValueError):
        return False
