"""Bit-exact oracle compare (the DRIVER's standard, stricter than the
1e-6-tolerance pytest gate): run named queries vs their DuckDB oracles
with NO float tolerance. Used to prove the exact-units refactor holds
at the driver's bar.

Usage: python -m tests.strict_compare [sf_dir] [query ...]
Defaults: /root/testdata/sf0.01 and every query with an oracle.
"""

from __future__ import annotations

import math
import sys


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v  # bit-exact: no rounding
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def strict_compare(spark_df, con, sql: str) -> list[str]:
    errors: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return [f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"]
    if len(s_rows) != len(d_rows):
        return [f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"]
    sc, s_norm = norm_rows(s_cols, s_rows)
    _, d_norm = norm_rows(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(s_norm, d_norm)):
        if a == b:
            continue
        for c, x, y in zip(sc, a, b):
            if x != y:
                errors.append(f"row {i} col {c}: spark={x!r} duckdb={y!r}")
        if len(errors) > 5:
            break
    return errors


def main() -> int:
    import __spark_entry__ as entrymod
    from tests.oracle_compare import duckdb_conn

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sys.argv[2:] or sorted(oracles.keys())
    from youtube_etl_automated_pipeline_spark.session import get_spark

    spark = get_spark("strict_compare")
    con = duckdb_conn(sf_dir)
    failed = []
    for name in names:
        if name not in oracles:
            print(f"{name}: SKIP (no oracle)")
            continue
        try:
            errs = strict_compare(queries[name](spark, sf_dir), con, oracles[name])
        except Exception as e:  # noqa: BLE001 - report and continue
            errs = [f"EXCEPTION {type(e).__name__}: {e}"]
        if errs:
            failed.append(name)
            print(f"{name}: FAIL")
            for e in errs[:6]:
                print(f"    {e}")
        else:
            print(f"{name}: OK")
    print(f"\n{len(names) - len(failed)}/{len(names)} strict-exact")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
