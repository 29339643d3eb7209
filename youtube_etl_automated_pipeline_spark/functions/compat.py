"""Cross-engine deterministic helpers.

``F.round`` on doubles routes through Java ``BigDecimal.valueOf``
(shortest decimal string, HALF_UP) while DuckDB rounds the binary
double — values whose shortest repr ends in ...5 diverge (e.g.
9044.675 -> 9044.68 vs 9044.67). ``hround`` uses
``floor(x * 10^dp + 0.5) / 10^dp``: every step is an exactly-specified
IEEE-754 op, so Spark and DuckDB produce bit-identical doubles. Use it
for any derived/aggregated double that feeds the oracle value-hash;
raw stored columns need no rounding at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hround(col: Column, dp: int = 2) -> Column:
    p = float(10**dp)
    return F.floor(col * p + F.lit(0.5)) / p


def sql_hround(expr: str, dp: int = 2) -> str:
    """The DuckDB-side twin of :func:`hround`."""
    p = float(10**dp)
    return f"floor(({expr}) * {p!r} + 0.5) / {p!r}"


def units(col: Column, dp: int = 2) -> Column:
    """Exact fixed-point integer units of a dp-decimal double column
    (long). ``floor(x*10^dp + 0.5)`` recovers the exact integer a
    dp-decimal double is nearest to — x*10^dp is within an ulp of the
    integer, never near .5 — with only exactly-specified IEEE ops, so
    Spark and DuckDB agree bit-for-bit (incl. negatives, e.g.
    c_acctbal)."""
    p = float(10**dp)
    return F.floor(col * p + F.lit(0.5))


def sql_units(expr: str, dp: int = 2) -> str:
    p = float(10**dp)
    return f"CAST(floor(({expr}) * {p!r} + 0.5) AS BIGINT)"


def xsum(col: Column, dp: int = 2) -> Column:
    """Order-independent exact sum of a dp-decimal double column:
    accumulate integer units (long — associative, no float drift),
    divide once. Replaces ``hround(F.sum(col), dp)``, whose inner
    float sum is summation-order-sensitive and can straddle a
    rounding boundary between Spark and DuckDB."""
    p = float(10**dp)
    return F.sum(units(col, dp)) / p


def sql_xsum(expr: str, dp: int = 2) -> str:
    """DuckDB twin of :func:`xsum`. The CAST AS BIGINT collapses
    DuckDB's HUGEINT integer-sum to Spark's long before the single
    division."""
    p = float(10**dp)
    return f"CAST(sum({sql_units(expr, dp)}) AS BIGINT) / {p!r}"


def xavg(col: Column, dp_in: int = 2, dp_out: int = 4) -> Column:
    """Deterministic average: exact integer-unit sum and non-null
    count, ONE division chain (sum/count/scale, mirrored textually in
    :func:`sql_xavg`), then hround to dp_out."""
    p = float(10**dp_in)
    return hround(
        F.sum(units(col, dp_in)).cast("double") / F.count(col).cast("double") / p,
        dp_out,
    )


def sql_xavg(expr: str, dp_in: int = 2, dp_out: int = 4) -> str:
    p = float(10**dp_in)
    inner = (
        f"CAST(sum({sql_units(expr, dp_in)}) AS DOUBLE)"
        f" / CAST(count({expr}) AS DOUBLE) / {p!r}"
    )
    return sql_hround(inner, dp_out)
