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
