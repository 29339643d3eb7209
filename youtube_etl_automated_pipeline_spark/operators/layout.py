"""Z-order data layout: multi-dimensional clustering for scan
skipping.

Partitioning prunes on ONE directory column; parquet row-group
min/max stats can prune on ANY column — but only if the writer
clustered the data so each row group covers a narrow slice of the
filter columns. Z-ordering interleaves the bits of two (or more)
dimensions into one sort key, so sorting by it keeps BOTH dimensions
locally narrow: a query filtering on either (or both) touches a small
fraction of row groups instead of all of them.

At 100 TB this is the difference between "every file intersects the
predicate" (random layout — min/max spans the full domain) and
reading a handful of files; it composes with directory partitioning
(partition on date, z-order within partitions on user/key dims).

Everything here is column expressions — the z-value is ~4*bits
bitwise ops that whole-stage codegen compiles flat; the layout write
is ``repartitionByRange(z)`` (one range shuffle, the same cost class
as any sorted write) + ``sortWithinPartitions``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns (a even positions, b odd) into one bigint z-value.

    Callers bucket real domains into [0, 2^bits) first — range/quantile
    bucketing preserves locality (modulo does not)."""
    one = F.lit(1).cast("bigint")
    z = F.lit(0).cast("bigint")
    a = a.cast("bigint")
    b = b.cast("bigint")
    for i in range(bits):
        bit_a = F.shiftleft(F.shiftright(a, i).bitwiseAND(one), 2 * i)
        bit_b = F.shiftleft(F.shiftright(b, i).bitwiseAND(one), 2 * i + 1)
        z = z.bitwiseOR(bit_a).bitwiseOR(bit_b)
    return z


def zorder_by(
    df: DataFrame,
    a: Column,
    b: Column,
    n_files: int = 16,
    bits: int = 16,
) -> DataFrame:
    """Return ``df`` arranged in z-order over (a, b): one range
    shuffle on the interleaved key, sorted within partitions, so a
    parquet write of the result yields row groups whose min/max are
    narrow in BOTH dimensions. Write with ``.write.parquet(...)``."""
    zdf = df.withColumn("_z", zvalue(a, b, bits))
    return (
        zdf.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )
