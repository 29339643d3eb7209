"""Z-order layout: parquet min/max stats must become narrow in BOTH
clustered dimensions, so a two-dimensional predicate touches a small
fraction of files — measured directly from the parquet footers, not
inferred."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from youtube_etl_automated_pipeline_spark.operators.layout import zorder_by, zvalue
from youtube_etl_automated_pipeline_spark.sources import load_table

EPOCH = "1992-01-01"


def _files_intersecting(path: str, c_lo: int, c_hi: int, d_lo, d_hi) -> tuple[int, int]:
    """(total files, files whose row-group [min,max] intersect BOTH
    the custkey and orderdate ranges), straight from parquet footers."""
    import pyarrow.parquet as pq

    total = hit = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        file_hit = False
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            cs = g.column(cols["o_custkey"]).statistics
            ds = g.column(cols["o_orderdate"]).statistics
            if cs.min <= c_hi and cs.max >= c_lo and ds.min <= d_hi and ds.max >= d_lo:
                file_hit = True
        total += 1
        hit += int(file_hit)
    return total, hit


def test_zvalue_interleaves_bits(spark):
    df = spark.createDataFrame([(3, 5)], "a int, b int").select(
        zvalue(F.col("a"), F.col("b"), 4).alias("z")
    )
    # a=0011, b=0101 -> z (b odd positions, a even) = 0b00100111 = 39
    assert df.collect()[0]["z"] == 0b00100111


def test_zorder_layout_prunes_both_dims(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    zpath = str(tmp_path / "z")
    rpath = str(tmp_path / "r")
    zorder_by(
        orders,
        F.col("o_custkey"),
        F.datediff(F.col("o_orderdate"), F.lit(EPOCH)),
        n_files=16,
    ).write.parquet(zpath)
    orders.repartition(16).write.parquet(rpath)

    import datetime as dt

    stats = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("o_orderdate"), F.max("o_orderdate")
    ).collect()[0]
    c_lo, c_hi = stats[0], stats[0] + max(1, (stats[1] - stats[0]) // 8)
    d_lo, d_hi = stats[2], stats[2] + dt.timedelta(days=365)

    z_total, z_hit = _files_intersecting(zpath, c_lo, c_hi, d_lo, d_hi)
    r_total, r_hit = _files_intersecting(rpath, c_lo, c_hi, d_lo, d_hi)
    assert z_total == 16 and r_total == 16
    # random layout: every file spans the domain -> everything intersects
    assert r_hit >= 14
    # z-order: the 2-D slice lives in a few contiguous z-ranges
    assert z_hit * 2 <= r_hit, (z_hit, r_hit)

    # layout change must be content-lossless
    assert spark.read.parquet(zpath).count() == orders.count()
