"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the IVF variant is
the scale path (assign to nearest centroid, search only the bucket —
the candidate set shrinks by the cluster count). Kernels are built-in
higher-order functions (zip_with/aggregate): JVM-side, codegen'd,
no Python in the hot loop. A Pandas-UDF path would only win if the
kernel needed BLAS-level batching; at 64 dims the expression kernel
is cheaper than Arrow round-trips.

Cross-engine determinism: cosines are rounded (floor-trick, 6dp)
before any ordering/thresholding so Spark and the DuckDB oracle agree
on ranks and set membership.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from youtube_etl_automated_pipeline_spark.functions.compat import hround


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine(a: Column, b: Column, dp: int = 6) -> Column:
    """Rounded cosine similarity; zero-norm inputs -> 0."""
    ad, bd = as_double(a), as_double(b)
    denom = norm(ad) * norm(bd)
    return hround(F.when(denom > 0, dot(ad, bd) / denom).otherwise(F.lit(0.0)), dp)


def topk_by_query(
    pairs: DataFrame, query_col: str, score_col: str, id_col: str, k: int
) -> DataFrame:
    """Per-query top-k with a deterministic tiebreak.

    Window over the query key: at production scale with few queries
    this skews — there, replace with groupBy(query).agg(max_by heap)
    or repartition by query first; for query fan-outs in the hundreds+
    the window is the right shape.
    """
    w = Window.partitionBy(query_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
