"""Skew mitigation: salted two-stage aggregation.

A groupBy on a low-cardinality / skewed key concentrates whole key
groups on single reducers. Salting splits each key into n_salts
sub-groups for a partial aggregate, then a cheap second aggregate over
n_keys * n_salts rows removes the salt. Stage 1 parallelizes across
the cluster regardless of key skew; stage 2 is tiny. (AQE's skew-join
splitting covers joins; this is the aggregation-side analog for
algebraic aggregates.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_sum(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    salt_source: Column,
    n_salts: int = 32,
) -> DataFrame:
    """count(*) + sum(value) per key via salt -> partial agg -> final
    agg. ``salt_source`` must be a deterministic column expression
    (e.g. a unique id) so results are reproducible."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(salt_source), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_n"), F.sum(value_col).alias("_s")
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n_rows"), F.sum("_s").alias("sum_value")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_source: Column,
    n_salts: int = 32,
) -> DataFrame:
    """Skew-safe equi-join for when AQE's split is unavailable (e.g.
    the skew only materializes mid-pipeline) and the dim side is too
    big to broadcast: the fact side salts each key into n_salts
    sub-keys from a deterministic source, the dim side REPLICATES each
    row across all salts (explode of a literal range — dim grows
    n_salts-fold, still tiny next to the fact), and the join runs on
    (key, salt) so a hot key spreads over n_salts reducers instead of
    one. Columns of both inputs survive; the salt is dropped.
    """
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_source), F.lit(n_salts)).cast("int")
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    joined = salted_fact.join(
        replicated_dim,
        (salted_fact[fact_key] == replicated_dim[dim_key])
        & (salted_fact["_salt"] == replicated_dim["_salt"]),
    )
    return joined.drop("_salt")
