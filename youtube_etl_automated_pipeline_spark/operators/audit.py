"""Inline pipeline audits via ``df.observe`` — production-grade row
accounting with ZERO extra scans.

The reference audits its pipeline by re-reading and re-counting the
sheet after each stage (Python-pipeline/dataprocessing.py's repeated
len()/shape checks — each one another full pass). On Spark the same
accounting rides inside the job: ``observe`` attaches accumulator-
backed aggregates to a plan node, the metrics materialize as a side
effect of whatever action runs the query, and at 100 TB that means
the audit is free — no second scan, no driver collect of data rows.

Use ``audited()`` around any stage boundary, run the job, then read
``Observation.get``. Batch-only by design (streaming queries surface
the same numbers through ``StreamingQueryProgress.observedMetrics``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def audited(
    df: DataFrame,
    name: str,
    *extra: Column,
    key: str | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach a standard audit to a stage boundary: row count, plus
    null-key count and distinct-ish key checksum when ``key`` is
    given, plus any caller aggregates. Returns (df, observation);
    read ``observation.get`` AFTER an action has run the plan."""
    obs = Observation(name)
    metrics: list[Column] = [F.count(F.lit(1)).alias("rows")]
    if key is not None:
        metrics.append(
            F.sum(F.when(F.col(key).isNull(), 1).otherwise(0)).alias("null_keys")
        )
        metrics.append(F.sum(F.xxhash64(F.col(key))).alias("key_checksum"))
    metrics.extend(extra)
    return df.observe(obs, *metrics), obs
