"""Lineage truncation for iterative algorithms (PageRank, connected
components, k-core, BPE, label propagation): each round's result
feeds the next round's join, so without truncation the logical plan
doubles per iteration (Catalyst re-analyzes a 2^iters tree) and a
lost executor replays the entire history.

Two modes behind one call:

- default: ``localCheckpoint`` — blocks are pinned on the executors
  that computed them. Right for local[] and for clusters that accept
  recompute-from-scratch on executor loss (fast: no DFS round trip).
- ``spark.graft.checkpoint.reliable=true``: ``checkpoint`` — blocks
  are written to the SparkContext checkpoint directory (HDFS/S3 on a
  real cluster; ``setCheckpointDir`` must have been called). This is
  the 100 TB posture every iterative docstring promises: iteration
  state survives executor loss AND the driver can release shuffle
  files from truncated stages.

The flag is read per call, so one session can run gate queries local
and a long PageRank reliable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

RELIABLE_CONF = "spark.graft.checkpoint.reliable"


def truncate_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut ``df``'s lineage: reliable ``checkpoint`` when
    ``spark.graft.checkpoint.reliable=true`` (requires
    ``sparkContext.setCheckpointDir``), else ``localCheckpoint``.
    ``eager=False`` defers materialization to the first action —
    callers that build several candidate plans and execute one keep
    that laziness in both modes."""
    spark = df.sparkSession
    if str(spark.conf.get(RELIABLE_CONF, "false")).lower() == "true":
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
