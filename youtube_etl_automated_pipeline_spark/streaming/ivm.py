"""Incremental view maintenance (IVM) of an equi-JOIN with appends on
BOTH sides — the missing sibling of the incremental AGGREGATE view
(streaming/aggstate.py) and the keyed CDC MERGE (streaming/merge.py).

The delta rule: applying one side's append-delta at a time, each new
pair is emitted exactly once — when the LATER of its two rows arrives:

    apply dA:  J += dA join B_acc ;  A_acc += dA
    apply dB:  J += A_acc join dB ;  B_acc += dB

so after any interleaving of deltas, J == A_acc join B_acc with no
row ever re-joined (each apply touches only the delta and the
opposite accumulator — incremental cost O(|delta| * match rate), not
O(|A| * |B|)).

Durability / idempotency: the join view is LOG-STRUCTURED — each
apply writes its output rows into a delta directory named by the
apply's id (`overwrite` mode), so a retried apply rewrites the same
directory instead of double-appending (same recovery contract as
aggstate's per-batch partial files). The accumulators append; a
retried accumulator append is prevented by the same id-directory
scheme.

Scale notes: each apply is one broadcast-or-shuffle join of a small
delta against one accumulator — with the accumulator bucketed by the
join key (sinks.write_bucketed) the shuffle lands only on the delta
side. View reads are a multi-directory parquet scan; periodic
compaction (sinks.compact_table on the view root) folds the delta log
exactly like any small-files maintenance pass.

Reference parity: the reference re-reads and re-joins the ENTIRE
sheet against its dims on every cron run (Python-pipeline/
dataingestion3.py:29-45); the IVM form does the same enrichment
touching only new rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _delta_dir(root: str, apply_id: str) -> str:
    return os.path.join(root, f"delta={apply_id}")


def _write_delta(df: DataFrame, root: str, apply_id: str) -> None:
    df.write.mode("overwrite").parquet(_delta_dir(root, apply_id))


def _read_acc(spark: SparkSession, root: str) -> DataFrame | None:
    """The accumulated side, or None before its first delta (an empty
    accumulator means the join emits nothing — no schema needed)."""
    if os.path.isdir(root) and any(
        d.startswith("delta=") for d in os.listdir(root)
    ):
        return spark.read.parquet(os.path.join(root, "delta=*"))
    return None


class JoinView:
    """Incrementally-maintained inner equi-join view A ⋈ B.

    ``a_dir``/``b_dir`` hold the side accumulators, ``j_dir`` the
    log-structured join view. ``a_key``/``b_key`` are the equi-join
    columns. All three directories grow by one ``delta=<id>``
    subdirectory per apply; apply ids must be unique per (side,
    delta) and stable across retries.
    """

    def __init__(
        self, a_dir: str, b_dir: str, j_dir: str, a_key: str, b_key: str
    ) -> None:
        self.a_dir, self.b_dir, self.j_dir = a_dir, b_dir, j_dir
        self.a_key, self.b_key = a_key, b_key

    def apply_delta_a(self, delta: DataFrame, apply_id: str) -> None:
        b_acc = _read_acc(delta.sparkSession, self.b_dir)
        if b_acc is not None:
            new_pairs = delta.join(
                b_acc, delta[self.a_key] == b_acc[self.b_key], "inner"
            )
            _write_delta(new_pairs, self.j_dir, f"a_{apply_id}")
        _write_delta(delta, self.a_dir, apply_id)

    def apply_delta_b(self, delta: DataFrame, apply_id: str) -> None:
        a_acc = _read_acc(delta.sparkSession, self.a_dir)
        if a_acc is not None:
            new_pairs = a_acc.join(
                delta, a_acc[self.a_key] == delta[self.b_key], "inner"
            )
            _write_delta(new_pairs, self.j_dir, f"b_{apply_id}")
        _write_delta(delta, self.b_dir, apply_id)

    def view(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.j_dir, "delta=*"))
