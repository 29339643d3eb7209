"""Explicitly-bounded single-partition windows.

A ``Window.orderBy(...)`` with no partition spec moves its whole
input to ONE task — Spark logs ``WindowExec: No Partition Defined``
because over an unbounded relation that is a scale killer. Every use
in this engine is over a relation that is provably bounded BEFORE the
window runs (a ``limit(k)`` head, a per-day/per-cell aggregate, a
K-truncated sketch), where a single task is the correct plan: the
bound, not the partition count, is the capacity argument.

``bounded_window(anchor)`` makes that audit explicit in the plan: it
partitions on a constant-zero expression derived (non-foldably) from
an anchor column of the bounded relation, so the planner sees a real
single-bucket partition spec instead of an empty one. Physically
identical — every row hashes to the one ``0`` bucket — but it
distinguishes "audited, bounded by construction" from "forgot to
partition", both for a reader of the plan and for the planner's
warning, which only fires on an EMPTY spec. The key expression has
to thread two optimizer rules: a bare ``lit(0)`` is erased by
ConstantFolding, and ``non_nullable_expr * 0`` folds away too, while
a nullable ``col * 0`` survives but yields NULL on null anchors — a
SECOND hash bucket, which would silently split a global window.
``pmod(hash(col), 1)`` threads both: ``hash`` is never null (a null
input hashes to the seed), so the key is 0 for every row, yet
``pmod`` is statically nullable so the optimizer keeps it. Call
sites state their bound in the enclosing docstring; new
unpartitioned windows over unbounded relations are a bug, not a
candidate for this helper.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def bounded_window(anchor: Column | str) -> WindowSpec:
    """A single-partition window base for provably bounded relations.

    ``anchor`` is any column of the (bounded) input relation; the
    partition key is ``0`` for every row regardless of its value,
    type, or nullness, so semantics match an empty partition spec
    exactly. Use ``.orderBy(...)`` / ``.rowsBetween(...)`` on the
    result as usual.
    """
    col = F.col(anchor) if isinstance(anchor, str) else anchor
    return Window.partitionBy(F.pmod(F.hash(col), F.lit(1)))
