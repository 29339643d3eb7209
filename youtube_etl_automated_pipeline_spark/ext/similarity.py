"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the IVF variant is
the scale path (assign to nearest centroid, search only the bucket —
the candidate set shrinks by the cluster count).

Kernel design for the O(pairs) hot path: Spark's higher-order
functions (zip_with/aggregate) are INTERPRETED (CodegenFallback), so
anything per-pair must avoid them. The pattern here:

1. ``unit()`` — normalize each vector ONCE per row (interpreted, but
   O(rows), off the hot path);
2. ``dot_unrolled()`` — the per-pair kernel is a flat sum of
   ``element_at`` products (dimension known up front), which
   whole-stage codegen compiles to a tight loop-free Java expression.

Cosine of unit vectors is just the dot product, so per-pair cost
drops from 2 norms + 1 dot of interpreted lambdas to one codegen'd
expression.

Cross-engine determinism: cosines are rounded (floor-trick, 6dp)
before any ordering/thresholding so Spark and the DuckDB oracle agree
on ranks and set membership; the oracle mirrors the same
normalize-then-dot arithmetic term by term.
"""

from __future__ import annotations

from functools import reduce

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


def unit(vec: Column) -> Column:
    """Unit-normalized double vector; zero vectors stay zero (so a
    later dot with anything is 0, matching the zero-norm guard)."""
    vd = as_double(vec)
    n = norm(vd)
    return F.when(n > 0, F.transform(vd, lambda x: x / n)).otherwise(
        F.transform(vd, lambda x: F.lit(0.0))
    )


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Codegen-friendly fixed-dimension dot product: a flat left-to-
    right sum of element products — no lambda, no interpreted eval."""
    return reduce(
        lambda acc, i: acc + F.element_at(a, i) * F.element_at(b, i),
        range(2, dim + 1),
        F.element_at(a, 1) * F.element_at(b, 1),
    )


def dot_unrolled_sql(a: str, b: str, dim: int) -> str:
    """The same flat unrolled dot product as ``dot_unrolled`` but as a
    SQL string for ONE ``F.expr`` parse. Building the 3·dim-node tree
    through the Python Column API costs ~3·dim py4j round-trips PER
    CALL SITE (~1 ms each — measured seconds of pure DataFrame-build
    time per query at dim=64); the parser builds the identical
    left-associative tree JVM-side in microseconds. Same nodes, same
    codegen, same bits — only the construction path changes."""
    return " + ".join(
        f"element_at({a}, {i}) * element_at({b}, {i})" for i in range(1, dim + 1)
    )


def cosine_unit(a: Column, b: Column, dim: int, dp: int = 6) -> Column:
    """Rounded cosine of two PRE-NORMALIZED (unit) vectors."""
    return hround(dot_unrolled(a, b, dim), dp)


def cosine_unit_cols(a: str, b: str, dim: int, dp: int = 6) -> Column:
    """``cosine_unit`` over column NAMES — parser-built (see
    ``dot_unrolled_sql``), for call sites where the operands are plain
    columns rather than computed expressions."""
    return hround(F.expr(dot_unrolled_sql(a, b, dim)), dp)


def _unit_rows_exact(x):
    """numpy twin of ``unit()`` that replays Spark's EXACT IEEE-754
    float64 op sequence per row so results are bitwise identical:
    norm² = ((0.0 + x1²) + x2²) + ... left-to-right (numpy additions
    iterated dim-sequentially — never np.sum, whose pairwise
    accumulation rounds differently), then sqrt, then per-element
    x_i / norm. Zero-norm rows map to all-zero rows, matching the
    ``when(n > 0)`` guard. Input float64 (n, dim); the float→double
    cast upstream is exact in either engine."""
    import numpy as np

    if not x.size:
        return x
    acc = x[:, 0] * x[:, 0]
    for i in range(1, x.shape[1]):
        acc = acc + x[:, i] * x[:, i]
    n = np.sqrt(acc)
    out = np.zeros_like(x)
    nz = n > 0.0
    out[nz] = x[nz] / n[nz, None]
    return out


def _dot_rounded_exact(a, b):
    """numpy twin of ``cosine_unit_cols`` over unit rows: the (n, m)
    matrix of left-associative float64 dot products — acc starts at
    a1*b1 and adds one a_i*b_i term per dim step, exactly
    ``dot_unrolled``'s association order (no BLAS matmul, whose
    blocked/FMA accumulation rounds differently) — then the
    engine-wide floor(x*1e6 + 0.5) / 1e6 rounding. Every output bit
    matches the JVM expression's value."""
    import numpy as np

    acc = a[:, 0, None] * b[None, :, 0]
    for i in range(1, a.shape[1]):
        acc = acc + a[:, i, None] * b[None, :, i]
    return np.floor(acc * 1e6 + 0.5) / 1e6


_DIM_MEMO: dict[tuple, int] = {}


def embedding_dim(df: DataFrame, vec_col: str = "embedding") -> int:
    """Read the (fixed) vector dimension from the first row — one tiny
    driver action. Memoized per (session, source files, column): ~20
    registry queries probe the same table's dimension on every build,
    and under the bench's min-of-N each probe is a whole extra Spark
    job (r08, guide section 1.2 — don't recompute what you throw
    away). The key is the scan's resolved file list PLUS each file's
    (mtime_ns, size) — the repo's table_fingerprint discipline (r08
    advice): a table rewritten IN PLACE at the same paths within one
    session changes the stat pair, so the memo misses and re-probes
    instead of serving a stale dimension. Computed relations report no
    input files and skip the memo entirely. Stat-only; ~µs per call."""
    try:
        files = tuple(sorted(df.inputFiles()))
    except Exception:
        files = ()
    key = None
    if files:
        import os

        def _stat(uri: str) -> tuple:
            path = uri[7:] if uri.startswith("file:") else uri
            try:
                st = os.stat(path)
                return (st.st_mtime_ns, st.st_size)
            except OSError:
                return (0, 0)  # non-local/missing: constant, no reuse risk
            # (0,0) for every file would collide across rewrites of
            # non-statable sources; those also keep the file list in
            # the key, and object-store rewrites change the URI list.

        fp = tuple(_stat(f) for f in files)
        key = (df.sparkSession.sparkContext.applicationId, files, fp, vec_col)
        hit = _DIM_MEMO.get(key)
        if hit is not None:
            return hit
    row = df.select(F.size(vec_col).alias("d")).first()
    d = int(row["d"])
    if key is not None:
        _DIM_MEMO[key] = d
    return d


def cosine(a: Column, b: Column, dp: int = 6) -> Column:
    """Rounded cosine similarity; zero-norm inputs -> 0. General-dim
    interpreted form — fine off the hot path; use unit()+cosine_unit()
    for per-pair kernels."""
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


def label_norm_stats(emb: DataFrame) -> DataFrame:
    """Grouped-map applyInPandas: per-label vector-norm statistics.
    One Arrow batch per label group, numpy-vectorized within the
    group — the grouped-map flavor of the Pandas UDF surface (the
    stateful and mapInPandas flavors live in streaming/ and
    ext/multimodal.py). Shuffles once on the group key."""
    import numpy as np
    import pandas as pd

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)
        # the NULL label is a legitimate SQL group (GROUP BY keeps
        # it); a bare int() on it would crash the worker
        first = pdf["label"].iloc[0]
        return pd.DataFrame(
            [
                (
                    None if pd.isna(first) else int(first),
                    len(pdf),
                    r6(norms.min()),
                    r6(norms.max()),
                    r6(norms.sum() / len(norms)),
                )
            ],
            columns=["label", "n_vecs", "min_norm", "max_norm", "mean_norm"],
        )

    return emb.select("label", "embedding").groupBy("label").applyInPandas(
        stats,
        "label int, n_vecs long, min_norm double, max_norm double, mean_norm double",
    )
