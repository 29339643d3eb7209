"""Distributed Lloyd k-means over embedding columns — the real
training step behind the IVF index (replaces the round-1 stand-in
"centroids = first 8 vectors").

Execution model (the MLlib shape): each iteration is ONE map pass —
an Arrow-batched mapInPandas kernel assigns every vector to its
nearest centroid and emits per-batch partial centroid sums — followed
by a tiny (k·dim)-row groupBy and a driver collect of the new
centroids, which ship back into the next iteration's kernel closure.
Nothing row-wise ever reaches the driver; at 100 TB each iteration is
a full scan + a k·dim·n_partitions shuffle (kilobytes).

Cross-engine determinism (the DuckDB oracle unrolls the same
iterations as CTEs):

- distances accumulate LEFT-TO-RIGHT over the dim axis —
  ``acc = acc + (v_i - c_i)²`` one vectorized step per element
  index — the same IEEE op-sequence as the oracle's
  ``list_sum(list_transform(...))`` fold, so with bit-identical
  inputs the argmin (ties → lowest centroid_id, numpy stable
  argsort) picks the same centroid in both engines;
- centroid means use exact integer micro-units: members' elements →
  ``floor(x·1e6 + 0.5)`` int64, summed exactly (order-free), ONE
  float division chain ``su / cnt / 1e6`` — so the next iteration's
  centroids are bit-identical too, and divergence cannot compound;
- empty clusters keep their previous centroid in both engines.

Reference parity: no counterpart — the reference (pandas + Sheets)
has no vector indexing; this is the LLM-pipeline extension surface.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNIT_SCALE = 1_000_000.0

# --- scale-parameterized k ------------------------------------------
# SemDeDup / IVF need k to GROW with the corpus: with fixed k, cluster
# size is O(n/k) and every per-cluster kernel (gram matmul, probe
# scan) inherits an unbounded frame. Deriving k from the training-
# sample count keeps E[cluster] ~ TRAIN_PER_CENTROID * TRAIN_MOD rows
# at every scale (the faiss sizing rule: a few dozen-to-hundreds of
# training vectors per centroid). TRAIN_PER_CENTROID is a power of
# two so the oracle's ceil(count / 32.0) over a double is EXACT (n *
# 2^-5 is always representable), matching Python's integer ceil
# bit-for-bit. K_MAX bounds the driver collect (k x dim floats) and
# the kernel-closure broadcast: 65536 x 64 doubles = 32 MB, the
# practical ceiling before the centroid table itself must become a
# joined relation instead of a closure constant.
K_MIN = 8
K_MAX = 65_536
TRAIN_PER_CENTROID = 32


def derive_k(n_train: int) -> int:
    """k as a deterministic function of training-set size — the twin
    of ``sql_derive_k`` (both compute exact integer ceil)."""
    return max(K_MIN, min(K_MAX, -(-int(n_train) // TRAIN_PER_CENTROID)))


def sql_derive_k(train_src: str) -> str:
    """DuckDB expression computing the same k as ``derive_k`` from a
    training CTE. Exact: count/32.0 is a power-of-two scaling of an
    integer, so the double is the true rational and ceil agrees with
    integer ceil."""
    return (
        f"(SELECT greatest({K_MIN}, least({K_MAX},"
        f" CAST(ceil(count(*) / {float(TRAIN_PER_CENTROID)!r}) AS BIGINT)))"
        f" FROM {train_src})"
    )


def _dist2_matrix(mat, cents):
    """n×k squared-L2 distances, accumulated left-to-right over dim
    so each (row, centroid) entry is the exact scalar fold
    acc = acc + (v_i - c_i)² — DuckDB's list_sum order."""
    import numpy as np

    n = mat.shape[0]
    acc = np.zeros((n, cents.shape[0]), dtype=np.float64)
    for i in range(mat.shape[1]):
        d = mat[:, i : i + 1] - cents[:, i]
        acc = acc + d * d
    return acc


def _partial_sums(corpus: DataFrame, cents: list[list[float]], dim: int) -> DataFrame:
    """One Lloyd half-step: assign each vector to its nearest centroid
    and emit per-batch partial (cid, pos, su, cnt) in exact integer
    micro-units."""
    import numpy as np
    import pandas as pd

    cent_mat = np.array(cents, dtype=np.float64)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf["v"].tolist(), dtype=np.float64)
            units = np.floor(mat * UNIT_SCALE + 0.5).astype(np.int64)
            nearest = np.argmin(_dist2_matrix(mat, cent_mat), axis=1)
            out_cid, out_pos, out_su, out_cnt = [], [], [], []
            for cid in np.unique(nearest):
                mask = nearest == cid
                su = units[mask].sum(axis=0)  # int64, exact, order-free
                out_cid.extend([int(cid)] * dim)
                out_pos.extend(range(dim))
                out_su.extend(int(x) for x in su)
                out_cnt.extend([int(mask.sum())] * dim)
            yield pd.DataFrame(
                {"cid": out_cid, "pos": out_pos, "su": out_su, "cnt": out_cnt}
            )

    return corpus.select("v").mapInPandas(
        kernel, "cid int, pos int, su long, cnt long"
    )


def train_kmeans(
    corpus: DataFrame, dim: int, k: int = 8, iters: int = 3
) -> list[list[float]]:
    """Lloyd iterations over (emb_id, v: array<double>). Init = the k
    lowest-emb_id vectors (deterministic seed). Returns k×dim python
    floats — tiny, destined for the next kernel's closure.

    The caller passes the TRAINING set — at scale a deterministic
    hash/modulo sample of the corpus (the faiss posture: a few hundred
    vectors per centroid suffice), so training cost is decoupled from
    corpus size. Persisted across iterations: Lloyd re-reads it
    ``iters`` times and nothing upstream should be re-scanned."""
    corpus = corpus.persist()
    init = (
        corpus.orderBy("emb_id").limit(k).select("v").collect()
    )
    cents = [list(r.v) for r in init]
    for _ in range(iters):
        rows = (
            _partial_sums(corpus, cents, dim)
            .groupBy("cid", "pos")
            .agg(F.sum("su").alias("su"), F.sum("cnt").alias("cnt"))
            .collect()
        )
        nxt = [list(c) for c in cents]  # empty cluster → keep previous
        acc: dict[int, list] = {}
        for r in rows:
            acc.setdefault(r.cid, [[0, 0]] * dim)
            acc[r.cid] = acc[r.cid][:]
            acc[r.cid][r.pos] = [r.su, r.cnt]
        for cid, elems in acc.items():
            nxt[cid] = [
                (float(su) / float(cnt)) / UNIT_SCALE for su, cnt in elems
            ]
        cents = nxt
    corpus.unpersist()
    return cents


def assign_nearest(
    df: DataFrame,
    id_col: str,
    cents: list[list[float]],
    nprobe: int = 1,
    carry_v: bool = False,
) -> DataFrame:
    """(id_col, v) → (id_col, cluster_id, probe): the nprobe nearest
    centroids per vector (probe 0 = nearest; ties → lowest cid via
    numpy stable argsort). Map-only, no shuffle.

    ``carry_v=True`` keeps the vector column in the output so callers
    that need (cluster_id, v) downstream (e.g. the SemDeDup per-cluster
    gram prune) avoid an id-hash shuffle join back to the corpus —
    at 100 TB that join is a full second wide-row shuffle the map-only
    pass-through makes unnecessary."""
    import numpy as np
    import pandas as pd

    cent_mat = np.array(cents, dtype=np.float64)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf["v"].tolist(), dtype=np.float64)
            order = np.argsort(
                _dist2_matrix(mat, cent_mat), axis=1, kind="stable"
            )[:, :nprobe]
            n = len(mat)
            out = {
                id_col: np.repeat(pdf[id_col].to_numpy(), nprobe),
                "cluster_id": order.reshape(-1).astype(np.int32),
                "probe": np.tile(np.arange(nprobe, dtype=np.int32), n),
            }
            if carry_v:
                out["v"] = pdf["v"].to_numpy().repeat(nprobe)
            yield pd.DataFrame(out)

    schema = f"{id_col} long, cluster_id int, probe int"
    if carry_v:
        schema += ", v array<double>"
    return df.select(id_col, "v").mapInPandas(kernel, schema)


# --- two-level (coarse/fine) training ------------------------------
# At 100 TB the derived k reaches 10^4-10^5; single-level Lloyd costs
# sample x k distance evals per iteration. Two-level training (the
# SemDeDup / IVF_HNSW posture) cuts that to sample x (k_c + k_f):
# train k_c coarse centroids, bucket the sample, then train k_f fine
# centroids INSIDE every bucket simultaneously — one map pass per
# fine iteration handles all buckets (centroid dict in the kernel
# closure), so driver round-trips stay O(iters), not O(k_c * iters).


def derive_two_level_k(n_train: int) -> tuple[int, int]:
    """(k_coarse, k_fine) with k_c*k_f >= derive_k(n): k_c =
    ceil(sqrt(k)), k_f = ceil(k/k_c). Exact in both engines: sqrt and
    the division run on small exact integers, and a double quotient
    that is truly integral is exactly representable, so ceil never
    drifts (the SQL twin computes the identical pair)."""
    import math

    k = derive_k(n_train)
    kc = math.ceil(math.sqrt(k))
    kf = -(-k // kc)
    return kc, kf


def _two_level_partial_sums(
    corpus: DataFrame,
    coarse: list[list[float]],
    fine: dict[int, list[list[float]]],
    dim: int,
) -> DataFrame:
    """One fine-Lloyd half-step across ALL coarse buckets at once:
    re-derive each training vector's coarse bucket (deterministic —
    coarse is frozen), argmin over that bucket's fine centroids, emit
    per-batch partial (b, f, pos, su, cnt) in exact micro-units."""
    import numpy as np
    import pandas as pd

    coarse_mat = np.array(coarse, dtype=np.float64)
    fine_mats = {b: np.array(c, dtype=np.float64) for b, c in fine.items()}

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf["v"].tolist(), dtype=np.float64)
            units = np.floor(mat * UNIT_SCALE + 0.5).astype(np.int64)
            buckets = np.argmin(_dist2_matrix(mat, coarse_mat), axis=1)
            out = {"b": [], "f": [], "pos": [], "su": [], "cnt": []}
            for b in np.unique(buckets):
                sel = buckets == b
                sub, subu = mat[sel], units[sel]
                fmat = fine_mats[int(b)]
                nearest = np.argmin(_dist2_matrix(sub, fmat), axis=1)
                for f in np.unique(nearest):
                    m2 = nearest == f
                    su = subu[m2].sum(axis=0)
                    out["b"].extend([int(b)] * dim)
                    out["f"].extend([int(f)] * dim)
                    out["pos"].extend(range(dim))
                    out["su"].extend(int(x) for x in su)
                    out["cnt"].extend([int(m2.sum())] * dim)
            yield pd.DataFrame(out)

    return corpus.select("v").mapInPandas(
        kernel, "b int, f int, pos int, su long, cnt long"
    )


def train_kmeans_two_level(
    corpus: DataFrame,
    dim: int,
    k_coarse: int,
    k_fine: int,
    coarse_iters: int = 2,
    fine_iters: int = 2,
) -> tuple[list[list[float]], dict[int, list[list[float]]]]:
    """Returns (coarse, fine): coarse = k_c x dim centroids (frozen
    after stage 1), fine = {active bucket -> <=k_f x dim centroids}.
    Fine init = the k_f lowest-emb_id training members of each bucket
    (the same deterministic seed rule as train_kmeans, per bucket);
    buckets with no training member get no fine table and are simply
    inactive — assign_two_level restricts the coarse argmin to active
    buckets, mirroring the oracle's semi-join on trained buckets."""
    from pyspark.sql import Window

    coarse = train_kmeans(corpus, dim, k=k_coarse, iters=coarse_iters)
    corpus = corpus.persist()
    assigned = assign_nearest(corpus, "emb_id", coarse, nprobe=1, carry_v=True)
    w = Window.partitionBy("cluster_id").orderBy("emb_id")
    init_rows = (
        assigned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k_fine)
        .select("cluster_id", "_rn", "v")
        .collect()
    )
    fine: dict[int, list[list[float]]] = {}
    for r in sorted(init_rows, key=lambda r: (r.cluster_id, r._rn)):
        fine.setdefault(int(r.cluster_id), []).append(list(r.v))
    for _ in range(fine_iters):
        rows = (
            _two_level_partial_sums(corpus, coarse, fine, dim)
            .groupBy("b", "f", "pos")
            .agg(F.sum("su").alias("su"), F.sum("cnt").alias("cnt"))
            .collect()
        )
        nxt = {b: [list(c) for c in cents] for b, cents in fine.items()}
        acc: dict[tuple[int, int], list] = {}
        for r in rows:
            key = (int(r.b), int(r.f))
            acc.setdefault(key, [None] * dim)
            acc[key][r.pos] = (r.su, r.cnt)
        for (b, f), elems in acc.items():
            nxt[b][f] = [
                (float(su) / float(cnt)) / UNIT_SCALE for su, cnt in elems
            ]
        fine = nxt
    corpus.unpersist()
    return coarse, fine


def assign_two_level(
    df: DataFrame,
    id_col: str,
    coarse: list[list[float]],
    fine: dict[int, list[list[float]]],
    carry_v: bool = False,
) -> DataFrame:
    """(id_col, v) -> (id_col, bucket, fine_cid): coarse argmin over
    ACTIVE buckets only (those with a fine table), then fine argmin
    within the bucket. Map-only; ties -> lowest cid both levels.
    ``carry_v`` threads the vector through (same rationale as
    assign_nearest: spares downstream kernels an id-hash re-join)."""
    import numpy as np
    import pandas as pd

    active = sorted(fine)
    act_mat = np.array([coarse[b] for b in active], dtype=np.float64)
    act_ids = np.array(active, dtype=np.int64)
    fine_mats = {b: np.array(c, dtype=np.float64) for b, c in fine.items()}

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf["v"].tolist(), dtype=np.float64)
            buckets = act_ids[np.argmin(_dist2_matrix(mat, act_mat), axis=1)]
            fid = np.empty(len(mat), dtype=np.int32)
            for b in np.unique(buckets):
                sel = buckets == b
                fid[sel] = np.argmin(
                    _dist2_matrix(mat[sel], fine_mats[int(b)]), axis=1
                )
            out = {
                id_col: pdf[id_col].to_numpy(),
                "bucket": buckets.astype("int32"),
                "fine_cid": fid,
            }
            if carry_v:
                out["v"] = pdf["v"].to_numpy()
            yield pd.DataFrame(out)

    schema = f"{id_col} long, bucket int, fine_cid int"
    if carry_v:
        schema += ", v array<double>"
    return df.select(id_col, "v").mapInPandas(kernel, schema)


# --- DuckDB oracle twins ---


def sql_dist2(vec_expr: str, cent_expr: str, dim: int) -> str:
    """Same left-to-right fold as _dist2_matrix."""
    return (
        f"list_sum(list_transform(generate_series(1, {dim}),"
        f" i -> ({vec_expr}[i] - {cent_expr}[i]) * ({vec_expr}[i] - {cent_expr}[i])))"
    )


def sql_kmeans_ctes(
    dim: int, k: int | str = 8, iters: int = 3, train_src: str = "corpus",
    prefix: str = "",
) -> str:
    """CTE chain reproducing train_kmeans bit-for-bit on a
    ``train_src`` CTE of (emb_id, v: list<double>) — the same
    training subset the Spark side passes in. Terminal CTE:
    {prefix}cent{iters} = (cid, cvec). ``prefix`` namespaces the CTE
    chain so several trainings (e.g. one per PQ subspace) can live in
    one WITH clause.

    ``k`` may be an int literal OR a SQL scalar expression (e.g.
    ``sql_derive_k("train")``) so the oracle derives the same
    data-dependent k the Spark side computes — the init filter is a
    row_number predicate rather than LIMIT so an expression works."""
    parts = [
        f"""{prefix}cent0 AS (
  SELECT CAST(_rn - 1 AS INTEGER) AS cid, v AS cvec
  FROM (SELECT emb_id, v,
               row_number() OVER (ORDER BY emb_id) AS _rn
        FROM {train_src})
  WHERE _rn <= {k}
)"""
    ]
    for t in range(iters):
        parts.append(f"""{prefix}assign{t} AS (
  SELECT emb_id, v, cid FROM (
    SELECT e.emb_id, e.v, c.cid,
           row_number() OVER (PARTITION BY e.emb_id
             ORDER BY {sql_dist2("e.v", "c.cvec", dim)} ASC, c.cid ASC) AS _rn
    FROM {train_src} e CROSS JOIN {prefix}cent{t} c
  ) WHERE _rn = 1
)""")
        parts.append(f"""{prefix}sums{t} AS (
  SELECT cid, i AS pos,
         CAST(sum(CAST(floor(v[i] * {UNIT_SCALE!r} + 0.5) AS BIGINT)) AS BIGINT) AS su,
         count(*) AS cnt
  FROM {prefix}assign{t}, generate_series(1, {dim}) AS g(i)
  GROUP BY cid, i
)""")
        parts.append(f"""{prefix}cent{t + 1} AS (
  SELECT p.cid,
         coalesce(n.cvec, p.cvec) AS cvec
  FROM {prefix}cent{t} p LEFT JOIN (
    SELECT cid, list(CAST(su AS DOUBLE) / CAST(cnt AS DOUBLE) / {UNIT_SCALE!r}
                     ORDER BY pos) AS cvec
    FROM {prefix}sums{t} GROUP BY cid
  ) n USING (cid)
)""")
    return ",\n".join(parts)


def sql_two_level_params(train_src: str, prefix: str = "") -> str:
    """{prefix}kp CTE holding (k, kc, kf) — the derive_two_level_k
    twin computed in SQL from the training count."""
    return f"""{prefix}kp AS (
  SELECT k,
         CAST(ceil(sqrt(k)) AS BIGINT) AS kc,
         CAST(ceil(CAST(k AS DOUBLE)
              / CAST(ceil(sqrt(k)) AS BIGINT)) AS BIGINT) AS kf
  FROM (SELECT {sql_derive_k(train_src)} AS k)
)"""


def sql_kmeans_two_level_ctes(
    dim: int,
    train_src: str = "train",
    coarse_iters: int = 2,
    fine_iters: int = 2,
    prefix: str = "",
) -> str:
    """CTE chain reproducing train_kmeans_two_level bit-for-bit:
    coarse chain (sql_kmeans_ctes with kc from the param CTE), the
    frozen bucket assignment of the training set, per-bucket fine
    init (kf lowest emb_id), fine Lloyd iterations grouped by
    (bucket, fine cid). Terminal CTE: {prefix}fcent{fine_iters} =
    (b, f, cvec); active buckets are exactly the b values present."""
    p = prefix
    parts = [
        sql_two_level_params(train_src, p),
        sql_kmeans_ctes(
            dim,
            k=f"(SELECT kc FROM {p}kp)",
            iters=coarse_iters,
            train_src=train_src,
            prefix=p + "c",
        ),
        f"""{p}base AS (
  SELECT emb_id, v, cid AS b FROM (
    SELECT e.emb_id, e.v, c.cid,
           row_number() OVER (PARTITION BY e.emb_id
             ORDER BY {sql_dist2("e.v", "c.cvec", dim)} ASC, c.cid ASC) AS _rn
    FROM {train_src} e CROSS JOIN {p}ccent{coarse_iters} c
  ) WHERE _rn = 1
)""",
        f"""{p}fcent0 AS (
  SELECT b, CAST(_rn - 1 AS INTEGER) AS f, v AS cvec FROM (
    SELECT b, v, row_number() OVER (PARTITION BY b ORDER BY emb_id) AS _rn
    FROM {p}base
  ) WHERE _rn <= (SELECT kf FROM {p}kp)
)""",
    ]
    for t in range(fine_iters):
        parts.append(f"""{p}fa{t} AS (
  SELECT emb_id, v, b, f FROM (
    SELECT e.emb_id, e.v, e.b, c.f,
           row_number() OVER (PARTITION BY e.emb_id
             ORDER BY {sql_dist2("e.v", "c.cvec", dim)} ASC, c.f ASC) AS _rn
    FROM {p}base e JOIN {p}fcent{t} c ON c.b = e.b
  ) WHERE _rn = 1
)""")
        parts.append(f"""{p}fs{t} AS (
  SELECT b, f, i AS pos,
         CAST(sum(CAST(floor(v[i] * {UNIT_SCALE!r} + 0.5) AS BIGINT)) AS BIGINT) AS su,
         count(*) AS cnt
  FROM {p}fa{t}, generate_series(1, {dim}) AS g(i)
  GROUP BY b, f, i
)""")
        parts.append(f"""{p}fcent{t + 1} AS (
  SELECT prev.b, prev.f, coalesce(n.cvec, prev.cvec) AS cvec
  FROM {p}fcent{t} prev LEFT JOIN (
    SELECT b, f, list(CAST(su AS DOUBLE) / CAST(cnt AS DOUBLE) / {UNIT_SCALE!r}
                      ORDER BY pos) AS cvec
    FROM {p}fs{t} GROUP BY b, f
  ) n USING (b, f)
)""")
    return ",\n".join(parts)
