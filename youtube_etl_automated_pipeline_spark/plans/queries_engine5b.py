"""Round-5 batch 2: Johnson–Lindenstrauss projection audit and MMR
diversity re-ranking — two more published-technique operators with
DuckDB oracle twins.

- ``embedding_jl_projection`` — random-sign (Achlioptas 2003) JL
  projection 64 -> 16 dims with a pairwise-distance distortion audit:
  the cheap dimensionality-reduction step a 100 TB embedding pipeline
  runs before clustering/LSH, plus the census that certifies the
  distance-preservation the JL lemma promises. The sign matrix is
  derived from md5 (pure-Python at import), so both engines share the
  identical literal matrix.
- ``retrieval_mmr_rerank`` — Maximal Marginal Relevance re-ranking
  (Carbonell & Goldstein, SIGIR 1998): greedy selection maximizing
  λ·relevance − (1−λ)·max-similarity-to-already-selected over a
  bounded top-C candidate pool — the diversity pass a retrieval stack
  runs after ANN candidate generation. Greedy steps are unrolled
  (fixed k) in both engines.

Cross-engine exactness: every score collapses to integer micro-units
before any argmax/threshold; float arithmetic is term-identical
(mirrored unrolled sums, same operand order).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_automated_pipeline_spark.ext.similarity import (
    dot_unrolled_sql,
    embedding_dim,
    unit,
)
from youtube_etl_automated_pipeline_spark.sources import load_wide

# --- JL projection ---------------------------------------------------
JL_IN_DIM = 64
JL_OUT_DIM = 16
JL_N_PAIRS = 24  # audit pairs (2t, 2t+1), t < JL_N_PAIRS


def _jl_sign(i: int, j: int) -> int:
    """Deterministic ±1 from md5 — identical constant in both engines
    (computed once at import, embedded as literals)."""
    h = hashlib.md5(f"jl:{i}:{j}".encode()).hexdigest()
    return 1 if int(h[0], 16) < 8 else -1


JL_SIGNS = [
    [_jl_sign(i, j) for j in range(JL_OUT_DIM)] for i in range(JL_IN_DIM)
]


def _proj_diff_term(j: int, elem: str) -> str:
    """Unrolled Σ_i sign_ij · diff_i as one left-associative SQL sum
    (projection is linear, so project the pair DIFFERENCE once).
    ``elem`` formats the i-th diff element, 1-based."""
    parts = []
    for i in range(JL_IN_DIM):
        s = JL_SIGNS[i][j]
        e = elem.format(i=i + 1)
        parts.append(f"({e})" if s == 1 else f"(-({e}))")
    return " + ".join(parts)


def embedding_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random-sign projection distortion audit: project each audit
    pair's difference vector through the shared ±1 matrix and compare
    squared distances, ratio = (||R·(a-b)||²/OUT_DIM) / ||a-b||² in
    integer micro-units (JL lemma: concentrated near 1).

    Scale shape: the projection is a pure map — an Arrow-batched
    numpy kernel (mapInPandas), vectorized ACROSS rows with the
    dim-axis accumulated sequentially so the double-add order is
    bit-reproducible (a 2048-term unrolled SQL expression computes
    the same thing but blows past the JVM codegen method limit and
    falls back to per-row interpretation — measured 7s vs sub-second
    for the kernel). The audit joins consecutive vec_ids (equi-join,
    O(n) pairs in general). This is the certify-then-trust step
    before swapping 64-dim vectors for 16-dim ones in downstream
    clustering/LSH: 4× less shuffle volume everywhere after.

    Exactness: both engines evaluate the SAME sequential-order sums
    over the SAME literal matrix; one double division, then the
    micro-unit floor.
    """
    import numpy as np
    import pandas as pd

    emb = load_wide(spark, sf_dir, "embeddings")
    dim = embedding_dim(emb)
    assert dim == JL_IN_DIM, f"JL matrix is {JL_IN_DIM}-dim, got {dim}"
    a = emb.filter(
        (F.col("vec_id") % 2 == 0) & (F.col("vec_id") < 2 * JL_N_PAIRS)
    ).select((F.col("vec_id") / 2).cast("int").alias("pair_id"),
             F.col("embedding").alias("va"))
    b = emb.filter(
        (F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 2 * JL_N_PAIRS)
    ).select(((F.col("vec_id") - 1) / 2).cast("int").alias("pair_id"),
             F.col("embedding").alias("vb"))
    signs = np.array(JL_SIGNS, dtype=np.float64)  # (IN, OUT)

    def kernel(batches):
        # Arrow-vectorized across rows; the i/j accumulations loop
        # SEQUENTIALLY so every double add happens in the exact order
        # the oracle's left-associative list_sum folds use (np.sum's
        # pairwise summation would diverge in the last ulp).
        for pdf in batches:
            if not len(pdf):
                continue
            va = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["va"]]
            )
            vb = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["vb"]]
            )
            dv = va - vb  # (rows, IN) — same IEEE subtract per element
            d2 = np.zeros(len(pdf))
            for i in range(JL_IN_DIM):
                d2 += dv[:, i] * dv[:, i]
            proj = np.zeros((len(pdf), JL_OUT_DIM))
            for i in range(JL_IN_DIM):
                # per output dim j the i-terms accumulate in ascending
                # i order, matching the unrolled SQL sum term order
                proj += dv[:, i][:, None] * signs[i][None, :]
            psq = np.zeros(len(pdf))
            for j in range(JL_OUT_DIM):
                psq += proj[:, j] * proj[:, j]
            ratio = np.floor((psq / JL_OUT_DIM) / d2 * 1e6 + 0.5)
            out = pd.DataFrame(
                {
                    "pair_id": pdf["pair_id"],
                    "ratio_micro": pd.array(
                        np.where(d2 > 0, ratio, np.nan), dtype="Int64"
                    ),
                }
            )
            yield out

    paired = a.join(b, "pair_id")
    projected = paired.mapInPandas(
        kernel, schema="pair_id int, ratio_micro long"
    )
    return (
        # integer DIV, not `/`+cast: Spark casts double->int by
        # truncation while DuckDB ROUNDS — 11.5 would split 11 vs 12
        projected.withColumn(
            "ratio_decile", F.expr("CAST(ratio_micro DIV 100000 AS INT)")
        )
        .orderBy("pair_id")
    )


# --- MMR re-ranking --------------------------------------------------
MMR_QUERY_ID = 7
MMR_POOL = 10  # candidate pool from the exact top-C pass
MMR_K = 4  # greedy selections (unrolled in both engines)
MMR_LAMBDA_NUM, MMR_LAMBDA_DEN = 7, 10  # λ = 0.7 as an exact rational


def retrieval_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-ranking over a bounded candidate pool: after
    exact top-``MMR_POOL`` retrieval for one query vector, greedily
    pick ``MMR_K`` results maximizing

        mmr(c) = λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)

    (Carbonell & Goldstein 1998) — near-duplicate candidates are
    penalized by their similarity to already-selected results, the
    post-ANN diversity pass of a retrieval stack.

    Scale shape: the DISTRIBUTED work is candidate generation (the
    broadcast-query corpus scan of `similarity_bruteforce_topk`) and
    the pool's pairwise similarities; the greedy argmax loop is
    inherently sequential over a CONSTANT-size pool, so pool + sims
    collapse to ONE row of sorted arrays (~100 small integers) and
    the K-step greedy runs inside a single Arrow kernel task — build
    stays lazy, nothing collects to the driver. Composing the K
    steps as nested limit-1 DataFrame branches instead was measured
    3.6s of pure stage overhead for 10 rows — the wrong side of the
    constant-vs-distributed line. Scores are exact integers:
    mmr·DEN = NUM·rel_micro − (DEN−NUM)·max_sim_micro.

    Exactness: rel/sim micro-cosines use the proven unit-dot kernel;
    argmax ties break on lowest vec_id in both engines.
    """
    from youtube_etl_automated_pipeline_spark.operators.cache_registry import (
        memo_persist,
    )

    emb = load_wide(spark, sf_dir, "embeddings")
    dim = embedding_dim(emb)
    q = emb.filter(F.col("vec_id") == MMR_QUERY_ID).select(
        unit(F.col("embedding")).alias("q_u")
    )
    corpus = emb.filter(F.col("vec_id") != MMR_QUERY_ID).select(
        F.col("vec_id").alias("cand_id"), unit(F.col("embedding")).alias("c_u")
    )
    rel = F.floor(
        F.expr(dot_unrolled_sql("q_u", "c_u", dim)) * 1e6 + F.lit(0.5)
    ).cast("long")
    # persist the POOL-row candidate relation: the greedy loop's plan
    # references it O(K^2) times (every step's remaining/scored/pick
    # branch) — without the persist each branch would re-run the
    # corpus scoring scan
    pool = memo_persist(
        spark,
        ("mmr_pool", sf_dir),
        lambda: corpus.crossJoin(F.broadcast(q))
        .select("cand_id", "c_u", rel.alias("rel_micro"))
        .orderBy(F.desc("rel_micro"), F.asc("cand_id"))
        .limit(MMR_POOL),
    )
    # pairwise candidate similarities within the bounded pool
    pa = pool.select(F.col("cand_id").alias("ca"), F.col("c_u").alias("ua"))
    pb = pool.select(F.col("cand_id").alias("cb"), F.col("c_u").alias("ub"))
    sim = F.floor(
        F.expr(dot_unrolled_sql("ua", "ub", dim)) * 1e6 + F.lit(0.5)
    ).cast("long")
    sims = memo_persist(
        spark,
        ("mmr_sims", sf_dir),
        lambda: pa.join(F.broadcast(pb), F.col("ca") != F.col("cb"))
        .select("ca", "cb", sim.alias("sim_micro")),
    )
    import pandas as pd

    lam, lam1 = MMR_LAMBDA_NUM, MMR_LAMBDA_DEN - MMR_LAMBDA_NUM
    # collapse pool + sims to ONE row of sorted arrays (sort_array
    # pins determinism — collect_list order is partition-dependent),
    # then run the sequential greedy inside a single Arrow kernel
    # task. Build stays fully lazy (no jobs until an action), and the
    # constant-size rerank never ships through a deep limit-1 plan.
    pool_row = pool.agg(
        F.sort_array(
            F.collect_list(F.struct("cand_id", "rel_micro"))
        ).alias("pool")
    )
    sims_row = sims.agg(
        F.sort_array(
            F.collect_list(F.struct("ca", "cb", "sim_micro"))
        ).alias("simlist")
    )
    one = pool_row.crossJoin(F.broadcast(sims_row))

    def greedy(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                rel_of = {p["cand_id"]: p["rel_micro"] for p in row["pool"]}
                sim_of = {
                    (s["ca"], s["cb"]): s["sim_micro"]
                    for s in row["simlist"]
                }
                chosen: list[int] = []
                out = []
                for step in range(1, MMR_K + 1):
                    best = None
                    for cid in sorted(rel_of):
                        if cid in chosen:
                            continue
                        max_sim = max(
                            (sim_of[(cid, s)] for s in chosen), default=None
                        )
                        num = rel_of[cid] * lam - (
                            max_sim * lam1 if max_sim is not None else 0
                        )
                        # argmax, lowest-cand_id tiebreak (asc scan)
                        if best is None or num > best[1]:
                            best = (cid, num)
                    out.append((step, best[0], rel_of[best[0]], best[1]))
                    chosen.append(best[0])
                yield pd.DataFrame(
                    out,
                    columns=[
                        "sel_rank", "cand_id", "rel_micro", "mmr_score_x10"
                    ],
                )

    return one.mapInPandas(
        greedy,
        schema=(
            "sel_rank int, cand_id long, rel_micro long, mmr_score_x10 long"
        ),
    ).orderBy("sel_rank")


QUERIES_ENGINE5B = {
    "embedding_jl_projection": embedding_jl_projection,
    "retrieval_mmr_rerank": retrieval_mmr_rerank,
}


def _sql_norm_elem(arr: str) -> str:
    return (
        f"sqrt(list_sum(list_transform(generate_series(1, len({arr})),"
        f" k -> CAST({arr}[k] AS DOUBLE) * CAST({arr}[k] AS DOUBLE))))"
    )


def _sql_micro_unit_dot(a: str, b: str) -> str:
    """Twin of unit()+dot_unrolled()+micro floor (same as engine5's
    _micro_cos — duplicated locally to keep each module freestanding)."""
    na, nb = _sql_norm_elem(a), _sql_norm_elem(b)
    dot = (
        f"list_sum(list_transform(generate_series(1, len({a})),"
        f" k -> (CAST({a}[k] AS DOUBLE) / {na}) * (CAST({b}[k] AS DOUBLE) / {nb})))"
    )
    raw = f"CASE WHEN {na} > 0 AND {nb} > 0 THEN {dot} ELSE 0 END"
    return f"CAST(floor(({raw}) * 1000000.0 + 0.5) AS BIGINT)"


def _jl_oracle() -> str:
    elem = "(CAST(va[{i}] AS DOUBLE) - CAST(vb[{i}] AS DOUBLE))"
    d2_orig = " + ".join(
        f"({elem.format(i=i + 1)}) * ({elem.format(i=i + 1)})"
        for i in range(JL_IN_DIM)
    )
    proj_sq = " + ".join(
        f"(({_proj_diff_term(j, elem)}) * ({_proj_diff_term(j, elem)}))"
        for j in range(JL_OUT_DIM)
    )
    ratio = (
        f"CASE WHEN ({d2_orig}) > 0 THEN"
        f" CAST(FLOOR((({proj_sq}) / {JL_OUT_DIM}) / ({d2_orig})"
        f" * 1000000.0 + 0.5) AS BIGINT) END"
    )
    return f"""
WITH a AS (
  SELECT CAST(vec_id / 2 AS INT) AS pair_id, embedding AS va
  FROM embeddings WHERE vec_id % 2 = 0 AND vec_id < {2 * JL_N_PAIRS}
),
b AS (
  SELECT CAST((vec_id - 1) / 2 AS INT) AS pair_id, embedding AS vb
  FROM embeddings WHERE vec_id % 2 = 1 AND vec_id < {2 * JL_N_PAIRS}
)
SELECT pair_id, ratio_micro,
       CAST(ratio_micro // 100000 AS INT) AS ratio_decile
FROM (
  SELECT pair_id, {ratio} AS ratio_micro
  FROM a JOIN b USING (pair_id)
)
ORDER BY pair_id
"""


def _mmr_oracle() -> str:
    lam, lam1 = MMR_LAMBDA_NUM, MMR_LAMBDA_DEN - MMR_LAMBDA_NUM
    steps = []
    steps.append(f"""
sel1 AS MATERIALIZED (
  SELECT cand_id, 1 AS sel_rank, rel_micro * {lam} AS mmr_num
  FROM pool ORDER BY rel_micro DESC, cand_id ASC LIMIT 1
)""")
    prev_union = "SELECT cand_id, sel_rank, mmr_num FROM sel1"
    for step in range(2, MMR_K + 1):
        steps.append(f"""
seln{step} AS MATERIALIZED ({prev_union}),
sel{step} AS MATERIALIZED (
  SELECT p.cand_id, {step} AS sel_rank,
         p.rel_micro * {lam}
           - coalesce((SELECT max(s.sim_micro) FROM sims s
                       WHERE s.ca = p.cand_id
                         AND s.cb IN (SELECT cand_id FROM seln{step})), 0)
             * {lam1} AS mmr_num
  FROM pool p
  WHERE p.cand_id NOT IN (SELECT cand_id FROM seln{step})
  ORDER BY mmr_num DESC, p.cand_id ASC LIMIT 1
)""")
        prev_union += f" UNION ALL SELECT cand_id, sel_rank, mmr_num FROM sel{step}"
    return f"""
WITH q AS (
  SELECT embedding AS q_emb FROM embeddings WHERE vec_id = {MMR_QUERY_ID}
),
corpus AS (
  SELECT vec_id AS cand_id, embedding AS c_emb FROM embeddings
  WHERE vec_id != {MMR_QUERY_ID}
),
pool AS MATERIALIZED (
  SELECT cand_id, c_emb,
         {_sql_micro_unit_dot("q_emb", "c_emb")} AS rel_micro
  FROM corpus CROSS JOIN q
  ORDER BY rel_micro DESC, cand_id ASC LIMIT {MMR_POOL}
),
sims AS MATERIALIZED (
  SELECT a.cand_id AS ca, b.cand_id AS cb,
         {_sql_micro_unit_dot("a.c_emb", "b.c_emb")} AS sim_micro
  FROM pool a JOIN pool b ON a.cand_id != b.cand_id
),
{",".join(steps)}
SELECT sel_rank, s.cand_id, p.rel_micro, s.mmr_num AS mmr_score_x10
FROM ({prev_union}) s JOIN pool p ON s.cand_id = p.cand_id
ORDER BY sel_rank
"""


ORACLES_ENGINE5B = {
    "embedding_jl_projection": _jl_oracle(),
    "retrieval_mmr_rerank": _mmr_oracle(),
}


def array_hof_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function surface in one gate query: the per-row
    array pipeline filter -> transform -> aggregate -> distinct ->
    sort -> slice, entirely JVM-side (no Python boundary) — the
    API breadth a pandas user migrating row loops onto this engine
    reaches for first. Per doc: long tokens (len >= 4) lowercased,
    their exact character mass via an aggregate fold, the distinct
    census, and the 3 lexicographically-first tokens; rolled up per
    language.

    Scale shape: pure scan-projection (HOFs evaluate per row — they
    are interpreted expressions, fine OFF the per-pair hot path; see
    ext/similarity.py for when they are not) + one rollup shuffle.
    Integer sums only.

    Oracle twin: DuckDB's list_filter / list_transform / list_sum /
    list_distinct / list_sort / list_slice mirror each step; both
    sides sort with plain lexicographic ordering over lowercased
    ASCII-ish tokens.
    """
    from youtube_etl_automated_pipeline_spark.ext.textstats import tokens

    docs = load_wide(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = F.transform(
        F.filter(tokens(F.col("text")), lambda x: F.length(x) >= 4),
        F.lower,
    )
    d = docs.select("lang", toks.alias("toks")).select(
        "lang",
        F.size("toks").alias("n_long"),
        F.aggregate(
            "toks", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("char_mass"),
        F.size(F.array_distinct("toks")).alias("n_uniq"),
        F.concat_ws(
            "|", F.slice(F.array_sort("toks"), 1, 3)
        ).alias("first3"),
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_long").alias("sum_long_tokens"),
            F.sum("char_mass").alias("sum_char_mass"),
            F.sum("n_uniq").alias("sum_uniq_tokens"),
            F.min("first3").alias("min_first3"),
        )
        .orderBy("lang")
    )


QUERIES_ENGINE5B["array_hof_pipeline"] = array_hof_pipeline

from youtube_etl_automated_pipeline_spark.ext.textstats import (  # noqa: E402
    WS_CHARS as _WS_CHARS,
)

ORACLES_ENGINE5B["array_hof_pipeline"] = f"""
WITH toked AS (
  SELECT lang,
         CASE WHEN trim(text) = '' THEN []
              ELSE list_transform(
                list_filter(
                  string_split_regex(trim(text), '[{_WS_CHARS}]+'),
                  x -> length(x) >= 4),
                x -> lower(x))
         END AS toks
  FROM documents WHERE text IS NOT NULL
),
perdoc AS (
  SELECT lang,
         len(toks) AS n_long,
         coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
           AS char_mass,
         len(list_distinct(toks)) AS n_uniq,
         array_to_string(list_slice(list_sort(toks), 1, 3), '|') AS first3
  FROM toked
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_long) AS BIGINT) AS sum_long_tokens,
       CAST(sum(char_mass) AS BIGINT) AS sum_char_mass,
       CAST(sum(n_uniq) AS BIGINT) AS sum_uniq_tokens,
       min(first3) AS min_first3
FROM perdoc GROUP BY lang ORDER BY lang
"""
