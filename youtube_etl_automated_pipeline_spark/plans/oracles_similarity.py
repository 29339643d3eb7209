"""DuckDB oracles for the similarity queries. Cosine is computed
manually (generate_series index walk, double-cast elements) rather
than via list_cosine_similarity so the arithmetic matches Spark's
zip_with/aggregate kernel; both sides round to 6dp before any
ordering or thresholding.
"""

from __future__ import annotations

from youtube_etl_automated_pipeline_spark.plans.queries_similarity import (
    IVF_QUERY_HI,
    IVF_QUERY_LO,
    N_QUERIES,
)


def _norm(a: str) -> str:
    return (
        f"sqrt(list_sum(list_transform(generate_series(1, len({a})),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    )


def _cos_unit(a: str, b: str, dp: int = 6) -> str:
    """Twin of Spark's unit()+dot_unrolled(): each element divided by
    its vector norm, products summed left-to-right — term-identical
    IEEE arithmetic to the engine's normalize-then-dot kernel."""
    p = float(10**dp)
    na, nb = _norm(a), _norm(b)
    dot = (
        f"list_sum(list_transform(generate_series(1, len({a})),"
        f" i -> (CAST({a}[i] AS DOUBLE) / {na}) * (CAST({b}[i] AS DOUBLE) / {nb})))"
    )
    raw = f"CASE WHEN {na} > 0 AND {nb} > 0 THEN {dot} ELSE 0 END"
    return f"floor(({raw}) * {p!r} + 0.5) / {p!r}"


ORACLES_SIMILARITY: dict[str, str] = {}

ORACLES_SIMILARITY["similarity_bruteforce_topk"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
  WHERE vec_id < {N_QUERIES}
),
c AS (
  SELECT vec_id AS neighbor_id, embedding AS c_emb FROM embeddings
  WHERE vec_id >= {N_QUERIES}
),
scored AS (
  SELECT query_id, neighbor_id, {_cos_unit("q_emb", "c_emb")} AS cos_sim
  FROM c CROSS JOIN q
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= 10
ORDER BY query_id, rank
"""

def _ivf_oracle(dim: int = 64) -> str:
    """Twin of the k-means-trained IVF query: unrolls the same Lloyd
    iterations as CTEs (ext/kmeans.sql_kmeans_ctes — same left-to-
    right distance folds, same exact-integer centroid means), then
    nprobe=2 query probing and nearest-bucket corpus assignment."""
    from youtube_etl_automated_pipeline_spark.ext.kmeans import (
        sql_derive_k,
        sql_dist2,
        sql_kmeans_ctes,
    )
    from youtube_etl_automated_pipeline_spark.plans.queries_similarity import (
        KMEANS_ITERS,
        NPROBE,
        TRAIN_MOD,
    )

    final = f"cent{KMEANS_ITERS}"
    du = (
        "list_sum(list_transform(generate_series(1, %d),"
        " i -> (a.v[i] / a.n) * (b.v[i] / b.n)))" % dim
    )
    cos_unit = (
        f"floor((CASE WHEN a.n > 0 AND b.n > 0 THEN {du} ELSE 0 END)"
        " * 1000000.0 + 0.5) / 1000000.0"
    )
    return f"""
WITH corpus AS (
  SELECT vec_id AS emb_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
train AS (
  SELECT * FROM corpus WHERE emb_id % {TRAIN_MOD} = 0
),
{sql_kmeans_ctes(dim, k=sql_derive_k("train"), iters=KMEANS_ITERS, train_src="train")},
q_probes AS (
  SELECT emb_id AS query_id, cid AS cluster_id FROM (
    SELECT e.emb_id, c.cid,
           row_number() OVER (PARTITION BY e.emb_id
             ORDER BY {sql_dist2("e.v", "c.cvec", dim)} ASC, c.cid ASC) AS _rn
    FROM corpus e CROSS JOIN {final} c
    WHERE e.emb_id >= {IVF_QUERY_LO} AND e.emb_id < {IVF_QUERY_HI}
  ) WHERE _rn <= {NPROBE}
),
c_assign AS (
  SELECT emb_id AS neighbor_id, cid AS cluster_id FROM (
    SELECT e.emb_id, c.cid,
           row_number() OVER (PARTITION BY e.emb_id
             ORDER BY {sql_dist2("e.v", "c.cvec", dim)} ASC, c.cid ASC) AS _rn
    FROM corpus e CROSS JOIN {final} c
    WHERE e.emb_id >= {IVF_QUERY_HI}
  ) WHERE _rn = 1
),
un AS (
  SELECT emb_id, v,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS n
  FROM corpus
),
cand AS (
  SELECT q.query_id, c.cluster_id, c.neighbor_id, {cos_unit} AS cos_sim
  FROM c_assign c
  JOIN q_probes q USING (cluster_id)
  JOIN un a ON a.emb_id = q.query_id
  JOIN un b ON b.emb_id = c.neighbor_id
)
SELECT query_id, cluster_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM cand
) WHERE rank <= 5
ORDER BY query_id, rank
"""


ORACLES_SIMILARITY["similarity_ivf_topk"] = _ivf_oracle()

ORACLES_SIMILARITY["dedup_embedding_cosine"] = f"""
SELECT label, vec_a, vec_b, cos_sim FROM (
  SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
         {_cos_unit("a.embedding", "b.embedding")} AS cos_sim
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
)
WHERE cos_sim >= 0.3
ORDER BY vec_a, vec_b
"""

def _lsh_oracle(dim: int = 64) -> str:
    """Twin of queries_similarity.dedup_embedding_lsh: same planted
    dups (pure function of vec_id, i), same md5-derived hyperplane
    literals, same left-to-right dot/norm arithmetic — so bands,
    candidates and verified pairs agree bit-for-bit."""
    from youtube_etl_automated_pipeline_spark.ext.embed_lsh import sql_band_keys
    from youtube_etl_automated_pipeline_spark.plans.queries_similarity import (
        DUP_EVERY,
        DUP_OFFSET,
        LSH_THRESH,
    )

    k0, k1 = sql_band_keys("v", dim)
    return f"""
WITH base AS (
  SELECT vec_id AS emb_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
dups AS (
  SELECT vec_id + {DUP_OFFSET} AS emb_id,
         list_transform(generate_series(1, {dim}),
           i -> CAST(embedding[i] AS DOUBLE)
                * (1.0 + CAST((vec_id + i) % 7 - 3 AS DOUBLE) * 0.01)) AS v
  FROM embeddings WHERE vec_id % {DUP_EVERY} = 0
),
corpus AS (SELECT * FROM base UNION ALL SELECT * FROM dups),
sig AS (
  SELECT emb_id, 0 AS band, {k0} AS key FROM corpus
  UNION ALL
  SELECT emb_id, 1 AS band, {k1} AS key FROM corpus
),
cand AS (
  SELECT DISTINCT a.emb_id AS vec_a, b.emb_id AS vec_b
  FROM sig a JOIN sig b
    ON a.band = b.band AND a.key = b.key AND a.emb_id < b.emb_id
),
un AS (
  SELECT emb_id, v,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS n
  FROM corpus
)
SELECT vec_a, vec_b, cos_sim FROM (
  SELECT c.vec_a, c.vec_b,
    floor((CASE WHEN a.n > 0 AND b.n > 0 THEN
      list_sum(list_transform(generate_series(1, {dim}),
        i -> (a.v[i] / a.n) * (b.v[i] / b.n)))
      ELSE 0 END) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
  FROM cand c
  JOIN un a ON c.vec_a = a.emb_id
  JOIN un b ON c.vec_b = b.emb_id
)
WHERE cos_sim >= {LSH_THRESH}
ORDER BY vec_a, vec_b
"""


ORACLES_SIMILARITY["dedup_embedding_lsh"] = _lsh_oracle()

_NORM_D = (
    "sqrt(list_sum(list_transform(generate_series(1, len(embedding)),"
    " i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))"
)


def _r6(expr: str) -> str:
    return f"floor(({expr}) * 1000000.0 + 0.5) / 1000000.0"


ORACLES_SIMILARITY["embedding_quantize_int8"] = """
WITH base AS (
  SELECT vec_id, embedding,
    list_max(list_transform(generate_series(1, len(embedding)),
      i -> abs(CAST(embedding[i] AS DOUBLE)))) AS amax
  FROM embeddings
), q AS (
  SELECT vec_id, len(embedding) AS n_dims,
    CASE WHEN amax > 0 THEN amax / 127.0 ELSE 0.0 END AS scale,
    CASE WHEN amax > 0 THEN
      list_transform(generate_series(1, len(embedding)), i ->
        CAST(greatest(-127, least(127,
          floor(CAST(embedding[i] AS DOUBLE) / (amax / 127.0) + 0.5))) AS BIGINT))
    ELSE list_transform(generate_series(1, len(embedding)), i -> CAST(0 AS BIGINT))
    END AS qv
  FROM base
)
SELECT vec_id, CAST(n_dims AS INTEGER) AS n_dims, scale,
  array_to_string(qv, ',') AS q_str,
  CAST(list_sum(qv) AS BIGINT) AS sum_q,
  CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS sum_abs_q
FROM q
ORDER BY vec_id
"""


ORACLES_SIMILARITY["embedding_label_stats"] = f"""
WITH n AS (
  SELECT label, {_NORM_D} AS nrm FROM embeddings
)
SELECT label, count(*) AS n_vecs,
  {_r6("min(nrm)")} AS min_norm,
  {_r6("max(nrm)")} AS max_norm,
  {_r6("sum(nrm) / count(*)")} AS mean_norm
FROM n GROUP BY label
ORDER BY label
"""


def _pq_oracle(dim: int = 64) -> str:
    """Twin of embedding_product_quantize: per-subspace k-means CTE
    chains (prefixed so 4 trainings share one WITH clause), nearest
    sub-centroid assignment with the cid-ASC tiebreak matching
    array_position-first-match, and the same floor(d*1e6+0.5) error
    units summed across subspaces."""
    from youtube_etl_automated_pipeline_spark.ext.kmeans import (
        sql_dist2,
        sql_kmeans_ctes,
    )
    from youtube_etl_automated_pipeline_spark.plans.queries_similarity import (
        PQ_ITERS,
        PQ_K,
        PQ_M,
        TRAIN_MOD,
    )

    sub = dim // PQ_M
    parts = [
        """corpus AS (
  SELECT vec_id AS emb_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)""",
        f"sample AS (SELECT * FROM corpus WHERE emb_id % {TRAIN_MOD} = 0)",
    ]
    assigns = []
    for m in range(PQ_M):
        off = m * sub
        parts.append(
            f"tr{m} AS (SELECT emb_id, v[{off + 1}:{off + sub}] AS v FROM sample)"
        )
        parts.append(
            sql_kmeans_ctes(sub, k=PQ_K, iters=PQ_ITERS, train_src=f"tr{m}",
                            prefix=f"pq{m}")
        )
        parts.append(
            f"""pq{m}d AS (
  SELECT e.emb_id, c.cid,
         {sql_dist2(f"e.v[{off + 1}:{off + sub}]", "c.cvec", sub)} AS d
  FROM corpus e CROSS JOIN pq{m}cent{PQ_ITERS} c
)"""
        )
        parts.append(
            f"""pq{m}a AS (
  SELECT emb_id, cid, d FROM (
    SELECT emb_id, cid, d,
           row_number() OVER (PARTITION BY emb_id ORDER BY d ASC, cid ASC) AS _rn
    FROM pq{m}d
  ) WHERE _rn = 1
)"""
        )
        assigns.append(f"pq{m}a")
    code_cols = ",\n       ".join(
        f"CAST(pq{m}a.cid AS INT) AS code_{m}" for m in range(PQ_M)
    )
    err_sum = " + ".join(
        f"CAST(floor(pq{m}a.d * 1000000.0 + 0.5) AS BIGINT)" for m in range(PQ_M)
    )
    joins = "".join(
        f" JOIN pq{m}a ON pq0a.emb_id = pq{m}a.emb_id" for m in range(1, PQ_M)
    )
    with_body = ",\n".join(parts)
    return f"""
WITH {with_body}
SELECT pq0a.emb_id AS emb_id,
       {code_cols},
       CAST({err_sum} AS BIGINT) AS err_units
FROM pq0a{joins}
ORDER BY emb_id
"""


ORACLES_SIMILARITY["embedding_product_quantize"] = _pq_oracle()


def _ivfpq_oracle(dim: int = 64) -> str:
    """Twin of similarity_ivfpq_topk: coarse kmeans chain (prefix cs)
    + per-subspace codebook chains (prefix pq{m}) + IVF candidate join
    + ADC from codes. Ranks by the floored integer units (exactly the
    Spark sort key), ties by neighbor_id."""
    from youtube_etl_automated_pipeline_spark.ext.kmeans import (
        sql_derive_k,
        sql_dist2,
        sql_kmeans_ctes,
    )
    from youtube_etl_automated_pipeline_spark.plans.queries_similarity import (
        IVF_QUERY_HI,
        IVF_QUERY_LO,
        KMEANS_ITERS,
        NPROBE,
        PQ_ITERS,
        PQ_K,
        PQ_M,
        TRAIN_MOD,
    )

    sub = dim // PQ_M
    parts = [
        """rawcorpus AS (
  SELECT vec_id AS emb_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)""",
        # unit-normalize exactly like ext.similarity.unit: norm is the
        # in-order fold of squares, zero vectors stay zero
        """corpus AS (
  SELECT emb_id,
         CASE WHEN n > 0 THEN list_transform(v, x -> x / n)
              ELSE list_transform(v, x -> 0.0) END AS v
  FROM (SELECT emb_id, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS n
        FROM rawcorpus)
)""",
        f"sample AS (SELECT * FROM corpus WHERE emb_id % {TRAIN_MOD} = 0)",
        sql_kmeans_ctes(dim, k=sql_derive_k("sample"), iters=KMEANS_ITERS,
                        train_src="sample", prefix="cs"),
    ]
    for m in range(PQ_M):
        off = m * sub
        parts.append(
            f"tr{m} AS (SELECT emb_id, v[{off + 1}:{off + sub}] AS v FROM sample)"
        )
        parts.append(
            sql_kmeans_ctes(sub, k=PQ_K, iters=PQ_ITERS, train_src=f"tr{m}",
                            prefix=f"pq{m}")
        )
        parts.append(f"""pq{m}a AS (
  SELECT emb_id, cid FROM (
    SELECT e.emb_id, c.cid,
           row_number() OVER (PARTITION BY e.emb_id ORDER BY
             {sql_dist2(f"e.v[{off + 1}:{off + sub}]", "c.cvec", sub)} ASC,
             c.cid ASC) AS _rn
    FROM corpus e CROSS JOIN pq{m}cent{PQ_ITERS} c
    WHERE e.emb_id >= {IVF_QUERY_HI}
  ) WHERE _rn = 1
)""")
    parts.append(f"""c_assign AS (
  SELECT emb_id AS neighbor_id, cid AS cluster_id FROM (
    SELECT e.emb_id, c.cid,
           row_number() OVER (PARTITION BY e.emb_id ORDER BY
             {sql_dist2("e.v", "c.cvec", dim)} ASC, c.cid ASC) AS _rn
    FROM corpus e CROSS JOIN cscent{KMEANS_ITERS} c
    WHERE e.emb_id >= {IVF_QUERY_HI}
  ) WHERE _rn = 1
)""")
    parts.append(f"""q_probes AS (
  SELECT emb_id AS query_id, cid AS cluster_id FROM (
    SELECT e.emb_id, c.cid,
           row_number() OVER (PARTITION BY e.emb_id ORDER BY
             {sql_dist2("e.v", "c.cvec", dim)} ASC, c.cid ASC) AS _rn
    FROM corpus e CROSS JOIN cscent{KMEANS_ITERS} c
    WHERE e.emb_id >= {IVF_QUERY_LO} AND e.emb_id < {IVF_QUERY_HI}
  ) WHERE _rn <= {NPROBE}
)""")
    parts.append(f"""q_vec AS (
  SELECT emb_id AS query_id, v AS q_v FROM corpus
  WHERE emb_id >= {IVF_QUERY_LO} AND emb_id < {IVF_QUERY_HI}
)""")
    adc_terms = " + ".join(
        sql_dist2(f"q.q_v[{m * sub + 1}:{m * sub + sub}]", f"cb{m}.cvec", sub)
        for m in range(PQ_M)
    )
    code_joins = "".join(
        f"\n  JOIN pq{m}a ON pq{m}a.emb_id = ca.neighbor_id"
        f"\n  JOIN pq{m}cent{PQ_ITERS} cb{m} ON cb{m}.cid = pq{m}a.cid"
        for m in range(PQ_M)
    )
    parts.append(f"""scored AS (
  SELECT qp.query_id, ca.neighbor_id,
         CAST(floor(({adc_terms}) * 1000000.0 + 0.5) AS BIGINT) AS adc_units
  FROM c_assign ca
  JOIN q_probes qp ON ca.cluster_id = qp.cluster_id
  JOIN q_vec q ON q.query_id = qp.query_id{code_joins}
)""")
    with_body = ",\n".join(parts)
    return f"""
WITH {with_body}
SELECT query_id, neighbor_id, adc_units, CAST(rank AS INT) AS rank FROM (
  SELECT query_id, neighbor_id, adc_units,
         row_number() OVER (PARTITION BY query_id
           ORDER BY adc_units ASC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
ORDER BY query_id, rank
"""


ORACLES_SIMILARITY["similarity_ivfpq_topk"] = _ivfpq_oracle()


def _purity_oracle(dim: int = 64) -> str:
    """Same trained k-means (shared CTE builder), every vector
    assigned to its nearest centroid (cid ASC tiebreak), then the
    per-cluster majority-label census in integer ppm."""
    from youtube_etl_automated_pipeline_spark.ext.kmeans import (
        sql_derive_k,
        sql_dist2,
        sql_kmeans_ctes,
    )
    from youtube_etl_automated_pipeline_spark.plans.queries_similarity import (
        KMEANS_ITERS,
        TRAIN_MOD,
    )

    final = f"cent{KMEANS_ITERS}"
    return f"""
WITH corpus AS (
  SELECT vec_id AS emb_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         label
  FROM embeddings
),
train AS (
  SELECT emb_id, v FROM corpus WHERE emb_id % {TRAIN_MOD} = 0
),
{sql_kmeans_ctes(dim, k=sql_derive_k("train"), iters=KMEANS_ITERS, train_src="train")},
assigned AS (
  SELECT emb_id, cid AS cluster_id FROM (
    SELECT e.emb_id, c.cid,
           row_number() OVER (PARTITION BY e.emb_id
             ORDER BY {sql_dist2("e.v", "c.cvec", dim)} ASC, c.cid ASC) AS _rn
    FROM corpus e CROSS JOIN {final} c
  ) WHERE _rn = 1
),
cells AS (
  SELECT a.cluster_id, e.label, CAST(count(*) AS BIGINT) AS n
  FROM assigned a JOIN corpus e USING (emb_id)
  GROUP BY 1, 2
),
ranked AS (
  SELECT cluster_id, label, n,
    CAST(sum(n) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_vecs,
    row_number() OVER (PARTITION BY cluster_id
                       ORDER BY n DESC, label ASC) AS rn
  FROM cells
)
SELECT cluster_id, n_vecs,
  CAST(label AS INT) AS top_label,
  n AS top_label_n,
  CAST((n * 1000000) // n_vecs AS BIGINT) AS purity_ppm
FROM ranked WHERE rn = 1
ORDER BY cluster_id
"""


ORACLES_SIMILARITY["cluster_label_purity"] = _purity_oracle()


def _two_level_oracle(dim: int = 64) -> str:
    """Twin of kmeans_two_level_assign: the full coarse-then-fine
    training chain (ext/kmeans.sql_kmeans_two_level_ctes — kc/kf
    derived in SQL exactly like derive_two_level_k), corpus argmin
    restricted to active buckets, fine argmin within bucket, census +
    exact-integer centroid checksums."""
    from youtube_etl_automated_pipeline_spark.ext.kmeans import (
        sql_dist2,
        sql_kmeans_two_level_ctes,
    )
    from youtube_etl_automated_pipeline_spark.plans.queries_similarity import (
        TRAIN_MOD,
    )

    return f"""
WITH corpus AS (
  SELECT vec_id AS emb_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
train AS (
  SELECT * FROM corpus WHERE emb_id % {TRAIN_MOD} = 0
),
{sql_kmeans_two_level_ctes(dim, train_src="train", coarse_iters=2, fine_iters=2, prefix="tl")},
active AS (SELECT DISTINCT b FROM tlbase),
cassign AS (
  SELECT emb_id, cid AS bucket FROM (
    SELECT e.emb_id, c.cid,
           row_number() OVER (PARTITION BY e.emb_id
             ORDER BY {sql_dist2("e.v", "c.cvec", dim)} ASC, c.cid ASC) AS _rn
    FROM corpus e CROSS JOIN tlccent2 c
    WHERE c.cid IN (SELECT b FROM active)
  ) WHERE _rn = 1
),
fassign AS (
  SELECT emb_id, bucket, f AS fine_cid FROM (
    SELECT a.emb_id, a.bucket, c.f,
           row_number() OVER (PARTITION BY a.emb_id
             ORDER BY {sql_dist2("e.v", "c.cvec", dim)} ASC, c.f ASC) AS _rn
    FROM cassign a
    JOIN corpus e USING (emb_id)
    JOIN tlfcent2 c ON c.b = a.bucket
  ) WHERE _rn = 1
),
census AS (
  SELECT bucket, fine_cid, count(*) AS n FROM fassign GROUP BY 1, 2
),
checks AS (
  SELECT b AS bucket, f AS fine_cid,
         CAST(list_sum(list_transform(cvec,
           x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT)
           AS cent_checksum
  FROM tlfcent2
)
SELECT c.bucket, c.fine_cid,
       CAST(coalesce(n.n, 0) AS BIGINT) AS n_members,
       c.cent_checksum
FROM checks c LEFT JOIN census n USING (bucket, fine_cid)
ORDER BY bucket, fine_cid
"""


ORACLES_SIMILARITY["kmeans_two_level_assign"] = _two_level_oracle()


def _knn_confusion_oracle() -> str:
    from youtube_etl_automated_pipeline_spark.plans.queries_similarity import (
        KNN_HOLDOUT_MOD,
        KNN_K,
    )

    return f"""
WITH hold AS (
  SELECT vec_id AS query_id, label AS actual, embedding AS q_emb
  FROM embeddings
  WHERE vec_id % {KNN_HOLDOUT_MOD} = 0 AND label IS NOT NULL
),
ref AS (
  SELECT vec_id AS neighbor_id, label AS neighbor_label,
         embedding AS c_emb
  FROM embeddings
  WHERE vec_id % {KNN_HOLDOUT_MOD} <> 0 AND label IS NOT NULL
),
scored AS (
  SELECT query_id, actual, neighbor_id, neighbor_label,
         {_cos_unit("q_emb", "c_emb")} AS cos_sim
  FROM ref CROSS JOIN hold
),
top AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
    FROM scored
  ) WHERE rn <= {KNN_K}
),
votes AS (
  SELECT query_id, actual, neighbor_label, count(*) AS n_votes
  FROM top GROUP BY 1, 2, 3
),
pred AS (
  SELECT query_id, actual, neighbor_label AS predicted FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY n_votes DESC, neighbor_label ASC) AS rn
    FROM votes
  ) WHERE rn = 1
)
SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n
FROM pred GROUP BY 1, 2
ORDER BY actual, predicted
"""


ORACLES_SIMILARITY["knn_label_confusion"] = _knn_confusion_oracle()


def _ivf_incremental_oracle(dim: int = 64) -> str:
    from youtube_etl_automated_pipeline_spark.ext.kmeans import (
        sql_derive_k,
        sql_dist2,
        sql_kmeans_ctes,
    )
    from youtube_etl_automated_pipeline_spark.plans.queries_similarity import (
        INGEST_MOD,
        KMEANS_ITERS,
        OVERFULL_X,
        TRAIN_MOD,
    )

    final = f"cent{KMEANS_ITERS}"
    return f"""
WITH corpus AS (
  SELECT vec_id AS emb_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
base AS (SELECT * FROM corpus WHERE emb_id % {INGEST_MOD} <> 3),
batch AS (SELECT * FROM corpus WHERE emb_id % {INGEST_MOD} = 3),
train AS (SELECT * FROM base WHERE emb_id % {TRAIN_MOD} = 0),
{sql_kmeans_ctes(dim, k=sql_derive_k("train"), iters=KMEANS_ITERS, train_src="train")},
a_base AS (
  SELECT cid AS cluster_id, count(*) AS n_base FROM (
    SELECT e.emb_id, c.cid,
           row_number() OVER (PARTITION BY e.emb_id
             ORDER BY {sql_dist2("e.v", "c.cvec", dim)} ASC, c.cid ASC) AS _rn
    FROM base e CROSS JOIN {final} c
  ) WHERE _rn = 1 GROUP BY 1
),
a_add AS (
  SELECT cid AS cluster_id, count(*) AS n_added FROM (
    SELECT e.emb_id, c.cid,
           row_number() OVER (PARTITION BY e.emb_id
             ORDER BY {sql_dist2("e.v", "c.cvec", dim)} ASC, c.cid ASC) AS _rn
    FROM batch e CROSS JOIN {final} c
  ) WHERE _rn = 1 GROUP BY 1
),
census AS (
  SELECT coalesce(b.cluster_id, a.cluster_id) AS cluster_id,
         CAST(coalesce(b.n_base, 0) AS BIGINT) AS n_base,
         CAST(coalesce(a.n_added, 0) AS BIGINT) AS n_added,
         CAST(coalesce(b.n_base, 0) + coalesce(a.n_added, 0) AS BIGINT)
           AS n_total
  FROM a_base b FULL JOIN a_add a USING (cluster_id)
),
tot AS (SELECT sum(n_total) AS grand, count(*) AS k FROM census)
SELECT cluster_id, n_base, n_added, n_total,
       (n_total * k > {OVERFULL_X} * grand) AS overfull
FROM census CROSS JOIN tot
ORDER BY cluster_id
"""


ORACLES_SIMILARITY["ivf_index_incremental_update"] = _ivf_incremental_oracle()


def _hn_oracle() -> str:
    from youtube_etl_automated_pipeline_spark.plans.queries_similarity import (
        HN_ANCHORS,
        HN_TOPK,
    )

    return f"""
WITH a AS (
  SELECT vec_id AS anchor_id, label AS anchor_label,
         embedding AS a_emb
  FROM embeddings WHERE vec_id < {HN_ANCHORS}
),
c AS (
  SELECT vec_id AS negative_id, label AS negative_label,
         embedding AS c_emb
  FROM embeddings WHERE vec_id >= {HN_ANCHORS}
),
scored AS (
  SELECT anchor_id, anchor_label, negative_id, negative_label,
         {_cos_unit("a_emb", "c_emb")} AS cos_sim
  FROM c CROSS JOIN a
  WHERE negative_label <> anchor_label
)
SELECT anchor_id, anchor_label, negative_id, negative_label,
       cos_sim, rank
FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY anchor_id
      ORDER BY cos_sim DESC, negative_id ASC) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {HN_TOPK}
ORDER BY anchor_id, rank
"""


ORACLES_SIMILARITY["hard_negative_mining"] = _hn_oracle()
