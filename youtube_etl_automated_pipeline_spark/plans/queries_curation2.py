"""Round-3 curation extensions: semantic dedup (SemDeDup posture),
hash-gated importance resampling, and n-gram novelty scoring — three
operators a 100 TB training-data pipeline layers on top of the
existing dedup/quality/mixing surface.

All three stay in exact integer arithmetic (ppm shares, md5 buckets)
or the 6-dp-rounded cosine contract the similarity suite already
pins, so every query carries a bit-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from youtube_etl_automated_pipeline_spark.operators.windows import bounded_window

from youtube_etl_automated_pipeline_spark.ext import textstats as TS
from youtube_etl_automated_pipeline_spark.ext.dedup import shingle_hashes
from youtube_etl_automated_pipeline_spark.sources import load_wide

QUERIES_CURATION2: dict = {}
ORACLES_CURATION2: dict[str, str] = {}


# ------------------------------------------------------------------
# SemDeDup: cluster-then-prune semantic dedup (Abbas et al. 2023
# posture): k-means buckets bound the pairwise-cosine candidate set
# to within-cluster pairs, pairs above the threshold drop the higher
# id. The planted perturbed corpus (shared with dedup_embedding_lsh)
# provides ground-truth near-dups the synthetic vectors lack.

SEMDEDUP_TAU = 0.95

# Hard cap on rows per prune-kernel group: a kernel frame is at most
# 2 * CAP vectors (one block pair), so the matmul is <= (2*CAP)^2
# and the pandas frame <= 2*CAP*dim doubles REGARDLESS of cluster
# skew. 4096 * 64 * 8 B = 2 MB per frame, (8192)^2 sims = 0.5 GB of
# transient float64 — comfortably inside one executor task. Derived
# k keeps E[cluster] ~64 rows, so at healthy scale nblk == 1 and the
# blocking adds nothing; it is the skew backstop, not the hot path.
SEMDEDUP_BLOCK_CAP = 4096


def blocked_pair_groups(m: DataFrame, cap: int) -> DataFrame:
    """Explode (cluster_id, emb_id, v) into block-pair kernel groups
    of bounded size.

    Members sort into blocks of <= ``cap`` rows (row_number within
    cluster, so the bound is EXACT, not expected-under-hashing); each
    member is replicated once per partner block, keyed (cluster_id,
    blk_lo, blk_hi). Group (b, b) covers within-block pairs, group
    (lo, hi) covers only CROSS-block pairs — every within-cluster
    pair lands in exactly one group, so pair work is identical to the
    unblocked form while no kernel frame ever exceeds 2 * cap rows.
    Replication factor is nblk = ceil(cluster/cap) — linear in
    cluster size, against the quadratic kernel it bounds."""
    from pyspark.sql import Window

    wc = Window.partitionBy("cluster_id")
    sized = (
        m.withColumn(
            "_rn", F.row_number().over(wc.orderBy("emb_id")) - F.lit(1)
        )
        .withColumn("_csize", F.count(F.lit(1)).over(wc))
        .withColumn(
            "nblk", F.ceil(F.col("_csize") / F.lit(cap)).cast("int")
        )
        .withColumn("blk", (F.col("_rn") / F.lit(cap)).cast("int"))
    )
    partner = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.col("nblk") - F.lit(1)),
            lambda p: F.struct(
                F.least(F.col("blk"), p).alias("lo"),
                F.greatest(F.col("blk"), p).alias("hi"),
            ),
        )
    )
    return sized.select(
        "cluster_id", "emb_id", "v", "blk", partner.alias("g")
    ).select(
        "cluster_id",
        F.col("g.lo").alias("blk_lo"),
        F.col("g.hi").alias("blk_hi"),
        "blk",
        "emb_id",
        "v",
    )


def _prune_dropped(blocked: DataFrame) -> DataFrame:
    """(cluster_id, emb_id) rows for every member with a lower-id
    within-cluster neighbor at cos >= tau — one numpy matmul per
    block-pair group (the FAISS per-bucket posture). BLAS
    accumulation order differs from the oracle's left-to-right fold
    only at ~1e-15; the tau=0.95 decision margin is ~0.05 on both
    sides (planted dups ~0.999, natural pairs < 0.5), so the drop
    CLASSIFICATION — and therefore the integer census the gate
    hashes — is identical."""
    import pandas as pd

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        ids = pdf["emb_id"].to_numpy()
        mat = np.array(pdf["v"].tolist(), dtype=np.float64)
        lo = int(pdf["blk_lo"].iloc[0])
        hi = int(pdf["blk_hi"].iloc[0])
        if lo == hi:
            order = ids.argsort(kind="stable")
            ids, mat = ids[order], mat[order]
            sims = mat @ mat.T
            hit = np.triu(sims >= SEMDEDUP_TAU, k=1)
            dropped = ids[hit.any(axis=0)]
        else:
            amask = pdf["blk"].to_numpy() == lo
            ia, ib = ids[amask], ids[~amask]
            sims = mat[amask] @ mat[~amask].T  # |A| x |B|, cross only
            close = sims >= SEMDEDUP_TAU
            a_lt_b = ia[:, None] < ib[None, :]  # ids unique, never ==
            dropped = np.concatenate(
                [
                    ib[(close & a_lt_b).any(axis=0)],
                    ia[(close & ~a_lt_b).any(axis=1)],
                ]
            )
        return pd.DataFrame(
            {
                "cluster_id": np.full(
                    len(dropped), int(pdf["cluster_id"].iloc[0]), dtype="int32"
                ),
                "emb_id": dropped.astype("int64"),
            }
        )

    return blocked.groupBy("cluster_id", "blk_lo", "blk_hi").applyInPandas(
        kernel, "cluster_id int, emb_id long"
    )


def semantic_dedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster semantic-dedup census: members, dropped (cosine >=
    SEMDEDUP_TAU to a lower-id member of the same cluster), kept.

    Scale shape: TWO-LEVEL k-means training (coarse/fine,
    ext.kmeans.train_kmeans_two_level) with k_c*k_f DERIVED from the
    sample count — SemDeDup's total cluster count grows with the
    corpus (keeping E[cluster] ~64 rows) while training cost stays
    sample x (k_c + k_f) distance evals, not sample x k (at the
    100 TB-derived k of 10^4-10^5 single-level Lloyd is itself the
    bottleneck). Assignment is map-only (both centroid levels in the
    kernel closure); the prune shuffles on (cluster_id, block pair)
    only, and blocked_pair_groups caps every kernel frame at 2 *
    SEMDEDUP_BLOCK_CAP rows, so a skewed cluster degrades into more
    linear-cost groups instead of one quadratic OOM frame. At 100 TB:
    one scan to assign, one bounded-group kernel pass, one dedup agg.
    """
    from youtube_etl_automated_pipeline_spark.ext.kmeans import (
        assign_two_level,
        derive_two_level_k,
        train_kmeans_two_level,
    )
    from youtube_etl_automated_pipeline_spark.plans.queries_similarity import (
        TRAIN_MOD,
        _trained,
        planted_corpus,
    )

    _, uall, dim = planted_corpus(spark, sf_dir)
    u = uall.select("emb_id", F.col("u").alias("v"))

    def build():
        train = u.filter(F.col("emb_id") % TRAIN_MOD == 0)
        kc, kf = derive_two_level_k(train.count())
        coarse, fine = train_kmeans_two_level(
            train, dim, kc, kf, coarse_iters=2, fine_iters=2
        )
        return coarse, fine, kf

    coarse, fine, kf = _trained((sf_dir, "semdedup2l"), build)
    # carry_v: the prune kernel needs (cluster_id, v); threading the
    # vector through the map-only assignment pass avoids re-joining
    # the corpus on emb_id (a second wide shuffle of every vector).
    # Flat cluster_id = bucket * k_f + fine_cid (same formula in the
    # oracle, so the census keys match bit-for-bit).
    from youtube_etl_automated_pipeline_spark.operators.cache_registry import (
        memo_persist,
    )

    # memo-persisted like its sibling uall: the assignment is an
    # Arrow-kernel pass over every vector and BOTH the prune arm and
    # the members census consume it — unpersisted it runs twice (r08)
    m = memo_persist(
        spark,
        ("semdedup_assign", sf_dir),
        lambda: assign_two_level(
            u, "emb_id", coarse, fine, carry_v=True
        ).select(
            "emb_id",
            (F.col("bucket") * F.lit(kf) + F.col("fine_cid")).alias(
                "cluster_id"
            ),
            "v",
        ),
    )
    blocked = blocked_pair_groups(m, SEMDEDUP_BLOCK_CAP)
    # distinct: a member may be dropped via pairs in several block-
    # pair groups; the census counts it once.
    dropped = (
        _prune_dropped(blocked)
        .distinct()
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )
    members = m.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return (
        members.join(dropped, "cluster_id", "left")
        .select(
            "cluster_id",
            "n_members",
            F.coalesce(F.col("n_dropped"), F.lit(0)).alias("n_dropped"),
            (
                F.col("n_members")
                - F.coalesce(F.col("n_dropped"), F.lit(0))
            ).alias("n_kept"),
        )
        .orderBy("cluster_id")
    )


QUERIES_CURATION2["semantic_dedup_prune"] = semantic_dedup_prune


def _semdedup_oracle(dim: int = 64) -> str:
    from youtube_etl_automated_pipeline_spark.ext.kmeans import (
        sql_dist2,
        sql_kmeans_two_level_ctes,
    )
    from youtube_etl_automated_pipeline_spark.plans.queries_similarity import (
        DUP_EVERY,
        DUP_OFFSET,
        TRAIN_MOD,
    )

    dot6 = (
        f"floor(list_sum(list_transform(generate_series(1, {dim}),"
        " i -> a.v[i] * b.v[i])) * 1000000.0 + 0.5) / 1000000.0"
    )
    return f"""
WITH rawbase AS (
  SELECT vec_id AS emb_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
rawdups AS (
  SELECT vec_id + {DUP_OFFSET} AS emb_id,
         list_transform(generate_series(1, {dim}),
           i -> CAST(embedding[i] AS DOUBLE)
                * (1.0 + CAST((vec_id + i) % 7 - 3 AS DOUBLE) * 0.01)) AS v
  FROM embeddings WHERE vec_id % {DUP_EVERY} = 0
),
rawcorpus AS (SELECT * FROM rawbase UNION ALL SELECT * FROM rawdups),
corpus AS (
  SELECT emb_id,
         CASE WHEN n > 0 THEN list_transform(v, x -> x / n)
              ELSE list_transform(v, x -> 0.0) END AS v
  FROM (SELECT emb_id, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS n
        FROM rawcorpus)
),
sample AS (SELECT * FROM corpus WHERE emb_id % {TRAIN_MOD} = 0),
{sql_kmeans_two_level_ctes(dim, train_src="sample", coarse_iters=2, fine_iters=2, prefix="sd")},
sdactive AS (SELECT DISTINCT b FROM sdbase),
cassign AS (
  SELECT emb_id, cid AS bucket FROM (
    SELECT e.emb_id, c.cid,
           row_number() OVER (PARTITION BY e.emb_id
             ORDER BY {sql_dist2("e.v", "c.cvec", dim)} ASC, c.cid ASC) AS _rn
    FROM corpus e CROSS JOIN sdccent2 c
    WHERE c.cid IN (SELECT b FROM sdactive)
  ) WHERE _rn = 1
),
assigned AS (
  SELECT emb_id,
         CAST(bucket * (SELECT kf FROM sdkp) + f AS INTEGER) AS cluster_id
  FROM (
    SELECT a.emb_id, a.bucket, c.f,
           row_number() OVER (PARTITION BY a.emb_id
             ORDER BY {sql_dist2("e.v", "c.cvec", dim)} ASC, c.f ASC) AS _rn
    FROM cassign a
    JOIN corpus e USING (emb_id)
    JOIN sdfcent2 c ON c.b = a.bucket
  ) WHERE _rn = 1
),
m AS (SELECT a.cluster_id, a.emb_id, e.v
      FROM assigned a JOIN corpus e USING (emb_id)),
dropped AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_dropped FROM (
    SELECT DISTINCT a.cluster_id, b.emb_id AS dropped_id
    FROM m a JOIN m b
      ON a.cluster_id = b.cluster_id AND a.emb_id < b.emb_id
    WHERE ({dot6}) >= {SEMDEDUP_TAU}
  ) GROUP BY cluster_id
)
SELECT g.cluster_id,
       CAST(g.n_members AS BIGINT) AS n_members,
       CAST(coalesce(d.n_dropped, 0) AS BIGINT) AS n_dropped,
       CAST(g.n_members - coalesce(d.n_dropped, 0) AS BIGINT) AS n_kept
FROM (SELECT cluster_id, count(*) AS n_members
      FROM assigned GROUP BY cluster_id) g
LEFT JOIN dropped d USING (cluster_id)
ORDER BY cluster_id
"""


ORACLES_CURATION2["semantic_dedup_prune"] = _semdedup_oracle()


# ------------------------------------------------------------------
# Hash-gated importance resampling: quality-weighted downsampling
# with a deterministic md5 acceptance gate — the curation step that
# turns a quality score into a kept subset REPRODUCIBLY (same corpus
# -> same sample, no RNG state), and growth-stably (a doc's fate
# never changes when the corpus grows; same md5-bucket posture as
# train_val_test_split).

RESAMPLE_BASE_PPM = 250_000  # floor: every doc keeps >= 25% chance
RESAMPLE_SLOPE_PPM = 7_500  # + 0.75% per token up to the 100 cap


def corpus_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language resampling census: documents kept when their md5
    bucket (uniform in [0, 1e6)) falls under a token-count-derived
    weight — weight_ppm = BASE + SLOPE * min(n_tokens, 100), i.e.
    longer (richer) documents survive at up to 4x the floor rate.

    One scan, pure projection per doc (md5 + token count), one tiny
    per-language agg. The acceptance decision is per-row with no
    global state, so the operator is a map-stage at any scale."""
    docs = load_wide(spark, sf_dir, "documents")
    n_tokens = TS.token_count(F.col("text"))
    weight = (
        F.lit(RESAMPLE_BASE_PPM)
        + F.lit(RESAMPLE_SLOPE_PPM) * F.least(n_tokens, F.lit(100))
    ).cast("long")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1_000_000
    )
    tagged = docs.select(
        F.coalesce("lang", F.lit("??")).alias("lang"),
        weight.alias("w"),
        (bucket < weight).alias("kept"),
    )
    return (
        tagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
            F.sum("w").alias("sum_weight_ppm"),
        )
        .select(
            "lang",
            "n_docs",
            "n_kept",
            # decimal(38,0): per-lang kept counts are O(corpus rows)
            F.expr(
                "CAST(CAST(n_kept AS DECIMAL(38,0)) * 1000000"
                " DIV n_docs AS BIGINT)"
            ).alias(
                "kept_share_ppm"
            ),
            F.expr("CAST(sum_weight_ppm DIV n_docs AS BIGINT)").alias(
                "mean_weight_ppm"
            ),
        )
        .orderBy("lang")
    )


QUERIES_CURATION2["corpus_importance_resample"] = corpus_importance_resample

_TOKS_SQL = None  # filled below from the shared oracle fragments


def _resample_oracle() -> str:
    from youtube_etl_automated_pipeline_spark.plans.oracles_ext import _TOKS

    ntok = f"len({_TOKS})"
    n_tokens = f"CASE WHEN trim(text) = '' OR text IS NULL THEN 0 ELSE {ntok} END"
    weight = (
        f"CAST({RESAMPLE_BASE_PPM} + {RESAMPLE_SLOPE_PPM}"
        f" * least({n_tokens}, 100) AS BIGINT)"
    )
    bucket = (
        "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)"
        " % 1000000"
    )
    return f"""
WITH tagged AS (
  SELECT coalesce(lang, '??') AS lang,
         {weight} AS w,
         ({bucket}) < ({weight}) AS kept
  FROM documents
)
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST((sum(CASE WHEN kept THEN 1 ELSE 0 END) * 1000000) // count(*)
       AS BIGINT) AS kept_share_ppm,
  CAST(sum(w) // count(*) AS BIGINT) AS mean_weight_ppm
FROM tagged
GROUP BY lang
ORDER BY lang
"""


ORACLES_CURATION2["corpus_importance_resample"] = _resample_oracle()


# ------------------------------------------------------------------
# N-gram novelty: per-document share of shingles FIRST introduced by
# that document (attribution by min doc_id) — the diversity/novelty
# signal dedup doesn't capture: a document can be no one's duplicate
# yet contribute nothing new.


def ngram_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc novelty census over distinct 3-token shingles: a
    shingle is NOVEL for the lowest doc_id containing it. Outputs
    (doc_id, n_shingles, n_novel, novelty_ppm).

    Plan: the novel count per doc NEVER joins the shingle-sized
    relation back to itself — first-doc attribution (groupBy shingle
    hash, min doc_id) re-aggregates by that winning doc into a
    doc-sized novel-count table, which joins the doc-sized
    total-count table. Both heavy shuffles key on a uniform 32-bit
    hash; the only join carries one row per document."""
    from youtube_etl_automated_pipeline_spark.operators.cache_registry import (
        memo_persist,
    )

    docs = load_wide(spark, sf_dir, "documents")
    # persist the exploded (doc_id, shingle-hash) relation: it feeds
    # BOTH grouped branches (per-doc totals AND per-shingle first-doc
    # attribution) — without it the md5 shingle projection + explode
    # runs twice. Production materializes this as the shingle index.
    ex = memo_persist(
        spark,
        ("novelty_ex", sf_dir),
        lambda: docs.filter(F.size(TS.tokens(F.col("text"))) >= 3)
        .select("doc_id", shingle_hashes(F.col("text"), 3).alias("hs"))
        .select("doc_id", F.explode("hs").alias("sh")),
    )
    totals = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    novel = (
        ex.groupBy("sh")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return (
        totals.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.expr(
                # sf bound: n_novel <= a DOCUMENT's shingle count (~1e5 for
                # even a book-length doc), so * 1e6 peaks ~1e11 —
                # per-doc bounded, corpus growth cannot wrap it
                "CAST((coalesce(n_novel, 0) * 1000000) DIV n_shingles"
                " AS BIGINT)"
            ).alias("novelty_ppm"),
        )
        .orderBy("doc_id")
    )


QUERIES_CURATION2["ngram_novelty_score"] = ngram_novelty_score


def _novelty_oracle() -> str:
    from youtube_etl_automated_pipeline_spark.plans.oracles_ext import (
        _SH_HASHES,
        _TOKS,
    )

    return f"""
WITH base AS (
  SELECT doc_id, {_SH_HASHES} AS hs
  FROM documents WHERE len({_TOKS}) >= 3
),
ex AS (SELECT doc_id, unnest(hs) AS sh FROM base),
first AS (SELECT sh, min(doc_id) AS first_doc FROM ex GROUP BY sh)
SELECT e.doc_id,
  CAST(count(*) AS BIGINT) AS n_shingles,
  CAST(sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END) AS BIGINT)
    AS n_novel,
  CAST((sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END) * 1000000)
       // count(*) AS BIGINT) AS novelty_ppm
FROM ex e JOIN first f USING (sh)
GROUP BY e.doc_id
ORDER BY e.doc_id
"""


ORACLES_CURATION2["ngram_novelty_score"] = _novelty_oracle()


# ------------------------------------------------------------------
# Distributed BPE tokenizer training: the merge table is THE artifact
# an LLM pipeline derives from its corpus before anything else.
# Statistics run on the word-type table (unique word + corpus freq),
# not the corpus — one corpus pass total, then tiny per-step shuffles.

_BPE_MEMO: dict = {}


def _bpe_model(spark: SparkSession, sf_dir: str) -> list:
    """Train-or-fetch the memoized BPE merge table. The memo key
    carries the documents table's (mtime, size) fingerprint: a table
    rewritten at the same path mid-process misses the memo and
    retrains instead of serving a stale merge table (round-5 advice —
    the fresh-process assumption is now enforced, not assumed). The
    key is computed ONCE per call and the merges are returned
    directly, so no consumer can re-stat the file and race a rewrite
    into a KeyError; inserting under a new fingerprint evicts stale
    entries for the same sf_dir (only the latest table version can
    ever be looked up again — the memo stays O(live tables))."""
    from youtube_etl_automated_pipeline_spark.ext.bpe import (
        BPE_MAX_LEN,
        BPE_MIN_LEN,
        BPE_WORD_RE,
        train_bpe,
    )
    from youtube_etl_automated_pipeline_spark.sources.readers import (
        table_fingerprint,
    )

    key = ("bpe", sf_dir, table_fingerprint(sf_dir, "documents"))
    if key not in _BPE_MEMO:
        docs = load_wide(spark, sf_dir, "documents")
        words = (
            docs.select(F.explode(TS.tokens(F.col("text"))).alias("word"))
            .filter(F.col("word").rlike(BPE_WORD_RE))
            .filter(F.length("word").between(BPE_MIN_LEN, BPE_MAX_LEN))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("freq"))
            .selectExpr(
                "word",
                "freq",
                "concat('|', array_join(transform(sequence(1, length(word)),"
                " i -> substr(word, i, 1)), '|'), '|') AS syms",
            )
        )
        for stale in [k for k in _BPE_MEMO if k[:2] == key[:2]]:
            del _BPE_MEMO[stale]
        _BPE_MEMO[key] = train_bpe(words)
    return _BPE_MEMO[key]


def bpe_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE_MERGES byte-pair-encoding merges learned from the
    corpus: (step, left_sym, right_sym, merged, pair_count). Greedy
    left-to-right merge semantics, ties broken (count DESC, x ASC,
    y ASC) — bit-identical to the oracle's fold (ext/bpe.py docs the
    cross-engine argument).

    Scale shape: the corpus is read ONCE (word count); every merge
    step is a pair-count shuffle over the word-type table (Heaps'-law
    small) + a map-only re-symbolization. Driver traffic is one
    (pair, count) row per step — the k-means-centroid pattern.
    Training is memoized per (sf_dir, documents fingerprint) so
    repeated calls measure serving and a rewritten table retrains."""
    return spark.createDataFrame(
        _bpe_model(spark, sf_dir),
        "step int, left_sym string, right_sym string, merged string,"
        " pair_count bigint",
    ).orderBy("step")


QUERIES_CURATION2["bpe_merge_steps"] = bpe_merge_steps


def _bpe_oracle() -> str:
    from youtube_etl_automated_pipeline_spark.ext.bpe import (
        BPE_MAX_LEN,
        BPE_MERGES,
        BPE_MIN_LEN,
    )
    from youtube_etl_automated_pipeline_spark.plans.oracles_ext import _TOKS

    sy = "list_filter(string_split(syms, '|'), s -> s <> '')"
    fold = (
        "list_reduce(list_prepend('|', {sy}), (acc, c) -> "
        "CASE WHEN c = t.y AND ends_with(acc, '|' || t.x || '|') "
        "THEN substr(acc, 1, length(acc) - length(t.x) - 1) || t.x || t.y || '|' "
        "ELSE acc || c || '|' END)"
    )
    parts = [
        f"""words0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq,
         '|' || array_to_string(list_transform(generate_series(1, len(word)),
                i -> substr(word, i, 1)), '|') || '|' AS syms
  FROM (SELECT unnest({_TOKS}) AS word FROM documents)
  WHERE regexp_full_match(word, '[a-z]+')
    AND len(word) BETWEEN {BPE_MIN_LEN} AND {BPE_MAX_LEN}
  GROUP BY word
)"""
    ]
    for i in range(1, BPE_MERGES + 1):
        prev = f"words{i - 1}"
        parts.append(
            f"""pairs{i} AS MATERIALIZED (
  SELECT sy[i] AS x, sy[i + 1] AS y, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT {sy} AS sy, freq FROM {prev}) w,
       UNNEST(generate_series(1, len(sy) - 1)) AS t(i)
  GROUP BY 1, 2
)"""
        )
        parts.append(
            f"""top{i} AS MATERIALIZED (
  SELECT x, y, cnt FROM pairs{i} ORDER BY cnt DESC, x ASC, y ASC LIMIT 1
)"""
        )
        if i < BPE_MERGES:
            parts.append(
                f"""words{i} AS MATERIALIZED (
  SELECT w.word, w.freq, {fold.format(sy=sy.replace('syms', 'w.syms'))} AS syms
  FROM {prev} w CROSS JOIN top{i} t
)"""
            )
    union = "\n  UNION ALL ".join(
        f"SELECT {i} AS step, x AS left_sym, y AS right_sym, cnt AS pair_count"
        f" FROM top{i}"
        for i in range(1, BPE_MERGES + 1)
    )
    return f"""
WITH {", ".join(parts)}
SELECT CAST(step AS INT) AS step, left_sym, right_sym,
       left_sym || right_sym AS merged, pair_count
FROM ({union})
ORDER BY step
"""


ORACLES_CURATION2["bpe_merge_steps"] = _bpe_oracle()


def bpe_token_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving the trained BPE artifact: apply the learned merge table
    to the word-type table and report corpus-level compression —
    (n_word_types, n_occurrences, chars_total, symbols_total,
    saved_ppm), all frequency-weighted exact integers.

    Scale shape: training is memoized (shared with bpe_merge_steps);
    application is a map-only chain of K greedy-fold projections over
    the word-type table — the corpus itself is never re-read, and at
    serving time the merge table ships in the task closure exactly
    like k-means centroids."""
    from youtube_etl_automated_pipeline_spark.ext.bpe import (
        BPE_MAX_LEN,
        BPE_MIN_LEN,
        BPE_WORD_RE,
        _SYMS,
        merge_fold_sql,
    )

    merges = _bpe_model(spark, sf_dir)  # train-or-fetch, key stat'd once
    docs = load_wide(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(TS.tokens(F.col("text"))).alias("word"))
        .filter(F.col("word").rlike(BPE_WORD_RE))
        .filter(F.length("word").between(BPE_MIN_LEN, BPE_MAX_LEN))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .selectExpr(
            "word",
            "freq",
            "concat('|', array_join(transform(sequence(1, length(word)),"
            " i -> substr(word, i, 1)), '|'), '|') AS syms",
        )
    )
    for m in merges:
        words = words.selectExpr(
            "word",
            "freq",
            f"{merge_fold_sql(m['left_sym'], m['right_sym'])} AS syms",
        )
    return words.selectExpr(
        "CAST(count(1) AS BIGINT) AS n_word_types",
        "CAST(sum(freq) AS BIGINT) AS n_occurrences",
        "CAST(sum(freq * length(word)) AS BIGINT) AS chars_total",
        f"CAST(sum(freq * size({_SYMS})) AS BIGINT) AS symbols_total",
        # decimal(38,0) multiply: corpus char totals exceed ~9.2e12
        # well before 100 TB, where a bigint *1e6 numerator would wrap
        "CAST(CAST(sum(freq * length(word)) - sum(freq * size("
        f"{_SYMS})) AS DECIMAL(38,0)) * 1000000"
        " DIV sum(freq * length(word)) AS BIGINT) AS saved_ppm",
    )


QUERIES_CURATION2["bpe_token_compression"] = bpe_token_compression


def _bpe_compression_oracle() -> str:
    from youtube_etl_automated_pipeline_spark.ext.bpe import (
        BPE_MAX_LEN,
        BPE_MERGES,
        BPE_MIN_LEN,
    )
    from youtube_etl_automated_pipeline_spark.plans.oracles_ext import _TOKS

    sy = "list_filter(string_split(syms, '|'), s -> s <> '')"
    fold = (
        "list_reduce(list_prepend('|', {sy}), (acc, c) -> "
        "CASE WHEN c = t.y AND ends_with(acc, '|' || t.x || '|') "
        "THEN substr(acc, 1, length(acc) - length(t.x) - 1) || t.x || t.y || '|' "
        "ELSE acc || c || '|' END)"
    )
    parts = [
        f"""words0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq,
         '|' || array_to_string(list_transform(generate_series(1, len(word)),
                i -> substr(word, i, 1)), '|') || '|' AS syms
  FROM (SELECT unnest({_TOKS}) AS word FROM documents)
  WHERE regexp_full_match(word, '[a-z]+')
    AND len(word) BETWEEN {BPE_MIN_LEN} AND {BPE_MAX_LEN}
  GROUP BY word
)"""
    ]
    for i in range(1, BPE_MERGES + 1):
        prev = f"words{i - 1}"
        parts.append(
            f"""pairs{i} AS MATERIALIZED (
  SELECT sy[i] AS x, sy[i + 1] AS y, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT {sy} AS sy, freq FROM {prev}) w,
       UNNEST(generate_series(1, len(sy) - 1)) AS t(i)
  GROUP BY 1, 2
)"""
        )
        parts.append(
            f"""top{i} AS MATERIALIZED (
  SELECT x, y, cnt FROM pairs{i} ORDER BY cnt DESC, x ASC, y ASC LIMIT 1
)"""
        )
        parts.append(
            f"""words{i} AS MATERIALIZED (
  SELECT w.word, w.freq, {fold.format(sy=sy.replace('syms', 'w.syms'))} AS syms
  FROM {prev} w CROSS JOIN top{i} t
)"""
        )
    return f"""
WITH {", ".join(parts)}
SELECT CAST(count(*) AS BIGINT) AS n_word_types,
  CAST(sum(freq) AS BIGINT) AS n_occurrences,
  CAST(sum(freq * len(word)) AS BIGINT) AS chars_total,
  CAST(sum(freq * len({sy})) AS BIGINT) AS symbols_total,
  CAST(((sum(freq * len(word)) - sum(freq * len({sy}))) * 1000000)
       // sum(freq * len(word)) AS BIGINT) AS saved_ppm
FROM words{BPE_MERGES}
"""


ORACLES_CURATION2["bpe_token_compression"] = _bpe_compression_oracle()


# ------------------------------------------------------------------
# Robust outlier census: median/MAD per language over document length.
# Percentile interpolation is bit-exact cross-engine here because the
# inputs are integers: medians land on k or k.5, absolute deviations
# step by 0.5, their median steps by 0.25 — all exactly representable
# binary fractions, so Spark percentile() and DuckDB quantile_cont()
# (both type-7 linear interpolation) agree to the last bit.

MAD_K = 3  # |x - median| > K * MAD flags an outlier


def quality_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language robust length-outlier census: median n_chars, MAD,
    and the count/share of documents beyond K*MAD — the
    mean/stddev-free screen a curation pipeline runs where a few
    giant documents would wreck moment-based thresholds.

    Plan: two tiny per-lang aggregations (median, then MAD over
    re-joined deviations) + one final census agg; the per-lang stat
    table stays broadcast-sized, so the corpus is scanned, never
    shuffled on doc identity."""
    docs = load_wide(spark, sf_dir, "documents").select(
        F.coalesce("lang", F.lit("??")).alias("lang"), "n_chars"
    )
    med = docs.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.5)").alias("med_chars")
    )
    dev = docs.join(F.broadcast(med), "lang").select(
        "lang", "n_chars", "med_chars",
        F.abs(F.col("n_chars") - F.col("med_chars")).alias("adev"),
    )
    mad = dev.groupBy("lang").agg(
        F.expr("percentile(adev, 0.5)").alias("mad_chars")
    )
    flagged = dev.join(F.broadcast(mad), "lang")
    return (
        flagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.first("med_chars").alias("med_chars"),
            F.first("mad_chars").alias("mad_chars"),
            F.sum(
                F.when(
                    F.col("adev") > MAD_K * F.col("mad_chars"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
        .select(
            "lang",
            "n_docs",
            "med_chars",
            "mad_chars",
            "n_outliers",
            # decimal(38,0): per-lang outlier counts are O(corpus rows)
            F.expr(
                "CAST(CAST(n_outliers AS DECIMAL(38,0)) * 1000000"
                " DIV n_docs AS BIGINT)"
            ).alias(
                "outlier_ppm"
            ),
        )
        .orderBy("lang")
    )


QUERIES_CURATION2["quality_outlier_mad"] = quality_outlier_mad

ORACLES_CURATION2["quality_outlier_mad"] = f"""
WITH d AS (
  SELECT coalesce(lang, '??') AS lang, n_chars FROM documents
),
med AS (
  SELECT lang, quantile_cont(n_chars, 0.5) AS med_chars
  FROM d GROUP BY lang
),
dev AS (
  SELECT d.lang, d.n_chars, m.med_chars,
         abs(d.n_chars - m.med_chars) AS adev
  FROM d JOIN med m USING (lang)
),
mad AS (
  SELECT lang, quantile_cont(adev, 0.5) AS mad_chars
  FROM dev GROUP BY lang
)
SELECT v.lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  any_value(v.med_chars) AS med_chars,
  any_value(m.mad_chars) AS mad_chars,
  CAST(sum(CASE WHEN v.adev > {MAD_K} * m.mad_chars THEN 1 ELSE 0 END)
       AS BIGINT) AS n_outliers,
  CAST((sum(CASE WHEN v.adev > {MAD_K} * m.mad_chars THEN 1 ELSE 0 END)
        * 1000000) // count(*) AS BIGINT) AS outlier_ppm
FROM dev v JOIN mad m USING (lang)
GROUP BY v.lang
ORDER BY v.lang
"""


# ------------------------------------------------------------------
# Curriculum interleave: the training-ORDER generator. Real data
# pipelines don't just select documents — they emit a deterministic
# order (richest docs early, sources interleaved so no batch is a
# single-source run). Quality key here = token count (exact integer;
# swap in any score column); interleave = round-robin by per-source
# rank.

CURRICULUM_HEAD = 100


def curriculum_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First CURRICULUM_HEAD positions of the training order: docs
    ranked per source by (n_tokens DESC, doc_id ASC), then positions
    assigned round-robin across sources (all source-rank-1 docs
    first, then rank 2, ...) — no training batch sees a
    single-source run.

    Scale shape: the per-source rank is a PARTITIONED window (one
    shuffle on source); the global position window runs only over
    the TakeOrdered head (the vocab_coverage pattern — never the
    corpus). NULL sources coalesce to '<null>' in both twins so the
    partition key and the interleave tiebreak agree cross-engine.
    """
    from youtube_etl_automated_pipeline_spark.ext import textstats as TS
    from pyspark.sql import Window

    docs = load_wide(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(F.col("source"), F.lit("<null>")).alias("source"),
        TS.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    ws = Window.partitionBy("source").orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    )
    ranked = docs.withColumn("src_seq", F.row_number().over(ws))
    head = ranked.orderBy(
        F.asc("src_seq"), F.asc("source"), F.asc("doc_id")
    ).limit(CURRICULUM_HEAD)
    wpos = bounded_window("doc_id").orderBy(F.asc("src_seq"), F.asc("source"), F.asc("doc_id"))
    return head.select(
        F.row_number().over(wpos).alias("position"),
        "doc_id",
        "source",
        "n_tokens",
        "src_seq",
    ).orderBy("position")


QUERIES_CURATION2["curriculum_interleave"] = curriculum_interleave


def _curriculum_oracle() -> str:
    from youtube_etl_automated_pipeline_spark.ext.textstats import WS_CLASS

    toks = f"string_split_regex(trim(text), '{WS_CLASS}+')"
    ntok = (
        "CASE WHEN text IS NULL OR trim(text) = '' THEN 0 "
        f"ELSE len({toks}) END"
    )
    return f"""
WITH docs AS (
  SELECT doc_id, coalesce(source, '<null>') AS source,
         CAST({ntok} AS BIGINT) AS n_tokens
  FROM documents
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY source
             ORDER BY n_tokens DESC, doc_id ASC) AS INTEGER) AS src_seq
  FROM docs
),
head AS (
  SELECT * FROM ranked
  ORDER BY src_seq ASC, source ASC, doc_id ASC
  LIMIT {CURRICULUM_HEAD}
)
SELECT CAST(row_number() OVER (ORDER BY src_seq ASC, source ASC, doc_id ASC)
            AS INTEGER) AS position,
       doc_id, source, n_tokens, src_seq
FROM head
ORDER BY position
"""


ORACLES_CURATION2["curriculum_interleave"] = _curriculum_oracle()


# ------------------------------------------------------------------
# Corpus datacard: the one-query per-source summary a dataset release
# ships (docs, token mass, language spread, exact-dup rate) — every
# number exact-integer so the card is reproducible anywhere.


def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source datacard row: docs, total/mean tokens, distinct
    langs, majority lang, exact-dup doc count and ppm.

    Scale shape: one (source, lang) count agg + one source rollup
    (map-side combinable); the dup rate joins the corpus's
    content-hash histogram back on the hash — shuffle on a 60-bit
    key. Null pins shared with the rest of the file: NULL source ->
    '<null>', NULL lang -> '??', NULL-text docs carry a NULL hash
    and are EXCLUDED from dup counting in both twins (otherwise the
    null-hash group would make all null-text docs mutual dups);
    dup_ppm rides decimal(38,0).
    """
    from youtube_etl_automated_pipeline_spark.ext import textstats as TS
    from pyspark.sql import Window

    docs = load_wide(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(F.col("source"), F.lit("<null>")).alias("source"),
        F.coalesce(F.col("lang"), F.lit("??")).alias("lang"),
        TS.token_count(F.col("text")).cast("long").alias("n_tokens"),
        TS.content_hash(F.col("text")).alias("h"),
    )
    hashes = (
        docs.where(F.col("h").isNotNull())
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_same"))
    )
    dup_docs = (
        docs.where(F.col("h").isNotNull())
        .join(hashes, "h")
        .where(F.col("n_same") > 1)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("dup_docs"))
    )
    cells = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("toks")
    )
    wtop = Window.partitionBy("source").orderBy(F.desc("n"), F.asc("lang"))
    per_source = (
        cells.withColumn("rn", F.row_number().over(wtop))
        .groupBy("source")
        .agg(
            F.sum("n").alias("n_docs"),
            F.sum("toks").alias("n_tokens_total"),
            F.count(F.lit(1)).alias("n_langs"),
            F.max(F.when(F.col("rn") == 1, F.col("lang"))).alias("top_lang"),
        )
    )
    return (
        per_source.join(dup_docs, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_tokens_total",
            F.expr("CAST(n_tokens_total DIV n_docs AS BIGINT)").alias(
                "mean_tokens"
            ),
            "n_langs",
            "top_lang",
            F.coalesce(F.col("dup_docs"), F.lit(0))
            .cast("long")
            .alias("dup_docs"),
            F.expr(
                "CAST(CAST(coalesce(dup_docs, 0) AS DECIMAL(38,0)) * 1000000"
                " DIV n_docs AS BIGINT)"
            ).alias("dup_ppm"),
        )
        .orderBy("source")
    )


QUERIES_CURATION2["corpus_datacard"] = corpus_datacard


def _datacard_oracle() -> str:
    from youtube_etl_automated_pipeline_spark.ext.textstats import WS_CLASS

    toks = f"string_split_regex(trim(text), '{WS_CLASS}+')"
    ntok = (
        "CASE WHEN text IS NULL OR trim(text) = '' THEN 0 "
        f"ELSE len({toks}) END"
    )
    norm = f"lower(regexp_replace(trim(text), '{WS_CLASS}+', ' ', 'g'))"
    h = (
        "CASE WHEN text IS NULL THEN NULL ELSE "
        f"CAST('0x' || substr(md5({norm}), 1, 15) AS BIGINT) END"
    )
    return f"""
WITH docs AS (
  SELECT doc_id, coalesce(source, '<null>') AS source,
         coalesce(lang, '??') AS lang,
         CAST({ntok} AS BIGINT) AS n_tokens,
         {h} AS h
  FROM documents
),
hist AS (
  SELECT h, count(*) AS n_same FROM docs WHERE h IS NOT NULL GROUP BY h
),
dups AS (
  SELECT d.source, CAST(count(*) AS BIGINT) AS dup_docs
  FROM docs d JOIN hist USING (h)
  WHERE d.h IS NOT NULL AND hist.n_same > 1
  GROUP BY d.source
),
cells AS (
  SELECT source, lang, count(*) AS n, sum(n_tokens) AS toks
  FROM docs GROUP BY 1, 2
),
tops AS (
  SELECT source, lang, row_number() OVER (PARTITION BY source
           ORDER BY n DESC, lang ASC) AS rn
  FROM cells
),
per_source AS (
  SELECT c.source,
         CAST(sum(c.n) AS BIGINT) AS n_docs,
         CAST(sum(c.toks) AS BIGINT) AS n_tokens_total,
         CAST(count(*) AS BIGINT) AS n_langs,
         max(CASE WHEN t.rn = 1 THEN c.lang END) AS top_lang
  FROM cells c JOIN tops t ON c.source = t.source AND c.lang = t.lang
  GROUP BY c.source
)
SELECT p.source, p.n_docs, p.n_tokens_total,
       CAST(p.n_tokens_total // p.n_docs AS BIGINT) AS mean_tokens,
       p.n_langs, p.top_lang,
       CAST(coalesce(d.dup_docs, 0) AS BIGINT) AS dup_docs,
       CAST((coalesce(d.dup_docs, 0) * 1000000) // p.n_docs AS BIGINT)
         AS dup_ppm
FROM per_source p LEFT JOIN dups d USING (source)
ORDER BY p.source
"""


ORACLES_CURATION2["corpus_datacard"] = _datacard_oracle()
