"""Round-7 engine extensions: training-data-pipeline operators.

- ``embedding_random_projection`` — Johnson-Lindenstrauss ±1 random
  projection of the embedding column: the zero-shuffle dimensionality
  reduction used before LSH/clustering at 100 TB. The sign matrix is
  DERIVED (md5 bits computed once at import and inlined as foldable
  literals into BOTH engines), so no projection matrix is ever
  materialized, broadcast, or shuffled; the per-vector work is an
  exact-integer fold (inputs quantized to micro-units first), making
  the projection bit-identical cross-engine. Distance preservation
  (the JL property, E||y_a-y_b||^2 = D_OUT * ||x_a-x_b||^2 for ±1
  signs) is asserted in tests/test_engine6.py.

- ``pair_rouge_overlap`` — ROUGE-1/ROUGE-2 clipped n-gram overlap
  (precision/recall/F1 in exact ppm) for every MinHash-LSH candidate
  pair: the summarization/eval-style overlap metric a curation team
  runs on near-dup candidates to grade HOW texts overlap (Jaccard
  over sets cannot distinguish a quote from a rewrite; clipped
  multiset counts can). Candidates come from the SAME shared banding
  as the dedup family — all-pairs never materializes — and the
  multiset intersections are two token-keyed equi-joins restricted to
  candidate docs.

- ``streaming_cms_heavy_hitters`` — the Count-Min sketch maintained
  as STREAMING STATE: each event fans out to CMS_DEPTH (row, cell)
  keys and a streaming aggregation keeps the per-cell count — state
  is O(depth x width) = 1024 rows, NEVER O(distinct keys), merged
  associatively across micro-batches. The batch side estimates each
  key as min-over-cells from the streamed sketch and reports the
  top-k. Deterministic md5 hashing -> fully oracle-gated (the batch
  twin cms_heavy_hitters' oracle verbatim: a fully-consumed
  availableNow complete-mode sketch equals the batch sketch), unlike
  HLL whose partials are engine-random. Completes the story that
  every sketch in the engine has a deterministic streaming form.

- ``preference_bradley_terry`` — Bradley-Terry preference-strength
  estimation (the RLHF preference-data aggregation): pairwise
  comparisons are derived deterministically from the data (within
  each customer, consecutive orders compete; the pricier order's
  priority class wins), then K rounds of the Hunter(2004)
  minorization-maximization update w_i <- W_i / sum_j N_ij/(w_i+w_j)
  run as aggregation passes over the pair-count relation. Every
  iteration is quantized to integer micro-units with integer DIV
  (the logreg bigint-gradient pattern), so both engines walk the
  identical fixed point path bit-for-bit.

Scale postures are per-query below; nothing here collects an
unbounded relation to the driver (the BT weight vector is one row per
ENTITY CLASS — 5 order priorities — re-broadcast per iteration, the
same bounded-collect class as the k-means centroid table).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_automated_pipeline_spark.sources import load_wide

# --------------------------------------------------------------- JL
RP_D_IN = 64
RP_D_OUT = 8

# Deterministic ±1 sign matrix: bit 0 of md5("rp|i|j"). Computed once
# here and INLINED into both plans — Catalyst constant-folds the
# literal arrays, DuckDB sees the same integers spelled out. No
# runtime hashing, no materialized matrix.
RP_SIGNS = [
    [
        1
        if int(hashlib.md5(f"rp|{i}|{j}".encode()).hexdigest(), 16) & 1
        else -1
        for j in range(RP_D_OUT)
    ]
    for i in range(RP_D_IN)
]


def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vec_id + the RP_D_OUT exact-integer projected components.

    Plan: ONE map stage, zero shuffle, zero joins — each component is
    a fold over zip_with(quantized vector, inlined sign literals).
    At 100 TB this fuses into the reading scan; the projected table is
    dim/8 the size and feeds LSH/clustering downstream."""
    emb = load_wide(spark, sf_dir, "embeddings")
    # float32 -> double is exact; micro-unit quantization makes every
    # downstream op integer (bit-identical in both engines)
    xi = F.transform(
        F.col("embedding"),
        lambda v: F.floor(v.cast("double") * 1e6 + F.lit(0.5)).cast("bigint"),
    )
    out = emb.select("vec_id", xi.alias("xi"))
    for j in range(RP_D_OUT):
        signs = F.array(
            *[F.lit(RP_SIGNS[i][j]).cast("bigint") for i in range(RP_D_IN)]
        )
        out = out.withColumn(
            f"y_{j}",
            F.aggregate(
                F.zip_with(F.col("xi"), signs, lambda a, b: a * b),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ),
        )
    # no trailing orderBy (r08): range-sampling re-executed the
    # projection map stage; driver compare is order-insensitive
    return out.drop("xi")


def _rp_oracle() -> str:
    comps = []
    for j in range(RP_D_OUT):
        terms = " ".join(
            ("+ " if RP_SIGNS[i][j] > 0 else "- ") + f"xi[{i + 1}]"
            for i in range(RP_D_IN)
        )
        comps.append(f"CAST(0 {terms} AS BIGINT) AS y_{j}")
    return f"""
WITH q AS (
  SELECT vec_id,
    list_transform(embedding,
      v -> CAST(floor(CAST(v AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS xi
  FROM embeddings
)
SELECT vec_id, {", ".join(comps)}
FROM q
ORDER BY vec_id
"""


# ------------------------------------------------------------ ROUGE
def lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE persisted MinHash-LSH candidate-pair relation (doc_a <
    doc_b, distinct) — shared by every pair-scoring operator in this
    module (ROUGE, Fellegi-Sunter). Memoized per (session, sf_dir,
    documents fingerprint): a candidate set consumed N times inside
    one plan would otherwise re-run the band self-join N times."""
    from youtube_etl_automated_pipeline_spark.ext.dedup import band_explode
    from youtube_etl_automated_pipeline_spark.operators.cache_registry import (
        memo_persist,
    )
    from youtube_etl_automated_pipeline_spark.plans.queries_dedup_adv import (
        minhash_base,
    )
    from youtube_etl_automated_pipeline_spark.sources import table_fingerprint

    def build_cand() -> DataFrame:
        bands = band_explode(minhash_base(spark, sf_dir))
        return (
            bands.alias("a")
            .join(
                bands.alias("b"),
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.sig") == F.col("b.sig"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )

    return memo_persist(
        spark,
        ("lsh_cand", sf_dir),
        build_cand,
        fingerprint=table_fingerprint(sf_dir, "documents"),
    )


def pair_rouge_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1/2 clipped-overlap scores for LSH candidate pairs.

    Plan shape: the shared banded candidate set (equi-join, the dedup
    family's machinery — all-pairs never materializes) is PERSISTED —
    it feeds five consumers and an unpersisted subtree would re-run
    the band self-join per consumer. Unigram and bigram counts are
    built in ONE tagged pass (g = 1|2) over the candidate docs, also
    persisted (two probe sides), so the clipped intersections
    sum(least(c_a, c_b)) are a single pair of (g, gram)-keyed
    equi-joins; P/R/F1 finalize as a conditional-aggregation pivot in
    integer ppm (F1 = 2I/(A+B) exactly, no float). At 100 TB the
    candidate set is the bounded relation and the n-gram joins are
    hash-keyed and skew-free."""
    from youtube_etl_automated_pipeline_spark.ext.textstats import (
        normalized_text,
        tokens,
    )
    from youtube_etl_automated_pipeline_spark.operators.cache_registry import (
        memo_persist,
    )
    from youtube_etl_automated_pipeline_spark.sources import table_fingerprint

    fp = table_fingerprint(sf_dir, "documents")
    cand = lsh_candidates(spark, sf_dir)

    def build_cnt() -> DataFrame:
        cand_docs = (
            cand.select(F.col("doc_a").alias("doc_id"))
            .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        docs = (
            load_wide(spark, sf_dir, "documents")
            .join(cand_docs, "doc_id", "left_semi")
            .select(
                "doc_id", tokens(normalized_text(F.col("text"))).alias("toks")
            )
        )
        bigrams = F.when(
            F.size("toks") >= 2,
            F.transform(
                F.slice("toks", 1, F.size("toks") - 1),
                lambda t, i: F.concat_ws(" ", t, F.element_at("toks", i + 2)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        grams = docs.select(
            "doc_id", F.lit(1).alias("g"), F.explode("toks").alias("gram")
        ).unionByName(
            docs.select(
                "doc_id", F.lit(2).alias("g"), F.explode(bigrams).alias("gram")
            )
        )
        return grams.groupBy("doc_id", "g", "gram").agg(
            F.count(F.lit(1)).alias("c")
        )

    cnt = memo_persist(spark, ("rouge_cnt", sf_dir), build_cnt, fingerprint=fp)
    tot = cnt.groupBy("doc_id", "g").agg(F.sum("c").alias("n"))

    inter = (
        cand.join(
            cnt.select(
                F.col("doc_id").alias("doc_a"), "g", "gram",
                F.col("c").alias("c_a"),
            ),
            "doc_a",
        )
        .join(
            cnt.select(
                F.col("doc_id").alias("doc_b"), "g", "gram",
                F.col("c").alias("c_b"),
            ),
            ["doc_b", "g", "gram"],
        )
        .groupBy("doc_a", "doc_b", "g")
        .agg(F.sum(F.least("c_a", "c_b")).alias("inter"))
    )
    # full (pair, g) grid so a zero-overlap order still reports i=0
    # with real totals; docs with >= 3 shingles always have >= 1
    # bigram, so n_a/n_b are never 0
    pg = cand.select(
        "doc_a", "doc_b", F.explode(F.array(F.lit(1), F.lit(2))).alias("g")
    )
    scored = (
        pg.join(inter, ["doc_a", "doc_b", "g"], "left")
        .join(
            tot.select(
                F.col("doc_id").alias("doc_a"), "g", F.col("n").alias("n_a")
            ),
            ["doc_a", "g"],
        )
        .join(
            tot.select(
                F.col("doc_id").alias("doc_b"), "g", F.col("n").alias("n_b")
            ),
            ["doc_b", "g"],
        )
        .select(
            "doc_a",
            "doc_b",
            "g",
            F.coalesce("inter", F.lit(0)).cast("bigint").alias("i"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
        )
    )

    def pick(g: int, expr: str):
        return F.max(F.when(F.col("g") == g, F.expr(expr))).cast("bigint")

    return (
        scored.groupBy("doc_a", "doc_b")
        .agg(
            pick(1, "i").alias("r1_inter"),
            pick(1, "i * 1000000 DIV n_a").alias("r1_p_ppm"),
            pick(1, "i * 1000000 DIV n_b").alias("r1_r_ppm"),
            pick(1, "2 * i * 1000000 DIV (n_a + n_b)").alias("r1_f_ppm"),
            pick(2, "i").alias("r2_inter"),
            pick(2, "i * 1000000 DIV n_a").alias("r2_p_ppm"),
            pick(2, "i * 1000000 DIV n_b").alias("r2_r_ppm"),
            pick(2, "2 * i * 1000000 DIV (n_a + n_b)").alias("r2_f_ppm"),
        )
        .orderBy("doc_a", "doc_b")
    )


def _rouge_oracle() -> str:
    from youtube_etl_automated_pipeline_spark.ext.dedup import N_PERM
    from youtube_etl_automated_pipeline_spark.ext.textstats import WS_CLASS
    from youtube_etl_automated_pipeline_spark.plans.oracles_dedup_adv import (
        _SH_HASHES,
        _sig,
    )

    norm = f"lower(regexp_replace(trim(text), '{WS_CLASS}+', ' ', 'g'))"
    return f"""
WITH base AS (
  SELECT doc_id, {_SH_HASHES} AS hs
  FROM documents
  WHERE len({_SH_HASHES}) >= 3
),
sigs AS MATERIALIZED (
  SELECT doc_id, hs,
    {", ".join(f"{_sig(j)} AS sig_{j}" for j in range(N_PERM))}
  FROM base
),
cand AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sigs a JOIN sigs b
    ON a.doc_id < b.doc_id
   AND ({" OR ".join(f"a.sig_{j} = b.sig_{j}" for j in range(N_PERM))})
),
toks AS MATERIALIZED (
  SELECT d.doc_id, {norm.replace("text", "d.text")} AS nt
  FROM documents d
  WHERE d.doc_id IN (SELECT doc_a FROM cand UNION SELECT doc_b FROM cand)
),
uni AS MATERIALIZED (
  SELECT doc_id, u.gram, count(*) AS c
  FROM toks, unnest(string_split_regex(nt, '{WS_CLASS}+')) AS u(gram)
  GROUP BY 1, 2
),
big AS MATERIALIZED (
  SELECT doc_id, g.gram, count(*) AS c FROM (
    SELECT s.doc_id, s.ts[u.i] || ' ' || s.ts[u.i + 1] AS gram
    FROM (
      SELECT doc_id, string_split_regex(nt, '{WS_CLASS}+') AS ts FROM toks
    ) s,
    unnest(generate_series(1, len(s.ts) - 1)) AS u(i)
  ) g
  GROUP BY 1, 2
),
u_tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM uni GROUP BY 1),
b_tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM big GROUP BY 1),
u_inter AS (
  SELECT c.doc_a, c.doc_b,
         CAST(sum(least(a.c, b.c)) AS BIGINT) AS i
  FROM cand c
  JOIN uni a ON a.doc_id = c.doc_a
  JOIN uni b ON b.doc_id = c.doc_b AND b.gram = a.gram
  GROUP BY 1, 2
),
b_inter AS (
  SELECT c.doc_a, c.doc_b,
         CAST(sum(least(a.c, b.c)) AS BIGINT) AS i
  FROM cand c
  JOIN big a ON a.doc_id = c.doc_a
  JOIN big b ON b.doc_id = c.doc_b AND b.gram = a.gram
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
  CAST(coalesce(u.i, 0) AS BIGINT) AS r1_inter,
  CAST(coalesce(u.i, 0) * 1000000 // ua.n AS BIGINT) AS r1_p_ppm,
  CAST(coalesce(u.i, 0) * 1000000 // ub.n AS BIGINT) AS r1_r_ppm,
  CAST(2 * coalesce(u.i, 0) * 1000000 // (ua.n + ub.n) AS BIGINT) AS r1_f_ppm,
  CAST(coalesce(b.i, 0) AS BIGINT) AS r2_inter,
  CAST(coalesce(b.i, 0) * 1000000 // ba.n AS BIGINT) AS r2_p_ppm,
  CAST(coalesce(b.i, 0) * 1000000 // bb.n AS BIGINT) AS r2_r_ppm,
  CAST(2 * coalesce(b.i, 0) * 1000000 // (ba.n + bb.n) AS BIGINT) AS r2_f_ppm
FROM cand c
LEFT JOIN u_inter u ON u.doc_a = c.doc_a AND u.doc_b = c.doc_b
LEFT JOIN b_inter b ON b.doc_a = c.doc_a AND b.doc_b = c.doc_b
JOIN u_tot ua ON ua.doc_id = c.doc_a
JOIN u_tot ub ON ub.doc_id = c.doc_b
JOIN b_tot ba ON ba.doc_id = c.doc_a
JOIN b_tot bb ON bb.doc_id = c.doc_b
ORDER BY c.doc_a, c.doc_b
"""


# ---------------------------------------------------- streaming CMS
def streaming_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cms_heavy_hitters with the sketch maintained as streaming
    state: events fan out to CMS_DEPTH (row, cell) keys pre-shuffle
    (map-side partials collapse the fan-out to <= depth x width rows
    per task), and the streaming aggregation's state is exactly the
    depth x width counter grid — O(1024), never O(users), merged
    associatively across micro-batches. The batch side estimates each
    key as min-over-cells against the streamed sketch and reports the
    top-k by estimate. Shares the batch twin's oracle verbatim: the
    fully-consumed availableNow complete-mode sketch equals the batch
    sketch because sum is the combine."""
    from youtube_etl_automated_pipeline_spark.ext.textstats import md5_long
    from youtube_etl_automated_pipeline_spark.plans.queries_sketch import (
        CMS_DEPTH,
        CMS_WIDTH,
        HH_TOPK,
    )
    from youtube_etl_automated_pipeline_spark.streaming.incremental import (
        read_events_stream,
        run_stream_to_memory,
    )

    stream = read_events_stream(spark, sf_dir)
    rows = F.array(*[F.lit(r) for r in range(CMS_DEPTH)])
    cells = stream.select(
        "user_id", F.explode(rows).alias("r")
    ).withColumn(
        "cell",
        md5_long(
            F.concat_ws(
                ":", F.col("r").cast("string"), F.col("user_id").cast("string")
            )
        )
        % CMS_WIDTH,
    )
    sketch_stream = cells.groupBy("r", "cell").agg(
        F.count(F.lit(1)).alias("cell_cnt")
    )
    sketch = run_stream_to_memory(
        sketch_stream, "cms_sketch", output_mode="complete"
    )

    per_key = (
        load_wide(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    key_cells = per_key.select(
        "user_id", "cnt", F.explode(rows).alias("r")
    ).withColumn(
        "cell",
        md5_long(
            F.concat_ws(
                ":", F.col("r").cast("string"), F.col("user_id").cast("string")
            )
        )
        % CMS_WIDTH,
    )
    est = (
        key_cells.join(F.broadcast(sketch), ["r", "cell"])
        .groupBy("user_id")
        .agg(F.max("cnt").alias("true_cnt"), F.min("cell_cnt").alias("cms_est"))
    )
    return (
        est.select(
            "user_id",
            "true_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("true_cnt")).alias("overcount"),
        )
        .orderBy(F.desc("cms_est"), F.asc("user_id"))
        .limit(HH_TOPK)
    )


# ------------------------------------------------------ Bradley-Terry
BT_ITERS = 8
BT_MICRO = 1_000_000  # weight unit
BT_NUM = 1_000_000_000_000  # integer-DIV numerator scale (1e12)


def _bt_relations(spark: SparkSession, sf_dir: str):
    """The shared Bradley-Terry input relations: persisted duel pair
    counts ``pc(winner, loser, n)``, the symmetric game-count relation
    ``games(i, j, n_ij)``, and win totals ``wins(winner, w_i)``. The
    duel log is ONE window + one aggregation over orders (consecutive
    same-customer orders of different priority duel; higher exact-cent
    total wins, ties -> the earlier order). Shared by the collected
    and the distributed MM trainers so both provably start from the
    same relation."""
    from pyspark.sql import Window

    from youtube_etl_automated_pipeline_spark.functions.compat import units
    from youtube_etl_automated_pipeline_spark.operators.cache_registry import (
        memo_persist,
    )
    from youtube_etl_automated_pipeline_spark.sources import table_fingerprint

    def build_pairs() -> DataFrame:
        orders = load_wide(spark, sf_dir, "orders").select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderpriority").alias("prio"),
            units(F.col("o_totalprice"), 2).alias("cents"),
        )
        w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
        paired = orders.select(
            "prio",
            "cents",
            F.lag("prio").over(w).alias("prev_prio"),
            F.lag("cents").over(w).alias("prev_cents"),
        ).filter(
            F.col("prev_prio").isNotNull() & (F.col("prio") != F.col("prev_prio"))
        )
        duels = paired.select(
            F.when(F.col("cents") > F.col("prev_cents"), F.col("prio"))
            .otherwise(F.col("prev_prio"))
            .alias("winner"),
            F.when(F.col("cents") > F.col("prev_cents"), F.col("prev_prio"))
            .otherwise(F.col("prio"))
            .alias("loser"),
        )
        return duels.groupBy("winner", "loser").agg(
            F.count(F.lit(1)).alias("n")
        )

    pc = memo_persist(
        spark,
        ("bt_pairs", sf_dir),
        build_pairs,
        fingerprint=table_fingerprint(sf_dir, "orders"),
    )
    games = (
        pc.select(F.col("winner").alias("i"), F.col("loser").alias("j"), "n")
        .unionByName(
            pc.select(
                F.col("loser").alias("i"), F.col("winner").alias("j"), "n"
            )
        )
        .groupBy("i", "j")
        .agg(F.sum("n").alias("n_ij"))
    )
    wins = pc.groupBy("winner").agg(F.sum("n").alias("w_i"))
    return games, wins, pc


def preference_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strength per order-priority class.

    Comparisons: within each customer, consecutive orders (by
    o_orderkey) compete; the order with the higher total price wins
    (exact-integer cents; ties -> the earlier order wins — a total,
    deterministic rule). Same-priority pairs carry no signal and are
    dropped. The pair-count relation N_ij is ONE window + one
    aggregation over orders.

    MM iterations (Hunter 2004): w_i <- W_i / sum_j N_ij/(w_i+w_j),
    quantized each round to integer micro-units with integer DIV so
    the fixed-point path is bit-identical in both engines (the
    divisions' truncation is part of the operator definition, like
    the logreg bigint gradients). The weight vector is one row per
    priority class (5) — the bounded-collect class of the k-means
    centroid table — re-inlined as a literal CASE per iteration, so
    each iteration is one broadcast-free aggregation over N_ij.

    At 100 TB: the expensive relation is the comparison log; N_ij is
    its keyed aggregate (entities^2 at worst, sparse in practice);
    each MM round is one map-side-combinable agg over N_ij keyed by
    entity. K is fixed — no driver-dependent convergence loop."""
    games, wins, pc = _bt_relations(spark, sf_dir)

    w_rows = {
        r["i"]: BT_MICRO
        for r in games.select("i").distinct().collect()
    }
    games_local = games.collect()  # <= entities^2 rows by construction
    wins_local = {r["winner"]: int(r["w_i"]) for r in wins.collect()}
    for _ in range(BT_ITERS):
        denom: dict[str, int] = {k: 0 for k in w_rows}
        for r in games_local:
            i, j, n_ij = r["i"], r["j"], int(r["n_ij"])
            denom[i] += (n_ij * BT_NUM) // (w_rows[i] + w_rows[j])
        w_rows = {
            k: (wins_local.get(k, 0) * BT_NUM) // denom[k] if denom[k] else 0
            for k in w_rows
        }

    # gate output recomputed AS A PLAN: per-class games/wins from the
    # persisted pair counts, final weights attached as a literal CASE
    # (the iterations above run on the <=25-row collected relation —
    # at real entity cardinality they run as the aggregation loop
    # described in the docstring; the fixed-point arithmetic is
    # identical either way and the oracle replays it in SQL)
    w_expr = F.lit(None).cast("bigint")
    for k in sorted(w_rows):
        w_expr = F.when(F.col("i") == k, F.lit(w_rows[k])).otherwise(w_expr)
    per_class = games.groupBy("i").agg(F.sum("n_ij").alias("games"))
    return (
        per_class.join(
            wins.select(F.col("winner").alias("i"), "w_i"), "i", "left"
        )
        .select(
            F.col("i").alias("priority"),
            F.col("games").cast("bigint").alias("games"),
            F.coalesce("w_i", F.lit(0)).cast("bigint").alias("wins"),
            w_expr.alias("bt_micro"),
        )
        .orderBy("priority")
    )


def preference_bradley_terry_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bradley-Terry with the MM rounds run IN-ENGINE — the shape the
    collected variant's docstring promises for real entity
    cardinality, now runnable (round 8; the logreg-trainer pattern of
    per-round in-engine aggregation, applied to a keyed weight
    RELATION instead of a scalar model row). Same duel log, same
    integer fixed point, same oracle as ``preference_bradley_terry``
    — `tests/test_engine6.py` asserts the two queries are row-identical.

    Each MM round w_i <- W_i*S // sum_j (N_ij*S // (w_i + w_j)) is:
    games ⋈ w on i ⋈ w on j (both joins broadcast the ≤entities-row
    weight relation), one map-side-combinable sum keyed by i, a left
    join to wins (coalesced to 0 — zero-win classes pin m = 0, the
    same contract the oracle's coalesce replays). The weight relation
    is ``localCheckpoint``-ed each round: lineage would otherwise
    double per round (w_t references w_{t-1} twice), and checkpointing
    keeps the per-round plan flat — 8 tiny jobs over an
    entities-bounded relation, with NO ``games.collect()`` anywhere.

    At 100 TB: N_ij is entities² at worst (sparse in practice) and
    stays fully distributed; the weight relation is entities-bounded
    (shuffle-join instead of broadcast if entities outgrow the
    broadcast threshold — same plan, Spark picks); driver memory is
    O(1). K fixed — no convergence-dependent driver loop."""
    games, wins, _ = _bt_relations(spark, sf_dir)
    games = games.localCheckpoint(eager=False)  # reused 2x/round + final

    w = games.select("i").distinct().select(
        "i", F.lit(BT_MICRO).cast("bigint").alias("m")
    )
    wins_i = wins.select(F.col("winner").alias("i"), "w_i")
    for _ in range(BT_ITERS):
        # integer DIV via expr so truncation matches Python // on the
        # all-positive operands (the fixed-point definition)
        denom = (
            games.join(w.select("i", F.col("m").alias("m_i")), "i")
            .join(
                w.select(F.col("i").alias("j"), F.col("m").alias("m_j")), "j"
            )
            .select(
                "i",
                F.expr(f"n_ij * CAST({BT_NUM} AS BIGINT) div (m_i + m_j)").alias(
                    "term"
                ),
            )
            .groupBy("i")
            .agg(F.sum("term").alias("den"))
        )
        w = (
            denom.join(wins_i, "i", "left")
            .select(
                "i",
                F.when(
                    F.col("den") > 0,
                    F.expr(
                        f"coalesce(w_i, 0) * CAST({BT_NUM} AS BIGINT) div den"
                    ),
                )
                .otherwise(F.lit(0))
                .cast("bigint")
                .alias("m"),
            )
            .localCheckpoint(eager=True)
        )

    per_class = games.groupBy("i").agg(F.sum("n_ij").alias("games"))
    return (
        per_class.join(wins_i, "i", "left")
        .join(w, "i")
        .select(
            F.col("i").alias("priority"),
            F.col("games").cast("bigint").alias("games"),
            F.coalesce("w_i", F.lit(0)).cast("bigint").alias("wins"),
            F.col("m").alias("bt_micro"),
        )
        .orderBy("priority")
    )


def _bt_oracle() -> str:
    iters = []
    prev = "w0"
    for t in range(1, BT_ITERS + 1):
        # wins is COALESCED to 0 (a zero-win class's m must become 0,
        # not NULL — an un-coalesced NULL would poison every other
        # class's denominator subquery next round and SQL sum() would
        # silently DROP those n_ij terms, diverging from the engine's
        # wins_local.get(k, 0) path); the denominator m lookups are
        # coalesced too so the oracle replays the engine's zero-win
        # fixed point exactly even if a future edit re-breaks one side.
        iters.append(
            f"""w{t} AS MATERIALIZED (
  SELECT g.i,
    CAST(coalesce((SELECT wins FROM wins wi WHERE wi.i = g.i), 0) * {BT_NUM}
      // sum(g.n_ij * {BT_NUM}
             // (coalesce((SELECT m FROM {prev} a WHERE a.i = g.i), 0)
                + coalesce((SELECT m FROM {prev} b WHERE b.i = g.j), 0)))
      AS BIGINT) AS m
  FROM games g GROUP BY g.i
)"""
        )
        prev = f"w{t}"
    return f"""
WITH o AS (
  SELECT o_custkey, o_orderkey, o_orderpriority AS prio,
    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM orders
),
paired AS (
  SELECT prio, cents,
    lag(prio) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_prio,
    lag(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_cents
  FROM o
),
duels AS (
  SELECT
    CASE WHEN cents > prev_cents THEN prio ELSE prev_prio END AS winner,
    CASE WHEN cents > prev_cents THEN prev_prio ELSE prio END AS loser
  FROM paired
  WHERE prev_prio IS NOT NULL AND prio <> prev_prio
),
pc AS MATERIALIZED (
  SELECT winner, loser, count(*) AS n FROM duels GROUP BY 1, 2
),
games AS MATERIALIZED (
  SELECT i, j, CAST(sum(n) AS BIGINT) AS n_ij FROM (
    SELECT winner AS i, loser AS j, n FROM pc
    UNION ALL
    SELECT loser AS i, winner AS j, n FROM pc
  ) GROUP BY 1, 2
),
wins AS MATERIALIZED (
  SELECT winner AS i, CAST(sum(n) AS BIGINT) AS wins FROM pc GROUP BY 1
),
w0 AS (SELECT DISTINCT i, CAST({BT_MICRO} AS BIGINT) AS m FROM games),
{",".join(iters)}
SELECT g.i AS priority,
  CAST(sum(g.n_ij) AS BIGINT) AS games,
  CAST(coalesce((SELECT wins FROM wins wi WHERE wi.i = g.i), 0) AS BIGINT)
    AS wins,
  (SELECT m FROM {prev} f WHERE f.i = g.i) AS bt_micro
FROM games g
GROUP BY g.i
ORDER BY priority
"""


# ------------------------------------------------- power iteration
POW_ITERS = 16  # flat synthetic spectrum (l2/l1 ~ 0.89) needs the extra rounds
POW_SDESC = 1_000_000_000  # per-vector score descale (keeps y in int64)
POW_MICRO = 1_000_000


def embedding_power_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal component of the embedding column — the
    spectral step under PCA whitening / spectral dedup — via the
    one-pass Gram decomposition: ONE distributed scan computes the
    EXACT integer Gram matrix G = sum_vec cx cx^T (an Arrow-batched
    numpy kernel emits per-partition partial Grams; a 4096-key agg
    folds them), and the POW_ITERS power rounds y = G v then run on
    the dim x dim matrix, which is driver-held — bounded by
    DIMENSION^2, the same bounded-collect class as the k-means
    centroid table, never by corpus size. At 100 TB this is the only
    shape that works: the corpus is scanned ONCE no matter how many
    rounds, and each round is 64x64 integer arithmetic.

    Exactness: embeddings quantized to integer micro-units; per-dim
    means use truncating division (deterministic centering); G is an
    exact int64 sum (|cx| <= ~4e6 so G_ij <= ~1.6e13 * n — inside
    int64 through sf10); the rounds run in arbitrary-precision Python
    integers and the oracle replays them in DuckDB HUGEINT — y terms
    reach ~1e24, exact in both. Each iterate renormalizes by max|y|
    with TRUNCATING division (DuckDB // truncates toward zero;
    matched explicitly — no sqrt anywhere).

    Output: one row per dimension with the final integer loading —
    64 rows, fully oracle-gated, sign fixed by the all-ones start."""
    import pandas as pd

    from youtube_etl_automated_pipeline_spark.operators.cache_registry import (
        memo_persist,
    )
    from youtube_etl_automated_pipeline_spark.sources import table_fingerprint

    def tdiv(a: int, b: int) -> int:
        quo = abs(a) // b
        return quo if a >= 0 else -quo

    def build_gram() -> DataFrame:
        import numpy as np

        emb = load_wide(spark, sf_dir, "embeddings")
        xi = F.transform(
            F.col("embedding"),
            lambda v: F.floor(v.cast("double") * POW_MICRO + F.lit(0.5)).cast(
                "bigint"
            ),
        )
        q = emb.select(xi.alias("xi"))
        sums = q.agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.element_at("xi", i + 1)).alias(f"s_{i}")
                for i in range(RP_D_IN)
            ],
        ).collect()[0]
        n = int(sums["n"])
        mu_py = [tdiv(int(sums[f"s_{i}"]), n) for i in range(RP_D_IN)]
        mu = F.array(*[F.lit(m).cast("bigint") for m in mu_py])
        cx = q.select(F.zip_with("xi", mu, lambda a, b: a - b).alias("cx"))

        def gram_kernel(batches):
            acc = np.zeros((RP_D_IN, RP_D_IN), dtype=np.int64)
            for pdf in batches:
                if not len(pdf):  # zero-row Arrow batch: nothing to stack
                    continue
                m = np.stack(pdf["cx"].to_numpy()).astype(np.int64)
                acc += m.T @ m
            idx = np.arange(RP_D_IN * RP_D_IN, dtype=np.int32)
            yield pd.DataFrame({"idx": idx, "g": acc.reshape(-1)})

        # per-partition partial Grams -> one 4096-key fold
        return cx.mapInPandas(gram_kernel, "idx int, g long").groupBy(
            "idx"
        ).agg(F.sum("g").alias("g"))

    gram_df = memo_persist(
        spark,
        ("power_gram", sf_dir),
        build_gram,
        fingerprint=table_fingerprint(sf_dir, "embeddings"),
    )
    G: dict[int, int] = {
        int(r["idx"]): int(r["g"]) for r in gram_df.collect()
    }  # dim^2 = 4096 entries — bounded by construction

    v = [POW_MICRO] * RP_D_IN
    for _ in range(POW_ITERS):
        y = [
            sum(G.get(i * RP_D_IN + j, 0) * v[j] for j in range(RP_D_IN))
            for i in range(RP_D_IN)
        ]
        ymax = max(abs(t) for t in y) or 1
        # renormalize back to ~micro scale via TRUNCATING division
        # with a descaled (positive) denominator — DuckDB's // also
        # truncates toward zero, so the paths stay bit-identical
        denom = max(ymax // POW_MICRO, 1)
        v = [tdiv(t, denom) for t in y]

    rows = [(i, v[i]) for i in range(RP_D_IN)]
    return spark.createDataFrame(
        rows, "dim_idx INT, loading_micro BIGINT"
    ).orderBy("dim_idx")


def _power_oracle() -> str:
    iters = []
    prev = "v0"
    for t in range(1, POW_ITERS + 1):
        iters.append(
            f"""y{t} AS MATERIALIZED (
  SELECT g.i, sum(CAST(g.g AS HUGEINT) * w.m) AS y
  FROM gram g JOIN {prev} w ON w.i = g.j GROUP BY g.i
),
v{t} AS MATERIALIZED (
  SELECT i, CAST(y // (SELECT greatest(max(abs(y)) // {POW_MICRO}, 1)
                       FROM y{t}) AS BIGINT) AS m
  FROM y{t}
)"""
        )
        prev = f"v{t}"
    return f"""
WITH q AS (
  SELECT vec_id,
    list_transform(embedding,
      v -> CAST(floor(CAST(v AS DOUBLE) * {POW_MICRO} + 0.5) AS BIGINT)) AS xi
  FROM embeddings
),
flat AS MATERIALIZED (
  SELECT vec_id, u.i - 1 AS i, q.xi[u.i] AS x
  FROM q, unnest(generate_series(1, {RP_D_IN})) AS u(i)
),
means AS (
  SELECT i, CAST(sum(x) // count(*) AS BIGINT) AS mu FROM flat GROUP BY i
),
cx AS MATERIALIZED (
  SELECT f.vec_id, f.i, CAST(f.x - m.mu AS BIGINT) AS cx
  FROM flat f JOIN means m USING (i)
),
gram AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, CAST(sum(a.cx * b.cx) AS BIGINT) AS g
  FROM cx a JOIN cx b USING (vec_id)
  GROUP BY 1, 2
),
v0 AS (SELECT u.i - 1 AS i, CAST({POW_MICRO} AS HUGEINT) AS m
       FROM unnest(generate_series(1, {RP_D_IN})) AS u(i)),
{",".join(iters)}
SELECT i AS dim_idx, CAST(m AS BIGINT) AS loading_micro
FROM {prev} ORDER BY dim_idx
"""


QUERIES_ENGINE6 = {
    "embedding_random_projection": embedding_random_projection,
    "embedding_power_component": embedding_power_component,
    "pair_rouge_overlap": pair_rouge_overlap,
    "streaming_cms_heavy_hitters": streaming_cms_heavy_hitters,
    "preference_bradley_terry": preference_bradley_terry,
    "preference_bradley_terry_distributed": preference_bradley_terry_distributed,
}


def _oracles_engine6() -> dict[str, str]:
    from youtube_etl_automated_pipeline_spark.plans.queries_sketch import (
        ORACLES_SKETCH,
    )

    return {
        "embedding_random_projection": _rp_oracle(),
        "embedding_power_component": _power_oracle(),
        "pair_rouge_overlap": _rouge_oracle(),
        # associative sum: streamed complete-mode sketch == batch sketch
        "streaming_cms_heavy_hitters": ORACLES_SKETCH["cms_heavy_hitters"],
        "preference_bradley_terry": _bt_oracle(),
        # the distributed MM trainer replays the SAME fixed point
        "preference_bradley_terry_distributed": _bt_oracle(),
    }


ORACLES_ENGINE6 = _oracles_engine6()


# ------------------------------------------- two-pass exact median
MED_BUCKETS = 1024  # FIXED buckets per round: histogram size is
# groups x MED_BUCKETS regardless of the value column's RANGE (round 8;
# the round-7 cents-DIV-width grain grew linearly with range)


def _median_hist(base: DataFrame, bucket_col: str) -> DataFrame:
    """Per-(group, bucket) count histogram — map-side combinable; at
    most groups x MED_BUCKETS rows by construction of the bucket
    expressions (both b1 and b2 live in [0, MED_BUCKETS))."""
    return base.groupBy("c_nationkey", bucket_col).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def _locate(hist: DataFrame, bucket_col: str, rank_col: str) -> DataFrame:
    """Running-sum bucket location over the SMALL histogram relation:
    returns (c_nationkey, <bucket_col>, off) where off is the target
    rank's offset INSIDE the located bucket. rank_col must be present
    on hist (joined in by the caller)."""
    from pyspark.sql import Window

    w = Window.partitionBy("c_nationkey").orderBy(bucket_col)
    cum = hist.select(
        "c_nationkey",
        bucket_col,
        rank_col,
        (F.sum("cnt").over(w) - F.col("cnt")).alias("below"),
        F.sum("cnt").over(w).alias("cum"),
    )
    return cum.filter(
        (F.col("below") < F.col(rank_col)) & (F.col(rank_col) <= F.col("cum"))
    ).select(
        "c_nationkey", bucket_col, (F.col(rank_col) - F.col("below")).alias("off")
    )


def exact_median_two_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-nation median order value WITHOUT a global sort — the
    classic histogram-refinement quantile used where a full per-group
    sort of 100 TB of values is unaffordable, now RANGE-INDEPENDENT
    (round 8): every histogram round uses MED_BUCKETS fixed buckets
    over the group's [lo, hi] value range, so the bucket relation is
    groups x MED_BUCKETS no matter how heavy-tailed the value column —
    a 100x corpus with a 10^15 value span costs the same bucket rows
    as cents-bounded order totals (range-invariance pinned in
    tests/test_engine6.py on a synthetic 10^15-span column).

    Rounds (each map-side combinable; all-integer arithmetic):
    0. per-group (min, max, n) — locates the range and the lower-median
       rank r = (n+1) DIV 2;
    1. b1 = (x-lo)*B DIV span histogram -> running sum over the SMALL
       bucket table finds the median bucket and the in-bucket offset;
    2. REFINEMENT: only rows in the median bucket (selectivity ~1/B;
       the broadcast hash join's runtime filter prunes the rest — on a
       real cluster this is a dynamic partition/bloom prune against
       the scan) re-bucket by the scaled remainder
       b2 = ((x-lo)*B - b1*span)*B DIV span into B sub-buckets;
    3. rows in the refined sub-bucket (~1/B^2 of the group) are ranked
       BY VALUE and the row at the offset is the exact median. Ties in
       cents are safe: any tie order yields the same VALUE.

    Output: nation_name, n_orders, median_cents, median_price."""
    from youtube_etl_automated_pipeline_spark.functions.compat import units

    from pyspark.sql import Window

    B = MED_BUCKETS
    cust = load_wide(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    nat = load_wide(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation_name")
    )
    # SQL percentile convention: NULL values carry no rank — exclude
    # them (both twins), so n and the target rank count real values
    orders = (
        load_wide(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice").isNotNull())
        .select("o_custkey", units(F.col("o_totalprice"), 2).alias("cents"))
        .join(F.broadcast(cust), "o_custkey")
        .select("c_nationkey", "cents")
    )
    med = group_median_exact(
        orders,
        value_col="cents",
        buckets=B,
        memo_key=("exact_median", sf_dir),
    )
    return (
        med.join(F.broadcast(nat), med.c_nationkey == nat.n_nationkey)
        .select(
            "nation_name",
            F.col("n").cast("bigint").alias("n_orders"),
            F.col("median_val").cast("bigint").alias("median_cents"),
            (F.col("median_val") / 100.0).alias("median_price"),
        )
        .orderBy("nation_name")
    )


def _median_base(
    rows: DataFrame, value_col: str, buckets: int, memo_key: tuple | None = None
):
    """Round-0 stats + the round-1 bucketed base relation. b1 =
    (v-lo)*B DIV span is in [0, B) by construction — (v-lo) < span so
    (v-lo)*B < span*B — which is what makes the histogram relation
    range-invariant (asserted directly in tests).

    ``memo_key``: persist the groups-bounded stats relation. Without
    it, every consumer of ``base`` (histogram pass, refinement pass)
    re-executes the stats AGGREGATE — a full input scan per consumer
    (r08: the median family was scanning the fact relation ~6x per
    run through this seam; guide section 1.2, don't recompute)."""
    vals = rows.select("c_nationkey", F.col(value_col).alias("v"))
    stats = vals.groupBy("c_nationkey").agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "c_nationkey",
        "lo",
        "n",
        (F.col("hi") - F.col("lo") + 1).alias("span"),
        F.expr("CAST((n + 1) DIV 2 AS BIGINT)").alias("r"),
    )
    if memo_key is not None:
        from youtube_etl_automated_pipeline_spark.operators.cache_registry import (
            memo_persist,
        )

        stats_df = stats
        stats = memo_persist(
            rows.sparkSession, (*memo_key, "med_stats"), lambda: stats_df
        )
    base = vals.join(F.broadcast(stats), "c_nationkey").withColumn(
        "b1", F.expr(f"(v - lo) * {buckets} div span")
    )
    return base, stats


def group_median_exact(
    rows: DataFrame,
    value_col: str,
    buckets: int = MED_BUCKETS,
    memo_key: tuple | None = None,
) -> DataFrame:
    """The reusable range-independent exact-median operator over a
    (c_nationkey, <value_col>) relation — see exact_median_two_pass
    for the round-by-round shape. Returns (c_nationkey, n,
    median_val). Exposed separately so tests can drive it with
    synthetic wide-range columns.

    ``memo_key`` persists the three BOUNDED intermediates consumed
    more than once (stats: one row per group; pick1: one row per
    group; ref: the located bucket's rows, ~1/buckets of the input by
    construction) — without it each consumer re-executes its subtree
    from the scan (r08; the callers with a stable (query, sf_dir)
    identity pass one, synthetic test drivers skip it)."""
    from pyspark.sql import Window

    B = buckets
    base, stats = _median_base(rows, value_col, B, memo_key=memo_key)

    pick1 = _locate(
        _median_hist(base, "b1").join(
            stats.select("c_nationkey", "r"), "c_nationkey"
        ),
        "b1",
        "r",
    )
    if memo_key is not None:
        from youtube_etl_automated_pipeline_spark.operators.cache_registry import (
            memo_persist,
        )

        pick1_df = pick1
        pick1 = memo_persist(
            rows.sparkSession, (*memo_key, "med_pick1"), lambda: pick1_df
        )
    # refinement round: only the median bucket's rows, re-bucketed by
    # the scaled remainder t = (v-lo)*B - b1*span in [0, span)
    ref = base.join(F.broadcast(pick1.select("c_nationkey", "b1")), [
        "c_nationkey", "b1"
    ]).withColumn("b2", F.expr(f"((v - lo) * {B} - b1 * span) * {B} div span"))
    if memo_key is not None:
        ref_df = ref
        ref = memo_persist(
            rows.sparkSession, (*memo_key, "med_ref"), lambda: ref_df
        )
    pick2 = _locate(
        _median_hist(ref, "b2").join(
            pick1.select("c_nationkey", F.col("off").alias("r1")),
            "c_nationkey",
        ),
        "b2",
        "r1",
    )

    w2 = Window.partitionBy("c_nationkey", "b2").orderBy("v")
    return (
        ref.join(F.broadcast(pick2), ["c_nationkey", "b2"])
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == F.col("off"))
        .select(
            "c_nationkey",
            F.col("n"),
            F.col("v").alias("median_val"),
        )
    )


_MEDIAN_ORACLE = f"""
WITH o AS (
  SELECT c.c_nationkey,
    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM orders JOIN customer c ON c.c_custkey = o_custkey
  WHERE o_totalprice IS NOT NULL
),
ranked AS (
  SELECT c_nationkey, cents,
    row_number() OVER (PARTITION BY c_nationkey ORDER BY cents) AS rn,
    count(*) OVER (PARTITION BY c_nationkey) AS n
  FROM o
)
SELECT nn.n_name AS nation_name,
  CAST(n AS BIGINT) AS n_orders,
  CAST(cents AS BIGINT) AS median_cents,
  cents / 100.0 AS median_price
FROM ranked JOIN nation nn ON nn.n_nationkey = ranked.c_nationkey
WHERE rn = (n + 1) // 2
ORDER BY nation_name
"""

QUERIES_ENGINE6["exact_median_two_pass"] = exact_median_two_pass
ORACLES_ENGINE6["exact_median_two_pass"] = _MEDIAN_ORACLE


# ------------------------------------------- Fellegi-Sunter linkage
FS_LEN_BUCKET = 256
FS_TOK_BUCKET = 32
# The shared ln fragment (DSIR / Kaplan-Meier exposure argument): ONE
# textually-identical expression evaluated by BOTH engines on
# identical integer counts — a rounding flip needs the true value
# within ~2 ulp of a .5 micro boundary. Add-one smoothing keeps every
# ratio finite even when a proxy set is empty or saturated.
_FS_W_AGREE = (
    "CAST(floor(ln((CAST(a_m + 1 AS DOUBLE) * (n_u + 2))"
    " / (CAST(a_u + 1 AS DOUBLE) * (n_m + 2))) * 1e6 + 0.5) AS BIGINT)"
)
_FS_W_DISAGREE = (
    "CAST(floor(ln((CAST(n_m + 1 - a_m AS DOUBLE) * (n_u + 2))"
    " / (CAST(n_u + 1 - a_u AS DOUBLE) * (n_m + 2))) * 1e6 + 0.5) AS BIGINT)"
)
_FS_FEATURES = ("lang", "source", "len_b", "tok_b")


def record_linkage_fs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record-linkage scoring — the
    entity-resolution operator that turns per-field agreement into a
    calibrated match weight (the backbone of production dedup linkers
    like Splink). Fields: lang, source, length bucket, token-count
    bucket (null-safe equality: missing == missing counts as
    agreement, identically in both engines).

    m-probabilities are estimated from a MATCH PROXY — the LSH
    candidate pairs whose exact shingle Jaccard clears the dedup
    family's threshold; u-probabilities from a NON-MATCH PROXY — the
    deterministic rank-shift pairing (doc at sorted position r vs
    r + n/2: a fixed, reproducible "random pairs" stand-in). Both are
    one aggregation each (4 conditional sums + a count). Per-feature
    agree/disagree log-weights evaluate the SAME ln text on the same
    integers in both engines (DSIR exposure argument), floored to
    integer micro-units.

    Because the score is a function of the 4-bit agreement PATTERN
    alone, the gate output is the complete pattern census over all
    candidate pairs: (pattern, n_pairs, score_micro) — at most 16
    rows. Scale shape: candidates come from the shared persisted
    banding (never all-pairs); proxies and censuses are map-side
    combinable aggs; the weight table is one broadcast row."""
    from youtube_etl_automated_pipeline_spark.ext.textstats import (
        normalized_text,
        tokens,
    )
    from youtube_etl_automated_pipeline_spark.functions.compat import hround
    from youtube_etl_automated_pipeline_spark.plans.queries_dedup_adv import (
        JACCARD_THRESHOLD,
        minhash_base,
    )

    cand = lsh_candidates(spark, sf_dir)
    docs = load_wide(spark, sf_dir, "documents")
    toks = tokens(normalized_text(F.col("text")))
    feats = docs.select(
        "doc_id",
        "lang",
        "source",
        F.expr(f"CAST(n_chars DIV {FS_LEN_BUCKET} AS BIGINT)").alias("len_b"),
        F.floor(F.size(toks) / F.lit(FS_TOK_BUCKET))
        .cast("bigint")
        .alias("tok_b"),
    )

    def agree_bits(pairs: DataFrame) -> DataFrame:
        fa = feats.select(
            F.col("doc_id").alias("doc_a"),
            *[F.col(f).alias(f"{f}_a") for f in _FS_FEATURES],
        )
        fb = feats.select(
            F.col("doc_id").alias("doc_b"),
            *[F.col(f).alias(f"{f}_b") for f in _FS_FEATURES],
        )
        out = pairs.join(fa, "doc_a").join(fb, "doc_b")
        for f in _FS_FEATURES:
            out = out.withColumn(
                f"ag_{f}",
                F.col(f"{f}_a").eqNullSafe(F.col(f"{f}_b")).cast("int"),
            )
        return out.select(
            "doc_a", "doc_b", *[f"ag_{f}" for f in _FS_FEATURES]
        )

    # match proxy: Jaccard-verified near-dup candidate pairs
    base = minhash_base(spark, sf_dir)
    sets_a = base.select(
        F.col("doc_id").alias("doc_a"), F.col("hash_set").alias("set_a")
    )
    sets_b = base.select(
        F.col("doc_id").alias("doc_b"), F.col("hash_set").alias("set_b")
    )
    m_pairs = (
        cand.join(sets_a, "doc_a")
        .join(sets_b, "doc_b")
        .filter(
            hround(
                F.size(F.array_intersect("set_a", "set_b"))
                / F.size(F.array_union("set_a", "set_b")),
                4,
            )
            >= JACCARD_THRESHOLD
        )
        .select("doc_a", "doc_b")
    )
    # non-match proxy: deterministic id-shift pairing (doc i vs doc
    # i + n/2, inner equi-join on the shifted key — no global window,
    # no sequence; on a sparse id space the inner join simply yields
    # the ids whose shifted partner exists, which stays deterministic)
    half = docs.count() // 2  # one scalar — bounded by construction
    ids = docs.select("doc_id")
    u_pairs = (
        ids.alias("a")
        .join(
            ids.alias("b"),
            F.col("b.doc_id") == F.col("a.doc_id") + F.lit(half),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
    )

    def proxy_counts(pairs: DataFrame, n_name: str, a_prefix: str) -> DataFrame:
        bits = agree_bits(pairs)
        return bits.agg(
            F.count(F.lit(1)).alias(n_name),
            *[
                F.sum(f"ag_{f}").alias(f"{a_prefix}_{f}")
                for f in _FS_FEATURES
            ],
        )

    counts = proxy_counts(m_pairs, "n_m", "am").crossJoin(
        proxy_counts(u_pairs, "n_u", "au")
    )  # 1 row x 1 row — the scalar-broadcast pattern

    census = (
        agree_bits(cand)
        .select(
            F.expr(
                "CAST("
                + " + ".join(
                    f"ag_{f} * {1 << (len(_FS_FEATURES) - 1 - k)}"
                    for k, f in enumerate(_FS_FEATURES)
                )
                + " AS INT)"
            ).alias("pattern"),
            *[F.col(f"ag_{f}") for f in _FS_FEATURES],
        )
        .groupBy("pattern", *[f"ag_{f}" for f in _FS_FEATURES])
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    scored = census.crossJoin(F.broadcast(counts))
    score = None
    for f in _FS_FEATURES:
        wa = _FS_W_AGREE.replace("a_m", f"am_{f}").replace("a_u", f"au_{f}")
        wd = _FS_W_DISAGREE.replace("a_m", f"am_{f}").replace(
            "a_u", f"au_{f}"
        )
        term = F.expr(f"CASE WHEN ag_{f} = 1 THEN {wa} ELSE {wd} END")
        score = term if score is None else score + term
    return (
        scored.select(
            "pattern",
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            score.cast("bigint").alias("score_micro"),
        )
        .orderBy("pattern")
    )


def _fs_oracle() -> str:
    from youtube_etl_automated_pipeline_spark.ext.dedup import N_PERM
    from youtube_etl_automated_pipeline_spark.ext.textstats import WS_CLASS
    from youtube_etl_automated_pipeline_spark.plans.oracles_dedup_adv import (
        _JACC,
        _SH_HASHES,
        _sig,
    )
    from youtube_etl_automated_pipeline_spark.plans.queries_dedup_adv import (
        JACCARD_THRESHOLD,
    )

    toks = f"string_split_regex(trim(text), '{WS_CLASS}+')"
    tok_cnt = (
        f"CASE WHEN text IS NULL OR trim(text) = '' THEN 0"
        f" ELSE len({toks}) END"
    )
    ag = {
        "lang": "fa.lang IS NOT DISTINCT FROM fb.lang",
        "source": "fa.source IS NOT DISTINCT FROM fb.source",
        "len_b": "fa.len_b IS NOT DISTINCT FROM fb.len_b",
        "tok_b": "fa.tok_b IS NOT DISTINCT FROM fb.tok_b",
    }
    bit_cols = ", ".join(
        f"CASE WHEN {cond} THEN 1 ELSE 0 END AS ag_{f}"
        for f, cond in ag.items()
    )
    pattern = " + ".join(
        f"ag_{f} * {1 << (len(_FS_FEATURES) - 1 - k)}"
        for k, f in enumerate(_FS_FEATURES)
    )
    score_terms = []
    for f in _FS_FEATURES:
        wa = _FS_W_AGREE.replace("a_m", f"am_{f}").replace("a_u", f"au_{f}")
        wd = _FS_W_DISAGREE.replace("a_m", f"am_{f}").replace(
            "a_u", f"au_{f}"
        )
        score_terms.append(f"CASE WHEN ag_{f} = 1 THEN {wa} ELSE {wd} END")
    agg_m = ", ".join(
        f"CAST(sum(ag_{f}) AS BIGINT) AS am_{f}" for f in _FS_FEATURES
    )
    agg_u = ", ".join(
        f"CAST(sum(ag_{f}) AS BIGINT) AS au_{f}" for f in _FS_FEATURES
    )
    return f"""
WITH base AS (
  SELECT doc_id, {_SH_HASHES} AS hs
  FROM documents
  WHERE len({_SH_HASHES}) >= 3
),
sigs AS MATERIALIZED (
  SELECT doc_id, hs,
    {", ".join(f"{_sig(j)} AS sig_{j}" for j in range(N_PERM))}
  FROM base
),
cand AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sigs a JOIN sigs b
    ON a.doc_id < b.doc_id
   AND ({" OR ".join(f"a.sig_{j} = b.sig_{j}" for j in range(N_PERM))})
),
feats AS MATERIALIZED (
  SELECT doc_id, lang, source,
    CAST(n_chars // {FS_LEN_BUCKET} AS BIGINT) AS len_b,
    CAST(({tok_cnt}) // {FS_TOK_BUCKET} AS BIGINT) AS tok_b
  FROM documents
),
cand_bits AS MATERIALIZED (
  SELECT c.doc_a, c.doc_b, {bit_cols}
  FROM cand c JOIN feats fa ON fa.doc_id = c.doc_a
  JOIN feats fb ON fb.doc_id = c.doc_b
),
m_pairs AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN base a ON a.doc_id = c.doc_a
  JOIN base b ON b.doc_id = c.doc_b
  WHERE ({_JACC.replace("n_inter", "len(list_intersect(a.hs, b.hs))")
            .replace("n_union",
                     "len(list_distinct(list_concat(a.hs, b.hs)))")})
        >= {JACCARD_THRESHOLD}
),
m_bits AS (
  SELECT {bit_cols}
  FROM m_pairs c JOIN feats fa ON fa.doc_id = c.doc_a
  JOIN feats fb ON fb.doc_id = c.doc_b
),
u_pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM documents a JOIN documents b
    ON b.doc_id = a.doc_id + (SELECT count(*) // 2 FROM documents)
),
u_bits AS (
  SELECT {bit_cols}
  FROM u_pairs c JOIN feats fa ON fa.doc_id = c.doc_a
  JOIN feats fb ON fb.doc_id = c.doc_b
),
counts AS (
  SELECT * FROM
    (SELECT CAST(count(*) AS BIGINT) AS n_m, {agg_m} FROM m_bits),
    (SELECT CAST(count(*) AS BIGINT) AS n_u, {agg_u} FROM u_bits)
),
census AS (
  SELECT CAST({pattern} AS INT) AS pattern,
    {", ".join(f"ag_{f}" for f in _FS_FEATURES)},
    CAST(count(*) AS BIGINT) AS n_pairs
  FROM cand_bits
  GROUP BY ALL
)
SELECT pattern, n_pairs,
  CAST({" + ".join(score_terms)} AS BIGINT) AS score_micro
FROM census, counts
ORDER BY pattern
"""


QUERIES_ENGINE6["record_linkage_fs"] = record_linkage_fs
ORACLES_ENGINE6["record_linkage_fs"] = _fs_oracle()
