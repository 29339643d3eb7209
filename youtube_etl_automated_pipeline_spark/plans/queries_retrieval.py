"""Ranked retrieval and model-based corpus-quality operators
(round 3, batch 3).

- ``bm25_search_docs`` — Okapi BM25 ranked retrieval for a fixed
  query-term set over the documents table: the serving-side twin of
  the existing ``boolean_search_docs`` / ``phrase_search_docs`` /
  ``tfidf_top_terms`` family (reference parity note: the reference
  pipeline has no retrieval surface at all — reference:
  Python-pipeline/dataprocessing1.py stops at grouped rollups — so
  this is extension surface for the LLM-data use case, where BM25
  ranking drives retrieval-based decontamination and RAG eval sets).
- ``lm_perplexity_buckets`` — CCNet-style model-based quality
  filter: train an add-one-smoothed bigram language model on a
  deterministic md5 split of the corpus, score held-out documents by
  average negative log-likelihood (micro-nats), and report the
  perplexity-band census a curation pipeline thresholds on.
- ``auc_mann_whitney`` — exact ROC-AUC of a cheap quality signal
  ("the"-marker count) against a binary label (lang = 'en') via the
  tie-aware Mann-Whitney rank statistic: the evaluation primitive for
  every learned quality filter (pairs with
  ``quality_logreg_scores`` / ``logreg_calibration_bins``).

Bit-exactness strategy (house pattern): every distributed pass
reduces to exact integers (term counts, document lengths, 2U rank
numerators, micro-nat-quantized log-likelihoods) so partial
aggregation order cannot matter; float chains run once per tiny
relation row over identical SQL text / expression chains in both
engines, then are fixed-point floored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from youtube_etl_automated_pipeline_spark.operators.windows import bounded_window

from youtube_etl_automated_pipeline_spark.sources import load_wide

QUERIES_RETRIEVAL: dict = {}
ORACLES_RETRIEVAL: dict[str, str] = {}


# ------------------------------------------------------------------
# BM25 ranked retrieval.
#
# The heavy pass produces two exact-integer relations:
#   tf(doc_id, term, tf, dl)      — one row per (matching doc, term)
#   stats(term, df, n_docs, sum_dl) — one row per query term
# and the scoring tail is ONE shared SQL text run verbatim by both
# engines over those relations, so the idf/tf-normalization double
# chain is bit-identical. Per-(doc,term) contributions are floored to
# integer micro-units BEFORE the per-doc sum, which keeps the final
# score an order-independent integer sum (same micro-nat trick as
# naive_bayes_lang_confusion). Ordering/limit runs on the quantized
# integer score with a doc_id tiebreak — a total order, so top-k is
# deterministic and engine-independent.

BM25_TERMS = ("spark", "merge", "vector")
BM25_TOPK = 10

# K1 = 1.2 and B = 0.75 are written as exact double literals (12e-1,
# 75e-2) inside the shared text so both engines parse the identical
# constant.
_BM25_SCORED = """contrib AS (
  SELECT t.doc_id,
    CAST(floor(1e6
      * ln((CAST(s.n_docs AS DOUBLE) - CAST(s.df AS DOUBLE) + 5e-1)
           / (CAST(s.df AS DOUBLE) + 5e-1) + 1e0)
      * (CAST(t.tf AS DOUBLE) * (12e-1 + 1e0))
      / (CAST(t.tf AS DOUBLE) + 12e-1
         * (1e0 - 75e-2 + 75e-2 * CAST(t.dl AS DOUBLE)
            * CAST(s.n_docs AS DOUBLE) / CAST(s.sum_dl AS DOUBLE)))
      + 5e-1) AS BIGINT) AS c_micro
  FROM {tf} t JOIN {stats} s ON t.term = s.term
), scored AS (
  SELECT doc_id, CAST(sum(c_micro) AS BIGINT) AS score_micro,
         count(*) AS n_terms
  FROM contrib GROUP BY doc_id
)"""

_BM25_TAIL = (
    _BM25_SCORED
    + """
SELECT doc_id, n_terms, score_micro
FROM scored
ORDER BY score_micro DESC, doc_id
LIMIT {topk}"""
)


def _bm25_register(spark: SparkSession, sf_dir: str) -> None:
    """Build and register the exact-integer tf/stats relations.

    Both are memo-persisted per sf_dir: tf is the query-term posting
    subset (exactly what a retrieval system materializes as its
    index), and three gate queries (bm25_search_docs,
    rrf_fused_search, retrieval_rank_eval) share it — without the
    memo each one re-tokenizes the full corpus.
    """
    from youtube_etl_automated_pipeline_spark.ext.textstats import (
        normalized_text,
        tokens,
    )
    from youtube_etl_automated_pipeline_spark.operators.cache_registry import (
        memo_persist,
    )

    def build_tf() -> DataFrame:
        docs = load_wide(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull()
        )
        toked = docs.select(
            "doc_id", tokens(normalized_text(F.col("text"))).alias("toks")
        ).select("doc_id", "toks", F.size("toks").alias("dl"))
        corpus = toked.agg(
            F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
        )
        tf = (
            toked.select("doc_id", "dl", F.explode("toks").alias("term"))
            .filter(F.col("term").isin(*BM25_TERMS))
            .groupBy("doc_id", "dl", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        # fold the 1-row corpus stats in so ONE persisted relation
        # carries everything downstream queries need
        return tf.crossJoin(F.broadcast(corpus))

    wide = memo_persist(spark, ("bm25_tf", sf_dir), build_tf)
    tf = wide.select("doc_id", "dl", "term", "tf")
    stats = (
        wide.groupBy("term", "n_docs", "sum_dl")
        .agg(F.count(F.lit(1)).alias("df"))
        .select("term", "df", "n_docs", "sum_dl")
    )
    tf.createOrReplaceTempView("_bm25_tf")
    stats.createOrReplaceTempView("_bm25_stats")


def bm25_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k documents by Okapi BM25 for the fixed query-term set.

    Scale shape: the corpus-sized work is one explode + a grouped
    count RESTRICTED to query terms (the filter lands before the
    shuffle, so the tf relation carries |q| rows per matching doc,
    not the whole posting list), plus one map-side-combinable (N,
    sum dl) corpus agg. The per-term stats relation is |q| rows and
    broadcast-joins into the contribution projection; top-k is
    TakeOrdered on an integer score — no global sort at any scale.
    """
    _bm25_register(spark, sf_dir)
    return spark.sql(
        "WITH "
        + _BM25_TAIL.format(tf="_bm25_tf", stats="_bm25_stats", topk=BM25_TOPK)
    )


QUERIES_RETRIEVAL["bm25_search_docs"] = bm25_search_docs


def _bm25_base_cte() -> str:
    """DuckDB CTE chain producing the same tf/stats relations."""
    from youtube_etl_automated_pipeline_spark.ext.textstats import WS_CLASS

    terms_list = ", ".join(f"'{t}'" for t in BM25_TERMS)
    norm = f"lower(regexp_replace(trim(text), '{WS_CLASS}+', ' ', 'g'))"
    return f"""toked AS (
  SELECT doc_id,
         list_filter(string_split_regex({norm}, '{WS_CLASS}+'),
                     x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL
), dls AS (
  SELECT doc_id, len(toks) AS dl, toks FROM toked
), corpus AS (
  SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dls
), tf AS (
  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dls)
  WHERE term IN ({terms_list})
  GROUP BY doc_id, dl, term
), stats AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df, n_docs, sum_dl
  FROM tf CROSS JOIN corpus
  GROUP BY term, n_docs, sum_dl
)"""


ORACLES_RETRIEVAL["bm25_search_docs"] = (
    "WITH "
    + _bm25_base_cte()
    + ", "
    + _BM25_TAIL.format(tf="tf", stats="stats", topk=BM25_TOPK)
)


# ------------------------------------------------------------------
# CCNet-style bigram-LM perplexity filter.
#
# Train an add-one-smoothed bigram LM on the md5-bucket train split
# (the same growth-stable split pattern as train_val_test_split /
# naive_bayes_lang_confusion), score each held-out document by its
# average negative log-likelihood in micro-nats (exact integers all
# the way: per-bigram-type NLLs are floored once at grid-build time,
# per-doc totals are integer sums, the average is integer division),
# and report the census of 0.5-nat perplexity bands — the artifact a
# curation pipeline thresholds on ("drop everything above band B").

LM_TRAIN_PCT = 80
LM_BAND_MICRO = 500_000  # 0.5 nat per band


def lm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band held-out document census under a train-split bigram LM.

    Scale shape: bigram generation is an ARRAY-LOCAL transform (no
    window, no self-join — `transform` over the token array emits
    (w1, w2) pairs inside the row before explode), so the corpus
    pass is explode + two map-side-combinable grouped counts. The
    likelihood grid is bigram-vocab-bounded and joins on (w1, w2);
    zipf-hot bigrams partial-aggregate before the shuffle. Scoring
    is one integer sum per doc. Docs with < 2 tokens have no bigrams
    and are out of scope (no model-scorable content).
    """
    from youtube_etl_automated_pipeline_spark.ext.textstats import (
        md5_long,
        normalized_text,
        tokens,
    )

    docs = load_wide(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toked = docs.select(
        "doc_id",
        (md5_long(F.col("doc_id").cast("string")) % 100).alias("bucket"),
        tokens(normalized_text(F.col("text"))).alias("toks"),
    )

    def bigrams(split: DataFrame) -> DataFrame:
        return split.select(
            "doc_id",
            F.explode(
                F.expr(
                    "filter(transform(toks, (x, i) ->"
                    " IF(i < size(toks) - 1,"
                    " named_struct('w1', x, 'w2', toks[i + 1]), NULL)),"
                    " s -> s IS NOT NULL)"
                )
            ).alias("bg"),
        ).select("doc_id", F.col("bg.w1"), F.col("bg.w2"))

    # split BEFORE tokenize/explode: the train pass explodes only the
    # 80% split and the scoring pass only the 20% split — one corpus
    # pass total, not two (the filter on a per-doc hash commutes with
    # bigram generation).
    train = bigrams(toked.filter(F.col("bucket") < LM_TRAIN_PCT))
    test = bigrams(toked.filter(F.col("bucket") >= LM_TRAIN_PCT))

    c_big = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bw"))
    c_ctx = c_big.groupBy("w1").agg(F.sum("c_bw").alias("c_w"))
    vrow = c_big.agg(
        (F.count_distinct(F.col("w2")) + F.lit(1)).alias("v")
    )

    # NLLs are ln of a (>1) exact-integer ratio, floored to micro-nats
    # once here — identical expression text to the oracle's.
    grid = (
        c_big.join(c_ctx, "w1")
        .crossJoin(F.broadcast(vrow))
        .select(
            "w1",
            "w2",
            F.floor(
                F.lit(1e6)
                * F.log(
                    (F.col("c_w") + F.col("v")).cast("double")
                    / (F.col("c_bw") + F.lit(1)).cast("double")
                )
                + F.lit(0.5)
            ).alias("nll_bw"),
        )
    )
    ctx_default = c_ctx.crossJoin(F.broadcast(vrow)).select(
        "w1",
        F.floor(
            F.lit(1e6) * F.log((F.col("c_w") + F.col("v")).cast("double"))
            + F.lit(0.5)
        ).alias("nll_ctx"),
    )
    glob_default = vrow.select(
        F.floor(
            F.lit(1e6) * F.log(F.col("v").cast("double")) + F.lit(0.5)
        ).alias("nll_glob")
    )

    tok = test.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_doc = (
        tok.join(grid, ["w1", "w2"], "left")
        .join(ctx_default, "w1", "left")
        .crossJoin(F.broadcast(glob_default))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("cnt")
                * F.coalesce(
                    F.col("nll_bw"), F.col("nll_ctx"), F.col("nll_glob")
                )
            ).alias("total_nll"),
            F.sum("cnt").alias("n_bigrams"),
        )
    )
    return (
        per_doc.select(
            F.expr(
                f"(total_nll div n_bigrams) div {LM_BAND_MICRO}"
            ).alias("ppl_band")
        )
        .groupBy("ppl_band")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


QUERIES_RETRIEVAL["lm_perplexity_buckets"] = lm_perplexity_buckets


def _lm_oracle() -> str:
    from youtube_etl_automated_pipeline_spark.ext.textstats import WS_CLASS

    norm = f"lower(regexp_replace(trim(text), '{WS_CLASS}+', ' ', 'g'))"
    return f"""
WITH toked AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
           % 100 AS bucket,
         list_filter(string_split_regex({norm}, '{WS_CLASS}+'),
                     x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL
), bigr AS (
  -- DuckDB zips multiple unnests in one select list positionally,
  -- so slicing [1..n-1] and [2..n] yields the bigram pairs.
  SELECT doc_id, bucket,
         unnest(list_slice(toks, 1, len(toks) - 1)) AS w1,
         unnest(list_slice(toks, 2, len(toks))) AS w2
  FROM toked
), train AS (
  SELECT * FROM bigr WHERE bucket < {LM_TRAIN_PCT}
), test AS (
  SELECT * FROM bigr WHERE bucket >= {LM_TRAIN_PCT}
), c_big AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bw
  FROM train GROUP BY w1, w2
), c_ctx AS (
  SELECT w1, CAST(sum(c_bw) AS BIGINT) AS c_w FROM c_big GROUP BY w1
), vrow AS (
  SELECT count(DISTINCT w2) + 1 AS v FROM c_big
), grid AS (
  SELECT w1, w2,
    CAST(floor(1e6 * ln(CAST(c_w + v AS DOUBLE)
      / CAST(c_bw + 1 AS DOUBLE)) + 5e-1) AS BIGINT) AS nll_bw
  FROM c_big JOIN c_ctx USING (w1) CROSS JOIN vrow
), ctx_default AS (
  SELECT w1,
    CAST(floor(1e6 * ln(CAST(c_w + v AS DOUBLE)) + 5e-1) AS BIGINT)
      AS nll_ctx
  FROM c_ctx CROSS JOIN vrow
), glob_default AS (
  SELECT CAST(floor(1e6 * ln(CAST(v AS DOUBLE)) + 5e-1) AS BIGINT)
    AS nll_glob
  FROM vrow
), tok AS (
  SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS cnt
  FROM test GROUP BY doc_id, w1, w2
), per_doc AS (
  SELECT doc_id,
    CAST(sum(cnt * COALESCE(nll_bw, nll_ctx, nll_glob)) AS BIGINT)
      AS total_nll,
    CAST(sum(cnt) AS BIGINT) AS n_bigrams
  FROM tok
  LEFT JOIN grid USING (w1, w2)
  LEFT JOIN ctx_default USING (w1)
  CROSS JOIN glob_default
  GROUP BY doc_id
)
SELECT (total_nll // n_bigrams) // {LM_BAND_MICRO} AS ppl_band,
       count(*) AS n_docs
FROM per_doc GROUP BY 1
"""


ORACLES_RETRIEVAL["lm_perplexity_buckets"] = _lm_oracle()


# ------------------------------------------------------------------
# Exact tie-aware ROC-AUC via the Mann-Whitney rank statistic.
#
# AUC = (sum over positives of [#negatives below + #tied/2]) /
# (n_pos * n_neg). Multiplying by 2 clears the halves:
#   2U = sum over score values v of  pos_v * (2 * cum_neg_below(v)
#                                             + neg_v)
# — an exact integer computed from one grouped count per score value
# plus one cumulative window over the tiny per-value relation. The
# only float op is the final 2U / (2 * n_pos * n_neg), a single
# division from exact integers (identical in both engines).


def auc_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the "the"-marker-count quality signal for the
    label lang = 'en' (one output row: n_pos, n_neg, u2, auc).

    Scale shape: the corpus pass is one projection (regex count —
    JVM codegen, no UDF) plus one map-side-combinable grouped count
    to per-score-value rows. The cumulative window runs over
    O(distinct score values) rows — bounded by max marker count, not
    corpus size — so the unpartitioned window is a deliberate
    tiny-relation stage, not a scale hazard.
    """
    from youtube_etl_automated_pipeline_spark.ext.textstats import (
        marker_count,
        normalized_text,
    )

    docs = load_wide(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    per_value = (
        docs.select(
            marker_count(normalized_text(F.col("text")), "the").alias("s"),
            (F.col("lang") == "en").cast("long").alias("pos"),
        )
        .groupBy("s")
        .agg(
            F.sum("pos").alias("n_pos_v"),
            F.sum(F.lit(1) - F.col("pos")).alias("n_neg_v"),
        )
    )
    w = bounded_window("s").orderBy("s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_value.select(
        "s",
        "n_pos_v",
        "n_neg_v",
        (F.sum("n_neg_v").over(w) - F.col("n_neg_v")).alias("neg_below"),
    )
    return cum.agg(
        F.sum("n_pos_v").alias("n_pos"),
        F.sum("n_neg_v").alias("n_neg"),
        F.sum(
            F.col("n_pos_v")
            * (F.lit(2) * F.col("neg_below") + F.col("n_neg_v"))
        ).alias("u2"),
    ).select(
        "n_pos",
        "n_neg",
        "u2",
        F.floor(
            F.col("u2").cast("double")
            / (
                F.lit(2e0)
                * F.col("n_pos").cast("double")
                * F.col("n_neg").cast("double")
            )
            * F.lit(1e6)
            + F.lit(0.5)
        ).alias("auc_micro"),
    )


QUERIES_RETRIEVAL["auc_mann_whitney"] = auc_mann_whitney


def _auc_oracle() -> str:
    from youtube_etl_automated_pipeline_spark.ext.textstats import WS_CLASS

    norm = f"lower(regexp_replace(trim(text), '{WS_CLASS}+', ' ', 'g'))"
    return f"""
WITH scored AS (
  SELECT len(regexp_extract_all({norm}, '\\bthe\\b')) AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
), per_value AS (
  SELECT s, CAST(sum(pos) AS BIGINT) AS n_pos_v,
         CAST(sum(1 - pos) AS BIGINT) AS n_neg_v
  FROM scored GROUP BY s
), cum AS (
  SELECT s, n_pos_v, n_neg_v,
         CAST(sum(n_neg_v) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_neg_v AS BIGINT) AS neg_below
  FROM per_value
)
SELECT CAST(sum(n_pos_v) AS BIGINT) AS n_pos,
       CAST(sum(n_neg_v) AS BIGINT) AS n_neg,
       CAST(sum(n_pos_v * (2 * neg_below + n_neg_v)) AS BIGINT) AS u2,
       CAST(floor(CAST(sum(n_pos_v * (2 * neg_below + n_neg_v)) AS DOUBLE)
         / (2e0 * CAST(sum(n_pos_v) AS DOUBLE)
            * CAST(sum(n_neg_v) AS DOUBLE)) * 1e6 + 5e-1) AS BIGINT)
         AS auc_micro
FROM cum
"""


ORACLES_RETRIEVAL["auc_mann_whitney"] = _auc_oracle()


# ------------------------------------------------------------------
# Reciprocal-rank fusion: combine the BM25 relevance ranking with an
# independent quality ranking ("the"-marker count — stand-in for any
# model-based quality prior) via RRF(d) = sum_r 1/(60 + rank_r(d)),
# the standard zero-tuning ranker combiner (Cormack et al.). The
# per-ranking reciprocal is an EXACT integer: round(1e6/(60+rank)) =
# (2e6 + (60+rank)) div (2*(60+rank)) — no floats anywhere in the
# operator, so fusion is bit-exact by construction.

RRF_K = 60
RRF_C = 50  # candidates taken from each ranking
RRF_TOPK = 10


def _rrf_micro(rank_col: str) -> str:
    """Shared SQL: round(1e6 / (RRF_K + rank)) in pure integers."""
    d = f"({RRF_K} + {rank_col})"
    return f"((2000000 + {d}) div (2 * {d}))"


def rrf_fused_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k docs by reciprocal-rank fusion of BM25 relevance and a
    quality ranking (truncated to the top ``RRF_C`` of each).

    Scale shape: each ranking is reduced to its top-C candidates via
    TakeOrdered on exact-integer keys BEFORE any window — the
    row_number that assigns ranks runs over C rows, never the corpus
    — so the fusion join touches at most 2C rows at any data size.
    """
    from youtube_etl_automated_pipeline_spark.ext.textstats import (
        marker_count,
        normalized_text,
    )

    _bm25_register(spark, sf_dir)
    rel_c = (
        spark.sql(
            "WITH "
            + _BM25_SCORED.format(tf="_bm25_tf", stats="_bm25_stats")
            + " SELECT doc_id, score_micro FROM scored"
        )
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(RRF_C)
    )
    w_rel = bounded_window("doc_id").orderBy(F.desc("score_micro"), F.asc("doc_id"))
    rel = rel_c.select(
        "doc_id", F.row_number().over(w_rel).cast("long").alias("rank_rel")
    )

    qual_c = (
        load_wide(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            marker_count(normalized_text(F.col("text")), "the").alias("q"),
        )
        .orderBy(F.desc("q"), F.asc("doc_id"))
        .limit(RRF_C)
    )
    w_q = bounded_window("doc_id").orderBy(F.desc("q"), F.asc("doc_id"))
    qual = qual_c.select(
        "doc_id", F.row_number().over(w_q).cast("long").alias("rank_qual")
    )

    fused = rel.join(qual, "doc_id", "full").select(
        "doc_id",
        "rank_rel",
        "rank_qual",
        (
            F.coalesce(F.expr(_rrf_micro("rank_rel")), F.lit(0))
            + F.coalesce(F.expr(_rrf_micro("rank_qual")), F.lit(0))
        ).alias("rrf_micro"),
    )
    return fused.orderBy(F.desc("rrf_micro"), F.asc("doc_id")).limit(
        RRF_TOPK
    )


QUERIES_RETRIEVAL["rrf_fused_search"] = rrf_fused_search


def _rrf_oracle() -> str:
    from youtube_etl_automated_pipeline_spark.ext.textstats import WS_CLASS

    norm = f"lower(regexp_replace(trim(text), '{WS_CLASS}+', ' ', 'g'))"
    # DuckDB's integer division operator is //
    rel_micro = _rrf_micro("rank_rel").replace(" div ", " // ")
    qual_micro = _rrf_micro("rank_qual").replace(" div ", " // ")
    return (
        "WITH "
        + _bm25_base_cte()
        + ", "
        + _BM25_SCORED.format(tf="tf", stats="stats")
        + f""", rel AS (
  SELECT doc_id, CAST(rn AS BIGINT) AS rank_rel FROM (
    SELECT doc_id, row_number() OVER
      (ORDER BY score_micro DESC, doc_id) AS rn
    FROM scored
  ) WHERE rn <= {RRF_C}
), qual AS (
  SELECT doc_id, CAST(rn AS BIGINT) AS rank_qual FROM (
    SELECT doc_id, row_number() OVER (ORDER BY q DESC, doc_id) AS rn
    FROM (
      SELECT doc_id,
             len(regexp_extract_all({norm}, '\\bthe\\b')) AS q
      FROM documents WHERE text IS NOT NULL
    )
  ) WHERE rn <= {RRF_C}
), fused AS (
  SELECT COALESCE(rel.doc_id, qual.doc_id) AS doc_id,
         rank_rel, rank_qual,
         COALESCE({rel_micro}, 0) + COALESCE({qual_micro}, 0)
           AS rrf_micro
  FROM rel FULL OUTER JOIN qual ON rel.doc_id = qual.doc_id
)
SELECT doc_id, rank_rel, rank_qual, rrf_micro
FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT {RRF_TOPK}"""
    )


ORACLES_RETRIEVAL["rrf_fused_search"] = _rrf_oracle()
