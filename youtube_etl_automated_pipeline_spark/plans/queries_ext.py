"""Extension-operator queries: text analysis, dedup, fingerprinting
over the documents table (training-data-pipeline operators; BASELINE
north star). All column-expression based — projection-speed at scan,
exact dedup is one hash shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from youtube_etl_automated_pipeline_spark.operators.windows import bounded_window

from youtube_etl_automated_pipeline_spark.ext import textstats as TS
from youtube_etl_automated_pipeline_spark.functions.compat import hround
from youtube_etl_automated_pipeline_spark.operators.cache_registry import (
    memo_persist,
)
from youtube_etl_automated_pipeline_spark.sources import load_table, load_wide, widen_scan


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish segments + punct
    census per document. Pure projection (scan-speed at 100 TB)."""
    docs = load_wide(spark, sf_dir, "documents")
    text = F.col("text")
    return docs.select(
        "doc_id",
        "n_chars",
        TS.token_count(text).alias("n_tokens"),
        TS.bpe_ish_token_count(text).alias("n_bpe_tokens"),
        TS.punct_count(text).alias("n_punct"),
        F.length(text).alias("text_len"),
    )


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/stopword/punct mix -> [0,1] score and a
    keep flag (the classic pre-training filter shape)."""
    docs = load_wide(spark, sf_dir, "documents")
    text = F.col("text")
    n_tokens = TS.token_count(text)
    stop_cnt = TS.lang_marker_counts(text)["en"]
    punct = TS.punct_count(text)
    text_len = F.length(text)
    stop_ratio = F.when(n_tokens > 0, stop_cnt / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(text_len > 0, punct / text_len).otherwise(F.lit(0.0))
    length_score = F.least(n_tokens, F.lit(100)) / 100.0
    score = hround(
        stop_ratio * 0.3 + length_score * 0.4 + (1.0 - punct_ratio) * 0.3, 4
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        hround(stop_ratio, 4).alias("stopword_ratio"),
        hround(punct_ratio, 4).alias("punct_ratio"),
        score.alias("quality_score"),
        (score >= 0.5).alias("keep_flag"),
    )


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID: marker-word census per language, deterministic
    argmax (priority tiebreak). An n-gram heuristic shaped like
    fastText-lite, kept oracle-reproducible."""
    docs = load_wide(spark, sf_dir, "documents")
    counts = TS.lang_marker_counts(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        *[counts[lang].alias(f"cnt_{lang}") for lang in TS.LANG_PRIORITY],
        TS.predicted_lang(counts).alias("predicted_lang"),
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: full-content md5-derived 60-bit hash +
    winnowing-style min 3-gram-shingle hash."""
    docs = load_wide(spark, sf_dir, "documents")
    text = F.col("text")
    return docs.select(
        "doc_id",
        TS.content_hash(text).alias("content_fp"),
        TS.min_shingle_hash(text, 3).alias("min_shingle_fp"),
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-content hash: one hash-shuffle
    groupBy; keeps the min doc_id per group (deterministic survivor
    policy) and reports group size. At 100 TB this is the standard
    first dedup pass — the shuffle key is the 60-bit content hash, so
    skew is impossible unless the corpus is pathological."""
    docs = load_wide(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", TS.content_hash(F.col("text")).alias("content_fp")
    )
    return (
        keyed.groupBy("content_fp")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )

    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs by 3-gram Jaccard within a blocking
    key (min-shingle-hash block = cheap LSH with one band). Pairs with
    the same block key get exact Jaccard over distinct shingle sets;
    emit pairs >= 0.2.

    Scale: the self-join is per-block (block key is a 32-bit hash ->
    tiny groups), so the quadratic blowup is bounded by block size,
    the classic blocked-dedup trade. No full cross join ever happens.
    Verification intersects DISTINCT SHINGLE-HASH sets (array<long>)
    rather than shingle strings: the hashes are already computed for
    the block key, and the pair join then carries ~8-byte elements
    instead of n-gram strings.
    """
    from youtube_etl_automated_pipeline_spark.ext.dedup import shingle_hashes

    docs = load_wide(spark, sf_dir, "documents")
    # persist: the hashed-shingle table feeds BOTH self-join sides;
    # without it the md5 shingle projection runs once per side (and
    # again inside the filter). Production would materialize this as
    # the dedup index table.
    base = memo_persist(
        spark,
        ("ngram_jaccard_base", sf_dir),
        lambda: docs.select(
            "doc_id", shingle_hashes(F.col("text"), 3).alias("hash_set")
        )
        .filter(F.size("hash_set") >= 3)
        .withColumn("block_key", F.array_min("hash_set")),
    )
    a = base.select(
        F.col("doc_id").alias("doc_a"),
        F.col("hash_set").alias("set_a"),
        "block_key",
    )
    b = base.select(
        F.col("doc_id").alias("doc_b"),
        F.col("hash_set").alias("set_b"),
        "block_key",
    )
    pairs = a.join(b, "block_key").filter(F.col("doc_a") < F.col("doc_b"))
    inter = F.size(F.array_intersect(F.col("set_a"), F.col("set_b")))
    union = F.size(F.array_union(F.col("set_a"), F.col("set_b")))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        pairs.select(
            "doc_a", "doc_b", hround(jac, 4).alias("jaccard")
        )
        .filter(F.col("jaccard") >= 0.2)
    )


QUERIES_EXT = {
    "text_token_stats": text_token_stats,
    "text_quality_score": text_quality_score,
    "text_lang_id": text_lang_id,
    "doc_fingerprint": doc_fingerprint,
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
}


def doc_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash fingerprinting (Rabin-Karp): full-document
    polynomial hash + winnowing-style min over all 16-char window
    hashes of normalized text, via the O(n)-per-doc prefix-hash
    mapInPandas kernel (see ext.textstats.rolling_hash_stats for why
    the expression form loses here)."""
    docs = load_wide(spark, sf_dir, "documents")
    return TS.rolling_hash_stats(docs)


QUERIES_EXT["doc_rolling_hash"] = doc_rolling_hash


PLANT_EVERY_SUB = 25
PLANT_OFFSET_SUB = 10_000_000


def dedup_repeated_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-SUBSTRING dedup via winnowing fingerprints (the MOSS
    selection rule; the operator class of "Deduplicating Training
    Data Makes Language Models Better"'s suffix-array pass,
    re-expressed as a Spark-joinable fingerprint index): report every
    document pair sharing at least one identical normalized substring
    of >= WIN_K + WIN_W - 1 = 39 chars, with the count of shared
    selected fingerprints as the overlap strength.

    The synthetic corpus has few natural long repeats, so one
    substring-copy of every PLANT_EVERY_SUB-th document is planted
    (substring(text, 21, 160) — a pure function the oracle
    reproduces); tests/test_properties.py asserts every planted
    (orig, copy) pair is recovered — the winnowing guarantee.

    Scale shape: fingerprints are map-only and ~2/(W+1) dense
    (ext/textstats.winnowed_fingerprints); candidates come from an
    equi-join on the (h1, h2) double hash — never an all-pairs or
    substring scan. At 100 TB the fingerprint relation persists as a
    parquet index; boilerplate-heavy corpora additionally drop
    fingerprints appearing in more than T docs (a frequency cap) to
    bound join skew — the same stop-fingerprint cut web-dedup
    pipelines use.
    """
    docs = load_wide(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    copies = docs.filter(F.col("doc_id") % PLANT_EVERY_SUB == 0).select(
        (F.col("doc_id") + PLANT_OFFSET_SUB).alias("doc_id"),
        F.expr("substring(text, 21, 160)").alias("text"),
    )
    corpus = docs.unionByName(copies)
    from youtube_etl_automated_pipeline_spark.operators.cache_registry import (
        memo_persist,
    )

    # the winnowing kernel is the expensive pass and BOTH self-join
    # sides consume it — persist the fingerprint relation (the same
    # "index persists as parquet" posture the docstring describes)
    # instead of fingerprinting the corpus twice (r08). Trailing
    # orderBy dropped: the range-partitioner's sampling pass
    # re-executed the candidate join, and the driver compare is
    # order-insensitive.
    fp = memo_persist(
        spark,
        ("winnow_fp", sf_dir),
        lambda: TS.winnowed_fingerprints(corpus),
    )
    a = fp.select(F.col("doc_id").alias("doc_a"), "h1", "h2")
    b = fp.select(F.col("doc_id").alias("doc_b"), "h1", "h2")
    return (
        a.join(b, ["h1", "h2"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


QUERIES_EXT["dedup_repeated_substring"] = dedup_repeated_substring


JAC_NUM, JAC_DEN = 2, 5  # Jaccard threshold 0.4 as an exact rational


def dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL set-similarity self-join with PREFIX FILTERING (the
    AllPairs/PPJoin candidate family — Bayardo et al. / Xiao et al.)
    — the third candidate-generation strategy next to blocking
    (`dedup_ngram_jaccard`) and LSH banding (`dedup_minhash_lsh`),
    and unlike both it is EXACT: every pair with Jaccard >= t is
    guaranteed a candidate, with no bands/recall tuning.

    The filter: order each doc's shingle set by ascending document
    frequency (rarest first, ties by hash — a deterministic global
    total order); two sets with Jaccard >= t MUST share a token in
    their first n - ceil(t·n) + 1 tokens. Only prefix tokens enter
    the candidate join — and because prefixes are rare-first, the
    per-token join groups stay small (the hot frequent shingles never
    appear in a prefix unless a doc is almost all-frequent).

    Scale shape: df-count = one agg; rank = one window per doc;
    candidates = equi-join on prefix token; verify = exact
    integer-rational test n_inter·DEN >= NUM·n_union on the hashed
    sets (array_intersect JVM-side). Everything shuffles on keys;
    nothing is quadratic except verified candidates.
    """
    from pyspark.sql import Window

    from youtube_etl_automated_pipeline_spark.ext.dedup import shingle_hashes
    from youtube_etl_automated_pipeline_spark.operators.cache_registry import (
        memo_persist,
    )

    base = memo_persist(
        spark,
        ("dedup_prefix_base", sf_dir),
        lambda: load_wide(spark, sf_dir, "documents")
        .select("doc_id", shingle_hashes(F.col("text"), 3).alias("hs"))
        .filter(F.size("hs") >= 3),
    )
    toks = base.select("doc_id", F.explode("hs").alias("sh"))
    dfc = toks.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "sh")
    wn = Window.partitionBy("doc_id")
    ranked = (
        toks.join(dfc, "sh")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
    )
    # the prefix-token index persists via the bounded registry: it is
    # the materialized AllPairs index a production system writes once
    # per corpus snapshot (rebuilding two full-corpus windows per
    # probe run would be the real anti-pattern at 100 TB)
    prefix = memo_persist(
        spark,
        ("prefix_filter_index", sf_dir),
        lambda: ranked.filter(
            F.col("rn")
            <= F.col("n")
            - F.expr(f"({JAC_NUM} * n + {JAC_DEN - 1}) DIV {JAC_DEN}")
            + 1
        ).select("doc_id", "sh", "n", "rn"),
    )
    # Two pre-verify prunes, both exact integer arithmetic:
    # - length filter (size compatibility): J >= t forces
    #   max(|a|,|b|)*NUM <= min(|a|,|b|)*DEN;
    # - PPJoin POSITIONAL filter: both token lists carry the same
    #   global (df, sh) total order, so for a token matched at ranks
    #   (i, j) the overlap is bounded by 1 + min(n_a - i, n_b - j)
    #   — tokens shared beyond the match must sit after it in BOTH
    #   lists (any shared token ordered before the pair's first match
    #   would itself be a prefix match, contradiction). J >= t needs
    #   overlap*(NUM+DEN) >= NUM*(n_a+n_b), so candidates whose every
    #   matched occurrence fails that bound on its overlap ceiling
    #   can never verify; the first match of a truly-similar pair
    #   always passes, so recall stays exact.
    cand = (
        prefix.select(
            F.col("doc_id").alias("doc_a"),
            "sh",
            F.col("n").alias("n_a"),
            F.col("rn").alias("rn_a"),
        )
        .join(
            prefix.select(
                F.col("doc_id").alias("doc_b"),
                "sh",
                F.col("n").alias("n_b"),
                F.col("rn").alias("rn_b"),
            ),
            "sh",
        )
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (
                F.greatest("n_a", "n_b") * JAC_NUM
                <= F.least("n_a", "n_b") * JAC_DEN
            )
            & (
                (
                    F.lit(1)
                    + F.least(
                        F.col("n_a") - F.col("rn_a"),
                        F.col("n_b") - F.col("rn_b"),
                    )
                )
                * (JAC_NUM + JAC_DEN)
                >= JAC_NUM * (F.col("n_a") + F.col("n_b"))
            )
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    arrays = base.select("doc_id", "hs", F.size("hs").alias("n"))
    scored = (
        cand.join(
            arrays.select(
                F.col("doc_id").alias("doc_a"),
                F.col("hs").alias("hs_a"),
                F.col("n").alias("n_a"),
            ),
            "doc_a",
        )
        .join(
            arrays.select(
                F.col("doc_id").alias("doc_b"),
                F.col("hs").alias("hs_b"),
                F.col("n").alias("n_b"),
            ),
            "doc_b",
        )
        .withColumn(
            "n_inter", F.size(F.array_intersect("hs_a", "hs_b")).cast("bigint")
        )
        .withColumn(
            "n_union", (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("bigint")
        )
    )
    return (
        scored.filter(
            F.col("n_inter") * JAC_DEN >= JAC_NUM * F.col("n_union")
        )
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            "n_union",
            F.expr("CAST(n_inter * 1000000 DIV n_union AS BIGINT)").alias(
                "jaccard_ppm"
            ),
        )
        .orderBy("doc_a", "doc_b")
    )


QUERIES_EXT["dedup_prefix_filter"] = dedup_prefix_filter


def corpus_mix_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition contingency table: the (lang × source) grid
    with each cell's independence LIFT in exact integer ppm —
    (n_cell · N · 1e6) DIV (n_lang · n_source); cells far from 1e6
    reveal collection bias (a source over-supplying one language),
    the first diagnostic a corpus-curation review runs. One scan,
    one cell agg, two marginal windows — all integer arithmetic."""
    from pyspark.sql import Window

    docs = load_wide(spark, sf_dir, "documents")
    cells = docs.groupBy(
        F.coalesce("lang", F.lit("??")).alias("lang"),
        F.coalesce("source", F.lit("??")).alias("source"),
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    wl = Window.partitionBy("lang")
    ws = Window.partitionBy("source")
    wt = bounded_window("lang")
    return (
        cells.withColumn("n_lang", F.sum("n_docs").over(wl))
        .withColumn("n_source", F.sum("n_docs").over(ws))
        .withColumn("n_total", F.sum("n_docs").over(wt))
        .select(
            "lang",
            "source",
            "n_docs",
            F.expr(
                "CAST(CAST(n_docs AS DECIMAL(38,0)) * n_total * 1000000"
                " DIV (CAST(n_lang AS DECIMAL(38,0)) * n_source)"
                " AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy("lang", "source")
    )


QUERIES_EXT["corpus_mix_contingency"] = corpus_mix_contingency
