"""Training-data curation operators: PII redaction, repetition
(boilerplate) statistics, benchmark decontamination, and chunking.

These extend the reference's text-cleaning surface
(Python-pipeline/data_cleaning.py's regex sanitize steps) to the
operations a large-scale LLM pretraining pipeline runs over a 100 TB
document corpus. Everything is pure column expressions or a
distributed explode+aggregate — no per-row Python, no driver loops —
so each operator is a scan-speed projection or one well-keyed shuffle.

Cross-engine determinism rules (shared with ext.textstats):
- regexes use explicit ASCII classes and no engine-specific syntax so
  Java regex (Spark) and RE2 (DuckDB) agree token-for-token;
- hashes are md5-prefix based (portable across engines);
- fractions are integer parts-per-million (ppm) via integer division
  (Spark ``div`` == DuckDB ``//``) — order-independent, bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from youtube_etl_automated_pipeline_spark.ext.textstats import (
    md5_long,
    shingles,
    tokens,
)

# --- PII patterns -----------------------------------------------------
# Conservative syntax only (classes, +, {m,n}) — identical semantics in
# Java regex and RE2. Replacement order is pinned: EMAIL first (its
# local part may contain digits), then IP (dotted quads), then PHONE
# (hyphen-separated only, so it can never overlap a dotted quad).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_ORDER = ((EMAIL_RE, "<EMAIL>"), (IPV4_RE, "<IP>"), (PHONE_RE, "<PHONE>"))


def pii_counts(text: Column) -> dict[str, Column]:
    """Match counts per PII class, counted BEFORE any replacement so
    classes can't consume each other's matches."""
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)),
        "n_ips": F.size(F.regexp_extract_all(text, F.lit(IPV4_RE), 0)),
        "n_phones": F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), 0)),
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its class token, in pinned order."""
    out = text
    for pattern, token in PII_ORDER:
        out = F.regexp_replace(out, pattern, token)
    return out


# --- Repetition / boilerplate statistics ------------------------------

def doc_bigrams(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Explode each document into (id, bigram) rows. Docs with < 2
    tokens vanish (no bigram exists). This is the DISTRIBUTED shape:
    the per-doc mode (most frequent bigram) becomes a two-level
    aggregation instead of a per-row O(n^2) array scan, and the
    shuffle key (id, bigram) is high-cardinality so it cannot skew."""
    toks = tokens(F.col("text"))
    return (
        docs.select(id_col, toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(id_col, F.explode(shingles(F.col("toks"), 2)).alias("bigram"))
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher/C4-style repetition censuses per document:

    - ``top_bigram_ppm`` — occurrences of the most frequent bigram
      over total bigrams (boilerplate docs repeat one phrase);
    - ``dup_bigram_ppm`` — fraction of bigram instances whose bigram
      occurs more than once;
    - ``keep_flag``      — top_bigram_ppm < 180000 (the published
      Gopher top-2-gram removal threshold of 0.18).

    Two aggregations, both map-side-combinable: (doc, bigram) counts,
    then per-doc rollup. Integer ppm keeps the gate bit-exact.
    """
    per_bigram = doc_bigrams(docs).groupBy("doc_id", "bigram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_doc = per_bigram.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_bigrams"),
        F.count(F.lit(1)).alias("n_distinct_bigrams"),
        F.max("cnt").alias("max_bigram_cnt"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))).alias(
            "dup_instances"
        ),
    )
    top_ppm = F.expr("max_bigram_cnt * 1000000 div n_bigrams")
    dup_ppm = F.expr("dup_instances * 1000000 div n_bigrams")
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "n_distinct_bigrams",
        "max_bigram_cnt",
        top_ppm.alias("top_bigram_ppm"),
        dup_ppm.alias("dup_bigram_ppm"),
        (top_ppm < 180000).alias("keep_flag"),
    )


# --- Benchmark decontamination ----------------------------------------

DECON_N = 3  # token n-gram order for contamination probes
EVAL_MOD = 97  # doc_id % EVAL_MOD == 0 -> held-out "benchmark" doc


def shingle_hash_rows(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, shingle_hash) rows — DISTINCT within a doc. The
    explode keeps memory per task bounded by Arrow batch size, not by
    the largest document's shingle set."""
    toks = tokens(F.col("text"))
    grams = shingles(F.col("toks"), n)
    return (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= n)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(F.transform(grams, lambda s: md5_long(s)))
            ).alias("shash"),
        )
    )


def decontaminate(docs: DataFrame) -> DataFrame:
    """Flag training docs sharing any token n-gram with the eval split.

    The eval split (doc_id % 97 == 0) is a benchmark stand-in; its
    distinct shingle-hash set is tiny relative to the corpus, so the
    probe join broadcasts it — at 100 TB this is the standard
    decontamination shape: one scan of the training corpus against a
    broadcast hash set, no corpus-sized shuffle. Output: one row per
    contaminated training doc with the hit census.
    """
    shr = shingle_hash_rows(docs, DECON_N)
    eval_side = (
        shr.filter((F.col("doc_id") % EVAL_MOD) == 0)
        .select(F.col("doc_id").alias("eval_doc_id"), "shash")
        .distinct()
    )
    train_side = shr.filter((F.col("doc_id") % EVAL_MOD) != 0)
    hits = train_side.join(F.broadcast(eval_side), "shash")
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hit_pairs"),
        F.countDistinct("shash").alias("n_hit_shingles"),
        F.countDistinct("eval_doc_id").alias("n_eval_docs"),
        F.min("eval_doc_id").alias("first_eval_doc"),
    )


# --- Chunking (context-window packing precursor) ----------------------

CHUNK_W = 64  # tokens per chunk
CHUNK_S = 48  # stride (CHUNK_W - CHUNK_S = 16 tokens of overlap)


def chunk_windows(docs: DataFrame, w: int = CHUNK_W, s: int = CHUNK_S) -> DataFrame:
    """Split each doc into overlapping token windows of ``w`` tokens
    at stride ``s`` — the standard pretraining chunker. Chunk count is
    ``1 + ceil(max(n-w,0)/s)`` in pure integer math so both engines
    agree. A generator expression (posexplode over an index sequence +
    slice) keeps this a single scan-speed projection: no shuffle, no
    UDF; Tungsten carries ONE copy of the token array per input row."""
    toks = tokens(F.col("text"))
    n = F.size(F.col("toks"))
    n_chunks = (
        F.lit(1)
        + F.expr(f"(greatest(size(toks) - {w}, 0) + {s - 1}) div {s}")
    ).cast("int")
    starts = F.sequence(F.lit(0), n_chunks - 1)
    exploded = (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 1)
        .select(
            "doc_id",
            "toks",
            F.posexplode(starts).alias("chunk_idx", "start_i"),
        )
        .withColumn("start", F.col("start_i") * s + 1)
    )
    chunk_toks = F.slice(F.col("toks"), F.col("start"), w)
    return exploded.select(
        "doc_id",
        "chunk_idx",
        F.size(chunk_toks).alias("chunk_len"),
        md5_long(F.concat_ws(" ", chunk_toks), 15).alias("chunk_fp"),
    )
