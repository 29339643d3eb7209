"""Round-5 engine extensions, seventh batch: DSIR data selection.

``dsir_importance_weights`` — Data Selection with Importance
Resampling (Xie et al., NeurIPS 2023): score every raw document by
how much its hashed n-gram profile looks like a TARGET domain versus
the raw corpus. The per-doc log-importance-weight is the sum of
per-feature log-likelihood ratios log(p_target(f)/p_raw(f)) over the
doc's hashed shingle features — the method used to select pretraining
corpora toward a quality/domain target without training a model.

Engine shape (all bounded, all keyed):
- features: token 3-gram shingles (the dedup family's exact
  machinery) hashed into DSIR_BUCKETS buckets — a fixed-size feature
  space, so the "model" is two 1024-row count vectors, never a
  vocabulary broadcast;
- the target profile counts shingles of ``lang = 'en'`` docs, the
  raw profile counts all docs (add-one smoothing both sides);
- per-bucket LLR is ONE textually-shared SQL expression evaluated on
  identical integer counts in both engines, floored to integer
  micro-units at the bucket level (1024 ln calls total — a rounding
  flip needs the true value within ~2 ulp of a .5 boundary, ~1e-10
  probability per bucket; the same accepted exposure as the shared
  Kaplan-Meier ln tail);
- per-doc weight = integer sum of its shingles' bucket LLRs (exact);
  output is the per-(lang, weight-band) census.

At 100 TB: shingle explode -> two 1024-group map-combinable count
aggs, one doc-keyed sum, one broadcast join of the 1024-row LLR
table. Nothing scales beyond the corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_automated_pipeline_spark.sources import load_wide

DSIR_BUCKETS = 1024
DSIR_TARGET_LANG = "en"
DSIR_SHINGLE_N = 3
# weight-band clamp for the census: floor(weight_micro / 1e6) in
# [-BAND_CLAMP, BAND_CLAMP]
DSIR_BAND_CLAMP = 10

# The ln fragment both engines evaluate on identical integer inputs
# (columns n_t, n_r, tot_t, tot_r). Multiplications run in DOUBLE so a
# 100 TB shingle mass (~1e13) times the smoothed totals cannot wrap an
# int64 — IEEE double ops are deterministic and textually identical
# cross-engine.
_LLR_MICRO = (
    "CAST(floor(ln((CAST(n_t + 1 AS DOUBLE) * (tot_r + {B}))"
    " / (CAST(n_r + 1 AS DOUBLE) * (tot_t + {B}))) * 1e6 + 0.5)"
    " AS BIGINT)"
).format(B=DSIR_BUCKETS)


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, weight-band) census of DSIR log-importance weights.

    A positive band means the doc's shingle profile is closer to the
    target-language distribution than to the raw corpus — the docs
    importance resampling would keep. Docs with fewer than
    DSIR_SHINGLE_N tokens carry no features and are excluded in both
    twins (a profile-free doc has no likelihood ratio).
    """
    from youtube_etl_automated_pipeline_spark.ext.textstats import (
        md5_long,
        normalized_text,
        shingles,
        tokens,
    )

    docs = load_wide(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("doc_id").isNotNull()
    )
    toks = tokens(normalized_text(F.col("text")))
    feat = (
        docs.select(
            "doc_id",
            F.coalesce("lang", F.lit("??")).alias("lang"),
            toks.alias("toks"),
        )
        .filter(F.size("toks") >= DSIR_SHINGLE_N)
        .select(
            "doc_id",
            "lang",
            F.explode(shingles(F.col("toks"), DSIR_SHINGLE_N)).alias("sh"),
        )
        .select(
            "doc_id",
            "lang",
            (md5_long(F.col("sh")) % DSIR_BUCKETS).alias("bucket"),
        )
    )
    counts = feat.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_r"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
        ).alias("n_t"),
    )
    totals = counts.agg(
        F.sum("n_r").alias("tot_r"), F.sum("n_t").alias("tot_t")
    )
    llr = (
        counts.crossJoin(F.broadcast(totals))
        .select("bucket", F.expr(_LLR_MICRO).alias("llr_micro"))
    )
    per_doc = (
        feat.join(F.broadcast(llr), "bucket")
        .groupBy("doc_id", "lang")
        .agg(F.sum("llr_micro").cast("long").alias("weight_micro"))
    )
    band = F.greatest(
        F.lit(-DSIR_BAND_CLAMP),
        F.least(
            F.lit(DSIR_BAND_CLAMP),
            F.floor(F.col("weight_micro") / F.lit(1_000_000)).cast("int"),
        ),
    )
    return (
        per_doc.select("lang", band.alias("weight_band"), "weight_micro")
        .groupBy("lang", "weight_band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("weight_micro").cast("long").alias("sum_weight_micro"),
        )
    )


def _dsir_oracle() -> str:
    from youtube_etl_automated_pipeline_spark.ext.textstats import WS_CLASS

    toks = f"string_split_regex(trim({{norm}}), '{WS_CLASS}+')"
    norm = "lower(regexp_replace(trim(text), '" + WS_CLASS + "+', ' ', 'g'))"
    toks = toks.format(norm=norm)
    sh = (
        f"list_transform(generate_series(1, len(tk) - {DSIR_SHINGLE_N - 1}),"
        f" i -> array_to_string(tk[i:i+{DSIR_SHINGLE_N - 1}], ' '))"
    )
    return f"""
WITH base AS (
  SELECT doc_id, coalesce(lang, '??') AS lang, {toks} AS tk
  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL
),
feat AS (
  SELECT doc_id, lang,
         CAST('0x' || substr(md5(s.sh), 1, 8) AS BIGINT) % {DSIR_BUCKETS}
           AS bucket
  FROM (SELECT doc_id, lang, {sh} AS shs
        FROM base WHERE len(tk) >= {DSIR_SHINGLE_N}) b,
       unnest(b.shs) AS s(sh)
),
counts AS (
  SELECT bucket, count(*) AS n_r,
         CAST(sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_t
  FROM feat GROUP BY bucket
),
totals AS (
  SELECT CAST(sum(n_r) AS BIGINT) AS tot_r,
         CAST(sum(n_t) AS BIGINT) AS tot_t
  FROM counts
),
llr AS (
  SELECT bucket, {_LLR_MICRO} AS llr_micro
  FROM counts, totals
),
per_doc AS (
  SELECT f.doc_id, f.lang,
         CAST(sum(l.llr_micro) AS BIGINT) AS weight_micro
  FROM feat f JOIN llr l USING (bucket)
  GROUP BY f.doc_id, f.lang
)
SELECT lang,
       CAST(greatest(-{DSIR_BAND_CLAMP}, least({DSIR_BAND_CLAMP},
         CAST(floor(weight_micro / 1000000.0) AS BIGINT))) AS INTEGER)
         AS weight_band,
       count(*) AS n_docs,
       CAST(sum(weight_micro) AS BIGINT) AS sum_weight_micro
FROM per_doc GROUP BY 1, 2 ORDER BY lang, weight_band
"""


QUERIES_ENGINE5G = {
    "dsir_importance_weights": dsir_importance_weights,
}

ORACLES_ENGINE5G = {
    "dsir_importance_weights": _dsir_oracle(),
}
