"""Distributed logistic-regression quality classifier — the
model-based document filter of an LLM curation pipeline (the
statistical stand-in for a learned fastText/transformer quality
scorer), trained entirely as DataFrame aggregations.

Training shape (the MLlib pattern, hand-rolled so the arithmetic is
oracle-reproducible): the per-doc feature vector is extracted ONCE
(regex-heavy, the expensive pass at 100 TB) and persisted — each of
the ``ITERS`` batch-gradient steps then aggregates the tiny cached
feature table (4 doubles per doc), never rescans text. The model (4
doubles) is collected to the driver per step — collecting a scalar
model is not a driver-side data loop.

Cross-engine bit-exactness (the whole design):
- the link is a HARD sigmoid ``clip(0.25 z + 0.5, 0, 1)`` — multiply/
  add/min/max only, all IEEE-correctly-rounded; no libm ``exp`` whose
  rounding differs between JVM and DuckDB;
- per-row gradient contributions are quantized to integer nano-units
  ``floor(c * 1e9 + 0.5)`` and SUMMED AS BIGINT — integer sums are
  associative, so Spark's partial-aggregation order cannot drift from
  DuckDB's sequential sum;
- the weight update ``w - LR * ((g / 1e9) / n)`` is evaluated with the
  same operation tree in Python driver floats and in the oracle's
  unrolled CTEs — identical IEEE doubles at every step.

The training label is PLANTED (a fixed linear rule over the features,
see ``label_expr``): the synthetic corpus has no learnable natural
label, so the gate verifies the TRAINER (feature extraction, gradient
aggregation, convergence) the same way the LSH recall tests verify
retrieval with planted duplicates. tests/test_properties.py asserts
the learned model beats the majority class by a wide margin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from youtube_etl_automated_pipeline_spark.ext import textstats as TS

LR = 8.0
ITERS = 48
SCALE = 1_000_000_000  # gradient quantization: integer nano-units


def features(docs: DataFrame) -> DataFrame:
    """doc_id, x1..x3 (scaled to O(1)), planted label y.

    x1 = capped token count / 200; x2 = 10 * en-stopword ratio;
    x3 = 10 * punctuation ratio. The 10x scales keep all features in
    the same order of magnitude so one learning rate fits (classic
    feature-scaling, chosen over z-scoring to stay closed-form)."""
    text = F.col("text")
    n_tokens = TS.token_count(text)
    stop_cnt = TS.lang_marker_counts(text)["en"]
    punct = TS.punct_count(text)
    text_len = F.length(text)
    x1 = F.least(n_tokens.cast("double"), F.lit(200.0)) / 200.0
    x2 = F.when(n_tokens > 0, 10.0 * stop_cnt / n_tokens).otherwise(F.lit(0.0))
    x3 = F.when(text_len > 0, 10.0 * punct / text_len).otherwise(F.lit(0.0))
    y = (
        (2.0 * x1 + 0.8 * x2 - 0.6 * x3 - 0.9 > 0).cast("int").alias("y")
    )
    return docs.select(
        "doc_id", x1.alias("x1"), x2.alias("x2"), x3.alias("x3"), y
    )


def _p(w: list[float]) -> Column:
    """Hard-sigmoid prediction under literal weights: the expression
    tree (w1*x1 + w2*x2 + w3*x3 + b, left-assoc) must match the oracle
    text exactly — IEEE ops on identical inputs are bit-identical."""
    z = (
        F.lit(w[0]) * F.col("x1")
        + F.lit(w[1]) * F.col("x2")
        + F.lit(w[2]) * F.col("x3")
        + F.lit(w[3])
    )
    return F.least(F.greatest(0.25 * z + 0.5, F.lit(0.0)), F.lit(1.0))


def _qsum(c: Column) -> Column:
    return F.sum(F.floor(c * SCALE + F.lit(0.5)).cast("long"))


def train(feat: DataFrame) -> list[float]:
    """ITERS batch-gradient steps; one aggregation job per step over
    the (persisted) feature table. Returns [w1, w2, w3, b]."""
    w = [0.0, 0.0, 0.0, 0.0]
    for _ in range(ITERS):
        p = _p(w)
        err = p - F.col("y")
        row = feat.agg(
            _qsum(err * F.col("x1")).alias("g1"),
            _qsum(err * F.col("x2")).alias("g2"),
            _qsum(err * F.col("x3")).alias("g3"),
            _qsum(err).alias("g4"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        n = row["n"]
        w = [
            w[j] - LR * ((row[f"g{j + 1}"] / 1e9) / n) for j in range(4)
        ]
    return w


def score(feat: DataFrame, w: list[float]) -> DataFrame:
    """Final scoring pass: integer micro-unit probability + decision."""
    p = _p(w)
    return feat.select(
        "doc_id",
        F.col("y").alias("label"),
        F.floor(p * 1000000.0 + F.lit(0.5)).cast("long").alias("score_ppm"),
        (p >= 0.5).alias("predicted"),
    )
