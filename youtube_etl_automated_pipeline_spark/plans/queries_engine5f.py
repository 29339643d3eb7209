"""Round-5 engine extensions, sixth batch: dedup-infrastructure
evaluation and streaming-configuration profiling, each with a DuckDB
oracle twin.

- ``dedup_blocking_venn`` — which near-dup BLOCKING FAMILY finds
  which verified pair: the Venn census over the engine's three
  bounded-candidate detectors (MinHash-LSH verified Jaccard,
  banded SimHash Hamming, MinHash-banded containment). Running one
  detector and trusting it is how silent recall gaps ship; the Venn
  region counts (minhash-only, simhash-only, all-three, ...) are the
  evaluation a dedup pipeline owner reads before choosing what to
  run at 100 TB. All three pair relations are already
  banding-bounded — the census adds two count-relation joins, never
  an all-pairs stage.
- ``watermark_lateness_histogram`` — event-time lateness profile:
  how far each event's timestamp trails the per-user running maximum
  in arrival order (arrival = the ingest-sequence event_id). The
  log2-bucketed histogram with per-bucket worst cases is the
  empirical basis for choosing ``withWatermark`` delays — a
  watermark below the p99 lateness bucket silently drops data (the
  engine's streaming queries use a 4-day delay; this op measures
  what the data actually needs). One keyed window + one tiny rollup.

The reference has no analogue for either (SURVEY §0).

Cross-engine exactness: pair identities and Venn flags are integer
doc-id pairs; lateness rides exact epoch microseconds and
``length(bin(x))`` bit buckets — no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from youtube_etl_automated_pipeline_spark.sources import load_table


def dedup_blocking_venn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Venn census of verified near-dup pairs by detector family.

    Output: one row per occupied Venn region — (in_minhash,
    in_simhash, in_containment) flags with the region's pair count.

    Plan shape: the three pair relations reuse their existing
    banding-bounded plans (and the memoized MinHash signature index
    feeds two of them); the census is a full-outer merge on the
    (doc_a, doc_b) key of three PAIR relations — each orders of
    magnitude smaller than the corpus — then an at-most-8-group
    rollup. Nothing here scales with corpus size, only with
    duplicate count.
    """
    from youtube_etl_automated_pipeline_spark.operators.cache_registry import (
        memo_persist,
    )
    from youtube_etl_automated_pipeline_spark.plans.queries_dedup_adv import (
        dedup_containment_pairs,
        dedup_minhash_lsh,
        dedup_simhash,
    )

    # each detector's pair relation persists as a materialized pair
    # index (the cluster family's posture for lsh_pairs): bounded by
    # duplicate count, consumed by every census over it
    mh = memo_persist(
        spark,
        ("venn_mh_pairs", sf_dir),
        lambda: dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b"),
    ).withColumn("in_minhash", F.lit(1))
    sh = memo_persist(
        spark,
        ("venn_sh_pairs", sf_dir),
        lambda: dedup_simhash(spark, sf_dir).select("doc_a", "doc_b"),
    ).withColumn("in_simhash", F.lit(1))
    ct = memo_persist(
        spark,
        ("venn_ct_pairs", sf_dir),
        lambda: dedup_containment_pairs(spark, sf_dir).select(
            "doc_a", "doc_b"
        ),
    ).withColumn("in_containment", F.lit(1))
    merged = (
        mh.join(sh, ["doc_a", "doc_b"], "full")
        .join(ct, ["doc_a", "doc_b"], "full")
        .select(
            "doc_a",
            "doc_b",
            F.coalesce("in_minhash", F.lit(0)).alias("in_minhash"),
            F.coalesce("in_simhash", F.lit(0)).alias("in_simhash"),
            F.coalesce("in_containment", F.lit(0)).alias("in_containment"),
        )
    )
    return merged.groupBy(
        "in_minhash", "in_simhash", "in_containment"
    ).agg(F.count(F.lit(1)).alias("n_pairs"))


def _venn_oracle() -> str:
    from youtube_etl_automated_pipeline_spark.plans.oracles_dedup_adv import (
        ORACLES_DEDUP_ADV,
    )

    mh = ORACLES_DEDUP_ADV["dedup_minhash_lsh"]
    sh = ORACLES_DEDUP_ADV["dedup_simhash"]
    ct = ORACLES_DEDUP_ADV["dedup_containment_pairs"]
    return f"""
WITH mh AS (SELECT doc_a, doc_b FROM ({mh}) x),
sh AS (SELECT doc_a, doc_b FROM ({sh}) x),
ct AS (SELECT doc_a, doc_b FROM ({ct}) x),
keys AS (
  SELECT doc_a, doc_b FROM mh
  UNION
  SELECT doc_a, doc_b FROM sh
  UNION
  SELECT doc_a, doc_b FROM ct
),
flags AS (
  SELECT k.doc_a, k.doc_b,
    CASE WHEN m.doc_a IS NULL THEN 0 ELSE 1 END AS in_minhash,
    CASE WHEN s.doc_a IS NULL THEN 0 ELSE 1 END AS in_simhash,
    CASE WHEN c.doc_a IS NULL THEN 0 ELSE 1 END AS in_containment
  FROM keys k
  LEFT JOIN mh m ON k.doc_a = m.doc_a AND k.doc_b = m.doc_b
  LEFT JOIN sh s ON k.doc_a = s.doc_a AND k.doc_b = s.doc_b
  LEFT JOIN ct c ON k.doc_a = c.doc_a AND k.doc_b = c.doc_b
)
SELECT in_minhash, in_simhash, in_containment, count(*) AS n_pairs
FROM flags GROUP BY 1, 2, 3
ORDER BY in_minhash, in_simhash, in_containment
"""


def watermark_lateness_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time lateness histogram: lateness(e) = running max of
    event-time over the user's arrival order (event_id) minus e's
    event-time, log2-bucketed by millisecond magnitude.

    Output per bucket: event count, worst lateness (exact micros) —
    the table you read p99 off to set a watermark delay. bucket = -1
    collects on-time events (lateness 0).

    Scale shape: one lag-free running-max window keyed by user (a
    single keyed shuffle, same cost class as any sessionization), a
    map-side-combinable ~40-group rollup. length(bin(ms)) is the
    exact integer log2 bucket — no libm.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late = ev.select("user_id", "event_id", us.alias("us")).select(
        (F.max("us").over(w) - F.col("us")).alias("late_us")
    )
    bucket = F.when(F.col("late_us") == 0, F.lit(-1)).otherwise(
        F.length(F.expr("bin(late_us DIV 1000)")).cast("int")
    )
    return (
        late.select(bucket.alias("late_ms_log2_bucket"), "late_us")
        .groupBy("late_ms_log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("late_us").alias("max_late_us"),
        )
    )


ORACLE_LATENESS = """
WITH ev AS (
  SELECT user_id, event_id,
         CAST(epoch_us(date_trunc('microseconds', ts)) AS BIGINT) AS us
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL
), late AS (
  SELECT max(us) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - us AS late_us
  FROM ev
)
SELECT CASE WHEN late_us = 0 THEN -1
            ELSE CAST(length(bin(late_us // 1000)) AS INTEGER)
       END AS late_ms_log2_bucket,
       count(*) AS n_events,
       CAST(max(late_us) AS BIGINT) AS max_late_us
FROM late GROUP BY 1 ORDER BY 1
"""


QUERIES_ENGINE5F = {
    "dedup_blocking_venn": dedup_blocking_venn,
    "watermark_lateness_histogram": watermark_lateness_histogram,
}

ORACLES_ENGINE5F = {
    "dedup_blocking_venn": _venn_oracle(),
    "watermark_lateness_histogram": ORACLE_LATENESS,
}
