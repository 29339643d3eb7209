"""Engine extras beyond the reference's surface: as-of join and
semi-structured (JSON) column processing over the events stream
table. Oracles live alongside (ORACLES_EXTRA).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from youtube_etl_automated_pipeline_spark.functions.compat import hround, sql_hround
from youtube_etl_automated_pipeline_spark.sources import load_table


def events_asof_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the customer's most recent order ON
    OR BEFORE the event date (the classic point-in-time enrichment
    Spark lacks as a built-in).

    Implementation: equi-join on the key with the temporal predicate
    in the join condition (shuffle on the key; per-key fan-out is
    bounded by orders-per-customer), then a keep-first window with a
    deterministic tiebreak (date DESC, orderkey DESC). Events with no
    qualifying order keep NULLs via the left join. At extreme per-key
    fan-out the union-and-sort formulation replaces this; the plan
    here stays two bounded shuffles.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.to_date("ts").alias("event_date")
    )
    ords = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    joined = ev.join(
        ords,
        (ev.user_id == ords.o_custkey) & (ords.o_orderdate <= ev.event_date),
        "left",
    )
    w = Window.partitionBy("event_id").orderBy(
        F.desc_nulls_last("o_orderdate"), F.desc_nulls_last("o_orderkey")
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("o_orderkey").alias("last_orderkey"),
            F.col("o_orderdate").alias("last_orderdate"),
            F.datediff("event_date", F.col("o_orderdate")).alias("days_since_order"),
        )
    )


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column: schema-on-read JSON parse
    (from_json) in a pure projection — scan-speed at scale."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k int")["k"]
    return ev.select(
        "event_id",
        "event_type",
        k.alias("prop_k"),
        (k % 10).alias("k_bucket"),
    )


def events_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-derived metric rollup per event type (parse + aggregate in
    one pass, partial aggregation map-side).

    Cross-engine exactness: avg_k is derived from the exact integer
    accumulators (sum_k / count of non-null k) with ONE double
    division — both engines divide the same two integers, so the
    result is bit-identical; a raw avg() over doubles is
    summation-order-sensitive and can cross a rounding boundary.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k int")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            hround(
                F.sum("k").cast("double") / F.count("k").cast("double"), 4
            ).alias("avg_k"),
        )
        .orderBy("event_type")
    )


def user_event_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-array result: per-user sorted distinct event types +
    per-type daily first/last seen. collect_set -> array_sort keeps
    the array deterministic (never rely on collection order); the
    sorted array is serialized to a '|'-joined string at the gate
    boundary (the harness canonicalizer needs hashable scalars)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.concat_ws("|", F.array_sort(F.collect_set("event_type"))).alias(
                "event_types"
            ),
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
        )
        .orderBy("user_id")
    )


QUERIES_EXTRA = {
    "events_asof_order": events_asof_order,
    "events_json_extract": events_json_extract,
    "events_json_agg": events_json_agg,
    "user_event_summary": user_event_summary,
}

_JSON_K = "CAST(json_extract(props, '$.k') AS INT)"

ORACLES_EXTRA = {
    "user_event_summary": """
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), '|') AS event_types,
       count(*) AS n_events,
       min(ts) AS first_seen,
       max(ts) AS last_seen
FROM events GROUP BY user_id ORDER BY user_id
""",
    "events_asof_order": """
WITH j AS (
  SELECT e.event_id, e.user_id, CAST(e.ts AS DATE) AS event_date,
         o.o_orderkey, o.o_orderdate,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC NULLS LAST
         ) AS rn
  FROM events e
  LEFT JOIN orders o
    ON e.user_id = o.o_custkey AND o.o_orderdate <= CAST(e.ts AS DATE)
)
SELECT event_id, user_id,
       o_orderkey AS last_orderkey,
       o_orderdate AS last_orderdate,
       date_diff('day', o_orderdate, event_date) AS days_since_order
FROM j WHERE rn = 1
ORDER BY event_id
""",
    "events_json_extract": f"""
SELECT event_id, event_type, {_JSON_K} AS prop_k, {_JSON_K} % 10 AS k_bucket
FROM events
ORDER BY event_id
""",
    # CAST(sum AS BIGINT): DuckDB integer sum returns HUGEINT; avg_k
    # re-derived from the exact integer accumulators (see query doc).
    "events_json_agg": f"""
SELECT event_type, count(*) AS n_events,
       CAST(sum({_JSON_K}) AS BIGINT) AS sum_k,
       {sql_hround(
           f"CAST(sum({_JSON_K}) AS DOUBLE) / CAST(count({_JSON_K}) AS DOUBLE)", 4
       )} AS avg_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
}


def cogroup_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas: events and orders cogrouped and merged
    per key group in one numpy/pandas kernel (the API for per-key
    alignment logic too awkward for joins).

    CRITICAL scale detail: cogrouping directly on user_id would mean
    one Python invocation per key — tens of thousands of tiny Arrow
    batches, all overhead (measured 10x slower). Instead cogroup on a
    COARSE BUCKET of the key and vectorize the per-user aggregation
    inside the kernel with pandas groupby: ~cores buckets, each one
    sizable batch. Output stays per-user; the oracle (a FULL OUTER
    JOIN of two rollups) proves semantics are unchanged.
    """
    import pandas as pd

    N_BUCKETS = 32
    ev = load_table(spark, sf_dir, "events").select(
        F.pmod(F.col("user_id"), F.lit(N_BUCKETS)).alias("bucket"), "user_id", "value"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.pmod(F.col("o_custkey"), F.lit(N_BUCKETS)).alias("bucket"),
        F.col("o_custkey").alias("user_id"),
        "o_totalprice",
    )

    def merge(key, ev_pdf: pd.DataFrame, ord_pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        # exact integer cents (compat.units contract): pandas float
        # sums would accumulate in a different order than the DuckDB
        # oracle and can straddle a rounding boundary. Nullable Int64
        # (NOT a bare astype(int64)): a NULL value is NaN here and a
        # bare cast turns it into min-long garbage, while SQL SUM
        # skips nulls and count(*) still counts the row — the masked
        # dtype reproduces exactly that (sum skips NA, size counts).
        def cents(col: pd.Series) -> pd.api.extensions.ExtensionArray:
            raw = np.floor(col.to_numpy(dtype="float64") * 100.0 + 0.5)
            return pd.array(raw, dtype="Int64")

        ev_pdf = ev_pdf.assign(_cents=cents(ev_pdf["value"]))
        ord_pdf = ord_pdf.assign(_cents=cents(ord_pdf["o_totalprice"]))
        ea = ev_pdf.groupby("user_id")["_cents"].agg(["size", "sum"])
        oa = ord_pdf.groupby("user_id")["_cents"].agg(["size", "sum"])
        m = ea.join(oa, how="outer", lsuffix="_e", rsuffix="_o").fillna(0)
        return pd.DataFrame(
            {
                "user_id": m.index.astype("int64"),
                "n_events": m["size_e"].astype("int64"),
                "sum_value": [int(x) / 100.0 for x in m["sum_e"]],
                "n_orders": m["size_o"].astype("int64"),
                "sum_spend": [int(x) / 100.0 for x in m["sum_o"]],
            }
        )

    return (
        ev.groupBy("bucket")
        .cogroup(orders.groupBy("bucket"))
        .applyInPandas(
            merge,
            "user_id bigint, n_events bigint, sum_value double,"
            " n_orders bigint, sum_spend double",
        )
        .orderBy("user_id")
    )


QUERIES_EXTRA["cogroup_user_activity"] = cogroup_user_activity

ORACLES_EXTRA["cogroup_user_activity"] = """
WITH e AS (
  SELECT user_id, count(*) AS n_events,
         CAST(sum(CAST(floor((value) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) / 100.0
           AS sum_value
  FROM events GROUP BY user_id
),
o AS (
  SELECT o_custkey AS user_id, count(*) AS n_orders,
         CAST(sum(CAST(floor((o_totalprice) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) / 100.0
           AS sum_spend
  FROM orders GROUP BY o_custkey
)
SELECT coalesce(e.user_id, o.user_id) AS user_id,
       coalesce(e.n_events, 0) AS n_events,
       coalesce(e.sum_value, 0.0) AS sum_value,
       coalesce(o.n_orders, 0) AS n_orders,
       coalesce(o.sum_spend, 0.0) AS sum_spend
FROM e FULL OUTER JOIN o ON e.user_id = o.user_id
ORDER BY user_id
"""


def doc_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator (UDTF-shape) coverage: posexplode flattens each
    document's token array into (doc_id, pos, token) rows — the
    row-to-many-rows primitive every tokenization pipeline starts
    with. Bounded to doc_id < 50 to keep the gate output stable
    across scale factors."""
    from youtube_etl_automated_pipeline_spark.ext.textstats import tokens

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (
        docs.select("doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "token"))
        .orderBy("doc_id", "pos")
    )


QUERIES_EXTRA["doc_token_positions"] = doc_token_positions

# DuckDB: index the token list with a lateral generate_series
# (1-based -> subtract 1 to match 0-based posexplode)
from youtube_etl_automated_pipeline_spark.ext.textstats import WS_CLASS  # noqa: E402

ORACLES_EXTRA["doc_token_positions"] = f"""
WITH b AS (
  SELECT doc_id, string_split_regex(trim(text), '{WS_CLASS}+') AS toks
  FROM documents
  WHERE doc_id < 50 AND text IS NOT NULL AND trim(text) <> ''
)
SELECT doc_id, CAST(g.i - 1 AS INT) AS pos, toks[g.i] AS token
FROM b, unnest(generate_series(1, len(toks))) AS g(i)
ORDER BY doc_id, pos
"""


# Per-stratum acceptance thresholds as EXACT integers over the md5
# 32-bit uniform: accept iff u < floor(frac * 2^32). floor() once in
# Python so both engines compare against the identical literal — no
# float fraction ever crosses the engine boundary.
STRAT_FRACTIONS = {
    "click": 0.5,
    "view": 0.25,
    "purchase": 1.0,
    "signup": 1.0,
    "error": 0.1,
}
_STRAT_TH = {t: int(f * 2**32) for t, f in STRAT_FRACTIONS.items()}


def stratified_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling census: per-event-type fractions applied
    through a deterministic md5-acceptance gate (accept iff the row's
    32-bit md5 uniform < floor(frac*2^32)) — the class-rebalancing
    curation primitive, REPRODUCIBLE across engines and growth-stable
    (a row's fate never changes when the corpus grows; the same
    posture as corpus_importance_resample / train_val_test_split).
    Replaced round 3's seeded sampleBy, whose Bernoulli stream was
    engine-private and forced a rows-only gate.

    Scale shape: one map-only hash + filter, one map-side-combinable
    count agg — no shuffle beyond the k-row census. Types outside the
    fraction map (and NULL types) fall to a NULL threshold, which the
    strict < rejects in both engines — sampleBy's exclusion
    semantics, pinned."""
    from youtube_etl_automated_pipeline_spark.ext.textstats import md5_long

    ev = load_table(spark, sf_dir, "events")
    u = md5_long(
        F.concat(F.lit("strat|"), F.col("event_id").cast("string"))
    )
    th = None
    for t, v in sorted(_STRAT_TH.items()):
        cond = F.when(F.col("event_type") == t, F.lit(v))
        th = cond if th is None else th.when(
            F.col("event_type") == t, F.lit(v)
        )
    return (
        ev.where(u < th)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .orderBy("event_type")
    )


QUERIES_EXTRA["stratified_sample_events"] = stratified_sample_events

_STRAT_CASE = "CASE event_type " + " ".join(
    f"WHEN '{t}' THEN {v}" for t, v in sorted(_STRAT_TH.items())
) + " END"

ORACLES_EXTRA["stratified_sample_events"] = f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n_sampled
FROM events
WHERE CAST('0x' || substr(md5('strat|' || CAST(event_id AS VARCHAR)), 1, 8)
           AS BIGINT) < {_STRAT_CASE}
GROUP BY event_type
ORDER BY event_type
"""
