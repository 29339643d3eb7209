"""Round-5 engine extensions, fourth batch: four families the
registry did not yet cover — a forensic-audit statistic, an
optimizer-style cardinality profiler, an index-compression census,
and a telemetry debounce — each with a DuckDB oracle twin.

- ``benford_leading_digit`` — first-digit (Benford's law) audit over
  order totals: the classic forensic screen for fabricated or
  truncated monetary data (Benford 1938; Nigrini's digital-analysis
  auditing). Expected shares are module-level integer ppm constants
  (computed once in Python and inlined into BOTH engines' plans, so
  no cross-engine log10 ulp can differ); the observed distribution is
  one map-side-combinable 9-group aggregate.
- ``join_size_profile`` — exact join-output cardinality and skew
  profile computed from per-key frequency aggregates WITHOUT
  executing the join: |A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k), the statistic
  a cost-based optimizer estimates and the first thing to check
  before running a 100 TB join (is the output 1× or 1000× the
  inputs? which key explodes?). Three relation pairs profiled:
  orders⋈lineitem (PK-FK), customer⋈orders (PK-FK), events⋈events
  self-join on user_id (the F2 frequency moment).
- ``postings_delta_encode`` — inverted-index posting-list delta-gap
  census: distinct (token, doc_id) postings, per-token doc-id deltas,
  and the bit-width histogram that decides index size under
  Elias-gamma vs fixed-width encoding (Witten/Moffat/Bell, "Managing
  Gigabytes" ch.3). Bit widths come from ``length(bin(delta))`` —
  integer→binary-string, bit-identical across engines.
- ``event_debounce_dedup`` — telemetry debounce: bursts of same
  (user, event_type) events chained STRICTLY closer than
  DEBOUNCE_SECONDS collapse to their first event (the kept anchor is
  chain-based, the sessionization semantics, NOT a naive
  previous-row filter — a burst longer than the window still keeps
  only its first event; a gap of exactly the window starts a new
  burst, matching Spark's ``session_window`` merge rule so the
  streaming twin shares this oracle). Output is the per-(user, type)
  kept/dropped census.

The reference has no analogue for any of these (SURVEY §0: a linear
fetch→clean→sheet chain); they extend the audit/indexing surface of
the engine's LLM-data mandate, expressed Spark-first.

Cross-engine exactness: every grouping, ordering and threshold value
is an exact integer (cents, epoch micros, binary-string lengths,
ppm via decimal/hugeint integer division); no floats anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from youtube_etl_automated_pipeline_spark.sources import load_table, load_wide

# --- Benford -------------------------------------------------------
# floor(log10(1 + 1/d) * 1e6 + 0.5), d = 1..9 — computed ONCE here
# and inlined as literals into both the Spark plan and the DuckDB
# oracle, so both engines share the identical integer constants.
BENFORD_PPM = {
    d: int(math.floor(math.log10(1.0 + 1.0 / d) * 1e6 + 0.5))
    for d in range(1, 10)
}

# --- debounce ------------------------------------------------------
DEBOUNCE_SECONDS = 300  # events of a burst within 5 min collapse


def benford_leading_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-digit distribution of order totals vs Benford's law.

    Output: one row per digit 1..9 with the observed count, observed
    ppm share, the Benford expectation ppm, and the signed deviation.

    Scale shape: one 9-group map-side-combinable aggregate over the
    fact scan; the share window runs over the 9-row digit relation
    (bounded_window). ppm rides decimal(38,0): 1e13 orders x 1e6
    cannot wrap. The leading digit comes from the DECIMAL STRING of
    the exact cent amount — no log10 on data, so no float anywhere.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    cents = F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
    digits = (
        orders.select(cents.alias("cents"))
        .filter(F.col("cents") > 0)
        .select(
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    benford = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(d) for d in sorted(BENFORD_PPM)]),
            F.array(*[F.lit(BENFORD_PPM[d]) for d in sorted(BENFORD_PPM)]),
        ),
        F.col("digit"),
    ).cast("long")
    return digits.select(
        "digit",
        "n_orders",
        F.expr(
            "CAST(CAST(n_orders AS DECIMAL(38,0)) * 1000000"
            " DIV sum(n_orders) over (partition by coalesce(digit,0) % 1)"
            " AS BIGINT)"
        ).alias("observed_ppm"),
        benford.alias("benford_ppm"),
    ).withColumn(
        "deviation_ppm", F.col("observed_ppm") - F.col("benford_ppm")
    )


_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {BENFORD_PPM[d]}" for d in sorted(BENFORD_PPM)
)

ORACLE_BENFORD = f"""
WITH cents AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
  FROM orders WHERE o_totalprice IS NOT NULL
), digits AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         count(*) AS n_orders
  FROM cents WHERE c > 0 GROUP BY 1
), shared AS (
  SELECT digit, CAST(n_orders AS BIGINT) AS n_orders,
         CAST(CAST(n_orders AS HUGEINT) * 1000000
              // sum(n_orders) OVER (PARTITION BY coalesce(digit,0) % 1)
              AS BIGINT) AS observed_ppm,
         CAST(CASE digit {_BENFORD_CASE} END AS BIGINT) AS benford_ppm
  FROM digits
)
SELECT digit, n_orders, observed_ppm, benford_ppm,
       observed_ppm - benford_ppm AS deviation_ppm
FROM shared ORDER BY digit
"""


def join_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-output cardinality + skew profile from per-key counts —
    the join is NEVER executed; only its size is computed, the way a
    cost-based optimizer would with exact frequency statistics.

    One row per profiled pair: distinct key counts on each side, the
    exact join output rows Σ cnt_l·cnt_r, the single hottest key's
    contribution, and its share in ppm (the skew signal that decides
    broadcast/salt/AQE strategy before paying for the join).

    Scale shape: per-side map-side-combinable key-count aggregates
    (each output ≤ distinct keys), an equi-join BETWEEN COUNT
    relations (orders of magnitude smaller than the facts), and a
    one-row final aggregate per pair. Products ride decimal(38,0)
    end-to-end; the emitted BIGINTs hold to ~9e18 join rows — beyond
    any join this engine would actually run (a 100 TB self-join with
    a 3e9-row hot key is the documented ceiling).
    """
    pairs = []
    specs = [
        ("orders_x_lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
        ("customer_x_orders", "customer", "c_custkey", "orders", "o_custkey"),
        ("events_self_user", "events", "user_id", "events", "user_id"),
    ]
    for name, lt, lk, rt, rk in specs:
        left = (
            load_table(spark, sf_dir, lt)
            .filter(F.col(lk).isNotNull())
            .groupBy(F.col(lk).alias("k"))
            .agg(F.count(F.lit(1)).alias("cl"))
        )
        right = (
            load_table(spark, sf_dir, rt)
            .filter(F.col(rk).isNotNull())
            .groupBy(F.col(rk).alias("k"))
            .agg(F.count(F.lit(1)).alias("cr"))
        )
        prod = F.expr("CAST(cl AS DECIMAL(38,0)) * cr")
        joined = left.join(right, "k").select(
            F.col("k"), prod.alias("rows_k")
        )
        pairs.append(
            joined.agg(
                F.lit(name).alias("pair"),
                F.count(F.lit(1)).alias("n_match_keys"),
                F.max("rows_k").cast("long").alias("max_key_rows"),
                F.sum("rows_k").cast("long").alias("join_rows"),
                F.expr(
                    "CAST(max(rows_k) * 1000000 DIV sum(rows_k) AS BIGINT)"
                ).alias("max_key_share_ppm"),
            )
        )
    out = pairs[0]
    for p in pairs[1:]:
        out = out.unionByName(p)
    return out


ORACLE_JOIN_SIZE = """
WITH profile AS (
  SELECT 'orders_x_lineitem' AS pair, l.k, l.cl * r.cr AS rows_k
  FROM (SELECT o_orderkey AS k, CAST(count(*) AS HUGEINT) AS cl
        FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 1) l
  JOIN (SELECT l_orderkey AS k, CAST(count(*) AS HUGEINT) AS cr
        FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1) r
    USING (k)
  UNION ALL
  SELECT 'customer_x_orders', l.k, l.cl * r.cr
  FROM (SELECT c_custkey AS k, CAST(count(*) AS HUGEINT) AS cl
        FROM customer WHERE c_custkey IS NOT NULL GROUP BY 1) l
  JOIN (SELECT o_custkey AS k, CAST(count(*) AS HUGEINT) AS cr
        FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1) r
    USING (k)
  UNION ALL
  SELECT 'events_self_user', l.k, l.cl * r.cr
  FROM (SELECT user_id AS k, CAST(count(*) AS HUGEINT) AS cl
        FROM events WHERE user_id IS NOT NULL GROUP BY 1) l
  JOIN (SELECT user_id AS k, CAST(count(*) AS HUGEINT) AS cr
        FROM events WHERE user_id IS NOT NULL GROUP BY 1) r
    USING (k)
)
SELECT pair,
       CAST(count(*) AS BIGINT) AS n_match_keys,
       CAST(max(rows_k) AS BIGINT) AS max_key_rows,
       CAST(sum(rows_k) AS BIGINT) AS join_rows,
       CAST(max(rows_k) * 1000000 // sum(rows_k) AS BIGINT)
         AS max_key_share_ppm
FROM profile GROUP BY pair ORDER BY pair
"""


def postings_delta_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index posting-list delta-gap bit-width census.

    Postings are the distinct (token, doc_id) pairs of the corpus;
    within a token's posting list (doc_id ascending) each entry is
    stored as the gap from its predecessor (the first entry stores
    the doc_id itself). The output histograms the gaps by binary bit
    width and prices the index under Elias-gamma (2w-1 bits/gap)
    against fixed 64-bit postings — the census that decides whether
    an index fits in memory at 100 TB.

    Scale shape: explode -> distinct(token, doc_id) (one shuffle,
    combiner-friendly), a PARTITIONED lag window (per-token — never
    a global window), then a ~64-group map-side-combinable rollup.
    Bit width = length(bin(gap)): integer-to-binary-string is
    bit-identical in Spark and DuckDB (verified for 0, 1, 5, 2^10).
    """
    from youtube_etl_automated_pipeline_spark.ext.textstats import (
        normalized_text,
        tokens,
    )

    docs = load_wide(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("doc_id").isNotNull()
    )
    postings = (
        docs.select(
            F.explode(tokens(normalized_text(F.col("text")))).alias("token"),
            "doc_id",
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    w = Window.partitionBy("token").orderBy("doc_id")
    gaps = postings.select(
        "token",
        (
            F.col("doc_id")
            - F.coalesce(F.lag("doc_id").over(w), F.lit(0))
        ).alias("gap"),
    )
    return (
        gaps.select(F.length(F.expr("bin(gap)")).cast("int").alias("bit_width"))
        .groupBy("bit_width")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.expr(
                "CAST(sum(CAST(2 * bit_width - 1 AS DECIMAL(38,0)))"
                " AS BIGINT)"
            ).alias("elias_gamma_bits"),
            F.expr("CAST(count(*) * 64 AS BIGINT)").alias("fixed64_bits"),
        )
    )


def _postings_oracle() -> str:
    from youtube_etl_automated_pipeline_spark.ext.textstats import WS_CLASS

    norm = f"lower(regexp_replace(trim(text), '{WS_CLASS}+', ' ', 'g'))"
    return f"""
WITH postings AS (
  SELECT DISTINCT tk.t AS token, doc_id
  FROM (SELECT doc_id, {norm} AS nt FROM documents
        WHERE text IS NOT NULL AND doc_id IS NOT NULL),
       unnest(string_split(nt, ' ')) AS tk(t)
  WHERE tk.t != ''
), gaps AS (
  SELECT doc_id - coalesce(
           lag(doc_id) OVER (PARTITION BY token ORDER BY doc_id), 0
         ) AS gap
  FROM postings
)
SELECT CAST(length(bin(gap)) AS INTEGER) AS bit_width,
       count(*) AS n_gaps,
       CAST(sum(2 * length(bin(gap)) - 1) AS BIGINT) AS elias_gamma_bits,
       CAST(count(*) * 64 AS BIGINT) AS fixed64_bits
FROM gaps GROUP BY 1 ORDER BY 1
"""


def event_debounce_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry debounce census: per (user, event_type), events that
    follow their predecessor within DEBOUNCE_SECONDS chain into one
    burst, and only the burst's FIRST event is kept.

    Chain semantics (the sessionization gap rule): a burst extends
    while consecutive gaps stay STRICTLY under the window (a gap of
    exactly DEBOUNCE_SECONDS starts a new burst — the session_window
    merge rule, so n_kept == session count and the streaming twin
    shares this oracle), and a 30-minute burst of 5-second pings
    still collapses to ONE kept event — the behavior a naive
    "compare to previous kept" lag filter cannot express in one
    pass.

    Output: per (user_id, event_type) the raw event count, kept
    count, and dropped ppm. Scale shape: one lag window partitioned
    by (user, type) — a single keyed shuffle — then a map-side
    combinable rollup; output is bounded by users x types. Ordering
    ties (identical timestamps) break on event_id in both engines;
    gap arithmetic is exact epoch-microsecond integers.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    flagged = ev.select(
        "user_id", "event_type", "event_id", us.alias("us")
    ).withColumn(
        "is_anchor",
        F.when(
            F.col("us") - F.lag("us").over(w)
            < F.lit(DEBOUNCE_SECONDS * 1_000_000),
            F.lit(0),
        ).otherwise(F.lit(1)),  # first row (NULL lag) is an anchor
    )
    return (
        flagged.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("is_anchor").cast("long").alias("n_kept"),
        )
        .withColumn(
            "dropped_ppm",
            F.expr(
                "CAST(CAST(n_events - n_kept AS DECIMAL(38,0)) * 1000000"
                " DIV n_events AS BIGINT)"
            ),
        )
    )


ORACLE_DEBOUNCE = f"""
WITH ev AS (
  SELECT user_id, event_type, event_id,
         CAST(epoch_us(date_trunc('microseconds', ts)) AS BIGINT) AS us
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL
), flagged AS (
  SELECT user_id, event_type,
         CASE WHEN us - lag(us) OVER (
                PARTITION BY user_id, event_type ORDER BY us, event_id
              ) < {DEBOUNCE_SECONDS} * 1000000
              THEN 0 ELSE 1 END AS is_anchor
  FROM ev
)
SELECT user_id, event_type,
       count(*) AS n_events,
       CAST(sum(is_anchor) AS BIGINT) AS n_kept,
       CAST(CAST(count(*) - sum(is_anchor) AS HUGEINT) * 1000000
            // count(*) AS BIGINT) AS dropped_ppm
FROM flagged GROUP BY 1, 2 ORDER BY user_id, event_type
"""


QUERIES_ENGINE5D = {
    "benford_leading_digit": benford_leading_digit,
    "join_size_profile": join_size_profile,
    "postings_delta_encode": postings_delta_encode,
    "event_debounce_dedup": event_debounce_dedup,
}

ORACLES_ENGINE5D = {
    "benford_leading_digit": ORACLE_BENFORD,
    "join_size_profile": ORACLE_JOIN_SIZE,
    "postings_delta_encode": _postings_oracle(),
    "event_debounce_dedup": ORACLE_DEBOUNCE,
}
