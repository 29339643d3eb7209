"""Round-5 engine extensions, second batch: five more semantic
families the registry did not yet cover, each with a DuckDB oracle
twin.

- ``line_dedup_census`` — CCNet-style duplicated-chunk filtering
  (Wenzek et al., "CCNet: Extracting High Quality Monolingual
  Datasets from Web Crawl Data", LREC 2020 §3.2 dedups paragraphs by
  hash against a corpus-wide census). The corpus has no newlines, so
  the "paragraph" unit is the aligned 80-char chunk the engine's
  ``doc_chunking`` operator already defines; the op computes the
  global chunk census, marks each doc's duplicated chunks, and emits
  the census plus a signature of the KEPT (deduplicated) document.
- ``cross_source_duplicate_census`` — provenance overlap matrix:
  which source pairs share verbatim content (by aligned-chunk hash).
  The inter-source audit run before mixing crawls/dumps, catching
  mirror sites and re-crawled hosts that per-doc dedup only removes
  pairwise.
- ``anomaly_rolling_zscore`` — trailing-window z-score anomaly flags
  over the daily revenue series, with the z² threshold evaluated in
  EXACT integer arithmetic (no sqrt, no float variance): flag iff
  (n*x - s)^2 > z^2 * (n*sq - s^2) over window sums s, sq.
- ``twap_user_value`` — time-weighted average value per user (the
  TWAP aggregation): each observation weighted by its holding
  duration until the user's next event; exact integer micro-second x
  centi-value mass, one double division at the end.
- ``order_backlog_sweepline`` — open-order backlog timeline by
  sweep-line: +1 delta at order date, -1 after the order's last
  shipment; running sum over the per-day delta relation (bounded by
  the calendar, never the fact table).

The reference has no analogue for any of these (SURVEY §0 linear
chain); they extend the curation/time-series surface the build
mandate asks for, expressed Spark-first.

Cross-engine exactness: every value feeding an ordering, threshold or
hash is an exact integer (chunk hashes, cents, microseconds,
decimal(38,0) squares); each query performs at most one double
division, on integer operands, in the same operand order in both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from youtube_etl_automated_pipeline_spark.operators.windows import bounded_window

from youtube_etl_automated_pipeline_spark.ext import textstats as TS
from youtube_etl_automated_pipeline_spark.sources import load_table, load_wide

# --- line/chunk dedup -----------------------------------------------
LDC_CHUNK = 80  # aligned chunk width, matches doc_chunking's unit

# --- rolling z-score ------------------------------------------------
ZS_WIN = 28  # trailing window (days), exclusive of the current day
ZS_MIN_N = 14  # min trailing days before a flag can fire
ZS_Z2 = 9  # z^2 threshold (|z| > 3)

# --- TWAP -----------------------------------------------------------
# (no constants: full event horizon, all users with >= 2 events)

# --- backlog sweep-line ---------------------------------------------
# (no constants: the close date is the order's max shipdate)


def line_dedup_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicated-chunk census + per-doc dedup signature
    (CCNet's paragraph dedup re-expressed over aligned 80-char
    chunks).

    Scale shape: chunks are a map-side generator (sequence +
    posexplode, no shuffle); the census is ONE window count
    partitioned by the 64-bit chunk hash — a single hash shuffle of
    ~32-byte rows, evaluating the chunk explode exactly once (the
    agg + join-back formulation scans the generator twice); the
    per-doc rebuild aggregates bounded state (a doc's own chunk
    hashes, capped by doc length / 80). Nothing is quadratic and no
    relation carries full text past the first projection.

    Exactness: the kept-document signature hashes the ordered
    concatenation of the SURVIVING chunks' md5 hexes, so both engines
    agree without re-materializing the filtered text.
    """
    docs = load_wide(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(LDC_CHUNK)
    )
    chunk = F.col("text").substr(F.col("chunk_start"), F.lit(LDC_CHUNK))
    chunks = docs.select(
        "doc_id", "text", F.posexplode(starts).alias("idx", "chunk_start")
    ).select(
        "doc_id",
        F.col("idx").cast("long").alias("idx"),
        F.substring(F.md5(chunk), 1, 16).alias("h"),
        F.length(chunk).cast("long").alias("clen"),
    )
    marked = chunks.withColumn(
        "n_global", F.count(F.lit(1)).over(Window.partitionBy("h"))
    )
    kept = F.when(F.col("n_global") == 1, F.col("h"))
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("n_global") > 1, 1).otherwise(0)).alias(
                "n_dup_chunks"
            ),
            F.sum(
                F.when(F.col("n_global") == 1, F.col("clen")).otherwise(0)
            ).alias("kept_len"),
            TS.md5_long(
                F.concat_ws(
                    "|",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(F.col("idx"), kept.alias("kh"))
                            )
                        ),
                        lambda s: F.coalesce(s.getField("kh"), F.lit("_")),
                    ),
                ),
                15,
            ).alias("kept_sig"),
        )
        .orderBy("doc_id")
    )


def cross_source_duplicate_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-pair verbatim-content overlap matrix over aligned-chunk
    hashes: for every source pair that shares at least one distinct
    80-char chunk, the shared-chunk count, each side's distinct-chunk
    census, and the overlap in ppm of the smaller side.

    Scale shape: ONE hash-keyed aggregation collects each chunk's
    sorted distinct source set; unordered source pairs expand
    JVM-side from that array (the copurchase array-expansion shape —
    per-chunk fan-out is C(sources carrying it, 2), bounded by the
    source census, never by corpus size) and one more shuffle counts
    pairs — no self-join, the chunk generator evaluates once. The
    per-source census explodes the same grouped relation; output is
    at most |sources|^2 rows, per-source rollups broadcast back.

    Exactness: counts and a ppm ratio via decimal(38,0) DIV — no
    floats anywhere.
    """
    docs = load_wide(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(LDC_CHUNK)
    )
    chunk = F.col("text").substr(F.col("s"), F.lit(LDC_CHUNK))
    grouped = (
        docs.select("source", "text", F.explode(starts).alias("s"))
        .select("source", F.substring(F.md5(chunk), 1, 16).alias("h"))
        .groupBy("h")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
    )
    per_src = (
        grouped.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_chunks"))
    )
    pairs = (
        grouped.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "srcs",
                        lambda x, i: F.transform(
                            F.slice(
                                F.col("srcs"),
                                i + 2,
                                F.size(F.col("srcs")) - i - 1,
                            ),
                            lambda y: F.struct(
                                x.alias("src_a"), y.alias("src_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.src_a", "p.src_b")
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        pairs.join(
            F.broadcast(per_src.withColumnRenamed("n_chunks", "n_a")),
            F.col("src_a") == F.col("source"),
        )
        .drop("source")
        .join(
            F.broadcast(per_src.withColumnRenamed("n_chunks", "n_b")),
            F.col("src_b") == F.col("source"),
        )
        .drop("source")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "n_a",
            "n_b",
            F.expr(
                "CAST(CAST(n_shared AS DECIMAL(38,0)) * 1000000"
                " DIV least(n_a, n_b) AS BIGINT)"
            ).alias("overlap_ppm_min_side"),
        )
        .orderBy(F.desc("n_shared"), "src_a", "src_b")
    )


def anomaly_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly detection over daily revenue,
    entirely in exact integer arithmetic.

    For each day x (cents) with trailing-window sums s = sum(cents),
    sq = sum(cents^2) over the previous ZS_WIN days (current day
    EXCLUDED — the classic leave-current-out detector), the flag is

        (n*x - s)^2  >  Z2 * (n*sq - s^2)          [and n >= ZS_MIN_N]

    which is z^2 > Z2 with the population variance cleared of both
    divisions — no sqrt, no float, bit-identical across engines.
    A z^2 magnitude in milli-units is emitted the same way.

    Scale shape: the fact scan collapses to one row per calendar day
    (hash partial agg) BEFORE any window; the single unpartitioned
    window runs over the bounded day relation (~2.4k rows for the
    7-year corpus; bounded by the calendar at any corpus size) —
    allowlisted with that proof in tests/test_plan_shapes.py.
    Squares ride decimal(38,0): day cents up to ~1e14 square to 1e28,
    far past bigint.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("rev_cents")
    )
    w = (
        bounded_window("day").orderBy("day")
        .rowsBetween(-ZS_WIN, -1)
    )
    stats = daily.select(
        "day",
        "rev_cents",
        F.count(F.lit(1)).over(w).alias("win_n"),
        F.sum(F.col("rev_cents").cast("decimal(38,0)")).over(w).alias("s"),
        F.sum(
            F.expr("CAST(rev_cents AS DECIMAL(38,0)) * rev_cents")
        ).over(w).alias("sq"),
    )
    return (
        stats.select(
            "day",
            "rev_cents",
            "win_n",
            F.expr("CAST(s AS BIGINT)").alias("win_sum_cents"),
            F.expr(
                "CASE WHEN win_n >= {m} AND (win_n * sq - s * s) > 0 THEN"
                " CAST((win_n * rev_cents - s) * (win_n * rev_cents - s)"
                " * 1000 DIV (win_n * sq - s * s) AS BIGINT)"
                " ELSE NULL END".format(m=ZS_MIN_N)
            ).alias("z2_milli"),
            F.expr(
                "win_n >= {m} AND (win_n * sq - s * s) > 0 AND"
                " (win_n * rev_cents - s) * (win_n * rev_cents - s)"
                " > {z2} * (win_n * sq - s * s)".format(
                    m=ZS_MIN_N, z2=ZS_Z2
                )
            ).alias("is_anomaly"),
        )
        .filter(F.col("is_anomaly"))
        .orderBy("day")
    )


def twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each event's value
    holds until the user's next event; the average weights each value
    by its holding duration. The standard position/price aggregation
    a row-wise mean silently gets wrong under irregular sampling.

    Scale shape: one window partitioned by user (lead over the
    user's own timeline — per-key state only), then a hash rollup per
    user. No unpartitioned stage anywhere; the fact table shuffles
    once on user_id and everything after is linear.

    Exactness: durations are exact microseconds, values exact
    centi-units; the weighted mass rides decimal(38,0) (us x cents x
    events/user exceeds bigint at fleet scale). One double division
    (num/den) at the end, same operand order both engines; a DIV'd
    micro-cents integer rides alongside for the exact comparison.
    """
    ev = load_wide(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    # events ts is TIMESTAMP_NTZ; session TZ is pinned UTC, so the
    # cast reinterprets without shifting — matching DuckDB's epoch_us
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    wu = Window.partitionBy("user_id").orderBy("us", "event_id")
    stepped = (
        ev.select(
            "user_id",
            "event_id",
            us.alias("us"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
        .select(
            "user_id",
            "cents",
            (F.lead("us").over(wu) - F.col("us")).alias("dur_us"),
        )
        .filter(F.col("dur_us").isNotNull())
    )
    return (
        stepped.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dur_us").alias("total_dur_us"),
            F.sum(
                F.expr("CAST(dur_us AS DECIMAL(38,0)) * cents")
            ).alias("mass"),
        )
        .filter(F.col("total_dur_us") > 0)
        .select(
            "user_id",
            "n_intervals",
            "total_dur_us",
            F.expr(
                "CAST(mass * 1000000 DIV total_dur_us AS BIGINT)"
            ).alias("twap_microcents"),
        )
        .orderBy("user_id")
    )


def order_backlog_sweepline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog timeline: how many orders are open (placed
    but not fully shipped) at the end of each calendar day, by
    sweep-line — +1 at the order date, -1 the day AFTER the order's
    last shipment, running sum over per-day deltas. Orders with no
    line items count as shipped on their order date, so they appear
    in exactly that day's end-of-day backlog snapshot.

    Scale shape: the close date is one hash agg over lineitem
    (max shipdate per order, map-side partial); deltas union two
    narrow projections and collapse to ONE ROW PER CALENDAR DAY
    before the only window — the running sum therefore runs over a
    calendar-bounded relation (~2.4k rows here, never fact-table
    rows), the same sweep-line/prefix-sum shape as
    ``gap_fill_daily_counts``. Allowlisted with that proof.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    li = load_table(spark, sf_dir, "lineitem")
    close = li.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("last_ship")
    )
    opened = F.to_date("o_orderdate")
    scoped = orders.join(
        close, orders.o_orderkey == close.l_orderkey, "left"
    ).select(
        opened.alias("opened"),
        # coalesce BEFORE greatest: engines disagree on greatest(NULL, x)
        F.date_add(
            F.greatest(F.coalesce("last_ship", opened), opened), 1
        ).alias("closes"),
    )
    deltas = scoped.select(
        F.col("opened").alias("day"), F.lit(1).alias("delta")
    ).unionAll(
        scoped.select(F.col("closes").alias("day"), F.lit(-1).alias("delta"))
    )
    per_day = deltas.groupBy("day").agg(
        F.sum("delta").cast("long").alias("net"),
        F.sum(F.when(F.col("delta") > 0, 1).otherwise(0)).alias("n_opened"),
    )
    wd = bounded_window("day").orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "day",
        "n_opened",
        F.sum("net").over(wd).cast("long").alias("open_backlog"),
    ).orderBy("day")


QUERIES_ENGINE5C = {
    "line_dedup_census": line_dedup_census,
    "cross_source_duplicate_census": cross_source_duplicate_census,
    "anomaly_rolling_zscore": anomaly_rolling_zscore,
    "twap_user_value": twap_user_value,
    "order_backlog_sweepline": order_backlog_sweepline,
}


def _h(expr: str, n: int = 8) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, {n}) AS BIGINT)"


_LDC_CHUNKS = f"""
  SELECT doc_id, source,
         CAST((s - 1) // {LDC_CHUNK} AS BIGINT) AS idx,
         substr(md5(substr(text, s, {LDC_CHUNK})), 1, 16) AS h,
         CAST(length(substr(text, s, {LDC_CHUNK})) AS BIGINT) AS clen
  FROM documents,
    unnest(generate_series(1, greatest(length(text), 1), {LDC_CHUNK})) AS t(s)
  WHERE text IS NOT NULL
"""

ORACLES_ENGINE5C: dict[str, str] = {}

ORACLES_ENGINE5C["line_dedup_census"] = f"""
WITH chunks AS ({_LDC_CHUNKS}),
census AS (SELECT h, count(*) AS n_global FROM chunks GROUP BY h),
marked AS (SELECT c.*, n_global FROM chunks c JOIN census USING (h))
SELECT doc_id,
  count(*) AS n_chunks,
  CAST(sum(CASE WHEN n_global > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dup_chunks,
  CAST(sum(CASE WHEN n_global = 1 THEN clen ELSE 0 END) AS BIGINT)
    AS kept_len,
  {_h("string_agg(CASE WHEN n_global = 1 THEN h ELSE '_' END, '|' ORDER BY idx)", 15)}
    AS kept_sig
FROM marked GROUP BY doc_id ORDER BY doc_id
"""

ORACLES_ENGINE5C["cross_source_duplicate_census"] = f"""
WITH chunks AS ({_LDC_CHUNKS}),
sh AS (SELECT DISTINCT source, h FROM chunks),
per_src AS (SELECT source, count(*) AS n_chunks FROM sh GROUP BY source),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_shared, pa.n_chunks AS n_a, pb.n_chunks AS n_b,
  CAST(CAST(n_shared AS HUGEINT) * 1000000
       // least(pa.n_chunks, pb.n_chunks) AS BIGINT)
    AS overlap_ppm_min_side
FROM pairs
JOIN per_src pa ON pa.source = src_a
JOIN per_src pb ON pb.source = src_b
ORDER BY n_shared DESC, src_a, src_b
"""

ORACLES_ENGINE5C["anomaly_rolling_zscore"] = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
),
stats AS (
  SELECT day, rev_cents,
    CAST(count(*) OVER w AS BIGINT) AS win_n,
    sum(CAST(rev_cents AS HUGEINT)) OVER w AS s,
    sum(CAST(rev_cents AS HUGEINT) * rev_cents) OVER w AS sq
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN {ZS_WIN} PRECEDING AND 1 PRECEDING)
)
SELECT day, rev_cents, win_n,
  CAST(s AS BIGINT) AS win_sum_cents,
  CASE WHEN win_n >= {ZS_MIN_N} AND (win_n * sq - s * s) > 0 THEN
    CAST((win_n * rev_cents - s) * (win_n * rev_cents - s) * 1000
         // (win_n * sq - s * s) AS BIGINT)
  ELSE NULL END AS z2_milli,
  (win_n >= {ZS_MIN_N} AND (win_n * sq - s * s) > 0 AND
   (win_n * rev_cents - s) * (win_n * rev_cents - s)
     > {ZS_Z2} * (win_n * sq - s * s)) AS is_anomaly
FROM stats
WHERE win_n >= {ZS_MIN_N} AND (win_n * sq - s * s) > 0 AND
  (win_n * rev_cents - s) * (win_n * rev_cents - s)
    > {ZS_Z2} * (win_n * sq - s * s)
ORDER BY day
"""

ORACLES_ENGINE5C["twap_user_value"] = """
WITH based AS (
  SELECT user_id, event_id,
    CAST(epoch_us(date_trunc('microseconds', ts)) AS BIGINT) AS us,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
stepped AS (
  SELECT user_id, cents,
    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us AS dur_us
  FROM based
),
rolled AS (
  SELECT user_id,
    count(*) AS n_intervals,
    CAST(sum(dur_us) AS BIGINT) AS total_dur_us,
    sum(CAST(dur_us AS HUGEINT) * cents) AS mass
  FROM stepped WHERE dur_us IS NOT NULL GROUP BY user_id
)
SELECT user_id, n_intervals, total_dur_us,
  CAST(mass * 1000000 // total_dur_us AS BIGINT) AS twap_microcents
FROM rolled WHERE total_dur_us > 0 ORDER BY user_id
"""

ORACLES_ENGINE5C["order_backlog_sweepline"] = """
WITH close AS (
  SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS last_ship
  FROM lineitem GROUP BY l_orderkey
),
scoped AS (
  SELECT CAST(o_orderdate AS DATE) AS opened,
    greatest(coalesce(last_ship, CAST(o_orderdate AS DATE)),
             CAST(o_orderdate AS DATE)) + 1 AS closes
  FROM orders LEFT JOIN close ON o_orderkey = l_orderkey
  WHERE o_orderdate IS NOT NULL
),
deltas AS (
  SELECT opened AS day, 1 AS delta FROM scoped
  UNION ALL
  SELECT closes AS day, -1 AS delta FROM scoped
),
per_day AS (
  SELECT day, CAST(sum(delta) AS BIGINT) AS net,
    CAST(sum(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_opened
  FROM deltas GROUP BY day
)
SELECT day, n_opened,
  CAST(sum(net) OVER (ORDER BY day
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS open_backlog
FROM per_day ORDER BY day
"""


# --- round-5 batch 3 -------------------------------------------------
PURITY_MIXED_PPM = 900_000  # majority share below this = mixed doc
SNB_LAG_DAYS = 7  # seasonal-naive horizon: same weekday last week
NUCLEUS_TOP = 1000  # ranked-vocab window bound (vocab_coverage pattern)
NUCLEUS_PPM = 900_000  # nucleus mass target (top-p = 0.9)


def doc_language_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document language-mixing audit: every aligned 80-char
    chunk is language-identified with the engine's marker heuristic
    (ext.textstats lang_marker_counts / predicted_lang — the same
    pins text_lang_id gates), then each doc reports its chunk-vote
    census, majority language, purity ppm and a mixed flag. Catches
    the boilerplate/embedded-translation docs a WHOLE-document
    lang-id scores confidently wrong — the curation filter between
    doc-level lang-id and paragraph-level splitting.

    Scale shape: chunking is the map-side generator; marker counts
    and the per-chunk argmax are pure column expressions evaluated
    BEFORE any shuffle (chunk text never crosses an exchange); one
    hash rollup per doc. Purity rides an exact integer ppm DIV.
    """
    docs = load_wide(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(LDC_CHUNK)
    )
    chunk = F.col("text").substr(F.col("s"), F.lit(LDC_CHUNK))
    pred = TS.predicted_lang(TS.lang_marker_counts(chunk))
    voted = docs.select("doc_id", "text", F.explode(starts).alias("s")).select(
        "doc_id", pred.alias("pred")
    )
    votes = {
        lang: F.sum(F.when(F.col("pred") == lang, 1).otherwise(0))
        for lang in TS.LANG_PRIORITY
    }
    agged = voted.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        *[votes[lang].alias(f"votes_{lang}") for lang in TS.LANG_PRIORITY],
    )
    vote_cols = {
        lang: F.col(f"votes_{lang}") for lang in TS.LANG_PRIORITY
    }
    majority = TS.predicted_lang(vote_cols)
    top_votes = F.greatest(
        *[F.col(f"votes_{lang}") for lang in TS.LANG_PRIORITY]
    )
    return (
        agged.select(
            "doc_id",
            "n_chunks",
            *[f"votes_{lang}" for lang in TS.LANG_PRIORITY],
            majority.alias("majority_lang"),
            F.expr(
                "CAST(CAST({top} AS DECIMAL(38,0)) * 1000000"
                " DIV n_chunks AS BIGINT)".format(
                    top="greatest("
                    + ", ".join(
                        f"votes_{lang}" for lang in TS.LANG_PRIORITY
                    )
                    + ")"
                )
            ).alias("purity_ppm"),
            (
                (top_votes * 1_000_000) < (PURITY_MIXED_PPM * F.col("n_chunks"))
            ).alias("is_mixed"),
        )
        .orderBy("doc_id")
    )


def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtesting: score the seasonal-naive predictor
    (revenue(day) ~ revenue(day - 7), same weekday last week) per
    order priority, in exact cents — the baseline every real
    forecasting model must beat, and the harness that measures it.

    Scale shape (round 8 reshape): the per-(priority, day) rollup is
    computed ONCE, then each daily row is exploded into its two roles
    — actual at `day`, prediction at `day + 7` — and a second keyed
    agg pairs them back up, keeping only days with both. Day gaps mean
    a lag-7-ROWS window would silently compare wrong weekdays, so the
    pairing keys the CALENDAR, not row adjacency; and the explode
    replaces the old self-equi-join, whose unpersisted daily subtree
    re-executed the orders rollup twice (the round-7 bench watch item:
    0.56s -> ~0.35s after the reshape). No window anywhere; the final
    rollup is 5 rows. MAE in milli-cents via decimal DIV.
    """
    # priority IS NOT NULL replays the oracle's inner-join semantics
    # exactly: a NULL priority never equi-joins itself, so the old
    # self-join form contributed no scored rows for it (the round-8
    # null-parity sweep caught the reshape keeping the NULL group)
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
        & F.col("o_orderpriority").isNotNull()
    )
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("rev_cents")
    )
    # presence flags, not value nullness, decide the pairing: the
    # oracle's join pairs two DAY ROWS whether or not their rev sums
    # are NULL (all-null-price days), and count(*) counts such pairs
    # while the value sums skip them — is_a/is_p replay that exactly
    roles = daily.select(
        "priority",
        F.explode(
            F.array(
                F.struct(
                    F.col("day"), F.col("rev_cents").alias("a"),
                    F.lit(None).cast("long").alias("p"),
                    F.lit(1).alias("is_a"), F.lit(0).alias("is_p"),
                ),
                F.struct(
                    F.date_add("day", SNB_LAG_DAYS).alias("day"),
                    F.lit(None).cast("long").alias("a"),
                    F.col("rev_cents").alias("p"),
                    F.lit(0).alias("is_a"), F.lit(1).alias("is_p"),
                ),
            )
        ).alias("r"),
    ).select("priority", "r.day", "r.a", "r.p", "r.is_a", "r.is_p")
    scored = (
        roles.groupBy("priority", "day")
        .agg(
            F.max("a").alias("actual_cents"),
            F.max("p").alias("pred_cents"),
            F.max("is_a").alias("has_a"),
            F.max("is_p").alias("has_p"),
        )
        .filter((F.col("has_a") == 1) & (F.col("has_p") == 1))
    )
    err = F.col("actual_cents") - F.col("pred_cents")
    return (
        scored.groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum(F.abs(err)).alias("sum_abs_err_cents"),
            F.sum(err).alias("sum_err_cents"),
        )
        .select(
            "priority",
            "n_scored",
            "sum_abs_err_cents",
            "sum_err_cents",
            F.expr(
                "CAST(CAST(sum_abs_err_cents AS DECIMAL(38,0)) * 1000"
                " DIV n_scored AS BIGINT)"
            ).alias("mae_millicents"),
        )
        .orderBy("priority")
    )


def vocab_nucleus_topp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language nucleus (top-p) vocabulary truncation: the
    smallest ranked-token prefix covering NUCLEUS_PPM of the
    language's token mass — the vocabulary-pruning counterpart of
    nucleus sampling, and the per-language generalization of
    vocab_coverage_curve's bounded-window rewrite.

    Scale shape: token counts hash-aggregate (map-side partials);
    the per-language rank window is pruned to NUCLEUS_TOP rows by
    WindowGroupLimit (rank + filter), so the cumulative-sum window
    runs over <= 5 x 1000 rows; language totals come from a 5-row agg
    broadcast back. If the nucleus needs more than NUCLEUS_TOP
    tokens the row reports NULL — the cap is explicit, not silent.

    Exactness: the 90% test multiplies instead of divides
    (cum * 1e6 >= NUCLEUS_PPM * total) on decimal(38,0).
    """
    from youtube_etl_automated_pipeline_spark.ext.textstats import tokens

    docs = load_wide(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    tok = docs.select(
        "lang", F.explode(tokens(F.col("text"))).alias("token")
    )
    counts = tok.groupBy("lang", "token").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = tok.groupBy("lang").agg(
        F.count(F.lit(1)).alias("total_mass")
    )
    wr = Window.partitionBy("lang").orderBy(F.desc("n"), F.col("token"))
    ranked = (
        counts.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= NUCLEUS_TOP)
    )
    wc = (
        Window.partitionBy("lang")
        .orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = ranked.withColumn(
        "cum_mass", F.sum(F.col("n").cast("decimal(38,0)")).over(wc)
    )
    hit = (
        cum.join(F.broadcast(totals), "lang")
        .filter(
            F.expr(
                f"cum_mass * 1000000 >= CAST({NUCLEUS_PPM} AS DECIMAL(38,0))"
                " * total_mass"
            )
        )
        .groupBy("lang")
        .agg(
            F.min("rnk").cast("long").alias("nucleus_k"),
            F.min(
                F.struct(F.col("rnk"), F.col("cum_mass"))
            ).getField("cum_mass").cast("long").alias("nucleus_mass"),
        )
    )
    top_mass = cum.groupBy("lang").agg(
        F.max("cum_mass").cast("long").alias("top_mass"),
        F.count(F.lit(1)).alias("n_ranked"),
    )
    return (
        totals.join(F.broadcast(top_mass), "lang", "left")
        .join(F.broadcast(hit), "lang", "left")
        .select(
            "lang",
            "total_mass",
            "n_ranked",
            "top_mass",
            "nucleus_k",
            "nucleus_mass",
            F.expr(
                "CAST(CAST(nucleus_mass AS DECIMAL(38,0)) * 1000000"
                " DIV total_mass AS BIGINT)"
            ).alias("nucleus_mass_ppm"),
        )
        .orderBy("lang")
    )


QUERIES_ENGINE5C["doc_language_purity"] = doc_language_purity
QUERIES_ENGINE5C["seasonal_naive_backtest"] = seasonal_naive_backtest
QUERIES_ENGINE5C["vocab_nucleus_topp"] = vocab_nucleus_topp


def _chunk_marker_cnt(lang: str, expr: str) -> str:
    parts = [
        f"len(regexp_extract_all(COALESCE({expr}, ''), '\\b{w}\\b'))"
        for w in TS.LANG_MARKERS[lang]
    ]
    return "(" + " + ".join(parts) + ")"


def _vote_majority_case(prefix: str) -> str:
    clauses = []
    langs = TS.LANG_PRIORITY
    for lang in langs[:-1]:
        others = [f"{prefix}{o}" for o in langs if o != lang]
        cond = " AND ".join(f"{prefix}{lang} >= {o}" for o in others)
        clauses.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + f" ELSE '{langs[-1]}' END"


_PURITY_GREATEST = "greatest(" + ", ".join(
    f"votes_{lang}" for lang in TS.LANG_PRIORITY
) + ")"

ORACLES_ENGINE5C["doc_language_purity"] = f"""
WITH ch AS (
  SELECT doc_id, substr(text, s, {LDC_CHUNK}) AS chunk
  FROM documents,
    unnest(generate_series(1, greatest(length(text), 1), {LDC_CHUNK})) AS t(s)
  WHERE text IS NOT NULL
),
counted AS (
  SELECT doc_id,
    {", ".join(f"{_chunk_marker_cnt(lang, 'chunk')} AS cnt_{lang}" for lang in TS.LANG_PRIORITY)}
  FROM ch
),
pred AS (
  SELECT doc_id, {_vote_majority_case("cnt_")} AS pred FROM counted
),
votes AS (
  SELECT doc_id, count(*) AS n_chunks,
    {", ".join(f"CAST(sum(CASE WHEN pred = '{lang}' THEN 1 ELSE 0 END) AS BIGINT) AS votes_{lang}" for lang in TS.LANG_PRIORITY)}
  FROM pred GROUP BY doc_id
)
SELECT doc_id, n_chunks,
  {", ".join(f"votes_{lang}" for lang in TS.LANG_PRIORITY)},
  {_vote_majority_case("votes_")} AS majority_lang,
  CAST(CAST({_PURITY_GREATEST} AS HUGEINT) * 1000000 // n_chunks AS BIGINT)
    AS purity_ppm,
  ({_PURITY_GREATEST} * 1000000 < {PURITY_MIXED_PPM} * n_chunks) AS is_mixed
FROM votes ORDER BY doc_id
"""

ORACLES_ENGINE5C["seasonal_naive_backtest"] = f"""
WITH daily AS (
  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS rev_cents
  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2
),
scored AS (
  SELECT a.priority, a.rev_cents AS actual, p.rev_cents AS pred
  FROM daily a JOIN daily p
    ON a.priority = p.priority AND p.day + {SNB_LAG_DAYS} = a.day
)
SELECT priority, count(*) AS n_scored,
  CAST(sum(abs(actual - pred)) AS BIGINT) AS sum_abs_err_cents,
  CAST(sum(actual - pred) AS BIGINT) AS sum_err_cents,
  CAST(CAST(sum(abs(actual - pred)) AS HUGEINT) * 1000 // count(*) AS BIGINT)
    AS mae_millicents
FROM scored GROUP BY priority ORDER BY priority
"""

from youtube_etl_automated_pipeline_spark.ext.textstats import (  # noqa: E402
    WS_CHARS as _WS_CHARS,
)

ORACLES_ENGINE5C["vocab_nucleus_topp"] = f"""
WITH toked AS (
  SELECT lang,
    unnest(CASE WHEN trim(text) = '' THEN []
                ELSE string_split_regex(trim(text), '[{_WS_CHARS}]+') END)
      AS token
  FROM documents WHERE text IS NOT NULL
),
counts AS (SELECT lang, token, count(*) AS n FROM toked GROUP BY 1, 2),
totals AS (SELECT lang, CAST(count(*) AS BIGINT) AS total_mass
           FROM toked GROUP BY lang),
ranked AS (
  SELECT lang, token, n,
    row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rnk
  FROM counts QUALIFY rnk <= {NUCLEUS_TOP}
),
cum AS (
  SELECT lang, rnk, sum(CAST(n AS HUGEINT)) OVER (
    PARTITION BY lang ORDER BY rnk
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_mass
  FROM ranked
),
hit AS (
  SELECT c.lang,
    CAST(min(rnk) AS BIGINT) AS nucleus_k,
    CAST(min_by(cum_mass, rnk) AS BIGINT) AS nucleus_mass
  FROM cum c JOIN totals t USING (lang)
  WHERE cum_mass * 1000000 >= {NUCLEUS_PPM} * CAST(total_mass AS HUGEINT)
  GROUP BY c.lang
),
top_mass AS (
  SELECT lang, CAST(max(cum_mass) AS BIGINT) AS top_mass,
    count(*) AS n_ranked
  FROM cum GROUP BY lang
)
SELECT t.lang, total_mass, n_ranked, top_mass, nucleus_k, nucleus_mass,
  CAST(CAST(nucleus_mass AS HUGEINT) * 1000000 // total_mass AS BIGINT)
    AS nucleus_mass_ppm
FROM totals t
LEFT JOIN top_mass USING (lang)
LEFT JOIN hit USING (lang)
ORDER BY t.lang
"""


# --- round-5 batch 4 -------------------------------------------------
MAXSIM_N_Q = 4  # multi-vector query: vec_ids [0, 4) form one "query doc"
SALIENT_TOP = 3  # chunks kept per document


def retrieval_maxsim_multivector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction multi-vector retrieval (the ColBERT MaxSim
    scoring rule, Khattab & Zaharia SIGIR 2020): the query is a SET
    of vectors (vec_id < MAXSIM_N_Q), each corpus document is the SET
    of vectors sharing a label, and

        score(doc) = sum_q max_{v in doc} cos(q, v)

    — each query vector matches its best doc vector independently,
    which is what makes multi-vector beat single-vector retrieval on
    multi-topic documents.

    Scale shape: ONE corpus scan against the broadcast 4-vector query
    batch (bounded BNL, same contract as bitext/hard-negative), then
    two hash aggregations: per-(label, q) max, per-label sum. The
    corpus never self-joins and never shuffles wider than
    (label, q, micro) rows.

    Exactness: cosines collapse to integer micro-units before the max
    and the sum, so scores are bit-identical cross-engine.
    """
    from youtube_etl_automated_pipeline_spark.ext.similarity import (
        dot_unrolled_sql,
        embedding_dim,
        unit,
    )

    emb = load_wide(spark, sf_dir, "embeddings")
    dim = embedding_dim(emb)
    q = emb.filter(F.col("vec_id") < MAXSIM_N_Q).select(
        F.col("vec_id").alias("q_id"), unit(F.col("embedding")).alias("q_u")
    )
    corpus = emb.filter(
        (F.col("vec_id") >= MAXSIM_N_Q) & F.col("label").isNotNull()
    ).select("label", unit(F.col("embedding")).alias("c_u"))
    micro = F.floor(
        F.expr(dot_unrolled_sql("q_u", "c_u", dim)) * 1e6 + F.lit(0.5)
    ).cast("long")
    per_q_best = (
        corpus.crossJoin(F.broadcast(q))
        .select("label", "q_id", micro.alias("micro"))
        .groupBy("label", "q_id")
        .agg(F.max("micro").alias("best_micro"))
    )
    sizes = corpus.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    return (
        per_q_best.groupBy("label")
        .agg(F.sum("best_micro").alias("maxsim_score_micro"))
        .join(F.broadcast(sizes), "label")
        .select("label", "n_vecs", "maxsim_score_micro")
        .orderBy(F.desc("maxsim_score_micro"), "label")
    )


def text_salient_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extractive salience: the SALIENT_TOP most informative 80-char
    chunks per document, scored by summed inverse document frequency
    (weight(token) = 1e6 // df, exact integer — the rare-token mass
    tfidf_top_terms uses, aggregated to chunk granularity). The
    summarization primitive for snippet selection and dedup-aware
    previews.

    Scale shape: corpus df is one distinct (doc, token) projection +
    token agg; chunk tokens explode map-side and meet the df relation
    in a token-keyed equi-join (hot tokens fan out to their chunk
    occurrences only); per-chunk rollup, then the per-doc top-3 via a
    rank window pruned by WindowGroupLimit — bounded per doc, never a
    global sort.
    """
    from youtube_etl_automated_pipeline_spark.ext.textstats import tokens

    docs = load_wide(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    df_rel = (
        docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("token")
        )
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .select("token", (F.lit(1_000_000).cast("long") / F.col("df"))
                .cast("long").alias("w"))
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(LDC_CHUNK)
    )
    chunk = F.col("text").substr(F.col("chunk_start"), F.lit(LDC_CHUNK))
    chunk_toks = docs.select(
        "doc_id", "text", F.posexplode(starts).alias("idx", "chunk_start")
    ).select(
        "doc_id",
        F.col("idx").cast("long").alias("chunk_idx"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.explode(tokens(chunk)).alias("token"),
    )
    scored = (
        chunk_toks.join(df_rel, "token")
        .groupBy("doc_id", "chunk_idx", "chunk_start")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w").alias("salience"),
        )
    )
    wr = Window.partitionBy("doc_id").orderBy(
        F.desc("salience"), F.col("chunk_idx")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= SALIENT_TOP)
        .select(
            "doc_id",
            F.col("rnk").cast("long").alias("rnk"),
            "chunk_idx",
            "chunk_start",
            "n_tokens",
            "salience",
        )
        .orderBy("doc_id", "rnk")
    )


QUERIES_ENGINE5C["retrieval_maxsim_multivector"] = retrieval_maxsim_multivector
QUERIES_ENGINE5C["text_salient_chunks"] = text_salient_chunks


def _sql_norm_elem5c(arr: str) -> str:
    return (
        f"sqrt(list_sum(list_transform(generate_series(1, len({arr})),"
        f" k -> CAST({arr}[k] AS DOUBLE) * CAST({arr}[k] AS DOUBLE))))"
    )


def _sql_micro_unit_dot5c(a: str, b: str) -> str:
    na, nb = _sql_norm_elem5c(a), _sql_norm_elem5c(b)
    dot = (
        f"list_sum(list_transform(generate_series(1, len({a})),"
        f" k -> (CAST({a}[k] AS DOUBLE) / {na}) * (CAST({b}[k] AS DOUBLE) / {nb})))"
    )
    raw = f"CASE WHEN {na} > 0 AND {nb} > 0 THEN {dot} ELSE 0 END"
    return f"CAST(floor(({raw}) * 1000000.0 + 0.5) AS BIGINT)"


ORACLES_ENGINE5C["retrieval_maxsim_multivector"] = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
  WHERE vec_id < {MAXSIM_N_Q}
),
corpus AS (
  SELECT label, embedding AS c_emb FROM embeddings
  WHERE vec_id >= {MAXSIM_N_Q} AND label IS NOT NULL
),
best AS (
  SELECT label, q_id,
    max({_sql_micro_unit_dot5c("q_emb", "c_emb")}) AS best_micro
  FROM corpus CROSS JOIN q
  GROUP BY label, q_id
),
sizes AS (SELECT label, count(*) AS n_vecs FROM corpus GROUP BY label)
SELECT label, n_vecs,
  CAST(sum(best_micro) AS BIGINT) AS maxsim_score_micro
FROM best JOIN sizes USING (label)
GROUP BY label, n_vecs
ORDER BY maxsim_score_micro DESC, label
"""

ORACLES_ENGINE5C["text_salient_chunks"] = f"""
WITH toked AS (
  SELECT DISTINCT doc_id,
    unnest(CASE WHEN trim(text) = '' THEN []
                ELSE string_split_regex(trim(text), '[{_WS_CHARS}]+') END)
      AS token
  FROM documents WHERE text IS NOT NULL
),
dfr AS (
  SELECT token, CAST(1000000 // count(*) AS BIGINT) AS w
  FROM toked GROUP BY token
),
ch AS (
  SELECT doc_id,
    CAST((s - 1) // {LDC_CHUNK} AS BIGINT) AS chunk_idx,
    CAST(s AS BIGINT) AS chunk_start,
    substr(text, s, {LDC_CHUNK}) AS chunk
  FROM documents,
    unnest(generate_series(1, greatest(length(text), 1), {LDC_CHUNK})) AS t(s)
  WHERE text IS NOT NULL
),
ctok AS (
  SELECT doc_id, chunk_idx, chunk_start,
    unnest(CASE WHEN trim(chunk) = '' THEN []
                ELSE string_split_regex(trim(chunk), '[{_WS_CHARS}]+') END)
      AS token
  FROM ch
),
scored AS (
  SELECT doc_id, chunk_idx, chunk_start,
    count(*) AS n_tokens,
    CAST(sum(w) AS BIGINT) AS salience
  FROM ctok JOIN dfr USING (token)
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY salience DESC, chunk_idx) AS rnk
  FROM scored QUALIFY rnk <= {SALIENT_TOP}
)
SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, chunk_idx, chunk_start,
  n_tokens, salience
FROM ranked ORDER BY doc_id, rnk
"""


# --- round-5 batch 5 -------------------------------------------------
AR_MIN_SUPPORT = 5  # min co-basket count for a rule
AR_TOP = 50  # rules kept (by lift, deterministic tiebreak)
OUTLIER_TOP = 5  # outliers reported per label


def association_rules_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets (basket = order,
    item = part): for every directed rule A -> B with co-basket
    support >= AR_MIN_SUPPORT, confidence = P(B|A) and lift =
    P(A,B)/(P(A)P(B)) in exact ppm; top-AR_TOP rules by lift. The
    market-basket step AFTER pair counting (copurchase_supplier_pairs)
    — rules rank by conditional strength, not raw co-occurrence.

    Scale shape: one shuffle builds per-order distinct item sets,
    pairs expand JVM-side (C(basket,2), basket bounded by order line
    count), one shuffle counts pairs; item supports are one agg
    broadcast back (catalog-bounded). Directed rules double the pair
    rows AFTER aggregation — 2 x pair-census, never 2 x corpus. Lift
    multiplies through decimal(38,0) (pair_n·N·1e6 wraps bigint at
    fleet scale); TakeOrderedAndProject finishes.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    n_baskets = baskets.select(
        F.count(F.lit(1)).alias("n_baskets")
    )
    from youtube_etl_automated_pipeline_spark.operators.cache_registry import (
        memo_persist,
    )

    # catalog-bounded, consumed by TWO broadcast builds (antecedent
    # and consequent sides) — each re-ran the distinct+count scan (r08)
    item_n = memo_persist(
        spark,
        ("ar_item_n", sf_dir),
        lambda: li.distinct()
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("item_n")),
    )
    # chained Generate instead of nested higher-order transforms: the
    # HOF fan-out is CodegenFallback (interpreted per element); the
    # posexplode + tail-slice explode emits the identical (a, b)
    # pairs inside whole-stage codegen (r08, guide section 4.1)
    pairs = (
        baskets.select(
            F.posexplode("parts").alias("i", "a"), "parts"
        )
        .select(
            "a",
            F.explode(
                F.expr("slice(parts, i + 2, size(parts))")
            ).alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= AR_MIN_SUPPORT)
    )
    # support-filtered pair census, consumed by BOTH direction arms —
    # unpersisted, the basket pair-expansion ran twice (r08)
    pairs_df = pairs
    pairs = memo_persist(
        spark, ("ar_pairs", sf_dir), lambda: pairs_df
    )
    directed = pairs.select("a", "b", "pair_n").unionAll(
        pairs.select(
            F.col("b").alias("a"), F.col("a").alias("b"), "pair_n"
        )
    )
    return (
        directed.join(
            F.broadcast(item_n.withColumnRenamed("l_partkey", "a")
                        .withColumnRenamed("item_n", "n_a")),
            "a",
        )
        .join(
            F.broadcast(item_n.withColumnRenamed("l_partkey", "b")
                        .withColumnRenamed("item_n", "n_b")),
            "b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            F.col("a").alias("antecedent"),
            F.col("b").alias("consequent"),
            F.col("pair_n").alias("support"),
            F.expr(
                "CAST(CAST(pair_n AS DECIMAL(38,0)) * 1000000"
                " DIV n_a AS BIGINT)"
            ).alias("confidence_ppm"),
            F.expr(
                "CAST(CAST(pair_n AS DECIMAL(38,0)) * n_baskets * 1000000"
                " DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(
            F.desc("lift_ppm"), "antecedent", "consequent"
        )
        .limit(AR_TOP)
    )


def embedding_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-error detection: the OUTLIER_TOP vectors farthest from
    their own label's centroid — the curation signal for mislabeled
    or contaminated examples (Northcutt et al.'s confident-learning
    intuition reduced to its geometric core).

    Exactness: embeddings quantize to integer micro-units m_d; the
    centroid never materializes as a float — squared distance to the
    mean clears the division, per dim: (n·m_d − s_d)² summed over
    dims, on decimal(38,0). Ranking happens on that exact integer;
    the reported mean-squared deviation divides once (DIV n²).

    Scale shape: per-label dim sums are one posexplode + hash agg
    collapsed to |labels| rows (s array rebuilt in dim order), then
    broadcast back onto ONE corpus scan — the distance is a 64-term
    unrolled expression, no per-dim shuffle, no self-join. Top-5 per
    label via WindowGroupLimit.
    """
    from youtube_etl_automated_pipeline_spark.ext.similarity import (
        embedding_dim,
    )

    emb = load_wide(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull()
    )
    dim = embedding_dim(emb)
    micro = emb.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1e6 + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("m"),
    )
    sums = (
        micro.select(
            "label", F.posexplode("m").alias("d", "md")
        )
        .groupBy("label", "d")
        .agg(F.sum(F.col("md").cast("decimal(38,0)")).alias("sd"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("d"), F.col("sd")))
                ),
                lambda st: st.getField("sd"),
            ).alias("s"),
        )
    )
    counts = micro.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    term = " + ".join(
        f"(CAST(n AS DECIMAL(38,0)) * element_at(m, {i}) -"
        f" element_at(s, {i})) * (CAST(n AS DECIMAL(38,0)) *"
        f" element_at(m, {i}) - element_at(s, {i}))"
        for i in range(1, dim + 1)
    )
    scored = (
        micro.join(F.broadcast(sums), "label")
        .join(F.broadcast(counts), "label")
        .select(
            "label",
            "vec_id",
            "n",
            F.expr(f"CAST(({term}) AS DECIMAL(38,0))").alias("dist2"),
        )
    )
    wr = Window.partitionBy("label").orderBy(
        F.desc("dist2"), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= OUTLIER_TOP)
        .select(
            "label",
            F.col("rnk").cast("long").alias("rnk"),
            "vec_id",
            "n",
            F.expr("CAST(dist2 DIV (CAST(n AS DECIMAL(38,0)) * n)"
                   " AS BIGINT)").alias("msd_micro2"),
        )
        .orderBy("label", "rnk")
    )


QUERIES_ENGINE5C["association_rules_parts"] = association_rules_parts
QUERIES_ENGINE5C["embedding_label_outliers"] = embedding_label_outliers

ORACLES_ENGINE5C["association_rules_parts"] = f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
nb AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM lineitem),
item_n AS (SELECT l_partkey, count(*) AS item_n FROM items GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b, count(*) AS pair_n
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {AR_MIN_SUPPORT}
),
directed AS (
  SELECT a, b, pair_n FROM pairs
  UNION ALL
  SELECT b AS a, a AS b, pair_n FROM pairs
)
SELECT d.a AS antecedent, d.b AS consequent, d.pair_n AS support,
  CAST(CAST(d.pair_n AS HUGEINT) * 1000000 // na.item_n AS BIGINT)
    AS confidence_ppm,
  CAST(CAST(d.pair_n AS HUGEINT) * n_baskets * 1000000
       // (CAST(na.item_n AS HUGEINT) * nb2.item_n) AS BIGINT)
    AS lift_ppm
FROM directed d
JOIN item_n na ON na.l_partkey = d.a
JOIN item_n nb2 ON nb2.l_partkey = d.b
CROSS JOIN nb
ORDER BY lift_ppm DESC, antecedent, consequent
LIMIT {AR_TOP}
"""

ORACLES_ENGINE5C["embedding_label_outliers"] = f"""
WITH micro AS (
  SELECT vec_id, label,
    list_transform(embedding,
      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS m
  FROM embeddings WHERE label IS NOT NULL
),
dims AS (
  SELECT label, d, sum(CAST(m[d] AS HUGEINT)) AS sd
  FROM micro, unnest(generate_series(1, len(m))) AS t(d)
  GROUP BY 1, 2
),
counts AS (SELECT label, count(*) AS n FROM micro GROUP BY label),
scored AS (
  SELECT mi.label, mi.vec_id, c.n,
    sum((CAST(c.n AS HUGEINT) * mi.m[dd.d] - dd.sd)
      * (CAST(c.n AS HUGEINT) * mi.m[dd.d] - dd.sd)) AS dist2
  FROM micro mi
  JOIN counts c ON c.label = mi.label
  JOIN dims dd ON dd.label = mi.label
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY label ORDER BY dist2 DESC, vec_id) AS rnk
  FROM scored QUALIFY rnk <= {OUTLIER_TOP}
)
SELECT label, CAST(rnk AS BIGINT) AS rnk, vec_id, n,
  CAST(dist2 // (CAST(n AS HUGEINT) * n) AS BIGINT) AS msd_micro2
FROM ranked ORDER BY label, rnk
"""


# --- round-5 batch 6 -------------------------------------------------
MAU_WINDOW_DAYS = 7  # trailing activity window (inclusive of the day)
IVU_WIDTH_MOD = 14  # interval width = l_orderkey % 14 days (engine5's derivation)


def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trailing-7-day active users per day (the WAU/MAU rollup)
    — the sliding COUNT DISTINCT that resists window functions,
    re-expressed as a linear explode: each (user, active day)
    contributes to the MAU_WINDOW_DAYS target days it keeps the user
    'active' for, then one distinct + one count per target day.
    Reported for every day that itself has activity.

    Scale shape: distinct (user, day) first (dedupe within day), a
    7x map-side fan-out, distinct (user, target), and a two-level
    count agg — every stage linear and hash-keyed; no window, no
    self-join, no approximate sketch. The day restriction is a
    semi-join against the observed-day set (equi, broadcast-able).
    """
    ev = load_wide(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    active = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    days = active.select("day").distinct()
    targets = (
        active.select(
            "user_id",
            F.explode(
                F.expr(
                    f"sequence(day, date_add(day, {MAU_WINDOW_DAYS - 1}),"
                    " interval 1 day)"
                )
            ).alias("day"),
        )
        .join(days, "day", "left_semi")
        .distinct()
    )
    dau = active.groupBy("day").agg(
        F.count(F.lit(1)).alias("dau")
    )
    mau = targets.groupBy("day").agg(
        F.count(F.lit(1)).alias("active_7d")
    )
    return (
        dau.join(mau, "day")
        .select("day", "dau", "active_7d")
        .orderBy("day")
    )


def interval_union_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier interval-algebra rollup: merge OVERLAPPING service
    intervals (gaps-and-islands) and report the union length — the
    'how much wall-clock was actually covered' number a naive
    sum-of-durations double-counts. Intervals derive exactly as in
    interval_overlap_join: [shipdate, shipdate + orderkey % 14 days].

    Scale shape: two windows, both PARTITIONED BY supplier (running
    max of interval ends → island flag → island id via prefix sum),
    then two hash rollups (per island, per supplier). Linear per
    partition, no self-join — the standard sweep-line merge.

    Exactness: all day arithmetic is integer; the coverage ratio is a
    ppm DIV. Window order (start, end, orderkey, linenumber) is a
    total order, so the prefix sums agree cross-engine.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").isNotNull()
    )
    iv = li.select(
        F.col("l_suppkey").alias("supp"),
        F.to_date("l_shipdate").alias("ivl_start"),
        F.date_add(
            F.to_date("l_shipdate"),
            (F.col("l_orderkey") % IVU_WIDTH_MOD).cast("int"),
        ).alias("ivl_end"),
        "l_orderkey",
        "l_linenumber",
    )
    order_cols = [
        F.col("ivl_start"),
        F.col("ivl_end"),
        F.col("l_orderkey"),
        F.col("l_linenumber"),
    ]
    w_prev = (
        Window.partitionBy("supp")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("supp")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(
            F.col("ivl_start") > F.coalesce(
                F.max("ivl_end").over(w_prev), F.lit("0001-01-01").cast("date")
            ),
            1,
        ).otherwise(0),
    ).withColumn("island", F.sum("new_island").over(w_run))
    islands = flagged.groupBy("supp", "island").agg(
        (
            F.datediff(F.max("ivl_end"), F.min("ivl_start")) + 1
        ).alias("island_days"),
        F.count(F.lit(1)).alias("n_intervals"),
        F.min("ivl_start").alias("i_start"),
        F.max("ivl_end").alias("i_end"),
    )
    return (
        islands.groupBy("supp")
        .agg(
            F.sum("n_intervals").alias("n_intervals"),
            F.count(F.lit(1)).alias("n_islands"),
            F.sum("island_days").cast("long").alias("covered_days"),
            (
                F.datediff(F.max("i_end"), F.min("i_start")) + 1
            ).cast("long").alias("span_days"),
        )
        .select(
            "supp",
            "n_intervals",
            "n_islands",
            "covered_days",
            "span_days",
            F.expr(
                "CAST(CAST(covered_days AS DECIMAL(38,0)) * 1000000"
                " DIV span_days AS BIGINT)"
            ).alias("coverage_ppm"),
        )
        .orderBy("supp")
    )


QUERIES_ENGINE5C["rolling_active_users"] = rolling_active_users
QUERIES_ENGINE5C["interval_union_length"] = interval_union_length

ORACLES_ENGINE5C["rolling_active_users"] = f"""
WITH active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events WHERE ts IS NOT NULL
),
days AS (SELECT DISTINCT day FROM active),
targets AS (
  SELECT DISTINCT user_id, t.day
  FROM active,
    unnest(generate_series(day, day + {MAU_WINDOW_DAYS - 1},
                           INTERVAL 1 DAY)) AS g(d),
    LATERAL (SELECT CAST(g.d AS DATE) AS day) t
  WHERE t.day IN (SELECT day FROM days)
),
dau AS (SELECT day, count(*) AS dau FROM active GROUP BY day),
mau AS (SELECT day, count(*) AS active_7d FROM targets GROUP BY day)
SELECT day, dau, active_7d
FROM dau JOIN mau USING (day)
ORDER BY day
"""

ORACLES_ENGINE5C["interval_union_length"] = f"""
WITH iv AS (
  SELECT l_suppkey AS supp,
    CAST(l_shipdate AS DATE) AS ivl_start,
    CAST(l_shipdate AS DATE)
      + CAST(l_orderkey % {IVU_WIDTH_MOD} AS INT) AS ivl_end,
    l_orderkey, l_linenumber
  FROM lineitem WHERE l_shipdate IS NOT NULL
),
flagged AS (
  SELECT *,
    CASE WHEN ivl_start > coalesce(
      max(ivl_end) OVER (PARTITION BY supp
        ORDER BY ivl_start, ivl_end, l_orderkey, l_linenumber
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      DATE '0001-01-01') THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islanded AS (
  SELECT *,
    sum(new_island) OVER (PARTITION BY supp
      ORDER BY ivl_start, ivl_end, l_orderkey, l_linenumber
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
),
islands AS (
  SELECT supp, island,
    date_diff('day', min(ivl_start), max(ivl_end)) + 1 AS island_days,
    count(*) AS n_intervals,
    min(ivl_start) AS i_start, max(ivl_end) AS i_end
  FROM islanded GROUP BY 1, 2
)
SELECT supp,
  CAST(sum(n_intervals) AS BIGINT) AS n_intervals,
  count(*) AS n_islands,
  CAST(sum(island_days) AS BIGINT) AS covered_days,
  CAST(date_diff('day', min(i_start), max(i_end)) + 1 AS BIGINT)
    AS span_days,
  CAST(CAST(sum(island_days) AS HUGEINT) * 1000000
       // (date_diff('day', min(i_start), max(i_end)) + 1) AS BIGINT)
    AS coverage_ppm
FROM islands GROUP BY supp ORDER BY supp
"""


# --- round-5 batch 7 -------------------------------------------------
ABSENCE_WINDOW_SECONDS = 86_400  # purchase must follow the view within 1 day
NGRAM_K = 3  # polymorphic UDTF: schema derives from this scalar argument


def cep_absence_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative CEP pattern: views with NO purchase by the same user
    within the next day — the absence/timeout branch of the
    view->click->purchase chain pattern_match_funnel matches
    positively. Per user: views, abandoned views, abandonment ppm.

    Scale shape: Catalyst extracts the user equality as the join key
    of a LEFT join (the time band stays a post-filter), the
    unmatched-view census is one hash rollup — the relational
    MATCH_RECOGNIZE absence pattern with per-key fan-out bounded by
    events-per-user-per-day, never a nested loop.
    """
    ev = load_wide(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        us.alias("v_us"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        us.alias("p_us"),
    )
    matched = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_us") > F.col("v_us"))
        & (F.col("p_us") <= F.col("v_us") + ABSENCE_WINDOW_SECONDS * 1_000_000),
        "left",
    )
    per_view = matched.groupBy("v_user", "view_id").agg(
        F.max(F.when(F.col("p_us").isNotNull(), 1).otherwise(0)).alias(
            "converted"
        )
    )
    return (
        per_view.groupBy(F.col("v_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_views"),
            F.sum(
                F.when(F.col("converted") == 0, 1).otherwise(0)
            ).alias("n_abandoned"),
        )
        .select(
            "user_id",
            "n_views",
            "n_abandoned",
            F.expr(
                "CAST(CAST(n_abandoned AS DECIMAL(38,0)) * 1000000"
                " DIV n_views AS BIGINT)"
            ).alias("abandon_ppm"),
        )
        .orderBy("user_id")
    )


def udtf_dynamic_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 analyze-time schema): the
    output columns g1..gk derive from the scalar n-gram width argument
    at ANALYSIS time via the static ``analyze`` hook — the
    table-function flavor whose schema is computed, not declared
    (udtf_doc_bigrams gates the static-schema flavor). Tokenization
    pins the repo-wide WS_CLASS / space-only-strip contract.

    Scale: scan-shaped Arrow flat map, fan-out bounded by document
    length; the doc_id bound sits in the lateral subquery because
    Catalyst cannot push predicates below a UDTF.
    """
    import re

    from pyspark.sql.functions import udtf
    from pyspark.sql.types import IntegerType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    ws_re = re.compile(TS.WS_CLASS + "+")

    @udtf(useArrow=True)
    class DynNgrams:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            assert k.value is not None and k.isConstantExpression
            schema = StructType().add("pos", IntegerType())
            for i in range(int(k.value)):
                schema = schema.add(f"g{i + 1}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, k: int):
            t = (text or "").strip(" ")
            if not t:
                return
            toks = ws_re.split(t)
            for i in range(len(toks) - k + 1):
                yield (i, *toks[i : i + k])

    spark.udtf.register("dyn_ngrams", DynNgrams)
    from youtube_etl_automated_pipeline_spark.plans.queries_engine4 import (
        register_views,
    )

    register_views(spark, sf_dir, tables=("documents",))
    return spark.sql(
        f"""
        SELECT d.doc_id, g.pos, {", ".join(f"g.g{i + 1}" for i in range(NGRAM_K))}
        FROM (SELECT doc_id, text FROM documents WHERE doc_id < 30) d,
             LATERAL dyn_ngrams(d.text, {NGRAM_K}) g
        """
    )


QUERIES_ENGINE5C["cep_absence_detection"] = cep_absence_detection
QUERIES_ENGINE5C["udtf_dynamic_ngrams"] = udtf_dynamic_ngrams

ORACLES_ENGINE5C["cep_absence_detection"] = f"""
WITH ev AS (
  SELECT user_id, event_id, event_type,
    CAST(epoch_us(date_trunc('microseconds', ts)) AS BIGINT) AS us
  FROM events WHERE ts IS NOT NULL
),
views AS (
  SELECT user_id AS v_user, event_id AS view_id, us AS v_us
  FROM ev WHERE event_type = 'view'
),
purchases AS (
  SELECT user_id AS p_user, us AS p_us FROM ev
  WHERE event_type = 'purchase'
),
per_view AS (
  SELECT v_user, view_id,
    max(CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END) AS converted
  FROM views LEFT JOIN purchases
    ON v_user = p_user AND p_us > v_us
   AND p_us <= v_us + CAST({ABSENCE_WINDOW_SECONDS} AS BIGINT) * 1000000
  GROUP BY 1, 2
)
SELECT v_user AS user_id,
  count(*) AS n_views,
  CAST(sum(CASE WHEN converted = 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_abandoned,
  CAST(CAST(sum(CASE WHEN converted = 0 THEN 1 ELSE 0 END) AS HUGEINT)
       * 1000000 // count(*) AS BIGINT) AS abandon_ppm
FROM per_view GROUP BY v_user ORDER BY user_id
"""

_NG_TOKS = f"string_split_regex(trim(text), '[{_WS_CHARS}]+')"

ORACLES_ENGINE5C["udtf_dynamic_ngrams"] = f"""
WITH toked AS (
  SELECT doc_id, {_NG_TOKS} AS tk
  FROM documents
  WHERE doc_id < 30 AND text IS NOT NULL AND trim(text) != ''
)
SELECT doc_id, CAST(i - 1 AS INT) AS pos,
  {", ".join(f"tk[i + {j}] AS g{j + 1}" for j in range(NGRAM_K))}
FROM toked,
  unnest(generate_series(1, len(tk) - {NGRAM_K - 1})) AS t(i)
"""
