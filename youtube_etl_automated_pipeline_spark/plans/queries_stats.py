"""Statistical / governance operator extensions (round 3, batch 2).

Families this module adds to the inventory:

- ``k_anonymity_census`` — privacy-governance profiling: equivalence-
  class census over a quasi-identifier tuple, reporting how much of
  the table violates k-anonymity (the pre-release check a data-
  governance pipeline runs before publishing a derived dataset;
  complements ``gdpr_delete_cascade``'s delete-audit).
- ``user_activity_streaks`` — gaps-and-islands run-length analysis
  (longest consecutive-day active streak per user), the canonical
  sessionless engagement metric.
- ``ab_test_ztest`` — deterministic hash-split experiment readout:
  per-arm user-level metric moments and the Welch z statistic, the
  analysis step of every A/B measurement pipeline.
- ``segment_priority_dependence`` — categorical association tests
  (chi-square, mutual information, Cramér's V) between two
  dimensions, the feature-selection / drift-detection primitive.

Everything here is exact integer arithmetic end to end (counts, day
arithmetic, fixed-point account-balance units), so the DuckDB oracles
are bit-exact with no float tolerance.

Reference parity note: the reference pipeline computes per-video
engagement rollups in pandas (reference: Python-pipeline/
dataprocessing1.py's grouped aggregations); these queries extend the
same grouped-census idiom to governance and engagement shapes the
reference's operators imply but never reach.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from youtube_etl_automated_pipeline_spark.operators.windows import bounded_window

from youtube_etl_automated_pipeline_spark.functions.compat import units
from youtube_etl_automated_pipeline_spark.sources import load_table

QUERIES_STATS: dict = {}
ORACLES_STATS: dict[str, str] = {}


# ------------------------------------------------------------------
# k-anonymity census. Quasi-identifier = (nation, market segment,
# $1000 account-balance band): the attacker-joinable attributes of
# the customer table. A row is k-anonymous iff its full QI tuple is
# shared by >= K rows; the census reports, per equivalence-class
# size, how many classes/rows sit at that size and whether that size
# violates K — the exact artifact a privacy review consumes (and the
# input to a suppress-or-generalize remediation step).

K_ANON = 5


def k_anonymity_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalence-class size census over the customer QI tuple.

    Scale shape: two hash aggregations (QI -> class size, class size
    -> census), both map-side combinable, shuffling at most one row
    per distinct QI tuple then one row per distinct class size. No
    windows, no joins — this is the cheapest possible governance scan
    and stays so at 100 TB. The balance band uses exact cent units
    (compat.units) so the bucket boundary is bit-identical to the
    oracle's.
    """
    cust = load_table(spark, sf_dir, "customer")
    kband = F.floor(units(F.col("c_acctbal"), 2) / F.lit(1e5)).alias(
        "acct_kband"
    )
    classes = cust.groupBy(
        F.col("c_nationkey"), F.col("c_mktsegment"), kband
    ).agg(F.count(F.lit(1)).alias("class_size"))
    return (
        classes.groupBy("class_size")
        .agg(F.count(F.lit(1)).alias("n_classes"))
        .select(
            "class_size",
            "n_classes",
            (F.col("class_size") * F.col("n_classes")).alias("n_rows"),
            F.when(F.col("class_size") < K_ANON, F.lit(1))
            .otherwise(F.lit(0))
            .alias("violates_k"),
        )
    )


QUERIES_STATS["k_anonymity_census"] = k_anonymity_census

ORACLES_STATS["k_anonymity_census"] = f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(CAST(floor(c_acctbal * 1e2 + 5e-1) AS BIGINT)
                    / 1e5) AS BIGINT) AS acct_kband,
         count(*) AS class_size
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT class_size,
       count(*) AS n_classes,
       class_size * count(*) AS n_rows,
       CASE WHEN class_size < {K_ANON} THEN 1 ELSE 0 END AS violates_k
FROM classes GROUP BY class_size
"""


# ------------------------------------------------------------------
# Gaps-and-islands: longest consecutive-day activity streak per user.
# island_key = day_number - row_number is constant exactly along a
# run of consecutive distinct days — the classic trick that turns
# run-length analysis into two grouped counts plus one per-user
# window, with no self-joins and no iteration.


def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of per-user longest consecutive-day streaks:
    (streak_days, n_users), n_users = users whose LONGEST streak is
    exactly that many days.

    Scale shape: dedup to (user, day) is one hash aggregation; the
    row_number window partitions BY USER (never global) and each
    user's distinct-day list is tiny relative to the table, so the
    window state fits trivially; the remaining steps are keyed
    aggregations. Everything shuffles on user_id — one exchange
    reused across the window and both per-user aggs (Spark keeps the
    hash-partitioning satisfied between them).
    """
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.select(
        "user_id",
        (
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("island"),
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_days")
    )
    longest = streaks.groupBy("user_id").agg(
        F.max("streak_days").alias("streak_days")
    )
    return longest.groupBy("streak_days").agg(
        F.count(F.lit(1)).alias("n_users")
    )


QUERIES_STATS["user_activity_streaks"] = user_activity_streaks

ORACLES_STATS["user_activity_streaks"] = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), islands AS (
  SELECT user_id,
         date_diff('day', DATE '1970-01-01', day)
           - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS island
  FROM days
), streaks AS (
  SELECT user_id, island, count(*) AS streak_days
  FROM islands GROUP BY user_id, island
), longest AS (
  SELECT user_id, max(streak_days) AS streak_days
  FROM streaks GROUP BY user_id
)
SELECT streak_days, count(*) AS n_users
FROM longest GROUP BY streak_days
"""


# ------------------------------------------------------------------
# A/B experiment readout. Arm assignment is the same md5-bucket
# pattern as train_val_test_split (content-independent, portable,
# growth-stable: a user's arm never changes as data accrues — the
# property randomSplit lacks). The per-user metric is total event
# value in exact cent units, so every group moment is an integer sum
# (order-independent) and the Welch statistic is one fixed chain of
# IEEE double ops — bit-identical across engines with no tolerance.


# The moments -> statistic tail is ONE shared SQL text (CTE suffix)
# run verbatim by both engines, so every double op executes in the
# same order on the same exact-integer inputs — bit-identical with
# no tolerance beyond the cosmetic fixed-point floors.
_AB_TAIL = """stat AS (
  SELECT arm, n,
         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
          / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1e0) AS var
  FROM {arms}
), wide AS (
  SELECT
    (SELECT n FROM stat WHERE arm = 0) AS n_a,
    (SELECT mean FROM stat WHERE arm = 0) AS mean_a,
    (SELECT var FROM stat WHERE arm = 0) AS var_a,
    (SELECT n FROM stat WHERE arm = 1) AS n_b,
    (SELECT mean FROM stat WHERE arm = 1) AS mean_b,
    (SELECT var FROM stat WHERE arm = 1) AS var_b
)
SELECT n_a, n_b,
  floor(mean_a * 1e4 + 5e-1) / 1e4 AS mean_a,
  floor(mean_b * 1e4 + 5e-1) / 1e4 AS mean_b,
  floor(var_a * 1e2 + 5e-1) / 1e2 AS var_a,
  floor(var_b * 1e2 + 5e-1) / 1e2 AS var_b,
  floor(((mean_a - mean_b) / sqrt(var_a / CAST(n_a AS DOUBLE)
    + var_b / CAST(n_b AS DOUBLE))) * 1e6 + 5e-1) / 1e6
    AS welch_z
FROM wide"""


def ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-arm Welch z-test on per-user total event value (cents).

    Output (single row): per-arm user counts, means, sample
    variances, and the Welch z statistic.

    Scale shape: one hash agg to user level (map-side combinable),
    one 2-row agg per arm; the x^2 sum rides decimal(38,0) so it
    cannot wrap at any scale (cent-totals ~1e6 squared times 1e9
    users exceeds int64), collapsed to double only inside the final
    one-row statistic (exact integer -> double, deterministic).

    Null pin: null-value events are dropped BEFORE the per-user
    rollup in both twins (same policy as ewma/gini). Otherwise a
    user whose values are all NULL gets x = NULL — counted in n by
    count(*) but contributing nothing to sx/sxx, deflating the mean
    and corrupting (sxx - sx^2/n)/(n-1). Dropping the events (not
    coalescing to 0) keeps "no signal" users out of the arm sizes
    entirely, which is the correct experimental-unit definition.
    """
    from youtube_etl_automated_pipeline_spark.ext.textstats import md5_long

    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    per_user = (
        ev.groupBy("user_id")
        .agg(F.sum(units(F.col("value"), 2)).alias("x"))
        .select(
            (md5_long(F.col("user_id").cast("string")) % 2).alias("arm"), "x"
        )
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    )
    arms.createOrReplaceTempView("_ab_arms")
    return spark.sql("WITH " + _AB_TAIL.format(arms="_ab_arms"))


QUERIES_STATS["ab_test_ztest"] = ab_test_ztest

ORACLES_STATS["ab_test_ztest"] = (
    """
WITH per_user AS (
  SELECT user_id,
         sum(CAST(floor(value * 1e2 + 5e-1) AS BIGINT)) AS x
  FROM events
  WHERE value IS NOT NULL
  GROUP BY user_id
), armed AS (
  SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
           % 2 AS arm,
         x
  FROM per_user
), arms AS (
  SELECT arm, count(*) AS n, sum(x) AS sx,
         sum(CAST(x AS HUGEINT) * x) AS sxx
  FROM armed GROUP BY arm
), """
    + _AB_TAIL.format(arms="arms")
)


# ------------------------------------------------------------------
# Categorical association: chi-square independence test, mutual
# information (nats), and Cramér's V between customer market segment
# and order priority. The distributed work is ONE joint-count
# aggregation over the orders-customer join; the statistic tail runs
# over the tiny (r x c) contingency relation via engine-shared SQL.
# Zero cells enter the chi-square through the margins cross join
# (observed 0, expected e > 0) and contribute 0 to MI by definition.

_DEP_TAIL = """m AS (
  SELECT seg, sum(n_xy) AS n_x FROM {joint} GROUP BY seg
), p AS (
  SELECT pri, sum(n_xy) AS n_y FROM {joint} GROUP BY pri
), tot AS (
  SELECT sum(n_xy) AS n FROM {joint}
), cells AS (
  SELECT m.n_x, p.n_y, tot.n, COALESCE(j.n_xy, 0) AS n_xy
  FROM m CROSS JOIN p CROSS JOIN tot
  LEFT JOIN {joint} j ON j.seg = m.seg AND j.pri = p.pri
), terms AS (
  SELECT n,
    (CAST(n_xy AS DOUBLE)
      - CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE))
    * (CAST(n_xy AS DOUBLE)
      - CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE))
    / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE))
      AS chi2_term,
    CASE WHEN n_xy > 0 THEN
      (CAST(n_xy AS DOUBLE) / CAST(n AS DOUBLE))
      * ln(CAST(n AS DOUBLE) * CAST(n_xy AS DOUBLE)
           / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)))
    ELSE 0e0 END AS mi_term
  FROM cells
), dims AS (
  SELECT count(DISTINCT seg) AS r, count(DISTINCT pri) AS c
  FROM {joint}
)
SELECT
  (SELECT max(n) FROM terms) AS n,
  dims.r AS r, dims.c AS c,
  floor(sum(chi2_term) * 1e4 + 5e-1) / 1e4 AS chi2,
  floor(sum(mi_term) * 1e6 + 5e-1) / 1e6 AS mi_nats,
  floor(sqrt(sum(chi2_term)
    / (CAST((SELECT max(n) FROM terms) AS DOUBLE)
       * CAST(least(dims.r - 1, dims.c - 1) AS DOUBLE)))
    * 1e6 + 5e-1) / 1e6 AS cramers_v
FROM terms CROSS JOIN dims
GROUP BY dims.r, dims.c"""


def segment_priority_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square / MI / Cramér's V between c_mktsegment and
    o_orderpriority.

    Scale shape: the only big work is the orders-customer equi-join
    (shuffle on custkey; AQE free to broadcast whichever side fits)
    feeding one map-side-combinable count agg down to r*c rows; the
    statistic tail is O(r*c) and engine-shared, so both engines walk
    the identical double-op chain over identical exact counts. The
    double-precision cell-term sums land well inside the 4-6dp
    fixed-point floors.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    # NULL categories are coalesced to a '<null>' sentinel BEFORE
    # the joint count (same policy as user_event_type_map): the
    # tail's cells LEFT JOIN matches on seg/pri equality, so a real
    # NULL category would never match — its n_xy would read 0 while
    # the margins and total still include it (sum of observed cells
    # != N, phantom chi2 deviation) and count(DISTINCT) would drop
    # it from r/c. The sentinel makes NULL a first-class category.
    joint = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.coalesce(F.col("c_mktsegment"), F.lit("<null>")).alias("seg"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<null>")).alias(
                "pri"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_xy"))
    )
    joint.createOrReplaceTempView("_dep_joint")
    return spark.sql("WITH " + _DEP_TAIL.format(joint="_dep_joint"))


QUERIES_STATS["segment_priority_dependence"] = segment_priority_dependence

ORACLES_STATS["segment_priority_dependence"] = (
    """
WITH joint AS (
  SELECT COALESCE(c_mktsegment, '<null>') AS seg,
         COALESCE(o_orderpriority, '<null>') AS pri,
         count(*) AS n_xy
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), """
    + _DEP_TAIL.format(joint="joint")
)


# ------------------------------------------------------------------
# Closed-form multiple linear regression (OLS via normal equations):
# per returnflag, fit price_cents ~ b0 + b1*qty + b2*disc_pct. The
# distributed pass produces nine exact integer moments per group
# (X'X and X'y entries in fixed-point units — order-independent
# sums); the 3x3 Cramer solve and R^2 run over the per-group moment
# rows through engine-shared SQL, so both engines execute the same
# IEEE chain on the same exact integers. This is the "train a linear
# model with one aggregation pass" pattern every in-warehouse ML
# layer builds on (and the closed-form sibling of the iterative
# quality_logreg_scores trainer).

_OLS_TAIL = """mm AS (
  SELECT grp, n,
         CAST(n   AS DOUBLE) AS da,
         CAST(sq  AS DOUBLE) AS db,
         CAST(sd  AS DOUBLE) AS dc,
         CAST(sqq AS DOUBLE) AS de,
         CAST(sqd AS DOUBLE) AS df,
         CAST(sdd AS DOUBLE) AS dg,
         CAST(sy  AS DOUBLE) AS y0,
         CAST(sqy AS DOUBLE) AS y1,
         CAST(sdy AS DOUBLE) AS y2,
         CAST(syy AS DOUBLE) AS yy
  FROM {moments}
), dets AS (
  SELECT grp, n, y0, y1, y2, yy, da,
         da * (de * dg - df * df) - db * (db * dg - df * dc)
           + dc * (db * df - de * dc) AS det,
         y0 * (de * dg - df * df) - db * (y1 * dg - df * y2)
           + dc * (y1 * df - de * y2) AS det0,
         da * (y1 * dg - y2 * df) - y0 * (db * dg - df * dc)
           + dc * (db * y2 - y1 * dc) AS det1,
         da * (de * y2 - df * y1) - db * (db * y2 - y1 * dc)
           + y0 * (db * df - de * dc) AS det2
  FROM mm
), fit AS (
  SELECT grp, n, y0, y1, y2, yy, da,
         det0 / det AS b0, det1 / det AS b1, det2 / det AS b2
  FROM dets
)
SELECT grp AS l_returnflag, n,
  floor(b0 * 1e2 + 5e-1) / 1e2 AS beta0_cents,
  floor(b1 * 1e4 + 5e-1) / 1e4 AS beta_qty,
  floor(b2 * 1e4 + 5e-1) / 1e4 AS beta_disc,
  floor((1e0 - (yy - b0 * y0 - b1 * y1 - b2 * y2)
         / (yy - y0 * y0 / da)) * 1e6 + 5e-1) / 1e6 AS r2
FROM fit"""


def ols_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag OLS fit of extended price (cents) on quantity
    and discount (pct units), closed form, with R^2.

    Scale shape: ONE map-side-combinable aggregation produces the
    normal-equation moments (9 integer sums per group — the classic
    single-pass sufficient-statistics trick); the solve itself is
    O(groups). sqy tops out ~1e16 per group at petabyte scale — still
    inside int64; the y^2 moment rides decimal(38,0) (its cents^2
    magnitude would wrap int64 already at ~100x this fixture).
    """
    li = load_table(spark, sf_dir, "lineitem")
    q = units(F.col("l_quantity"), 0)
    d = units(F.col("l_discount"), 2)
    y = units(F.col("l_extendedprice"), 2)
    moments = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("sq"),
        F.sum(d).alias("sd"),
        F.sum(q * q).alias("sqq"),
        F.sum(q * d).alias("sqd"),
        F.sum(d * d).alias("sdd"),
        F.sum(y).alias("sy"),
        F.sum(q * y).alias("sqy"),
        F.sum(d * y).alias("sdy"),
        F.sum(y.cast("decimal(38,0)") * y).alias("syy"),
    )
    moments.createOrReplaceTempView("_ols_moments")
    return spark.sql("WITH " + _OLS_TAIL.format(moments="_ols_moments"))


QUERIES_STATS["ols_price_model"] = ols_price_model

ORACLES_STATS["ols_price_model"] = (
    """
WITH base AS (
  SELECT l_returnflag AS grp,
         CAST(floor(l_quantity + 5e-1) AS BIGINT) AS q,
         CAST(floor(l_discount * 1e2 + 5e-1) AS BIGINT) AS d,
         CAST(floor(l_extendedprice * 1e2 + 5e-1) AS BIGINT) AS y
  FROM lineitem
), moments AS (
  SELECT grp, count(*) AS n,
         CAST(sum(q) AS BIGINT) AS sq,
         CAST(sum(d) AS BIGINT) AS sd,
         CAST(sum(q * q) AS BIGINT) AS sqq,
         CAST(sum(q * d) AS BIGINT) AS sqd,
         CAST(sum(d * d) AS BIGINT) AS sdd,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(q * y) AS BIGINT) AS sqy,
         CAST(sum(d * y) AS BIGINT) AS sdy,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM base GROUP BY grp
), """
    + _OLS_TAIL.format(moments="moments")
)


# ------------------------------------------------------------------
# Kaplan-Meier survival over customer order-activity lifetimes.
# Lifetime = weeks between a customer's first and last order; a
# customer whose last order precedes the dataset horizon by more
# than CHURN_GAP_DAYS is an observed churn event, otherwise the
# lifetime is right-censored (still active at the horizon) — the
# standard retention-analytics framing. The product-limit estimator
# runs as a cumulative windowed sum of log terms over the tiny
# (distinct lifetime weeks) relation via engine-shared SQL: both
# engines accumulate the SAME log terms in the SAME wk order, so the
# running product is deterministic (ln's ulp-level engine variance
# sits ~8 orders of magnitude inside the 6dp fixed-point floor).

CHURN_GAP_DAYS = 90

_KM_TAIL = """wk AS (
  SELECT lifetime_wk, count(*) AS n_total,
         CAST(sum(churned) AS BIGINT) AS d
  FROM {life} GROUP BY lifetime_wk
), risk AS (
  SELECT lifetime_wk, n_total, d,
         CAST(sum(n_total) OVER (PARTITION BY coalesce(lifetime_wk, 0) % 1
           ORDER BY lifetime_wk DESC NULLS LAST
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_risk
  FROM wk
), km AS (
  SELECT lifetime_wk, d, n_risk, n_total - d AS censored,
         exp(sum(CASE WHEN d > 0 THEN
               ln((CAST(n_risk AS DOUBLE) - CAST(d AS DOUBLE))
                  / CAST(n_risk AS DOUBLE))
             ELSE 0e0 END) OVER (PARTITION BY coalesce(lifetime_wk, 0) % 1
               ORDER BY lifetime_wk ASC NULLS LAST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
  FROM risk
)
SELECT lifetime_wk, d AS n_events, censored AS n_censored, n_risk,
       floor(s * 1e6 + 5e-1) / 1e6 AS survival
FROM km"""


def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of customer order lifetimes
    (weeks), churn = no order in the trailing CHURN_GAP_DAYS of the
    dataset horizon.

    Scale shape: the heavy pass is one per-customer min/max
    aggregation over orders (map-side combinable, shuffles one row
    per customer); the horizon is a 1-row broadcast cross join; the
    KM tail windows over distinct lifetime weeks — a few hundred
    rows regardless of input scale, so the single-partition
    cumulative windows there are O(weeks), never O(rows). The tail
    partitions on ``coalesce(lifetime_wk, 0) % 1`` — a constant 0
    in BOTH engines (the bounded_window idiom, spelled portably in
    the shared SQL) so the audited one-task plan reads as intent,
    not a forgotten partition spec.

    Null pin: customers whose order dates are ALL null have a NULL
    lifetime — excluded in BOTH twins (a subject with unknown
    follow-up time cannot enter a product-limit estimate). The
    shared tail additionally pins NULLS LAST on both cumulative
    windows: Spark's ASC default is NULLS FIRST while DuckDB's is
    NULLS LAST, so an unpinned ORDER BY would put a null-lifetime
    row's ln-term into every Spark running product and no DuckDB
    one — the belt to the filter's braces.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.min(F.to_date("o_orderdate")).alias("first_day"),
        F.max(F.to_date("o_orderdate")).alias("last_day"),
    )
    horizon = orders.agg(F.max(F.to_date("o_orderdate")).alias("maxd"))
    life = per_cust.crossJoin(F.broadcast(horizon)).select(
        F.floor(
            F.datediff(F.col("last_day"), F.col("first_day")) / F.lit(7e0)
        ).alias("lifetime_wk"),
        F.when(
            F.datediff(F.col("maxd"), F.col("last_day")) > CHURN_GAP_DAYS,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("churned"),
    ).where(F.col("lifetime_wk").isNotNull())
    life.createOrReplaceTempView("_km_life")
    return spark.sql("WITH " + _KM_TAIL.format(life="_km_life"))


QUERIES_STATS["survival_kaplan_meier"] = survival_kaplan_meier

ORACLES_STATS["survival_kaplan_meier"] = (
    f"""
WITH per_cust AS (
  SELECT o_custkey,
         min(CAST(o_orderdate AS DATE)) AS first_day,
         max(CAST(o_orderdate AS DATE)) AS last_day
  FROM orders GROUP BY o_custkey
), horizon AS (
  SELECT max(CAST(o_orderdate AS DATE)) AS maxd FROM orders
), life AS (
  SELECT CAST(floor(date_diff('day', first_day, last_day) / 7e0)
              AS BIGINT) AS lifetime_wk,
         CASE WHEN date_diff('day', last_day, maxd) > {CHURN_GAP_DAYS}
              THEN 1 ELSE 0 END AS churned
  FROM per_cust CROSS JOIN horizon
  WHERE first_day IS NOT NULL AND last_day IS NOT NULL
), """
    + _KM_TAIL.format(life="life")
)


# ------------------------------------------------------------------
# Multinomial Naive Bayes language classifier, trained in-engine on
# an md5-bucket train split and scored on the held-out split — the
# closed-form sibling of quality_logreg_scores (whose trainer is
# iterative GD). NB training IS a grouped count (the sufficient
# statistics are (class, term) occurrence counts), which makes it the
# canonical "train a model with one aggregation" pattern at 100 TB.
#
# Determinism: log-likelihoods are quantized to integer micro-nats
# (floor(1e6 * ln(p) + 0.5)) per (term, class) — per-document scores
# are then INTEGER sums (order-independent), and argmax ties break on
# lang ascending. ln()'s ulp-level engine variance only matters if a
# quantization boundary lands within ~1e-9 of a value — negligible
# across the vocab-x-class grid.

NB_TRAIN_PCT = 80  # md5 buckets 0-79 train, 80-99 held-out test


def naive_bayes_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix (actual_lang, pred_lang, n_docs) of a
    Laplace-smoothed multinomial NB language classifier on the
    held-out split. Docs with no tokens are out of scope (no
    features to score).

    Scale shape: training is explode + two map-side-combinable count
    aggs; the (vocab x class) likelihood grid is vocab-bounded
    (min-count-prunable at scale) and broadcast-joins against the
    test token table; scoring is one integer sum per (doc, class)
    and a per-doc top-1 window. No driver-side collection anywhere —
    the "model" never leaves the cluster.
    """
    from youtube_etl_automated_pipeline_spark.ext.textstats import (
        md5_long,
        normalized_text,
        tokens,
    )
    from youtube_etl_automated_pipeline_spark.sources import load_wide

    docs = load_wide(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    bucketed = docs.select(
        "doc_id",
        "lang",
        (md5_long(F.col("doc_id").cast("string")) % 100).alias("bucket"),
        "text",
    )

    # Split BEFORE tokenize/explode: each pass explodes only its own
    # split (train aggregates touch 80%, scoring 20%) instead of
    # exploding the full corpus and filtering after. Every aggregate
    # below collapses map-side to a vocab/class-bounded shuffle, so
    # recomputing the cheap explode per aggregate beats materializing
    # a high-cardinality per-(doc,term) intermediate.
    def split_terms(pred) -> DataFrame:
        return (
            bucketed.filter(pred)
            .select(
                "doc_id",
                "lang",
                F.explode(
                    tokens(normalized_text(F.col("text")))
                ).alias("term"),
            )
            .filter(F.col("term") != "")
        )

    train = split_terms(F.col("bucket") < NB_TRAIN_PCT)
    test = split_terms(F.col("bucket") >= NB_TRAIN_PCT)

    cnts = train.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("c_tc"))
    cls = cnts.groupBy("lang").agg(F.sum("c_tc").alias("t_c"))
    # per-class doc counts WITHOUT an explode pass: a train doc
    # contributes iff it has >= 1 non-empty token, which the array
    # itself already tells us (one doc-level tokenize instead of a
    # second tokenize+explode+distinct over the split); and since a
    # doc has exactly one lang, n_train = sum of the per-class doc
    # counts — a window over the 5-row relation, NOT another corpus
    # pass (the old distinct-count arm re-tokenized the train split
    # twice more).
    ndocs = (
        bucketed.filter(F.col("bucket") < NB_TRAIN_PCT)
        .filter(
            F.size(
                F.filter(
                    tokens(normalized_text(F.col("text"))),
                    lambda t: t != "",
                )
            )
            > 0
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs_c"))
        .withColumn(
            "n_train",
            F.sum("n_docs_c").over(bounded_window("lang")),
        )
    )
    totals = cnts.agg(F.count_distinct(F.col("term")).alias("v"))
    classes = (
        cls.join(ndocs, "lang")
        .crossJoin(F.broadcast(totals))
        .select(
            "lang",
            "t_c",
            "v",
            F.floor(
                F.lit(1e6)
                * F.log(
                    F.col("n_docs_c").cast("double")
                    / F.col("n_train").cast("double")
                )
                + F.lit(0.5)
            ).alias("prior_micro"),
            F.floor(
                F.lit(1e6)
                * F.log(
                    F.lit(1e0)
                    / (F.col("t_c") + F.col("v")).cast("double")
                )
                + F.lit(0.5)
            ).alias("default_micro"),
        )
    )
    grid = (
        cnts.select("term")
        .distinct()
        .crossJoin(classes.select("lang", "t_c", "v"))
        .join(cnts, ["lang", "term"], "left")
        .select(
            "term",
            "lang",
            F.floor(
                F.lit(1e6)
                * F.log(
                    (F.coalesce(F.col("c_tc"), F.lit(0)) + F.lit(1)).cast(
                        "double"
                    )
                    / (F.col("t_c") + F.col("v")).cast("double")
                )
                + F.lit(0.5)
            ).alias("ll_micro"),
        )
    )

    grid = grid.withColumnRenamed("lang", "cls_lang")

    tok = test.groupBy(
        F.col("doc_id"), F.col("lang").alias("actual_lang"), F.col("term")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    per_doc = tok.groupBy("doc_id", "actual_lang").agg(
        F.sum("cnt").alias("n_doc")
    )
    matched = (
        tok.join(grid, "term")
        .groupBy("doc_id", "cls_lang")
        .agg(
            F.sum(F.col("cnt") * F.col("ll_micro")).alias("s_in"),
            F.sum("cnt").alias("n_in"),
        )
    )
    scored = (
        per_doc.crossJoin(
            F.broadcast(
                classes.select(
                    F.col("lang").alias("cls_lang"),
                    "prior_micro",
                    "default_micro",
                )
            )
        )
        .join(matched, ["doc_id", "cls_lang"], "left")
        .select(
            "doc_id",
            "actual_lang",
            "cls_lang",
            (
                F.col("prior_micro")
                + F.coalesce(F.col("s_in"), F.lit(0))
                + (F.col("n_doc") - F.coalesce(F.col("n_in"), F.lit(0)))
                * F.col("default_micro")
            ).alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_micro"), F.asc("cls_lang")
    )
    pred = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "actual_lang", F.col("cls_lang").alias("pred_lang"))
    )
    return pred.groupBy("actual_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


QUERIES_STATS["naive_bayes_lang_confusion"] = naive_bayes_lang_confusion


def _nb_oracle() -> str:
    from youtube_etl_automated_pipeline_spark.ext.textstats import WS_CLASS

    norm = f"lower(regexp_replace(trim(text), '{WS_CLASS}+', ' ', 'g'))"
    return f"""
WITH docs AS (
  SELECT doc_id, lang,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
           % 100 AS bucket,
         {norm} AS norm
  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
), terms AS (
  SELECT doc_id, lang, bucket, term FROM (
    SELECT doc_id, lang, bucket,
           unnest(string_split_regex(norm, '{WS_CLASS}+')) AS term
    FROM docs
  ) WHERE term <> ''
), train AS (
  SELECT * FROM terms WHERE bucket < {NB_TRAIN_PCT}
), test AS (
  SELECT * FROM terms WHERE bucket >= {NB_TRAIN_PCT}
), cnts AS (
  SELECT lang, term, CAST(count(*) AS BIGINT) AS c_tc
  FROM train GROUP BY lang, term
), cls AS (
  SELECT lang, CAST(sum(c_tc) AS BIGINT) AS t_c FROM cnts GROUP BY lang
), ndocs AS (
  SELECT lang, count(DISTINCT doc_id) AS n_docs_c FROM train GROUP BY lang
), totals AS (
  SELECT (SELECT count(DISTINCT term) FROM cnts) AS v,
         (SELECT count(DISTINCT doc_id) FROM train) AS n_train
), classes AS (
  SELECT cls.lang, t_c, v,
    CAST(floor(1e6 * ln(CAST(n_docs_c AS DOUBLE)
      / CAST(n_train AS DOUBLE)) + 5e-1) AS BIGINT) AS prior_micro,
    CAST(floor(1e6 * ln(1e0 / CAST(t_c + v AS DOUBLE)) + 5e-1)
      AS BIGINT) AS default_micro
  FROM cls JOIN ndocs USING (lang) CROSS JOIN totals
), grid AS (
  SELECT vt.term, c.lang AS cls_lang,
    CAST(floor(1e6 * ln(CAST(COALESCE(c_tc, 0) + 1 AS DOUBLE)
      / CAST(t_c + v AS DOUBLE)) + 5e-1) AS BIGINT) AS ll_micro
  FROM (SELECT DISTINCT term FROM cnts) vt
  CROSS JOIN (SELECT lang, t_c, v FROM classes) c
  LEFT JOIN cnts ON cnts.lang = c.lang AND cnts.term = vt.term
), tok AS (
  SELECT doc_id, lang AS actual_lang, term,
         CAST(count(*) AS BIGINT) AS cnt
  FROM test GROUP BY 1, 2, 3
), per_doc AS (
  SELECT doc_id, actual_lang, CAST(sum(cnt) AS BIGINT) AS n_doc
  FROM tok GROUP BY 1, 2
), matched AS (
  SELECT doc_id, cls_lang,
         CAST(sum(cnt * ll_micro) AS BIGINT) AS s_in,
         CAST(sum(cnt) AS BIGINT) AS n_in
  FROM tok JOIN grid USING (term) GROUP BY 1, 2
), scored AS (
  SELECT per_doc.doc_id, actual_lang, c.cls_lang,
    prior_micro + COALESCE(s_in, 0)
      + (n_doc - COALESCE(n_in, 0)) * default_micro AS score_micro
  FROM per_doc
  CROSS JOIN (SELECT lang AS cls_lang, prior_micro, default_micro
              FROM classes) c
  LEFT JOIN matched ON matched.doc_id = per_doc.doc_id
                   AND matched.cls_lang = c.cls_lang
), pred AS (
  SELECT doc_id, actual_lang, cls_lang AS pred_lang FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
      ORDER BY score_micro DESC, cls_lang ASC) AS rk
    FROM scored
  ) WHERE rk = 1
)
SELECT actual_lang, pred_lang, count(*) AS n_docs
FROM pred GROUP BY 1, 2
"""


ORACLES_STATS["naive_bayes_lang_confusion"] = _nb_oracle()


# --- Wald SPRT sequential monitoring (round 5) ----------------------
# Sequential probability-ratio test on the daily urgent-order share:
# H0: p = SPRT_P0 vs H1: p = SPRT_P1, alpha = beta = 0.05. The four
# log terms are integer micro-unit constants computed ONCE here and
# inlined into BOTH engines' plans (the Benford-constants pattern), so
# no cross-engine ln() ulp can differ; everything downstream is
# integer multiply-accumulate over the bounded day relation.
import math as _math

SPRT_P0 = 0.20
SPRT_P1 = 0.25
SPRT_ALPHA = 0.05
SPRT_L1 = int(_math.floor(_math.log(SPRT_P1 / SPRT_P0) * 1e6 + 0.5))
SPRT_L0 = int(
    _math.floor(_math.log((1 - SPRT_P1) / (1 - SPRT_P0)) * 1e6 + 0.5)
)
SPRT_UPPER = int(
    _math.floor(_math.log((1 - SPRT_ALPHA) / SPRT_ALPHA) * 1e6 + 0.5)
)
SPRT_LOWER = int(
    _math.floor(_math.log(SPRT_ALPHA / (1 - SPRT_ALPHA)) * 1e6 + 0.5)
)


def sprt_sequential_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT trajectory over the daily urgent-order share: one
    row per day with the cumulative log-likelihood ratio (micro
    units) and the sequential decision — the streaming-experiment
    monitor that stops the moment evidence crosses a boundary
    instead of waiting for a fixed horizon (Wald 1945).

    Scale shape: one map-side-combinable day rollup over the fact
    scan; the cumulative LLR is a prefix sum over the CALENDAR-
    bounded day relation (bounded_window idiom spelled in shared SQL
    form); decisions are integer comparisons against inlined
    boundary constants. sf bound: day counts x 1e6-unit terms peak
    ~1e13 * 13 << 9e18 — bigint-safe at any corpus scale.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_day"),
        F.sum(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("x_day"),
    )
    cum = daily.select(
        "day",
        "n_day",
        F.col("x_day").cast("long").alias("x_day"),
        F.expr(
            "sum(x_day) OVER (PARTITION BY coalesce(n_day,0) % 1"
            " ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ).alias("cum_x"),
        F.expr(
            "sum(n_day) OVER (PARTITION BY coalesce(n_day,0) % 1"
            " ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ).alias("cum_n"),
    )
    llr = (
        F.col("cum_x") * F.lit(SPRT_L1)
        + (F.col("cum_n") - F.col("cum_x")) * F.lit(SPRT_L0)
    ).cast("long")
    return cum.select(
        "day",
        "n_day",
        "x_day",
        llr.alias("llr_micro"),
        F.when(llr >= SPRT_UPPER, F.lit("accept_h1"))
        .when(llr <= SPRT_LOWER, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    )


QUERIES_STATS["sprt_sequential_monitor"] = sprt_sequential_monitor

ORACLES_STATS["sprt_sequential_monitor"] = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         count(*) AS n_day,
         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
           AS BIGINT) AS x_day
  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
), cum AS (
  SELECT day, n_day, x_day,
         sum(x_day) OVER (PARTITION BY coalesce(n_day,0) % 1
           ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_x,
         sum(n_day) OVER (PARTITION BY coalesce(n_day,0) % 1
           ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_n
  FROM daily
)
SELECT day, CAST(n_day AS BIGINT) AS n_day, x_day,
       CAST(cum_x * {SPRT_L1} + (cum_n - cum_x) * {SPRT_L0} AS BIGINT)
         AS llr_micro,
       CASE WHEN cum_x * {SPRT_L1} + (cum_n - cum_x) * {SPRT_L0}
              >= {SPRT_UPPER} THEN 'accept_h1'
            WHEN cum_x * {SPRT_L1} + (cum_n - cum_x) * {SPRT_L0}
              <= {SPRT_LOWER} THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM cum ORDER BY day
"""
