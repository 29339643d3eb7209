"""OLAP-surface extras: exact percentiles, pivot/unpivot reshaping,
and a binned range join (interval containment without an equi key —
the operator family Spark lacks as a built-in). Oracles inline.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_automated_pipeline_spark.functions.compat import (
    hround,
    sql_hround,
    sql_xavg,
    sql_xsum,
    units,
    xavg,
    xsum,
)
from youtube_etl_automated_pipeline_spark.sources import load_table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event type (sort-based
    aggregate; for 100 TB you'd switch to percentile_approx and accept
    the sketch error — both surfaces exist, this one is the
    oracle-matchable baseline)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            hround(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            hround(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
            hround(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long -> wide: per-user event counts pivoted by event type
    (explicit value list keeps the schema deterministic — never let
    pivot infer values from data at scale: that is an extra job plus
    an unstable schema)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
        .orderBy("user_id")
    )


def unpivot_event_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long: per-type metric columns melted to (metric, value)
    rows via DataFrame.unpivot (UNION-ALL-free melt)."""
    ev = load_table(spark, sf_dir, "events")
    wide = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n_events"),
        xsum(F.col("value"), 2).alias("sum_value"),
        xavg(F.col("value"), 2, 4).alias("avg_value"),
    )
    return wide.unpivot(
        "event_type",
        ["n_events", "sum_value", "avg_value"],
        "metric",
        "value",
    ).orderBy("event_type", "metric")


def range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-containment) join WITHOUT an equi key, made
    scalable by time binning: 2-hour 'incident windows' around error
    events are exploded into hourly bins, points join on their own
    bin (equi-join!), then the exact containment predicate filters.
    Cost is O(points + intervals * bins_per_interval) shuffled on the
    bin key — never the O(points * intervals) cartesian a naive theta
    join degrades to. Per-incident rollup output.
    """
    ev = load_table(spark, sf_dir, "events")
    iv = (
        ev.filter((F.col("event_type") == "error") & (F.col("event_id") % 7 == 0))
        .select(
            F.col("event_id").alias("incident_id"),
            F.col("ts").alias("s"),
            (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("e"),
        )
    )
    bins = iv.select(
        "incident_id",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("s")),
                F.date_trunc("hour", F.col("e")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bin"),
    )
    pts = ev.filter(F.col("event_type") != "error").select(
        F.col("event_id").alias("point_id"),
        F.col("ts").alias("p_ts"),
        F.date_trunc("hour", F.col("ts")).alias("bin"),
    )
    matched = bins.join(pts, "bin").filter(
        (F.col("p_ts") >= F.col("s")) & (F.col("p_ts") <= F.col("e"))
    )
    return (
        matched.groupBy("incident_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("p_ts").alias("first_point"),
            F.max("p_ts").alias("last_point"),
        )
        .orderBy("incident_id")
    )


QUERIES_OLAP = {
    "percentile_stats": percentile_stats,
    "pivot_event_counts": pivot_event_counts,
    "unpivot_event_metrics": unpivot_event_metrics,
    "range_join_binned": range_join_binned,
}

_PIVOT_COLS = ", ".join(
    'sum(CASE WHEN event_type = \'{t}\' THEN 1 ELSE 0 END) AS "{t}"'.format(t=t)
    for t in EVENT_TYPES
)

ORACLES_OLAP = {
    "percentile_stats": f"""
SELECT event_type, count(*) AS n,
  {sql_hround("quantile_cont(value, 0.5)", 6)} AS p50,
  {sql_hround("quantile_cont(value, 0.95)", 6)} AS p95,
  {sql_hround("quantile_cont(value, 0.99)", 6)} AS p99
FROM events GROUP BY event_type ORDER BY event_type
""",
    "pivot_event_counts": f"""
SELECT user_id, {_PIVOT_COLS}
FROM events GROUP BY user_id ORDER BY user_id
""",
    "unpivot_event_metrics": f"""
WITH wide AS (
  SELECT event_type,
    CAST(count(*) AS DOUBLE) AS n_events,
    {sql_xsum("value", 2)} AS sum_value,
    {sql_xavg("value", 2, 4)} AS avg_value
  FROM events GROUP BY event_type
)
SELECT event_type, 'n_events' AS metric, n_events AS value FROM wide
UNION ALL SELECT event_type, 'sum_value', sum_value FROM wide
UNION ALL SELECT event_type, 'avg_value', avg_value FROM wide
ORDER BY event_type, metric
""",
    "range_join_binned": """
WITH iv AS (
  SELECT event_id AS incident_id, ts AS s, ts + INTERVAL 2 HOUR AS e
  FROM events WHERE event_type = 'error' AND event_id % 7 = 0
),
pts AS (
  SELECT event_id AS point_id, ts AS p_ts FROM events
  WHERE event_type <> 'error'
)
SELECT incident_id, count(*) AS n_points,
       min(p_ts) AS first_point, max(p_ts) AS last_point
FROM iv JOIN pts ON p_ts BETWEEN s AND e
GROUP BY incident_id
ORDER BY incident_id
""",
}


def gap_fill_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a generated per-type daily date spine
    left-joined to actual daily rollups, missing days carried forward
    (last_value IGNORE NULLS window). The standard dense-timeline
    operator for downstream window/trend math.

    Scale shape: the spine is date_range x types (tiny, generated with
    sequence+explode, no driver loop); the rollup shuffles once on
    (type, day); the fill is one window per type ordered by day.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    bounds = ev.select(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = (
        bounds.select(
            F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
        )
        .crossJoin(daily.select("event_type").distinct())
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.last(F.col("n_events"), ignorenulls=True).over(w).alias("n_filled"),
        )
        .orderBy("event_type", "day")
    )


QUERIES_OLAP["gap_fill_daily_counts"] = gap_fill_daily_counts

ORACLES_OLAP["gap_fill_daily_counts"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events
),
spine AS (
  SELECT t.event_type, CAST(u.day AS DATE) AS day
  FROM (SELECT DISTINCT event_type FROM daily) t
  CROSS JOIN (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
              FROM bounds) u
)
SELECT s.event_type, s.day,
       coalesce(d.n_events, 0) AS n_events,
       last_value(d.n_events IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_filled
FROM spine s LEFT JOIN daily d ON s.event_type = d.event_type AND s.day = d.day
ORDER BY s.event_type, s.day
"""


def rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-priority daily order revenue with a
    trailing 7-day (current day + 6 preceding) rolling sum and count.
    The range frame is over epoch seconds so sparse days contribute
    nothing (a ROWS frame would silently skip gaps)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    # exact integer cents through BOTH aggregation levels: the daily
    # rollup and the rolling window sum stay in longs (order-free),
    # one division at the output projection.
    daily = orders.groupBy(
        "o_orderpriority", F.to_date("o_orderdate").alias("day")
    ).agg(
        F.sum(units(F.col("o_totalprice"), 2)).alias("day_cents"),
        F.count(F.lit(1)).alias("day_orders"),
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.unix_date(F.col("day")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "o_orderpriority",
        "day",
        (F.col("day_cents") / 1e2).alias("day_revenue"),
        (F.sum("day_cents").over(w) / 1e2).alias("rev_7d"),
        F.sum("day_orders").over(w).alias("orders_7d"),
    ).orderBy("o_orderpriority", "day")


QUERIES_OLAP["rolling_7day_revenue"] = rolling_7day_revenue

ORACLES_OLAP["rolling_7day_revenue"] = """
WITH daily AS (
  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(floor((o_totalprice) * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS day_cents,
         count(*) AS day_orders
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, day, day_cents / 100.0 AS day_revenue,
  CAST(sum(day_cents) OVER (
     PARTITION BY o_orderpriority ORDER BY day
     RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0
    AS rev_7d,
  CAST(sum(day_orders) OVER (
     PARTITION BY o_orderpriority ORDER BY day
     RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS orders_7d
FROM daily
ORDER BY o_orderpriority, day
"""


def conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER-clause shape): per-priority
    counts/sums restricted by predicates inside one aggregate pass —
    no self-joins, no second scan."""
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_totalprice") > 200000
    open_ = F.col("o_orderstatus") == "O"
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_if(high).alias("n_high_value"),
            xsum(F.when(high, F.col("o_totalprice")).otherwise(0.0), 2).alias(
                "high_value_total"
            ),
            F.count_if(high & open_).alias("n_high_open"),
            xavg(F.when(open_, F.col("o_totalprice")), 2, 4).alias("avg_open_price"),
        )
        .orderBy("o_orderpriority")
    )


def nth_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/second/latest order per customer via first_value /
    nth_value / last_value over a full-partition frame with a
    deterministic total order."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        # NULLS LAST pin: Spark ASC defaults NULLS FIRST, DuckDB LAST
        .orderBy(F.asc_nulls_last("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        orders.select(
            "o_custkey",
            F.first_value("o_orderkey").over(w).alias("first_order"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
            F.last_value("o_orderkey").over(w).alias("latest_order"),
            F.count(F.lit(1)).over(w).alias("n_orders"),
        )
        .distinct()
        .orderBy("o_custkey")
    )


QUERIES_OLAP["conditional_aggregates"] = conditional_aggregates
QUERIES_OLAP["nth_order_per_customer"] = nth_order_per_customer

ORACLES_OLAP["conditional_aggregates"] = f"""
SELECT o_orderpriority,
  count(*) AS n_orders,
  count(*) FILTER (o_totalprice > 200000) AS n_high_value,
  {sql_xsum("CASE WHEN o_totalprice > 200000 THEN o_totalprice ELSE 0.0 END", 2)}
    AS high_value_total,
  count(*) FILTER (o_totalprice > 200000 AND o_orderstatus = 'O') AS n_high_open,
  {sql_xavg("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END", 2, 4)}
    AS avg_open_price
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

ORACLES_OLAP["nth_order_per_customer"] = """
SELECT DISTINCT o_custkey,
  first_value(o_orderkey) OVER w AS first_order,
  nth_value(o_orderkey, 2) OVER w AS second_order,
  last_value(o_orderkey) OVER w AS latest_order,
  count(*) OVER w AS n_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_orderdate ASC NULLS LAST, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey
"""


def statistical_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family: sample stddev/variance,
    correlation and covariance per group — single-pass distributed
    moments (partial aggregation composes across partitions)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            hround(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
            hround(F.var_samp("l_quantity"), 4).alias("qty_var"),
            hround(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
            hround(F.covar_samp("l_extendedprice", "l_discount"), 4).alias(
                "price_disc_covar"
            ),
        )
        .orderBy("l_returnflag")
    )


QUERIES_OLAP["statistical_aggregates"] = statistical_aggregates

ORACLES_OLAP["statistical_aggregates"] = f"""
SELECT l_returnflag, count(*) AS n,
  {sql_hround("stddev_samp(l_extendedprice)", 4)} AS price_stddev,
  {sql_hround("var_samp(l_quantity)", 4)} AS qty_var,
  {sql_hround("corr(l_extendedprice, l_quantity)", 6)} AS price_qty_corr,
  {sql_hround("covar_samp(l_extendedprice, l_discount)", 4)} AS price_disc_covar
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def skew_salted_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join-side skew lever as an oracle-visible query: orders
    keys are COLLAPSED onto 5 hot nation-sized values (pmod on
    custkey) to fabricate extreme skew, then salted-joined to the
    5-row hot dim and rolled up. The oracle runs the plain join —
    salting must be invisible in the result. (AQE skew-split handles
    the planner-visible case, tests/test_bucketing.py; this operator
    covers skew that appears mid-pipeline where stats can't see it.)
    """
    from youtube_etl_automated_pipeline_spark.operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders").select(
        F.pmod(F.col("o_custkey"), F.lit(5)).alias("hot_key"),
        "o_orderkey",
        units(F.col("o_totalprice"), 2).alias("cents"),
    )
    hot_dim = load_table(spark, sf_dir, "nation").filter(
        F.col("n_nationkey") < 5
    ).select(F.col("n_nationkey").alias("dim_key"), "n_name")
    joined = salted_join(
        orders, hot_dim, "hot_key", "dim_key", F.col("o_orderkey"), n_salts=16
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("cents"),
        )
        .orderBy("n_name")
    )


QUERIES_OLAP["skew_salted_join_rollup"] = skew_salted_join_rollup

ORACLES_OLAP["skew_salted_join_rollup"] = """
SELECT n.n_name, count(*) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS cents
FROM orders o
JOIN nation n ON (o.o_custkey % 5) = n.n_nationkey
WHERE n.n_nationkey < 5
GROUP BY n.n_name
ORDER BY n.n_name
"""


def approx_percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path percentile_stats' docstring points
    at: percentile_approx (bounded-memory KLL-style quantile sketch,
    mergeable across partitions — no global sort). Sketch output is
    engine-specific -> rows-only gate; the accuracy envelope vs the
    exact percentile is asserted in tests/test_sinks.py (same pattern
    as the HLL and CMS sketches). The DETERMINISTIC oracle-gated twin
    covering the same capability is kmv_percentile_stats
    (queries_sketch.py): bottom-K md5-priority sample + exact order
    statistics, bit-exact in both engines."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("percentile_approx(value, 0.5, 1000)").alias("p50_approx"),
            F.expr("percentile_approx(value, 0.95, 1000)").alias("p95_approx"),
            F.expr("percentile_approx(value, 0.99, 1000)").alias("p99_approx"),
        )
        .orderBy("event_type")
    )


QUERIES_OLAP["approx_percentile_stats"] = approx_percentile_stats


def bucketed_colocated_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketing strategy as an ORACLE-VISIBLE query (the
    no-Exchange plan property itself is asserted in
    tests/test_bucketing.py): orders and lineitem are written ONCE as
    8-bucket managed tables hash-bucketed + sorted on the join key,
    then joined WITHOUT broadcast — the sort-merge join reads
    co-located buckets, so the only shuffle in the plan is the final
    rollup key. At 100 TB this is the pay-the-shuffle-once-at-write
    layout for every repeated fact-fact join. The oracle computes the
    same rollup from the raw tables, proving the bucketed layout is
    content-lossless."""
    from youtube_etl_automated_pipeline_spark.sinks import write_bucketed

    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    t_orders = f"bkt_orders_{sf_tag.replace('.', '_')}"
    t_li = f"bkt_lineitem_{sf_tag.replace('.', '_')}"
    if not spark.catalog.tableExists(t_orders):
        write_bucketed(load_table(spark, sf_dir, "orders"), t_orders, "o_orderkey")
    if not spark.catalog.tableExists(t_li):
        write_bucketed(load_table(spark, sf_dir, "lineitem"), t_li, "l_orderkey")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = (
            spark.table(t_orders)
            .join(
                spark.table(t_li),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(units(F.col("l_extendedprice"), 2)).alias("price_cents"),
            )
            .orderBy("o_orderstatus")
        )
        # Materialize the physical plan WHILE the conf is active:
        # Catalyst reads SQLConf at planning time (lazily, at the first
        # action), so restoring the conf before the caller's action
        # would silently re-enable broadcast and void the co-located
        # SMJ this query exists to demonstrate. executedPlan is a
        # cached lazy val — once forced here, the caller's action
        # reuses it.
        df._jdf.queryExecution().executedPlan()
        return df
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


QUERIES_OLAP["bucketed_colocated_join_rollup"] = bucketed_colocated_join_rollup

ORACLES_OLAP["bucketed_colocated_join_rollup"] = """
SELECT o_orderstatus, count(*) AS n_lines,
       CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def bloom_filter_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join as an ORACLE-VISIBLE query: a
    selective dim-side predicate (1-URGENT orders) feeds a shuffle
    join, and Spark's runtime row-level filtering injects a
    bloom_filter_agg on the dim side plus a might_contain probe at the
    FACT scan — most lineitem rows die before the shuffle. At 100 TB
    the 10MB/10GB default thresholds trigger this rewrite on exactly
    this shape; the smoke tables are tiny, so the thresholds are
    lowered here and the physical plan is forced while the confs are
    active (Catalyst reads SQLConf at planning time — see
    bucketed_colocated_join_rollup). The oracle is the plain join:
    identical results prove the runtime filter is semantics-free.
    Plan-shape assertion lives in
    tests/test_plan_shapes.py::test_runtime_bloom_filter_prunes_large_join."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, sf_dir, "lineitem")
        df = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(units(F.col("l_extendedprice"), 2)).alias("price_cents"),
            )
            .orderBy("o_orderstatus")
        )
        df._jdf.queryExecution().executedPlan()
        return df
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


QUERIES_OLAP["bloom_filter_join_rollup"] = bloom_filter_join_rollup

ORACLES_OLAP["bloom_filter_join_rollup"] = """
SELECT o_orderstatus, count(*) AS n_lines,
       CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""
