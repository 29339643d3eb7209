"""Named queries over the driver testdata — the engine's public query
surface, one entry per operator row in SURVEY.md section 2.

Each callable takes (spark, sf_dir) and returns a DataFrame whose
column names/aliases match the DuckDB oracle in plans/oracles.py
exactly (the driver's compare sorts columns by name and hashes
values).

Role mapping (FIXTURES.md section A): orders/lineitem = fact
("videos" + "metrics"), nation/region/part = broadcast dims,
events = re-ingest / streaming fixtures, documents/embeddings =
extension ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_automated_pipeline_spark.functions.compat import (
    hround,
    units,
    xavg,
    xsum,
)
from youtube_etl_automated_pipeline_spark.functions import dates as D
from youtube_etl_automated_pipeline_spark.functions import metrics as M
from youtube_etl_automated_pipeline_spark.functions import text as X
from youtube_etl_automated_pipeline_spark.operators.dedup import keep_last
from youtube_etl_automated_pipeline_spark.operators.joins import (
    anti_join_waterfall,
    merge_upsert,
)
from youtube_etl_automated_pipeline_spark.sources import load_table


def flagship_enrich_dedup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (SURVEY section 7 step 1): enrich + dedup + aggregate.

    Mirrors the reference's E2+E3 shape (dataingestion1.py:104-181,
    ingestdatainbigquery.py:84-96): keep-last dedup on the fact key
    (A5/J7: last lineitem per order = 'current state' after re-ingest),
    enrichment joins up the star (J1-J3), grouped rollup (A2), guarded
    ratio metrics (F20-F22).

    Scale notes: lineitem->orders and orders->customer are shuffle
    joins on their keys (AQE handles skew); nation/region are broadcast
    (no fact shuffle); the dedup window shares the l_orderkey shuffle
    with the orders join downstream. Date predicate pushes to parquet.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")

    # (l_orderkey, l_linenumber) is not unique in the synthetic data;
    # keep-last needs a TOTAL order to be deterministic (SURVEY section 7
    # risk register) — extend the tiebreak until unique.
    latest_line = keep_last(
        li, ["l_orderkey"], ["l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"]
    )

    fact = (
        latest_line.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
    )

    # Exact fixed-point accumulation (compat.units): integer unit sums
    # are order-independent, so Spark's partial-agg order and DuckDB's
    # scan order cannot produce a sum straddling a rounding boundary.
    # ext*(1-disc) is an exact 4-dp decimal (2dp * (1 - 2dp)).
    rev_u = F.sum(units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4))
    qty_u = F.sum(units(F.col("l_quantity"), 2))
    revenue = rev_u / 1e4
    qty = qty_u / 1e2
    return (
        fact.groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            hround(revenue, 2).alias("revenue"),
            qty.alias("sum_qty"),
            hround(
                F.when(qty_u > 0, revenue / qty).otherwise(F.lit(0.0)), 4
            ).alias("rev_per_qty"),
        )
        .orderBy("region_name", "nation_name")
    )


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2-shape grouped rollup (TPC-H Q1 pattern): hash aggregate with
    map-side partial aggregation; filter pushed to the parquet scan.

    All money/qty aggregates accumulate exact integer units (xsum/
    xavg): order-independent long sums, one final division — immune to
    the Spark-vs-DuckDB summation-order rounding-boundary drift.
    charge units are 1e-6 (2+2+2 dp product): per-group long capacity
    ~8e7 rows at worst-case row value, ample for the gate SFs; at
    warehouse scale you'd sum DECIMAL(38,6) instead.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            xsum(F.col("l_quantity"), 2).alias("sum_qty"),
            xsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            hround(xsum(disc_price, 4), 2).alias("sum_disc_price"),
            hround(xsum(charge, 6), 2).alias("sum_charge"),
            xavg(F.col("l_quantity"), 2, 4).alias("avg_qty"),
            xavg(F.col("l_extendedprice"), 2, 4).alias("avg_price"),
            xavg(F.col("l_discount"), 2, 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def code_derivation_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2-F7 + P5-P7 string chain (dataingestion2.py:33-64) applied to
    part.p_name as the 'title'. Pure codegen'd projection — no UDFs,
    no shuffle; scales linearly with scan width."""
    part = load_table(spark, sf_dir, "part")
    raw = X.extract_last_word(F.col("p_name"))
    df = part.select(
        "p_partkey",
        F.col("p_name").alias("title"),
        raw.alias("raw_code"),
        F.length(raw).alias("raw_len"),
    )
    cleaned = X.clean_main_code(F.col("raw_code"))
    df = df.withColumn("main_code", cleaned)
    df = df.withColumn("code_len", F.length("main_code"))
    df = df.withColumn("code", X.code_prefix(F.col("main_code"), F.col("code_len")))
    df = df.withColumn("resource_code", X.last_char(F.col("main_code")))
    return df


def date_time_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11-F15 (dataingestion1.py:66-67, dataprocessing3.py:28-43,
    dataprocessing.py:150): ISO formatting, UTC->Asia/Karachi split,
    seconds->H:MM:SS. Projection only; no shuffle."""
    ev = load_table(spark, sf_dir, "events")
    iso = D.iso_utc(F.col("ts"))
    local_date, local_time = D.utc_to_local_date_time(iso)
    return ev.select(
        "event_id",
        iso.alias("published_at"),
        local_date.alias("published_date_local"),
        local_time.alias("published_time_local"),
        D.seconds_to_hms(F.col("value").cast("long")).alias("avg_view_duration_hms"),
    )


def keep_last_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/W2 (dataingestion1.py:168): latest event per user — keep-last
    with a deterministic total order (ts, event_id). One shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return keep_last(ev, ["user_id"], ["ts", "event_id"]).select(
        "user_id", "event_id", "event_type", "value"
    )


def merge_upsert_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7/U1 (dataingestion1.py:166-168): re-ingest upsert. 'New batch'
    = every 10th order with a restated total; union + keep-last by
    ingest_seq overlays new over old. One shuffle on the key."""
    orders = load_table(spark, sf_dir, "orders")
    old = orders.select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).withColumn("ingest_seq", F.lit(1))
    new = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.lit("R").alias("o_orderstatus"),
            hround(F.col("o_totalprice") * 1.1, 2).alias("o_totalprice"),
        )
        .withColumn("ingest_seq", F.lit(2))
    )
    merged = merge_upsert(old, new, ["o_orderkey"], ["ingest_seq"])
    return merged.select("o_orderkey", "o_orderstatus", "o_totalprice", "ingest_seq")


def waterfall_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/U2 (dataprocessing.py:106-114): customers never 'fetched' by
    any owner — owners are order-priority buckets; LEFT ANTI per step
    with isEmpty() early-exit. Returns unmatched customer keys.

    Owners deliberately do NOT cover '5-LOW' so the remainder is
    non-empty (a 0-row result would match its oracle trivially).
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders")
    owners = [
        orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
            F.col("o_custkey").alias("c_custkey")
        ),
        orders.filter(F.col("o_orderpriority") == "3-MEDIUM").select(
            F.col("o_custkey").alias("c_custkey")
        ),
        orders.filter(F.col("o_orderpriority") == "4-NOT SPECIFIED").select(
            F.col("o_custkey").alias("c_custkey")
        ),
    ]
    return anti_join_waterfall(cust, owners, "c_custkey").orderBy("c_custkey")


def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O4 (dataprocessing.py:93): global top-k — Spark's
    TakeOrderedAndProject computes per-partition top-k then merges;
    no full sort, no full shuffle. Deterministic tiebreak on the key."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def derived_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17-F23 (dataprocessing3.py:46-97) over a per-order metric
    rollup: engagement%/CPV/RPM-shaped guarded divisions, net value,
    minutes->hours. Aggregate once, derive in a projection."""
    li = load_table(spark, sf_dir, "lineitem")
    # xsum: the downstream guarded ratios divide these sums, so the
    # dividends must be bit-identical cross-engine (exact unit sums).
    per_order = li.groupBy("l_orderkey").agg(
        xsum(F.col("l_quantity"), 2).alias("views"),
        xsum(F.col("l_extendedprice"), 2).alias("revenue"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("returns"),
        F.count(F.lit(1)).alias("n_lines"),
        xsum(F.col("l_tax"), 2).alias("tax_sum"),
        xsum(F.col("l_discount"), 2).alias("disc_sum"),
    )
    return per_order.select(
        "l_orderkey",
        M.minutes_to_hours(F.col("revenue")).alias("watch_hours"),
        M.net_subscribers(F.col("n_lines"), F.col("returns")).alias("net_lines"),
        M.engagement_pct(
            F.col("returns"), F.col("n_lines"), F.col("tax_sum"), F.col("views")
        ).alias("engagement_pct"),
        M.cpv(F.col("revenue"), F.col("views")).alias("cpv"),
        M.rpm(F.col("revenue"), F.col("views")).alias("rpm"),
    )


QUERIES = {
    "flagship_enrich_dedup_agg": flagship_enrich_dedup_agg,
    "q1_pricing_summary": q1_pricing_summary,
    "code_derivation_chain": code_derivation_chain,
    "date_time_ops": date_time_ops,
    "keep_last_dedup": keep_last_dedup,
    "merge_upsert_keep_last": merge_upsert_keep_last,
    "waterfall_anti_join": waterfall_anti_join,
    "top_k_orders": top_k_orders,
    "derived_metrics": derived_metrics,
}
