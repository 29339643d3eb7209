"""TPC-H-shaped analytical queries (Q3/Q5/Q10 adapted to the testdata
schema) — the classic multi-join OLAP suite exercising Catalyst's
join reordering, broadcast selection, and partial aggregation on the
star schema. Q1 lives in plans/queries.py (q1_pricing_summary).

Scale notes: dims (region/nation, and customer at these SFs) go
broadcast; fact-fact joins (orders x lineitem) shuffle on the order
key once; every aggregate is map-side partial first. Dates/segments
are literals -> pushed to the parquet scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_automated_pipeline_spark.functions.compat import (
    hround,
    sql_hround,
    sql_xsum,
    xsum,
)
from youtube_etl_automated_pipeline_spark.sources import load_table

def _revenue():
    # built lazily: classic-mode Column construction needs an active
    # SparkContext, which doesn't exist at import time
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: top-10 highest-revenue orders for one market segment,
    ordered before / shipped after a date boundary."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(hround(xsum(_revenue(), 4), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: revenue by nation for one region where supplier and
    customer share the nation (the 6-table join)."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    joined = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.groupBy(F.col("n_name").alias("nation_name"))
        .agg(hround(xsum(_revenue(), 4), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "nation_name")
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top-20 customers by lost revenue on returned items
    in a quarter, with their nation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation_name"))
        .agg(hround(xsum(_revenue(), 4), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


QUERIES_TPCH = {
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q10_returned_items": q10_returned_items,
}

_REV_SQL = sql_xsum("l_extendedprice * (1 - l_discount)", 4)

ORACLES_TPCH = {
    "q3_shipping_priority": f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {sql_hround(_REV_SQL, 2)} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1998-01-01'
  AND l_shipdate > DATE '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    "q5_local_supplier_volume": f"""
SELECT n_name AS nation_name, {sql_hround(_REV_SQL, 2)} AS revenue
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, nation_name
""",
    "q10_returned_items": f"""
SELECT c_custkey, c_name, c_acctbal, n_name AS nation_name,
       {sql_hround(_REV_SQL, 2)} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
}


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: potential revenue delta from discount changes — a
    pure scan-filter-aggregate where ALL predicates push to parquet
    row groups (the minimal-IO classic)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount").between(0.03, 0.05))
        & (F.col("l_quantity") < 24)
    ).agg(
        hround(xsum(F.col("l_extendedprice") * F.col("l_discount"), 4), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


QUERIES_TPCH["q6_forecast_revenue"] = q6_forecast_revenue

ORACLES_TPCH["q6_forecast_revenue"] = f"""
SELECT {sql_hround(sql_xsum("l_extendedprice * l_discount", 4), 2)} AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.05
  AND l_quantity < 24
"""
