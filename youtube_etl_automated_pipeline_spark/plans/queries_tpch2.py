"""TPC-H-shaped OLAP batch 2: the classic subquery/decorrelation
shapes (Q4/Q7/Q8/Q13/Q14/Q15/Q17/Q18/Q19/Q21/Q22 adapted to the
testdata schema — no partsupp/commitdate/shipmode columns, so each
query keeps the canonical PLAN SHAPE with predicates the schema can
express).

Why these matter for the engine: they exercise exactly the Catalyst
rewrites a declarative engine must get right at 100 TB —
EXISTS/NOT EXISTS → left-semi/anti joins (never a subquery re-scan
per row), correlated scalar aggregates → decorrelated agg + equi-join,
global scalar aggregates → one-row broadcast join, HAVING pushdown
after partial aggregation, and OR-of-ANDs predicates that still prune
columns at the scan.

Cross-engine determinism: every float aggregate goes through the
compat integer-unit helpers (xsum/units — exact long accumulation,
one final division) so Spark and DuckDB hash bit-identically; ratios
divide two bit-identical doubles (IEEE division is deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_automated_pipeline_spark.functions.compat import (
    sql_units,
    sql_xsum,
    units,
    xsum,
)
from youtube_etl_automated_pipeline_spark.sources import load_table


def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_REV_SQL = sql_xsum("l_extendedprice * (1 - l_discount)", 4)
_REV_UNITS_SQL = sql_units("l_extendedprice * (1 - l_discount)", 4)


def q4_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: order-priority count for orders with at least one
    line shipped >30 days after order date — EXISTS decorrelated to a
    LEFT SEMI join on the order key (one shuffle, no per-row probe)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: shipping volume between two nations by direction and
    year. Nation dim joins broadcast; the fact-fact join shuffles once
    on the order key."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_8")
            )
            | (
                (F.col("supp_nation") == "NATION_8")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(xsum(_revenue(), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one supplier-nation's share of total revenue to ASIA
    customers per order year — the conditional-sum ratio. Both the
    numerator and denominator accumulate exact integer units, so the
    single IEEE division is bit-identical across engines."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("c_nk"))
    sn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"), "inner")
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
    )
    rev_units = units(_revenue(), 4)
    num = F.sum(F.when(F.col("supp_nation") == "NATION_7", rev_units).otherwise(F.lit(0)))
    den = F.sum(rev_units)
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg((num.cast("double") / den.cast("double")).alias("mkt_share"))
        .orderBy("o_year")
    )


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of customers by how many orders they
    placed, INCLUDING zero-order customers — the left-outer-join +
    double-aggregation classic. First agg shuffles on c_custkey, the
    second on the (tiny) count domain."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: percentage of revenue from PROMO parts in one month
    — conditional-sum ratio over a fact-dim join (part broadcasts at
    these SFs; at 100 TB it shuffles on l_partkey, still one pass)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    rev_units = units(_revenue(), 4)
    num = F.sum(F.when(F.col("p_type") == "PROMO", rev_units).otherwise(F.lit(0)))
    den = F.sum(rev_units)
    return joined.agg(
        (F.lit(100.0) * (num.cast("double") / den.cast("double"))).alias(
            "promo_revenue_pct"
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) with the maximum quarterly revenue —
    the global-scalar-subquery pattern as an explicit one-row
    broadcast crossJoin (never a single-partition window over the
    whole aggregate)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = load_table(spark, sf_dir, "supplier")
    # exact integer units end-to-end: the max/equality compare happens
    # on longs, so ties are exact, not float-coincidental
    rev = li.groupBy("l_suppkey").agg(
        F.sum(units(_revenue(), 4)).alias("rev_units")
    )
    top = rev.agg(F.max("rev_units").alias("max_units"))
    return (
        rev.join(F.broadcast(top), rev.rev_units == F.col("max_units"))
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_units").cast("double") / 1e4).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue from lineitems whose quantity is below 20%
    of the per-part average — the correlated scalar-aggregate
    decorrelated into a per-part agg joined back to the fact (one
    l_partkey shuffle shared by both sides)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_q = li.groupBy(F.col("l_partkey").alias("a_pk")).agg(
        (
            F.sum(units(F.col("l_quantity"), 0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_qty")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_q, li.l_partkey == F.col("a_pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            xsum(F.col("l_extendedprice"), 2).alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: customers with any order totalling >300 units of
    quantity — HAVING over a fact aggregation, then joins back to
    orders/customer. The quantity sum is integer-exact so the
    threshold cannot float-flicker."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("b_ok"))
        .agg(F.sum(units(F.col("l_quantity"), 0)).alias("qty_units"))
        .filter(F.col("qty_units") > 300)
    )
    return (
        big.join(orders, F.col("b_ok") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("qty_units").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


def q19_or_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: revenue under an OR-of-ANDs brand/size/quantity
    predicate — Catalyst extracts the common l_partkey equi-join and
    keeps the disjunction as a post-join filter (no cartesian)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(5, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return li.join(part, li.l_partkey == part.p_partkey).filter(cond).agg(
        xsum(_revenue(), 4).alias("revenue"), F.count(F.lit(1)).alias("n_lines")
    )


def q21_sole_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (returns-adapted): suppliers who were the ONLY
    supplier with returned lines on a multi-supplier order — the
    EXISTS + NOT EXISTS double-correlation, decorrelated to a semi
    join then an anti join, all co-partitioned on the order key."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    rets = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    other = pairs.select(
        F.col("l_orderkey").alias("o_ok"), F.col("l_suppkey").alias("o_sk")
    )
    other_ret = rets.select(
        F.col("l_orderkey").alias("r_ok"), F.col("l_suppkey").alias("r_sk")
    )
    blamed = rets.join(
        other,
        (rets.l_orderkey == F.col("o_ok")) & (rets.l_suppkey != F.col("o_sk")),
        "left_semi",
    ).join(
        other_ret,
        (rets.l_orderkey == F.col("r_ok")) & (rets.l_suppkey != F.col("r_sk")),
        "left_anti",
    )
    return (
        blamed.join(supp, blamed.l_suppkey == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(20)
    )


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: customers with above-average (positive) balances and
    no orders SINCE 2000 (dormant accounts — every synthetic customer
    has some order, so the date bound keeps the anti join non-trivial),
    rolled up per nation — a global scalar aggregate (one-row
    broadcast) plus a NOT EXISTS anti join."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(units(F.col("c_acctbal"), 2)).cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(100.0)
        ).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            xsum(F.col("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


QUERIES_TPCH2 = {
    "q4_late_ship_priority": q4_late_ship_priority,
    "q7_nation_pair_volume": q7_nation_pair_volume,
    "q8_market_share": q8_market_share,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q14_promo_revenue_share": q14_promo_revenue_share,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_or_predicate_revenue": q19_or_predicate_revenue,
    "q21_sole_return_supplier": q21_sole_return_supplier,
    "q22_idle_rich_customers": q22_idle_rich_customers,
}

ORACLES_TPCH2 = {
    "q4_late_ship_priority": """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    "q7_nation_pair_volume": f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {_REV_SQL} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
   OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
    "q8_market_share": f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(CAST(sum(CASE WHEN sn.n_name = 'NATION_7'
                     THEN {_REV_UNITS_SQL} ELSE 0 END) AS BIGINT) AS DOUBLE)
       / CAST(CAST(sum({_REV_UNITS_SQL}) AS BIGINT) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
GROUP BY 1
ORDER BY 1
""",
    "q13_order_count_distribution": """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    "q14_promo_revenue_share": f"""
SELECT 100.0 * (
  CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
                THEN {_REV_UNITS_SQL} ELSE 0 END) AS BIGINT) AS DOUBLE)
  / CAST(CAST(sum({_REV_UNITS_SQL}) AS BIGINT) AS DOUBLE)) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'
""",
    "q15_top_supplier": f"""
WITH rev AS (
  SELECT l_suppkey, CAST(sum({_REV_UNITS_SQL}) AS BIGINT) AS rev_units
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(rev_units AS DOUBLE) / 10000.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_units = (SELECT max(rev_units) FROM rev)
ORDER BY s_suppkey
""",
    "q17_small_quantity_revenue": f"""
WITH avg_q AS (
  SELECT l_partkey AS a_pk,
         CAST(CAST(sum({sql_units('l_quantity', 0)}) AS BIGINT) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT {sql_xsum("l_extendedprice", 2)} AS small_qty_revenue,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN avg_q ON l_partkey = a_pk
WHERE p_brand = 'Brand#3' AND l_quantity < 0.2 * avg_qty
""",
    "q18_large_volume_customers": f"""
WITH big AS (
  SELECT l_orderkey AS b_ok,
         CAST(sum({sql_units('l_quantity', 0)}) AS BIGINT) AS qty_units
  FROM lineitem GROUP BY l_orderkey
  HAVING qty_units > 300
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(qty_units AS DOUBLE) AS total_qty
FROM big
JOIN orders ON b_ok = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    "q19_or_predicate_revenue": f"""
SELECT {_REV_SQL} AS revenue, count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 25
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 40)
""",
    "q21_sole_return_supplier": """
WITH rets AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
),
pairs AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM rets r
JOIN supplier ON r.l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM pairs p
    WHERE p.l_orderkey = r.l_orderkey AND p.l_suppkey <> r.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM rets r2
    WHERE r2.l_orderkey = r.l_orderkey AND r2.l_suppkey <> r.l_suppkey)
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT 20
""",
    "q22_idle_rich_customers": f"""
WITH avg_bal AS (
  SELECT CAST(CAST(sum({sql_units('c_acctbal', 2)}) AS BIGINT) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) / 100.0 AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, count(*) AS numcust,
       {sql_xsum('c_acctbal', 2)} AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= DATE '2000-01-01')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""
}
