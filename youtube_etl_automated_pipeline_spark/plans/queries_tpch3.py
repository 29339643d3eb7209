"""TPC-H batch 3 — the remaining classic shapes (Q2/Q9/Q11/Q12/Q16/
Q20 adapted: no partsupp/shipmode/comment columns, so supplier-part
relationships derive from distinct lineitem pairs and each query
keeps its canonical plan shape).

With batches 1-2 (queries.py Q1, queries_tpch.py Q3/Q5/Q6/Q10,
queries_tpch2.py Q4/Q7/Q8/Q13-Q15/Q17-Q19/Q21/Q22) this completes
all 22 TPC-H query shapes, each oracle-backed bit-exact vs DuckDB.

Shapes here: correlated MIN over a group (Q2 → per-group agg joined
back on the extremum), multi-dim profit rollup (Q9), HAVING against a
global-scalar fraction kept in INTEGER arithmetic (Q11 — comparing
`sum > total div 10000` avoids ever forming a float threshold),
conditional counts (Q12), count-distinct with a NOT-IN exclusion →
anti join (Q16), and a nested semi-join reduction (Q20).
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


def _supplied_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (partkey, suppkey) supply relationships — the partsupp
    stand-in, derived once from lineitem (shuffle on the pair, then
    every consumer is an equi-join)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )


def q2_min_balance_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each ECONOMY size-15 part, the supplier(s) with
    the minimum account balance among its suppliers — the correlated
    MIN subquery decorrelated to a per-part agg joined back on the
    extremum (both sides share the p_partkey shuffle)."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cand = (
        _supplied_pairs(spark, sf_dir)
        .join(part, F.col("l_partkey") == part.p_partkey)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    min_bal = cand.groupBy(F.col("p_partkey").alias("m_pk")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        cand.join(
            min_bal,
            (cand.p_partkey == F.col("m_pk"))
            & (cand.s_acctbal == F.col("min_bal")),
        )
        .select("s_acctbal", "s_name", F.col("n_name").alias("nation_name"), "p_partkey")
        .orderBy(F.desc("s_acctbal"), "nation_name", "s_name", "p_partkey")
        .limit(100)
    )


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit per supplier nation per order year for one
    part family (name contains 'widget'); cost proxied as 10% of
    retail price per unit (no partsupp supplycost in this schema)."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("widget")
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.1
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(xsum(amount, 4).alias("profit"))
        .orderBy("nation_name", F.desc("o_year"))
    )


def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose total line revenue exceeds 1/1900 of
    the global total — HAVING vs a global-scalar fraction. The synthetic
    per-part revenue is near-uniform around the 1/2000 mean, so the
    1/1900 bound keeps ~38% of parts (2x-mean would keep zero). The
    comparison stays in INTEGER units (`sum_units > total div 1900`)
    so no float threshold ever exists to disagree across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(units(F.col("l_extendedprice"), 2)).alias("val_units")
    )
    total = per_part.agg(
        F.expr("sum(val_units) div 1900").alias("threshold_units")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("val_units") > F.col("threshold_units"))
        .select(
            "l_partkey",
            (F.col("val_units").cast("double") / 1e2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: per return flag (the shipmode stand-in), how many
    1997-shipped lines belong to critical- vs normal-priority orders —
    the conditional-count pivot."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct supplier count per (brand, type, size) for
    non-Brand#1 parts, excluding flagged suppliers (negative balance —
    the complaints stand-in): NOT IN → broadcast anti join, then a
    count-distinct rollup."""
    pairs = _supplied_pairs(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    flagged = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("bad_sk"))
    return (
        pairs.join(F.broadcast(flagged), pairs.l_suppkey == F.col("bad_sk"), "left_anti")
        .join(part, pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(100)
    )


def q20_volume_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers carrying more than 20% of the shipped
    volume of any 'small'-named part — the nested semi-join chain
    (filtered parts -> per-(part,supplier) volume vs per-part total ->
    LEFT SEMI to supplier). Quantity sums stay in integer units and
    the threshold is an integer div."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("small")
    ).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier")
    filtered = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    per_ps = filtered.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(units(F.col("l_quantity"), 0)).alias("ps_qty")
    )
    per_part = filtered.groupBy(F.col("l_partkey").alias("t_pk")).agg(
        F.sum(units(F.col("l_quantity"), 0)).alias("total_qty")
    )
    heavy = (
        per_ps.join(per_part, per_ps.l_partkey == F.col("t_pk"))
        .filter(F.col("ps_qty") > F.expr("total_qty div 5"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


QUERIES_TPCH3 = {
    "q2_min_balance_supplier": q2_min_balance_supplier,
    "q9_profit_by_nation_year": q9_profit_by_nation_year,
    "q11_important_part_values": q11_important_part_values,
    "q12_priority_by_returnflag": q12_priority_by_returnflag,
    "q16_supplier_counts": q16_supplier_counts,
    "q20_volume_share_suppliers": q20_volume_share_suppliers,
}

_PAIRS_SQL = "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem"

ORACLES_TPCH3 = {
    "q2_min_balance_supplier": f"""
WITH pairs AS ({_PAIRS_SQL}),
cand AS (
  SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name
  FROM pairs
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_size = 15 AND p_type = 'ECONOMY'
),
mb AS (SELECT p_partkey AS m_pk, min(s_acctbal) AS min_bal FROM cand GROUP BY 1)
SELECT s_acctbal, s_name, n_name AS nation_name, p_partkey
FROM cand JOIN mb ON p_partkey = m_pk AND s_acctbal = min_bal
ORDER BY s_acctbal DESC, nation_name, s_name, p_partkey
LIMIT 100
""",
    "q9_profit_by_nation_year": f"""
SELECT n_name AS nation_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {sql_xsum(
           "l_extendedprice * (1 - l_discount)"
           " - 0.1 * p_retailprice * l_quantity", 4)} AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY nation_name, o_year DESC
""",
    "q11_important_part_values": f"""
WITH per_part AS (
  SELECT l_partkey,
         CAST(sum({sql_units('l_extendedprice', 2)}) AS BIGINT) AS val_units
  FROM lineitem GROUP BY l_partkey
),
t AS (SELECT CAST(sum(val_units) AS BIGINT) // 1900 AS threshold_units
      FROM per_part)
SELECT l_partkey, CAST(val_units AS DOUBLE) / 100.0 AS part_value
FROM per_part, t
WHERE val_units > threshold_units
ORDER BY part_value DESC, l_partkey
""",
    "q12_priority_by_returnflag": """
SELECT l_returnflag,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    "q16_supplier_counts": f"""
WITH pairs AS ({_PAIRS_SQL})
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM pairs JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 100
""",
    "q20_volume_share_suppliers": f"""
WITH filtered AS (
  SELECT l_partkey, l_suppkey, l_quantity
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
),
per_ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum({sql_units('l_quantity', 0)}) AS BIGINT) AS ps_qty
  FROM filtered GROUP BY 1, 2
),
per_part AS (
  SELECT l_partkey AS t_pk,
         CAST(sum({sql_units('l_quantity', 0)}) AS BIGINT) AS total_qty
  FROM filtered GROUP BY 1
),
heavy AS (
  SELECT DISTINCT l_suppkey
  FROM per_ps JOIN per_part ON l_partkey = t_pk
  WHERE ps_qty > total_qty // 5
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM heavy)
ORDER BY s_suppkey
""",
}


def ship_delay_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfilment lead-time profile: order-to-ship delay in weekly
    buckets per return flag — the operational-SLA histogram. The
    orders join shuffles both sides on orderkey (the same key the
    bucketed-layout path co-locates shuffle-free, see
    bucketed_colocated_join_rollup); delays and buckets are exact
    integer day arithmetic."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_returnflag"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    bucket = F.least(F.floor(delay / 7).cast("int"), F.lit(16))
    return (
        joined.groupBy(
            F.col("l_returnflag").alias("returnflag"),
            bucket.alias("week_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.min(delay).alias("min_delay_days"),
            F.max(delay).alias("max_delay_days"),
        )
        .orderBy("returnflag", "week_bucket")
    )


QUERIES_TPCH3["ship_delay_histogram"] = ship_delay_histogram

ORACLES_TPCH3["ship_delay_histogram"] = """
WITH j AS (
  SELECT l.l_returnflag AS returnflag,
    date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))
      AS delay
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT returnflag,
  CAST(least(CAST(floor(delay / 7.0) AS BIGINT), 16) AS INT) AS week_bucket,
  CAST(count(*) AS BIGINT) AS n_lines,
  CAST(min(delay) AS INT) AS min_delay_days,
  CAST(max(delay) AS INT) AS max_delay_days
FROM j GROUP BY 1, 2 ORDER BY returnflag, week_bucket
"""
