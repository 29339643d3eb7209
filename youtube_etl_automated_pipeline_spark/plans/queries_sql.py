"""Pure-SQL-API queries (spark.sql over registered views) — the
engine's second query surface beyond the DataFrame API, plus sketch
aggregates the reference never had but any OLAP engine exposes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_automated_pipeline_spark.sources import load_table, register_views

# sum_price accumulates EXACT integer cents (o_totalprice is 2-dp, so
# round(x*100) is its exact cent value) and divides once at the end:
# integer sums are order-independent, so Spark and DuckDB agree
# bit-for-bit where a raw sum(double) can straddle a rounding boundary.
# The outer CAST AS BIGINT collapses DuckDB's HUGEINT sum to Spark's long.
GROUPING_SETS_SQL = """
SELECT n.n_name AS nation_name,
       o.o_orderpriority AS priority,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
         / CAST(100.0 AS DOUBLE) AS sum_price,
       CAST(grouping(n.n_name) AS INT) AS g_nation,
       CAST(grouping(o.o_orderpriority) AS INT) AS g_priority
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY GROUPING SETS ((n.n_name, o.o_orderpriority), (n.n_name), ())
"""


def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity rollup in one shuffle pass via GROUPING SETS
    (nation x priority, nation, grand total) with grouping()
    indicators disambiguating real NULLs from subtotal rows. Executed
    through the SQL surface end-to-end."""
    register_views(spark, sf_dir, tables=("orders", "customer", "nation"))
    return spark.sql(GROUPING_SETS_SQL)


def approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-customer counts per order priority next
    to the exact count. Engine-specific sketch -> rows-only gate check
    (no cross-engine oracle can hash-match an HLL estimate); the unit
    test asserts the <=5%-error envelope instead."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_custs"),
            F.countDistinct("o_custkey").alias("exact_custs"),
        )
        .orderBy("o_orderpriority")
    )


QUERIES_SQL = {
    "sql_grouping_sets": sql_grouping_sets,
    "approx_distinct_customers": approx_distinct_customers,
}

ORACLES_SQL = {
    # DuckDB runs the very same ANSI SQL text (views carry the same
    # names); only the grouping() cast spelling is shared already.
    "sql_grouping_sets": GROUPING_SETS_SQL,
}


# Top-N-per-group through a correlated LATERAL derived table — ANSI
# text both engines run verbatim. Catalyst decorrelates the
# LATERAL ORDER BY/LIMIT into a ranked window join (no per-row
# re-scan of customer); the (acctbal, custkey) tie-break makes the
# result a total order, hash-stable cross-engine.
LATERAL_TOPN_SQL = """
SELECT n_name AS nation_name, t.c_custkey, t.c_name, t.c_acctbal
FROM nation, LATERAL (
  SELECT c_custkey, c_name, c_acctbal FROM customer
  WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
ORDER BY nation_name, c_acctbal DESC, c_custkey
"""


def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 customers by balance per nation via a LATERAL correlated
    subquery (the SQL-standard top-N-per-group idiom)."""
    register_views(spark, sf_dir, tables=("nation", "customer"))
    return spark.sql(LATERAL_TOPN_SQL)


QUERIES_SQL["sql_lateral_topn"] = sql_lateral_topn
ORACLES_SQL["sql_lateral_topn"] = LATERAL_TOPN_SQL


# CUBE completes the multi-granularity trio (ROLLUP and GROUPING SETS
# are gated elsewhere): all four (status, priority) granularities in
# one Expand + single shuffle. Exact integer cents as above.
CUBE_SQL = """
SELECT o_orderstatus AS status,
       o_orderpriority AS priority,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS cents,
       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       CAST(grouping(o_orderpriority) AS INT) AS g_priority
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def sql_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): the 2^2 granularity lattice in a
    single pass — Catalyst expands each input row into 4 grouping-id
    variants map-side, so the plan is one Expand + one hash aggregate
    + one exchange, not four scans. grouping() flags disambiguate
    subtotal NULLs from data NULLs. Same ANSI text runs on DuckDB."""
    register_views(spark, sf_dir, tables=("orders",))
    return spark.sql(CUBE_SQL)


QUERIES_SQL["sql_cube_status_priority"] = sql_cube_status_priority
ORACLES_SQL["sql_cube_status_priority"] = CUBE_SQL


def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (parameter markers bound at execution, the
    injection-safe templating surface): open orders above a price
    floor rolled up per priority. The oracle inlines the same
    literals; exact integer cents keep the hash bit-stable."""
    register_views(spark, sf_dir, tables=("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority AS priority, count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM orders
        WHERE o_orderstatus = :status AND o_totalprice > :floor
        GROUP BY o_orderpriority
        ORDER BY priority
        """,
        args={"status": "F", "floor": 50000.0},
    )


QUERIES_SQL["sql_parameterized"] = sql_parameterized
ORACLES_SQL["sql_parameterized"] = """
SELECT o_orderpriority AS priority, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS cents
FROM orders
WHERE o_orderstatus = 'F' AND o_totalprice > 50000.0
GROUP BY o_orderpriority
ORDER BY priority
"""


def sql_scripting_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 BEGIN...END procedural blocks): a
    DECLAREd session variable is computed FROM the data (half the max
    order price — max is exact, *0.5 is one float op, so the threshold
    is bit-identical cross-engine) and drives the final statement.
    The oracle expresses the same dataflow with a scalar subquery —
    scripting is control-flow sugar over the identical plan."""
    register_views(spark, sf_dir, tables=("orders",))
    prev = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(
            """
            BEGIN
              DECLARE threshold DOUBLE;
              SET threshold = (SELECT max(o_totalprice) / 2 FROM orders);
              SELECT o_orderpriority AS priority,
                     count(*) AS n_above,
                     CAST(min(o_orderkey) AS BIGINT) AS first_key
              FROM orders WHERE o_totalprice > threshold
              GROUP BY o_orderpriority
              ORDER BY priority;
            END
            """
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", prev)


QUERIES_SQL["sql_scripting_block"] = sql_scripting_block
ORACLES_SQL["sql_scripting_block"] = """
SELECT o_orderpriority AS priority, count(*) AS n_above,
       CAST(min(o_orderkey) AS BIGINT) AS first_key
FROM orders
WHERE o_totalprice > (SELECT max(o_totalprice) / 2 FROM orders)
GROUP BY o_orderpriority
ORDER BY priority
"""


# Identical recursive ANSI text for both engines. The decimal-key
# hierarchy (parent = floor(key/10)) turns the flat customer table
# into a 6-level tree rooted at keys < 10 — the org-chart/BOM
# recursion shape. floor(x/10.0) is exact for keys far below 2^53, so
# Spark's `/` (double) and DuckDB's agree bit-for-bit.
RECURSIVE_HIERARCHY_SQL = """
WITH RECURSIVE chain AS (
  SELECT c_custkey AS node, CAST(0 AS INT) AS depth
  FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey AS node, chain.depth + 1 AS depth
  FROM customer c
  JOIN chain ON CAST(floor(c.c_custkey / 10.0) AS BIGINT) = chain.node
  WHERE c.c_custkey >= 10
)
SELECT depth, count(*) AS n_nodes, CAST(sum(node) AS BIGINT) AS sum_keys
FROM chain GROUP BY depth ORDER BY depth
"""


def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE) walking a 6-level
    hierarchy over customer keys, grouped by depth. Each recursion
    round is one join+filter over the previous frontier — the same
    iterative join+agg shape as the DataFrame connected-components
    loop (ext/dedup.py), here expressed declaratively and run from
    the very same SQL text DuckDB executes."""
    register_views(spark, sf_dir, tables=("customer",))
    return spark.sql(RECURSIVE_HIERARCHY_SQL)


QUERIES_SQL["sql_recursive_hierarchy"] = sql_recursive_hierarchy
ORACLES_SQL["sql_recursive_hierarchy"] = RECURSIVE_HIERARCHY_SQL


GROUP_BY_ALL_SQL = """
SELECT n_name AS nation, o_orderstatus AS status,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ALL
ORDER BY ALL
"""


def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL: the modern analyst-SQL surface
    (grouping keys inferred from the non-aggregate select list) —
    IDENTICAL query text executes on both engines."""
    register_views(spark, sf_dir, tables=("orders", "customer", "nation"))
    return spark.sql(GROUP_BY_ALL_SQL)


QUERIES_SQL["sql_group_by_all"] = sql_group_by_all
ORACLES_SQL["sql_group_by_all"] = GROUP_BY_ALL_SQL


def ansi_safe_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode safe arithmetic (Spark 4 runs ANSI ON by default —
    overflow/div-by-zero THROW): the try_* family returns NULL where
    strict ANSI would fail, the semantics the reference's
    int(x or 0)-style guards approximate. try_divide on a sometimes-
    zero denominator, try_add at bigint range edge, try_to_number on
    mixed-validity strings, try_element_at past array end — each
    mirrored by an explicit CASE guard in the oracle."""
    orders = load_table(spark, sf_dir, "orders")
    zero_when_low = F.when(
        F.col("o_orderpriority") == "5-LOW", F.lit(0)
    ).otherwise(F.col("o_custkey") % 7)
    return orders.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), zero_when_low).alias("safe_ratio"),
        F.try_add(
            F.lit(9223372036854775807).cast("long"),
            (F.col("o_custkey") % 2).cast("long"),
        ).alias("safe_add"),
        F.try_element_at(
            F.array(F.lit(1), F.lit(2)), (F.col("o_custkey") % 4 + 1).cast("int")
        ).alias("safe_elem"),
    )
    # No trailing orderBy: the gate hash is order-insensitive, and a
    # global range-sort of a row-per-order projection is exactly the
    # Exchange+Sort a 100 TB sink write would never pay.


QUERIES_SQL["ansi_safe_math"] = ansi_safe_math

ORACLES_SQL["ansi_safe_math"] = """
SELECT o_orderkey,
  CASE WHEN (CASE WHEN o_orderpriority = '5-LOW' THEN 0
             ELSE o_custkey % 7 END) = 0 THEN NULL
       ELSE o_totalprice / (CASE WHEN o_orderpriority = '5-LOW' THEN 0
                            ELSE o_custkey % 7 END) END AS safe_ratio,
  CASE WHEN o_custkey % 2 = 0 THEN 9223372036854775807 END AS safe_add,
  CASE WHEN o_custkey % 4 + 1 <= 2
       THEN CAST(o_custkey % 4 + 1 AS INT) END AS safe_elem
FROM orders
ORDER BY o_orderkey
"""


def collated_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 COLLATION surface: grouping under UTF8_LCASE compares
    case-insensitively at the COLLATION level (no lower() rewrite of
    the data). A deterministically case-mangled priority column groups
    back to 5 rows; min() picks the collation-smallest variant. The
    oracle reproduces the semantics with explicit lower() keys and the
    same representative rule."""
    orders = load_table(spark, sf_dir, "orders")
    mangled = F.when(
        F.col("o_orderkey") % 3 == 0, F.upper("o_orderpriority")
    ).when(
        F.col("o_orderkey") % 3 == 1, F.lower("o_orderpriority")
    ).otherwise(F.col("o_orderpriority"))
    df = orders.select(
        F.collate(mangled, "UTF8_LCASE").alias("priority_ci"),
        F.expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").alias("cents"),
    )
    return (
        df.groupBy("priority_ci")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
        )
        .select(
            # project a collation-free canonical key for the compare
            F.lower(F.col("priority_ci").cast("string")).alias("priority"),
            "n_orders",
            "sum_cents",
        )
        .orderBy("priority")
    )


QUERIES_SQL["collated_grouping"] = collated_grouping

ORACLES_SQL["collated_grouping"] = """
WITH m AS (
  SELECT CASE WHEN o_orderkey % 3 = 0 THEN upper(o_orderpriority)
              WHEN o_orderkey % 3 = 1 THEN lower(o_orderpriority)
              ELSE o_orderpriority END AS mangled,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders
)
SELECT lower(mangled) AS priority,
       count(*) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM m
GROUP BY lower(mangled)
ORDER BY priority
"""


# --- Spark 4 SQL UDFs + IDENTIFIER clause (round 5) -----------------
# Scalar and TABLE functions defined in pure SQL (CREATE TEMPORARY
# FUNCTION ... RETURN ...) — logic shared with analysts without
# leaving the optimizer (the body inlines into the plan, unlike a
# Python UDF), and IDENTIFIER(:param) — injection-safe templating for
# table/column NAMES, the dimension value parameter markers cannot
# reach. Oracles inline the expanded bodies: a SQL UDF is
# macro-expansion by design, so the twin is the same dataflow.

_BAND_CASE = (
    "CASE WHEN {c} < 5000000 THEN 'small'"
    " WHEN {c} < 20000000 THEN 'mid'"
    " ELSE 'large' END"
)


def sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar SQL UDF: a revenue-band classifier created with CREATE
    TEMPORARY FUNCTION ... RETURN <expr> and used in a rollup. The
    body is a plain CASE over exact cents, so Catalyst inlines it
    into whole-stage codegen — zero serialization boundary, unlike
    any Python UDF."""
    register_views(spark, sf_dir, tables=("orders",))
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION revenue_band(cents BIGINT)"
        " RETURNS STRING RETURN " + _BAND_CASE.format(c="cents")
    )
    return spark.sql(
        """
        SELECT revenue_band(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                 AS band,
               count(*) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                 AS BIGINT) AS sum_cents
        FROM orders WHERE o_totalprice IS NOT NULL
        GROUP BY 1 ORDER BY band
        """
    )


QUERIES_SQL["sql_udf_scalar"] = sql_udf_scalar
ORACLES_SQL["sql_udf_scalar"] = f"""
WITH cents AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
  FROM orders WHERE o_totalprice IS NOT NULL
)
SELECT {_BAND_CASE.format(c="c")} AS band,
       count(*) AS n_orders,
       CAST(sum(c) AS BIGINT) AS sum_cents
FROM cents GROUP BY 1 ORDER BY band
"""

SQL_UDF_TOPK = 10


def sql_udf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLE-valued SQL UDF: top-k customers by exact order revenue
    as CREATE TEMPORARY FUNCTION ... RETURNS TABLE(...) — the
    parameterized-view surface. The cap is a row_number predicate,
    not LIMIT k (a function argument is not foldable, so LIMIT
    rejects it — the same reason the engine's top-k queries ride
    WindowGroupLimit)."""
    register_views(spark, sf_dir, tables=("orders",))
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION top_spenders(k BIGINT)
        RETURNS TABLE(o_custkey BIGINT, cents BIGINT) RETURN
        SELECT o_custkey, cents FROM (
          SELECT o_custkey,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS cents,
                 row_number() OVER (
                   ORDER BY sum(CAST(floor(o_totalprice * 100 + 0.5)
                     AS BIGINT)) DESC, o_custkey ASC
                 ) AS rn
          FROM orders
          WHERE o_totalprice IS NOT NULL AND o_custkey IS NOT NULL
          GROUP BY o_custkey
        ) WHERE rn <= k
        """
    )
    return spark.sql(f"SELECT * FROM top_spenders({SQL_UDF_TOPK})")


QUERIES_SQL["sql_udf_table"] = sql_udf_table
ORACLES_SQL["sql_udf_table"] = f"""
SELECT o_custkey, cents FROM (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
           AS BIGINT) AS cents,
         row_number() OVER (
           ORDER BY sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             DESC, o_custkey ASC
         ) AS rn
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_custkey IS NOT NULL
  GROUP BY o_custkey
) x WHERE rn <= {SQL_UDF_TOPK}
ORDER BY cents DESC, o_custkey
"""


def sql_identifier_param(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER(:param) templating: the table AND the grouping
    column arrive as parameters but bind as identifiers, not values —
    the injection-safe way to write one rollup over many tables that
    string interpolation can't match. The oracle is the resolved
    query."""
    register_views(spark, sf_dir, tables=("orders",))
    return spark.sql(
        """
        SELECT IDENTIFIER(:col) AS group_key, count(*) AS n,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                 AS BIGINT) AS cents
        FROM IDENTIFIER(:tbl)
        WHERE o_totalprice IS NOT NULL
        GROUP BY IDENTIFIER(:col) ORDER BY group_key
        """,
        args={"tbl": "orders", "col": "o_orderpriority"},
    )


QUERIES_SQL["sql_identifier_param"] = sql_identifier_param
ORACLES_SQL["sql_identifier_param"] = """
SELECT o_orderpriority AS group_key, count(*) AS n,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
WHERE o_totalprice IS NOT NULL
GROUP BY o_orderpriority ORDER BY group_key
"""
