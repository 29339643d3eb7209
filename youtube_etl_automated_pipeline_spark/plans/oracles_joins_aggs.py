"""DuckDB oracles for plans/queries_joins_aggs.py (same conventions as
plans/oracles.py: floor-based rounding, BIGINT casts for int sums)."""

from __future__ import annotations

ORACLES_JOINS_AGGS: dict[str, str] = {}

ORACLES_JOINS_AGGS["broadcast_enrich_defaults"] = """
WITH dim_raw AS (
  SELECT n_nationkey, n_name, 1 AS _seq FROM nation WHERE n_nationkey < 20
  UNION ALL
  SELECT n_nationkey, n_name || '_V2' AS n_name, 2 AS _seq
  FROM nation WHERE n_nationkey < 20 AND n_nationkey % 2 = 0
),
dim AS (
  SELECT n_nationkey, n_name FROM (
    SELECT *, row_number() OVER (PARTITION BY n_nationkey ORDER BY _seq DESC) AS _rn
    FROM dim_raw
  ) WHERE _rn = 1
),
enriched AS (
  SELECT c.*, coalesce(d.n_name, 'Unknown Nation') AS n_name
  FROM customer c LEFT JOIN dim d ON c.c_nationkey = d.n_nationkey
)
SELECT n_name,
       count(*) AS n_customers,
       CAST(sum(CAST(floor((c_acctbal) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_acctbal
FROM enriched
GROUP BY n_name
ORDER BY n_name
"""

ORACLES_JOINS_AGGS["update_merge_revenue"] = """
WITH upd AS (
  SELECT l_orderkey AS o_orderkey,
         floor((CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0) * 100.0 + 0.5) / 100.0 AS line_revenue,
         count(*) AS n_lines
  FROM lineitem GROUP BY 1
)
SELECT o.o_orderkey, o.o_orderstatus,
       coalesce(u.line_revenue, 0.0) AS line_revenue,
       coalesce(u.n_lines, 0) AS n_lines
FROM orders o LEFT JOIN upd u ON o.o_orderkey = u.o_orderkey
ORDER BY o.o_orderkey
"""

ORACLES_JOINS_AGGS["two_key_rollup"] = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(floor((o_totalprice) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_total,
       floor((CAST(sum(CAST(floor((o_totalprice) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / CAST(count(o_totalprice) AS DOUBLE) / 100.0) * 10000.0 + 0.5) / 10000.0 AS avg_total
FROM orders
GROUP BY o_orderstatus, o_orderpriority
ORDER BY o_orderstatus, o_orderpriority
"""

ORACLES_JOINS_AGGS["min_over_group"] = """
SELECT o_custkey,
       strftime(min(o_orderdate), '%Y-%m-%d') AS first_order_date,
       strftime(max(o_orderdate), '%Y-%m-%d') AS last_order_date,
       count(*) AS n_orders
FROM orders
GROUP BY o_custkey
ORDER BY o_custkey
"""

ORACLES_JOINS_AGGS["rollup_region_nation"] = """
SELECT
  r_name AS region_name,
  n_name AS nation_name,
  count(*) AS n_customers,
  CAST(sum(CAST(floor((c_acctbal) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_acctbal,
  CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS INTEGER) AS grouping_level
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY region_name ASC NULLS FIRST, nation_name ASC NULLS FIRST
"""

ORACLES_JOINS_AGGS["window_analytics"] = """
SELECT
  o_orderkey,
  o_custkey,
  o_totalprice,
  rank() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC)
    AS price_rank,
  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate ASC NULLS LAST, o_orderkey)
    AS prev_total,
  CAST(sum(CAST(floor((o_totalprice) * 100.0 + 0.5) AS BIGINT)) OVER (
     PARTITION BY o_custkey ORDER BY o_orderdate ASC NULLS LAST, o_orderkey
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0
    AS running_total
FROM orders
ORDER BY o_orderkey
"""

ORACLES_JOINS_AGGS["set_ops_except_intersect"] = """
WITH buyers AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders),
cust AS (SELECT c_custkey FROM customer)
SELECT c_custkey, 'never_bought' AS segment_label
FROM (SELECT c_custkey FROM cust EXCEPT SELECT c_custkey FROM buyers)
UNION ALL
SELECT c_custkey, 'active' AS segment_label
FROM (SELECT c_custkey FROM cust INTERSECT SELECT c_custkey FROM buyers)
ORDER BY c_custkey
"""

ORACLES_JOINS_AGGS["distinct_count_audit"] = """
SELECT l_returnflag,
       count(DISTINCT l_orderkey) AS n_orders,
       count(DISTINCT l_partkey) AS n_parts,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


ORACLES_JOINS_AGGS["window_distribution_ranks"] = """
SELECT c_custkey, c_nationkey AS nation, c_acctbal,
       ntile(4) OVER w AS quartile,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC NULLS LAST, c_custkey)
ORDER BY nation, c_acctbal, c_custkey
"""

# JSON text built to match Spark's to_json byte-for-byte: sorted keys,
# no whitespace, integer values
ORACLES_JOINS_AGGS["user_event_type_map"] = """
WITH per_type AS (
  SELECT user_id, COALESCE(event_type, '<null>') AS event_type,
         count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id,
       '{' || string_agg('"' || event_type || '":' || n, ',' ORDER BY event_type)
           || '}' AS type_counts,
       CAST(sum(n) AS BIGINT) AS n_events
FROM per_type
GROUP BY user_id
ORDER BY user_id
"""


ORACLES_JOINS_AGGS["nation_revenue_share"] = """
WITH per_nation AS (
  SELECT r_name, n_name,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name AS region_name, n_name AS nation_name, cents,
       CAST(cents AS DOUBLE)
         / CAST(sum(cents) OVER (PARTITION BY r_name) AS DOUBLE) AS share_of_region,
       CAST(cents AS DOUBLE)
         / CAST(sum(cents) OVER () AS DOUBLE) AS share_of_total
FROM per_nation
ORDER BY region_name, nation_name
"""


ORACLES_JOINS_AGGS["null_safe_join_rollup"] = """
WITH keyed AS (
  SELECT o_orderkey, o_totalprice,
         CASE WHEN o_orderpriority <> '5-LOW'
              THEN CAST(o_custkey % 10 AS VARCHAR) END AS clerk_bucket
  FROM orders
),
dim AS (
  SELECT clerk_bucket, count(*) AS bucket_orders
  FROM keyed GROUP BY clerk_bucket
)
SELECT k.clerk_bucket,
       count(*) AS n_orders,
       CAST(max(d.bucket_orders) AS BIGINT) AS bucket_orders,
       CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS cents
FROM keyed k JOIN dim d ON k.clerk_bucket IS NOT DISTINCT FROM d.clerk_bucket
GROUP BY k.clerk_bucket
ORDER BY k.clerk_bucket NULLS FIRST
"""
