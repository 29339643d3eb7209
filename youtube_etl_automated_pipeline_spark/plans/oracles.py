"""DuckDB oracle SQL for every query in plans/queries.py.

Each statement is ANSI-ish SQL DuckDB runs over the same parquet
tables (pre-registered views). Column aliases match the Spark side
exactly. Engine-specific equivalences used:

- ``Asia/Karachi`` is UTC+05:00 with no DST for all modern dates, so
  the oracle uses ``ts + INTERVAL 5 HOUR`` where Spark uses
  ``from_utc_timestamp(ts, 'Asia/Karachi')``.
- DuckDB double->int CAST rounds; Spark truncates toward zero -> the
  oracle uses ``trunc()`` before casting.
- DuckDB ``sum(INTEGER)`` returns HUGEINT -> cast to BIGINT to match
  Spark's long.
- DuckDB ``regexp_replace`` needs the ``'g'`` flag to replace all
  occurrences (Spark replaces all by default).

Rounding of derived doubles uses ``floor(x * 10^dp + 0.5) / 10^dp``
(see functions/compat.py): exactly-specified IEEE ops, bit-identical
between Spark and DuckDB — native ``round()`` differs on shortest-repr
...5 values.
"""

from __future__ import annotations

from youtube_etl_automated_pipeline_spark.ext.textstats import WS_CLASS as _WS_CLASS
from youtube_etl_automated_pipeline_spark.functions.compat import (
    sql_hround,
    sql_xavg,
    sql_xsum,
)

ORACLES: dict[str, str] = {}

# exact-unit sum twins (see compat.xsum): integer-unit accumulation,
# CAST AS BIGINT (DuckDB sums to HUGEINT), single final division —
# textually mirrors the Spark expression chain op for op.
_REV_U = sql_xsum("l_extendedprice * (1 - l_discount)", 4)
_QTY_U = sql_xsum("l_quantity", 2)

ORACLES["flagship_enrich_dedup_agg"] = f"""
WITH latest_line AS (
  SELECT * FROM (
    SELECT l.*, row_number() OVER (
      PARTITION BY l_orderkey
      ORDER BY l_linenumber DESC, l_partkey DESC, l_suppkey DESC, l_extendedprice DESC) AS _rn
    FROM lineitem l
  ) WHERE _rn = 1
)
SELECT
  r_name AS region_name,
  n_name AS nation_name,
  count(*) AS n_orders,
  {sql_hround(_REV_U, 2)} AS revenue,
  {_QTY_U} AS sum_qty,
  {sql_hround(
      f"CASE WHEN sum(CAST(floor((l_quantity) * 100.0 + 0.5) AS BIGINT)) > 0"
      f" THEN ({_REV_U}) / ({_QTY_U}) ELSE 0.0 END", 4)} AS rev_per_qty
FROM latest_line
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY 1, 2
ORDER BY 1, 2
"""

ORACLES["q1_pricing_summary"] = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_xsum("l_quantity", 2)} AS sum_qty,
  {sql_xsum("l_extendedprice", 2)} AS sum_base_price,
  {sql_hround(sql_xsum("l_extendedprice * (1 - l_discount)", 4), 2)} AS sum_disc_price,
  {sql_hround(sql_xsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6), 2)} AS sum_charge,
  {sql_xavg("l_quantity", 2, 4)} AS avg_qty,
  {sql_xavg("l_extendedprice", 2, 4)} AS avg_price,
  {sql_xavg("l_discount", 2, 4)} AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLES["code_derivation_chain"] = f"""
WITH raw AS (
  SELECT
    p_partkey,
    p_name AS title,
    CASE WHEN p_name IS NULL OR trim(regexp_replace(p_name, '\\|', ' ', 'g')) = ''
         THEN ''
         ELSE list_extract(
                string_split_regex(trim(regexp_replace(p_name, '\\|', ' ', 'g')),
                                   '{_WS_CLASS}+'),
                -1)
    END AS raw_code
  FROM part
),
cleaned AS (
  SELECT *,
    length(raw_code) AS raw_len,
    CASE WHEN length(raw_code) IN (3, 4, 5)
          AND NOT regexp_matches(raw_code, '^[0-9]+$')
          AND length(regexp_replace(raw_code, '[^\\p{{Ll}}]', '', 'g')) <= 1
         THEN raw_code ELSE '' END AS main_code
  FROM raw
)
SELECT
  p_partkey,
  title,
  raw_code,
  raw_len,
  main_code,
  length(main_code) AS code_len,
  CASE WHEN length(main_code) = 4 THEN substr(main_code, 1, 2)
       ELSE substr(main_code, 1, 3) END AS code,
  CASE WHEN main_code = '' THEN '' ELSE right(main_code, 1) END AS resource_code
FROM cleaned
ORDER BY p_partkey
"""

ORACLES["date_time_ops"] = """
SELECT
  event_id,
  strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS published_at,
  strftime(ts + INTERVAL 5 HOUR, '%Y-%m-%d') AS published_date_local,
  strftime(ts + INTERVAL 5 HOUR, '%H:%M:%S') AS published_time_local,
  -- null seconds -> '' (Spark's concat_ws skips null parts and
  -- yields the empty string; pin the same here)
  CASE WHEN value IS NULL THEN '' ELSE
    CAST(trunc(value) AS BIGINT) // 3600 || ':' ||
    lpad(CAST((CAST(trunc(value) AS BIGINT) % 3600) // 60 AS VARCHAR), 2, '0') || ':' ||
    lpad(CAST(CAST(trunc(value) AS BIGINT) % 60 AS VARCHAR), 2, '0')
  END AS avg_view_duration_hms
FROM events
ORDER BY event_id
"""

ORACLES["keep_last_dedup"] = """
SELECT user_id, event_id, event_type, value
FROM (
  -- date_trunc to microseconds: the parquet stores nanos, Spark works
  -- at microsecond precision
  SELECT *, row_number() OVER (
    PARTITION BY user_id
    ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC) AS _rn
  FROM events
) WHERE _rn = 1
ORDER BY user_id
"""

ORACLES["merge_upsert_keep_last"] = """
WITH unioned AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         1 AS ingest_seq
  FROM orders
  UNION ALL
  SELECT o_orderkey, 'R' AS o_orderstatus, floor((o_totalprice * 1.1) * 100.0 + 0.5) / 100.0 AS o_totalprice,
         2 AS ingest_seq
  FROM orders WHERE o_orderkey % 10 = 0
)
SELECT o_orderkey, o_orderstatus, o_totalprice, ingest_seq
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY ingest_seq DESC) AS _rn
  FROM unioned
) WHERE _rn = 1
"""

ORACLES["waterfall_anti_join"] = """
WITH s1 AS (
  SELECT c_custkey FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
),
s2 AS (
  SELECT c_custkey FROM s1
  WHERE NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = s1.c_custkey
                      AND o.o_orderpriority = '3-MEDIUM')
)
SELECT c_custkey FROM s2
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = s2.c_custkey
                    AND o.o_orderpriority = '4-NOT SPECIFIED')
ORDER BY c_custkey
"""

ORACLES["top_k_orders"] = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM (
  SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
)
"""

ORACLES["derived_metrics"] = f"""
WITH per_order AS (
  SELECT
    l_orderkey,
    {sql_xsum("l_quantity", 2)} AS views,
    {sql_xsum("l_extendedprice", 2)} AS revenue,
    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returns,
    count(*) AS n_lines,
    {sql_xsum("l_tax", 2)} AS tax_sum
  FROM lineitem
  GROUP BY l_orderkey
)
SELECT
  l_orderkey,
  floor((revenue / 60.0) * 100.0 + 0.5) / 100.0 AS watch_hours,
  n_lines - returns AS net_lines,
  floor((CASE WHEN views > 0 THEN (returns + n_lines + tax_sum) / views * 100 ELSE 0 END) * 100.0 + 0.5) / 100.0
    AS engagement_pct,
  floor((CASE WHEN views > 0 THEN revenue / views ELSE 0 END) * 1000000.0 + 0.5) / 1000000.0 AS cpv,
  floor((CASE WHEN views > 0 THEN revenue / views ELSE 0 END * 1000) * 100.0 + 0.5) / 100.0 AS rpm
FROM per_order
ORDER BY l_orderkey
"""
