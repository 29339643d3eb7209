"""DuckDB oracle for pipeline_e2e — the whole A-AD chain in SQL.

Mirrors plans/queries_pipeline.py stage by stage; literal dims are
generated from the same Python lists so the two sides cannot drift.
"""

from __future__ import annotations

from youtube_etl_automated_pipeline_spark.ext.textstats import WS_CLASS as _WS
from youtube_etl_automated_pipeline_spark.plans.queries_pipeline import (
    CPM_ROWS,
    RESOURCE_ROWS,
    SHOWNAMES_ROWS,
)


def _sql_lit(v) -> str:
    if v is None:
        return "CAST(NULL AS VARCHAR)"
    return "'" + str(v).replace("'", "''") + "'"


def _values(rows, with_ord: bool) -> str:
    out = []
    for i, r in enumerate(rows):
        cells = ", ".join(_sql_lit(c) for c in r)
        out.append(f"({cells}, {i + 1})" if with_ord else f"({cells})")
    return ",\n  ".join(out)


_TOKEN_SQL = (
    "CASE WHEN o_orderkey % 11 = 0 THEN CAST(o_orderkey % 1000 AS VARCHAR) "
    "WHEN o_orderkey % 13 = 0 THEN 'abcd' "
    "ELSE substr('ABCDEFGHIJ', CAST(1 + o_orderkey % 5 AS INT), CAST(2 + o_orderkey % 4 AS INT)) END"
)
_TOKEN2_SQL = "substr('KLMNOPQRST', CAST(1 + o_orderkey % 5 AS INT), 3)"
_PUB_AT_SQL = (
    "strftime(o_orderdate + (o_orderkey % 86400) * INTERVAL 1 SECOND, "
    "'%Y-%m-%dT%H:%M:%SZ')"
)


def _r(expr: str, dp: int) -> str:
    p = float(10**dp)
    return f"floor(({expr}) * {p!r} + 0.5) / {p!r}"


ORACLES_PIPELINE: dict[str, str] = {}

ORACLES_PIPELINE["pipeline_e2e"] = f"""
WITH
shownames_raw(code, show_name, broadcaster, category, _ord) AS (VALUES
  {_values(SHOWNAMES_ROWS, True)}),
shownames AS (
  SELECT code, show_name, broadcaster, category FROM (
    SELECT *, row_number() OVER (PARTITION BY code ORDER BY _ord DESC) AS _rn
    FROM shownames_raw) WHERE _rn = 1),
resource_names(employee_code, team) AS (VALUES
  {_values(RESOURCE_ROWS, False)}),
cpm_categories(show_name, cpm_category) AS (VALUES
  {_values(CPM_ROWS, False)}),
channels_raw AS (
  SELECT 'CH' || CAST(n_nationkey AS VARCHAR) AS channel_id,
         n_name AS channel_name, 1 AS _seq
  FROM nation
  UNION ALL
  SELECT 'CH' || CAST(n_nationkey AS VARCHAR), n_name || '_V2', 2
  FROM nation WHERE n_nationkey % 2 = 0),
channels AS (
  SELECT channel_id, channel_name FROM (
    SELECT *, row_number() OVER (PARTITION BY channel_id ORDER BY _seq DESC) AS _rn
    FROM channels_raw) WHERE _rn = 1),
videos_raw AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS video_id,
         'Video ' || o_orderpriority || ' | ' || {_TOKEN_SQL} AS title,
         'CH' || CAST(o_custkey % 30 AS VARCHAR) AS channel_id,
         {_PUB_AT_SQL} AS published_at,
         1 AS ingest_seq
  FROM orders
  UNION ALL
  SELECT CAST(o_orderkey AS VARCHAR),
         'Video RESTATED | ' || {_TOKEN2_SQL},
         'CH' || CAST(o_custkey % 30 AS VARCHAR),
         {_PUB_AT_SQL},
         2
  FROM orders WHERE o_orderkey % 7 = 0),
videos AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY video_id ORDER BY ingest_seq DESC) AS _rn
    FROM videos_raw) WHERE _rn = 1),
with_channel AS (
  SELECT v.video_id, v.title, v.published_at,
         coalesce(c.channel_name, 'Unknown Channel') AS channel_name
  FROM videos v LEFT JOIN channels c USING (channel_id)),
raw_codes AS (
  SELECT *, list_extract(
      string_split_regex(trim(regexp_replace(title, '\\|', ' ', 'g')), '{_WS}+'), -1)
    AS raw_code
  FROM with_channel),
codes AS (
  SELECT * EXCLUDE (raw_code),
    CASE WHEN length(raw_code) IN (3, 4, 5)
          AND NOT regexp_matches(raw_code, '^[0-9]+$')
          AND length(regexp_replace(raw_code, '[^\\p{{Ll}}]', '', 'g')) <= 1
         THEN raw_code ELSE '' END AS main_code
  FROM raw_codes),
codes2 AS (
  SELECT *,
    length(main_code) AS code_len,
    CASE WHEN length(main_code) = 4 THEN substr(main_code, 1, 2)
         ELSE substr(main_code, 1, 3) END AS code,
    CASE WHEN main_code = '' THEN '' ELSE right(main_code, 1) END AS resource_code
  FROM codes),
with_resource AS (
  SELECT c2.*, coalesce(r.team, '') AS resource_name
  FROM codes2 c2 LEFT JOIN resource_names r ON r.employee_code = c2.resource_code),
with_show AS (
  SELECT w.*,
    CASE WHEN s.code IS NULL THEN '' ELSE s.show_name END AS show_name,
    CASE WHEN s.code IS NULL THEN '' ELSE s.broadcaster END AS broadcaster,
    CASE WHEN s.code IS NULL THEN '' ELSE s.category END AS category
  FROM with_resource w LEFT JOIN shownames s ON s.code = w.code),
analytics AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS video_id,
    CASE WHEN l_orderkey % 3 = 0 THEN 'VIDEO'
         WHEN l_orderkey % 3 = 1 THEN 'SHORTS' ELSE 'LIVE' END AS content_type,
    CASE WHEN l_orderkey % 17 = 0 THEN 0
         ELSE CAST(floor(sum(l_quantity)) AS BIGINT) END AS views,
    (CAST(sum(CAST(floor((l_extendedprice) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) / 100.0) / 100.0 AS minutes_watched,
    (l_orderkey * 37) % 7200 AS avg_view_duration,
    count(*) AS comments,
    CAST(floor(sum(l_quantity)) AS BIGINT) % 100 AS likes,
    count(*) % 7 AS shares,
    {_r("(CAST(sum(CAST(floor((l_extendedprice * l_discount) * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0) / 10.0", 4)} AS estimated_revenue,
    {_r("(CAST(sum(CAST(floor((l_tax) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / CAST(count(l_tax) AS DOUBLE) / 100.0 * 100.0)", 6)} AS cpm,
    CASE WHEN l_orderkey % 19 = 0 THEN NULL ELSE count(*) END AS subscribers_gained,
    count(*) % 5 AS subscribers_lost
  FROM lineitem WHERE l_orderkey % 5 <> 1
  GROUP BY l_orderkey),
merged AS (
  SELECT w.*, a.content_type, a.views, a.minutes_watched, a.avg_view_duration,
         a.comments, a.likes, a.shares, a.estimated_revenue, a.cpm,
         a.subscribers_gained, a.subscribers_lost
  FROM with_show w LEFT JOIN analytics a USING (video_id))
SELECT
  video_id,
  title,
  channel_name,
  published_at,
  main_code,
  code_len,
  code,
  resource_code,
  resource_name,
  show_name,
  broadcaster,
  category,
  -- COALESCE to '': the engine's utc_to_local_date_time contract is
  -- ('','') on empty/malformed input (reference parity), and Spark
  -- emits '' where strftime here would emit NULL
  COALESCE(strftime(try_strptime(published_at, '%Y-%m-%dT%H:%M:%SZ')
    + INTERVAL 5 HOUR, '%Y-%m-%d'), '') AS published_date_local,
  COALESCE(strftime(try_strptime(published_at, '%Y-%m-%dT%H:%M:%SZ')
    + INTERVAL 5 HOUR, '%H:%M:%S'), '') AS published_time_local,
  content_type,
  views,
  {_r("coalesce(minutes_watched, 0) / 60.0", 2)} AS watch_hours,
  coalesce(avg_view_duration, 0) // 3600 || ':' ||
    lpad(CAST((coalesce(avg_view_duration, 0) % 3600) // 60 AS VARCHAR), 2, '0') || ':' ||
    lpad(CAST(coalesce(avg_view_duration, 0) % 60 AS VARCHAR), 2, '0')
    AS avg_view_duration_hms,
  comments,
  likes,
  shares,
  estimated_revenue,
  cpm,
  subscribers_gained,
  subscribers_lost,
  CAST(coalesce(subscribers_gained, 0) - coalesce(subscribers_lost, 0) AS BIGINT)
    AS net_subscribers,
  {_r("CASE WHEN coalesce(views, 0) > 0 THEN (coalesce(comments,0) + coalesce(likes,0) + coalesce(shares,0)) / coalesce(views, 0) * 100.0 ELSE 0 END", 2)}
    AS engagement_pct,
  {_r("CASE WHEN coalesce(views, 0) > 0 THEN coalesce(estimated_revenue, 0) / coalesce(views, 0) ELSE 0 END", 6)}
    AS cpv,
  {_r("CASE WHEN coalesce(views, 0) > 0 THEN coalesce(estimated_revenue, 0) / coalesce(views, 0) ELSE 0 END * 1000.0", 2)}
    AS rpm,
  CASE WHEN trim(coalesce(category, '')) = 'International News'
       THEN coalesce(show_name, '')
       ELSE coalesce(cc.cpm_category, '') END AS cpm_category
FROM merged LEFT JOIN cpm_categories cc USING (show_name)
ORDER BY video_id
"""
