"""DuckDB oracles for the windowed/sessionized event queries.

Session-window twin: Spark's ``session_window(ts, gap)`` starts a new
session when an event is >= gap after the previous one (window ends
are exclusive at last+gap) — the classic gaps-and-islands SQL below
uses ``>= INTERVAL`` to match exactly.
"""

from __future__ import annotations

_TUMBLING = f"""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(floor((value) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""

# Hopping 1h/30m windows: every event belongs to exactly two windows,
# starting at its 30-minute bucket and at that bucket minus 30min —
# the unnest reproduces Spark's map-side window fan-out.
_HOPPING = """
WITH fanout AS (
  SELECT event_type, value,
         unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                 time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE
                ]) AS window_start
  FROM events
)
SELECT window_start, event_type, count(*) AS n_events,
       CAST(sum(CAST(floor((value) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) / 100.0
         AS sum_value
FROM fanout
GROUP BY 1, 2
ORDER BY window_start, event_type
"""

ORACLES_STREAMING: dict[str, str] = {
    "events_tumbling_window": _TUMBLING,
    "streaming_tumbling_window": _TUMBLING,
    "events_hopping_window": _HOPPING,
    "streaming_hopping_window": _HOPPING,
    "streaming_stateful_user_stats": f"""
WITH last AS (
  SELECT user_id, event_id,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC) AS rn
  FROM events
),
agg AS (
  SELECT user_id, count(*) AS n_events,
         CAST(sum(CAST(floor((value) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
  FROM events GROUP BY user_id
)
SELECT a.user_id, a.n_events, a.sum_value, l.event_id AS last_event_id
-- NULL-safe key match: a NULL user_id is a legitimate GROUP BY group
-- in both engines and the stateful operator keeps it; a plain
-- equi-join would silently drop that group from the oracle only.
FROM agg a JOIN last l ON a.user_id IS NOT DISTINCT FROM l.user_id AND l.rn = 1
ORDER BY a.user_id
""",
    "streaming_stream_stream_join": """
SELECT e.event_id AS error_id, p.event_id AS purchase_id,
       e.user_id, e.ts AS e_ts, p.ts AS p_ts
FROM events e JOIN events p
  ON e.user_id = p.user_id
 AND e.event_type = 'error' AND p.event_type = 'purchase'
 AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 30 MINUTE
ORDER BY error_id, purchase_id
""",
    "streaming_static_enrich": f"""
SELECT coalesce(c.c_mktsegment, 'UNKNOWN') AS segment,
       count(*) AS n_events,
       CAST(sum(CAST(floor((e.value) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1 ORDER BY segment
""",
    "streaming_dedup_ids": """
SELECT DISTINCT event_id FROM events ORDER BY event_id
""",
    # Twin of streaming_merge_cdc: same pure-function CDC derivation
    # from o_orderkey, global keep-last-by-seq, tombstones dropped at
    # read time. Batch splitting is irrelevant by construction (the
    # merge is associative), so one global window reproduces the
    # 3-micro-batch streaming result exactly.
    "streaming_merge_cdc": """
WITH cents AS (
  SELECT o_orderkey AS k, CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS pc
  FROM orders
),
all_ops AS (
  SELECT k AS key, pc AS price_cents, 'S' AS op, CAST(0 AS BIGINT) AS seq FROM cents
  UNION ALL
  SELECT k, pc + 100, 'U', CAST(k * 2 + 1 AS BIGINT) FROM cents WHERE k % 7 IN (1, 2)
  UNION ALL
  SELECT k, NULL, 'D', CAST(k * 2 + 1 AS BIGINT) FROM cents WHERE k % 7 = 0
  UNION ALL
  SELECT k + 100000000, pc, 'I', CAST(k * 2 + 2 AS BIGINT) FROM cents WHERE k % 11 = 0
  UNION ALL
  SELECT k, pc + 200, 'U', CAST(k * 2 + 3 AS BIGINT) FROM cents WHERE k % 14 = 1
),
last AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
    FROM all_ops
  ) WHERE rn = 1
)
SELECT key, CAST(price_cents AS DOUBLE) / 100 AS price,
       op AS last_op, seq AS last_seq
FROM last WHERE op <> 'D'
ORDER BY key
""",
    # Twin of streaming_incremental_agg: additive partials over any
    # batch split sum to the plain batch aggregate.
    "streaming_incremental_agg": """
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(floor((value) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) / 100.0
         AS sum_value
FROM events GROUP BY event_type ORDER BY event_type
""",
    "events_session_window": f"""
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts, value,
    sum(new_session) OVER (
      PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
    ) AS session_id
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) AS session_last,
       count(*) AS n_events,
       CAST(sum(CAST(floor((value) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_start
""",
}

# The streaming session-window gate shares the batch oracle: a fully
# consumed availableNow source in complete mode produces the final
# session set, identical to the batch aggregation.
ORACLES_STREAMING["streaming_session_window"] = ORACLES_STREAMING[
    "events_session_window"
]

# Left side bounded 3 days before the data's end -> every outer
# window is closed by the final watermark, so the batch left join is
# exact.
ORACLES_STREAMING["streaming_outer_join_unmatched"] = """
SELECT e.event_id AS error_id, p.event_id AS purchase_id,
       e.user_id, e.ts AS e_ts, p.ts AS p_ts
FROM events e LEFT JOIN events p
  ON e.user_id = p.user_id
 AND p.event_type = 'purchase'
 AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 30 MINUTE
WHERE e.event_type = 'error' AND e.ts < TIMESTAMP '2024-01-28 00:00:00'
ORDER BY error_id, purchase_id
"""


ORACLES_STREAMING["ivm_join_view"] = """
SELECT c_nationkey AS nation, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY nation
ORDER BY nation
"""


# chained join->agg: batch join + daily rollup, filtered by the SAME
# eviction rule the streaming engine applies at end-of-stream (day
# window closed iff its end <= global watermark = least of the two
# sides' max event time - 1h)
ORACLES_STREAMING["streaming_chained_join_agg"] = """
WITH e AS (SELECT user_id, ts FROM events WHERE event_type = 'error'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
pairs AS (
  SELECT p.ts AS p_ts
  FROM e JOIN p ON e.user_id = p.user_id
   AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 30 MINUTE
),
wm AS (
  SELECT least((SELECT max(ts) FROM e), (SELECT max(ts) FROM p))
         - INTERVAL 1 HOUR AS w
),
daily AS (
  SELECT CAST(date_trunc('day', p_ts) AS TIMESTAMP) AS day,
         count(*) AS n_conversions
  FROM pairs GROUP BY day
)
SELECT day, n_conversions
FROM daily
WHERE day + INTERVAL 1 DAY <= (SELECT w FROM wm)
ORDER BY day
"""


# chained dedup->agg: daily counts, filtered by the end-of-stream
# eviction rule (day closed iff day_end <= max(ts) - 1h); event_ids
# are unique so the dedup stage passes every row through
ORACLES_STREAMING["streaming_chained_dedup_agg"] = """
WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events),
daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         count(*) AS n_events
  FROM events GROUP BY day
)
SELECT day, n_events FROM daily
WHERE day + INTERVAL 1 DAY <= (SELECT w FROM wm)
ORDER BY day
"""


# Dynamic gap: the previous session END is the running MAX of all
# earlier interval ends (an early error event's 60-minute hold can
# outlast several later short-gap events), so the island break tests
# ts against that running max, not lag(ts) + gap.
ORACLES_STREAMING["events_session_dynamic_gap"] = """
WITH g AS (
  SELECT user_id, ts, value,
    CASE WHEN event_type = 'error' THEN INTERVAL 60 MINUTE
         ELSE INTERVAL 15 MINUTE END AS gap
  FROM events
),
m AS (
  SELECT user_id, ts, value,
    max(ts + gap) OVER (
      PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ) AS prev_end
  FROM g
),
f AS (
  SELECT user_id, ts, value,
    CASE WHEN prev_end IS NULL OR ts >= prev_end THEN 1 ELSE 0 END AS brk
  FROM m
),
i AS (
  SELECT user_id, ts, value,
    sum(brk) OVER (
      PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
    ) AS island
  FROM f
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) AS session_last,
       count(*) AS n_events,
       CAST(sum(CAST(floor((value) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) / 100.0
         AS sum_value
FROM i
GROUP BY user_id, island
ORDER BY user_id, session_start
"""

# Streaming dynamic-gap sessions share the batch oracle: complete-mode
# output of a fully-consumed availableNow source is the final session
# set of the same plan.
ORACLES_STREAMING["streaming_session_dynamic_gap"] = ORACLES_STREAMING[
    "events_session_dynamic_gap"
]


from youtube_etl_automated_pipeline_spark.plans.oracles_ext import (  # noqa: E402
    winnow_fp_ctes,
)
from youtube_etl_automated_pipeline_spark.plans.queries_ext import (  # noqa: E402
    PLANT_EVERY_SUB,
    PLANT_OFFSET_SUB,
)

ORACLES_STREAMING["streaming_dedup_fingerprint_probe"] = f"""
WITH probes_src AS (
  SELECT doc_id + {PLANT_OFFSET_SUB} AS doc_id, substr(text, 21, 160) AS text
  FROM documents WHERE doc_id % {PLANT_EVERY_SUB} = 0
),
corpus_src AS (
  SELECT doc_id, text FROM documents
),
{winnow_fp_ctes("probes_src", "p_")},
{winnow_fp_ctes("corpus_src", "c_")}
SELECT p.doc_id AS probe_id, c.doc_id AS src_id,
       CAST(count(*) AS BIGINT) AS n_shared
FROM p_fp p JOIN c_fp c ON p.h1 = c.h1 AND p.h2 = c.h2
GROUP BY 1, 2
ORDER BY probe_id, src_id
"""

ORACLES_STREAMING["streaming_tws_user_peaks"] = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS peak_cents
FROM events
GROUP BY user_id
ORDER BY user_id
"""

ORACLES_STREAMING["streaming_tws_user_topk"] = """
WITH c AS (
  SELECT user_id,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
         row_number() OVER (
           PARTITION BY user_id ORDER BY
           CAST(floor(value * 100.0 + 0.5) AS BIGINT) DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS cnt
  FROM events
)
SELECT user_id,
       CAST(max(cnt) AS BIGINT) AS n_seen,
       string_agg(CAST(cents AS VARCHAR), '|' ORDER BY cents DESC)
         FILTER (rn <= 3) AS top_cents
FROM c
GROUP BY user_id
ORDER BY user_id
"""

ORACLES_STREAMING["streaming_tws_type_counts"] = """
SELECT user_id, COALESCE(event_type, '<null>') AS event_type,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY 1, 2
ORDER BY user_id, event_type
"""

ORACLES_STREAMING["streaming_tws_inactive_users"] = """
WITH s AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(max(epoch_ms(ts)) AS BIGINT) AS last_ms
  FROM events GROUP BY user_id
),
g AS (SELECT max(epoch_ms(ts)) AS gmax FROM events)
SELECT user_id, n_events, last_ms
FROM s CROSS JOIN g
WHERE last_ms + 7200000 <= gmax - 3600000
ORDER BY user_id
"""


def _debounce_oracle() -> str:
    from youtube_etl_automated_pipeline_spark.plans.queries_engine5d import (
        ORACLES_ENGINE5D,
    )

    return ORACLES_ENGINE5D["event_debounce_dedup"]


# The streaming debounce census shares the batch twin's oracle: a
# fully-consumed availableNow source in complete mode yields the final
# session set, and n_kept == session count at gap = DEBOUNCE_SECONDS
# (strict-< merge rule pinned by tests/test_engine5d.py).
ORACLES_STREAMING["streaming_debounce_census"] = _debounce_oracle()


def _linear_count_oracle() -> str:
    """Deterministic streaming distinct via linear counting: the
    oracle rebuilds the identical bucket-occupancy sketch from the
    batch table (a fully-consumed availableNow complete-mode run
    equals the batch aggregate) and serves the estimate from the SAME
    Python-computed integer table the Spark plan inlines — zero
    runtime float ops on either side."""
    from youtube_etl_automated_pipeline_spark.plans.queries_streaming import (
        LC_BUCKETS,
        LC_EST_TABLE,
    )

    tbl = "ARRAY[" + ", ".join(str(v) for v in LC_EST_TABLE) + "]"
    return f"""
WITH h AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)
           % {LC_BUCKETS} AS bucket
  FROM events
),
b AS (
  SELECT window_start, event_type, bucket FROM h GROUP BY 1, 2, 3
),
est AS (
  SELECT window_start, event_type,
         CAST(count(*) AS BIGINT) AS occ_buckets,
         CAST(({tbl})[count(*) + 1] AS BIGINT) AS est_users
  FROM b GROUP BY 1, 2
),
ex AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events GROUP BY 1, 2
)
SELECT e.window_start, e.event_type, occ_buckets, est_users, exact_users
FROM est e JOIN ex USING (window_start, event_type)
ORDER BY e.window_start, e.event_type
"""


ORACLES_STREAMING["streaming_linear_count_users"] = _linear_count_oracle()


def _minhash_dedup_oracle() -> str:
    """Streaming MinHash dedup twin: a fully-consumed availableNow
    complete-mode run makes the streamed bucket->canon index equal the
    batch min(doc_id)-per-bucket aggregate, so the whole pipeline is
    batch SQL. Every hash/permutation/threshold constant is imported
    from the SAME modules the Spark plan uses (via the batch dedup
    oracle's fragment builders) — the engines cannot drift. sigs is
    MATERIALIZED: the band fan-out scans it N_PERM+2 times and the
    shingle-hash expressions must not be re-derived per scan."""
    from youtube_etl_automated_pipeline_spark.ext.dedup import N_PERM
    from youtube_etl_automated_pipeline_spark.plans.oracles_dedup_adv import (
        _JACC,
        _SH_HASHES,
        _sig,
    )
    from youtube_etl_automated_pipeline_spark.plans.queries_dedup_adv import (
        JACCARD_THRESHOLD,
    )

    band_union = " UNION ALL ".join(
        f"SELECT doc_id, {j} AS band_id, sig_{j} AS sig FROM sigs"
        for j in range(N_PERM)
    )
    return f"""
WITH base AS (
  SELECT doc_id, {_SH_HASHES} AS hs
  FROM documents
  WHERE len({_SH_HASHES}) >= 3
),
sigs AS MATERIALIZED (
  SELECT doc_id, hs,
    {", ".join(f"{_sig(j)} AS sig_{j}" for j in range(N_PERM))}
  FROM base
),
bands AS MATERIALIZED ({band_union}),
buckets AS (
  SELECT band_id, sig, min(doc_id) AS canon_doc
  FROM bands GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT bk.canon_doc AS doc_a, b.doc_id AS doc_b
  FROM bands b JOIN buckets bk USING (band_id, sig)
  WHERE b.doc_id > bk.canon_doc
),
pairs AS (
  SELECT c.doc_a, c.doc_b,
    len(list_intersect(a.hs, b.hs)) AS n_inter,
    len(list_distinct(list_concat(a.hs, b.hs))) AS n_union
  FROM cand c
  JOIN sigs a ON a.doc_id = c.doc_a
  JOIN sigs b ON b.doc_id = c.doc_b
)
SELECT doc_a, doc_b, {_JACC} AS jaccard
FROM pairs
WHERE ({_JACC}) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


ORACLES_STREAMING["streaming_minhash_dedup"] = _minhash_dedup_oracle()
