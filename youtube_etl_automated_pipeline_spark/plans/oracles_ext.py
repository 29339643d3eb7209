"""DuckDB oracles for the extension operators. Marker lists / hash
recipes are generated from ext.textstats constants so the two sides
cannot drift.
"""

from __future__ import annotations

from youtube_etl_automated_pipeline_spark.ext.textstats import (
    BPE_ISH_PATTERN,
    LANG_MARKERS,
    LANG_PRIORITY,
    WS_CHARS,
    WS_CLASS,
)

# WS_CLASS (explicit ASCII whitespace set) is shared with the Spark
# expressions: Java `\s`, RE2 `\s`, and Python `\s` are three
# different sets, a literal class is one.
_NORM = f"lower(regexp_replace(trim(text), '{WS_CLASS}+', ' ', 'g'))"
_TOKS = f"string_split_regex(trim(text), '{WS_CLASS}+')"
_CONTENT_FP = f"CAST('0x' || substr(md5({_NORM}), 1, 15) AS BIGINT)"


def _h8(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT)"


def _marker_cnt(lang: str) -> str:
    # COALESCE(text, '') pins NULL-text marker counts to 0 in both
    # engines (Spark size(NULL) = -1, DuckDB len(NULL) = NULL)
    parts = [
        f"len(regexp_extract_all(COALESCE(text, ''), '\\b{w}\\b'))"
        for w in LANG_MARKERS[lang]
    ]
    return "(" + " + ".join(parts) + ")"


def _r(expr: str, dp: int) -> str:
    p = float(10**dp)
    return f"floor(({expr}) * {p!r} + 0.5) / {p!r}"


_SHINGLES = (
    f"list_transform(generate_series(1, len({_TOKS}) - 2),"
    f" i -> array_to_string(({_TOKS})[i:i+2], ' '))"
)
_MIN_SHINGLE_FP = (
    f"CASE WHEN len({_TOKS}) >= 3 THEN"
    f" list_min(list_transform({_SHINGLES}, s -> {_h8('s')}))"
    f" ELSE {_CONTENT_FP} END"
)


def _predicted_lang_case() -> str:
    clauses = []
    for lang in LANG_PRIORITY[:-1]:
        others = [f"cnt_{o}" for o in LANG_PRIORITY if o != lang]
        cond = " AND ".join(f"cnt_{lang} >= {o}" for o in others)
        clauses.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + f" ELSE '{LANG_PRIORITY[-1]}' END"


ORACLES_EXT: dict[str, str] = {}

ORACLES_EXT["text_token_stats"] = f"""
SELECT doc_id, n_chars,
  CASE WHEN text IS NULL OR trim(text) = '' THEN 0 ELSE len({_TOKS}) END AS n_tokens,
  len(regexp_extract_all(COALESCE(text, ''), '{BPE_ISH_PATTERN}'))
    AS n_bpe_tokens,
  length(regexp_replace(text, '[A-Za-z0-9{WS_CHARS}]', '', 'g')) AS n_punct,
  length(text) AS text_len
FROM documents
ORDER BY doc_id
"""

ORACLES_EXT["text_quality_score"] = f"""
WITH base AS (
  SELECT doc_id,
    CASE WHEN text IS NULL OR trim(text) = '' THEN 0 ELSE len({_TOKS}) END AS n_tokens,
    {_marker_cnt("en")} AS stop_cnt,
    length(regexp_replace(text, '[A-Za-z0-9{WS_CHARS}]', '', 'g')) AS punct,
    length(text) AS text_len
  FROM documents
),
ratios AS (
  SELECT doc_id, n_tokens,
    CASE WHEN n_tokens > 0 THEN stop_cnt / n_tokens ELSE 0 END AS stop_ratio,
    CASE WHEN text_len > 0 THEN punct / text_len ELSE 0 END AS punct_ratio,
    least(n_tokens, 100) / 100.0 AS length_score
  FROM base
)
SELECT doc_id, n_tokens,
  {_r("stop_ratio", 4)} AS stopword_ratio,
  {_r("punct_ratio", 4)} AS punct_ratio,
  {_r("stop_ratio * 0.3 + length_score * 0.4 + (1.0 - punct_ratio) * 0.3", 4)}
    AS quality_score,
  ({_r("stop_ratio * 0.3 + length_score * 0.4 + (1.0 - punct_ratio) * 0.3", 4)}) >= 0.5
    AS keep_flag
FROM ratios
ORDER BY doc_id
"""

ORACLES_EXT["text_lang_id"] = f"""
WITH counted AS (
  SELECT doc_id, lang,
    {", ".join(f'{_marker_cnt(lang)} AS cnt_{lang}' for lang in LANG_PRIORITY)}
  FROM documents
)
SELECT doc_id, lang,
  {", ".join(f"cnt_{lang}" for lang in LANG_PRIORITY)},
  {_predicted_lang_case()} AS predicted_lang
FROM counted
ORDER BY doc_id
"""

ORACLES_EXT["doc_fingerprint"] = f"""
SELECT doc_id,
  {_CONTENT_FP} AS content_fp,
  {_MIN_SHINGLE_FP} AS min_shingle_fp
FROM documents
ORDER BY doc_id
"""

ORACLES_EXT["dedup_exact"] = f"""
SELECT {_CONTENT_FP.replace("text", "text")} AS content_fp,
       min(doc_id) AS keep_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
ORDER BY keep_doc_id
"""

_SH_HASHES = f"list_distinct(list_transform({_SHINGLES}, s -> {_h8('s')}))"

ORACLES_EXT["dedup_ngram_jaccard"] = f"""
WITH base AS (
  SELECT doc_id,
    {_SH_HASHES} AS hash_set,
    list_min({_SH_HASHES}) AS block_key
  FROM documents
  WHERE len({_SH_HASHES}) >= 3
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    len(list_intersect(a.hash_set, b.hash_set)) AS n_inter,
    len(list_distinct(list_concat(a.hash_set, b.hash_set))) AS n_union
  FROM base a JOIN base b ON a.block_key = b.block_key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
  {_r("CASE WHEN n_union > 0 THEN n_inter / n_union ELSE 0 END", 4)} AS jaccard
FROM pairs
WHERE ({_r("CASE WHEN n_union > 0 THEN n_inter / n_union ELSE 0 END", 4)}) >= 0.2
ORDER BY doc_a, doc_b
"""


from youtube_etl_automated_pipeline_spark.ext.textstats import (  # noqa: E402
    RABIN_B,
    RABIN_K,
    RABIN_M,
)

_CL = f"list_transform(generate_series(1, greatest(length(nrm), 1)), i -> ord(substr(nrm, i, 1)))"
_FOLD = f"(a, b) -> (CAST(a AS BIGINT) * {RABIN_B} + b) % {RABIN_M}"
_FULL = f"CASE WHEN length(nrm) = 0 THEN 0 ELSE list_reduce({_CL}, {_FOLD}) END"
_MINW = (
    f"CASE WHEN length(nrm) >= {RABIN_K} THEN "
    f"list_min(list_transform(generate_series(1, length(nrm) - {RABIN_K - 1}),"
    f" i -> list_reduce(({_CL})[i:i+{RABIN_K - 1}], {_FOLD})))"
    f" ELSE {_FULL} END"
)

ORACLES_EXT["doc_rolling_hash"] = f"""
WITH b AS (
  -- null text = empty document (the mapInPandas kernel treats None
  -- as '' -> zero hashes / zero length); COALESCE pins the twin
  SELECT doc_id, COALESCE({_NORM}, '') AS nrm FROM documents
)
SELECT doc_id,
  CAST(COALESCE({_FULL}, 0) AS BIGINT) AS rabin_full,
  CAST(COALESCE({_MINW}, 0) AS BIGINT) AS min_window_hash,
  length(nrm) AS norm_len
FROM b
ORDER BY doc_id
"""


from youtube_etl_automated_pipeline_spark.ext.textstats import (  # noqa: E402
    RABIN_B2,
    WIN_K,
    WIN_W,
)
from youtube_etl_automated_pipeline_spark.plans.queries_ext import (  # noqa: E402
    PLANT_EVERY_SUB,
    PLANT_OFFSET_SUB,
)

# Winnowing fingerprints, mirrored step by step from
# ext/textstats.winnowed_fingerprints: the kernel's prefix-hash
# window identity (pre[i+K] - pre[i]*B^K) mod M equals the stepwise
# fold list_reduce performs here (both are the K-char polynomial hash
# reduced into [0, M)); selection takes the LEFTMOST minimum of each
# W-window of h1 (list_position returns the first match).
_FOLD2 = f"(a, b) -> (CAST(a AS BIGINT) * {RABIN_B2} + b) % {RABIN_M}"
_WCL = "list_transform(generate_series(i, i + " f"{WIN_K - 1}" "), j -> ord(substr(nrm, j, 1)))"

def winnow_fp_ctes(src_cte: str, prefix: str = "") -> str:
    """CTE chain reproducing ext.textstats.winnowed_fingerprints over
    a (doc_id, text) CTE named ``src_cte``; terminal CTE {prefix}fp =
    (doc_id, h1, h2). ``prefix`` namespaces the chain so several
    fingerprint sources (corpus index + streaming probes) can live in
    one WITH clause."""
    return f"""{prefix}nd AS (
  SELECT doc_id, {_NORM} AS nrm FROM {src_cte}
),
{prefix}eligible AS (
  SELECT doc_id, nrm, length(nrm) AS n FROM {prefix}nd
  WHERE length(nrm) >= {WIN_K + WIN_W - 1}
),
{prefix}hs AS MATERIALIZED (
  SELECT doc_id,
    list_transform(generate_series(1, n - {WIN_K - 1}),
                   i -> list_reduce({_WCL}, {_FOLD})) AS h1s,
    list_transform(generate_series(1, n - {WIN_K - 1}),
                   i -> list_reduce({_WCL}, {_FOLD2})) AS h2s,
    n - {WIN_K - 1} AS n_win
  FROM {prefix}eligible
),
{prefix}sel AS (
  SELECT doc_id, h1s, h2s,
    list_distinct(list_transform(generate_series(1, n_win - {WIN_W - 1}),
      p -> p - 1 + list_position(h1s[p:p+{WIN_W - 1}],
                                 list_min(h1s[p:p+{WIN_W - 1}])))) AS pos_list
  FROM {prefix}hs
),
{prefix}fp AS (
  SELECT DISTINCT doc_id, h1s[pos] AS h1, h2s[pos] AS h2
  FROM (SELECT doc_id, h1s, h2s, unnest(pos_list) AS pos FROM {prefix}sel)
)"""


ORACLES_EXT["dedup_repeated_substring"] = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {PLANT_OFFSET_SUB} AS doc_id, substr(text, 21, 160) AS text
  FROM documents WHERE doc_id % {PLANT_EVERY_SUB} = 0
),
{winnow_fp_ctes("corpus")},
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM fp a JOIN fp b ON a.h1 = b.h1 AND a.h2 = b.h2 AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_shared FROM pairs ORDER BY doc_a, doc_b
"""


from youtube_etl_automated_pipeline_spark.plans.queries_ext import (  # noqa: E402
    JAC_DEN,
    JAC_NUM,
)

ORACLES_EXT["dedup_prefix_filter"] = f"""
WITH base AS (
  SELECT doc_id, {_SH_HASHES} AS hs FROM documents
  WHERE len({_SH_HASHES}) >= 3
),
toks AS (SELECT doc_id, unnest(hs) AS sh FROM base),
dfc AS (SELECT sh, count(*) AS df FROM toks GROUP BY sh),
ranked AS (
  SELECT t.doc_id, t.sh,
    row_number() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.sh) AS rn,
    count(*) OVER (PARTITION BY t.doc_id) AS n
  FROM toks t JOIN dfc d USING (sh)
),
prefix AS (
  SELECT doc_id, sh, n FROM ranked
  WHERE rn <= n - (({JAC_NUM} * n + {JAC_DEN - 1}) // {JAC_DEN}) + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM prefix a JOIN prefix b ON a.sh = b.sh AND a.doc_id < b.doc_id
   AND greatest(a.n, b.n) * {JAC_NUM} <= least(a.n, b.n) * {JAC_DEN}
),
arrays AS (SELECT doc_id, hs, len(hs) AS n FROM base),
scored AS (
  SELECT doc_a, doc_b,
    CAST(len(list_intersect(x.hs, y.hs)) AS BIGINT) AS n_inter,
    CAST(x.n + y.n - len(list_intersect(x.hs, y.hs)) AS BIGINT) AS n_union
  FROM cand
  JOIN arrays x ON x.doc_id = doc_a
  JOIN arrays y ON y.doc_id = doc_b
)
SELECT doc_a, doc_b, n_inter, n_union,
  CAST(n_inter * 1000000 // n_union AS BIGINT) AS jaccard_ppm
FROM scored WHERE n_inter * {JAC_DEN} >= {JAC_NUM} * n_union
ORDER BY doc_a, doc_b
"""


ORACLES_EXT["corpus_mix_contingency"] = """
WITH cells AS (
  SELECT coalesce(lang, '??') AS lang, coalesce(source, '??') AS source,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1, 2
)
SELECT lang, source, n_docs,
  CAST((n_docs * sum(n_docs) OVER () * 1000000)
       // (sum(n_docs) OVER (PARTITION BY lang)
           * sum(n_docs) OVER (PARTITION BY source)) AS BIGINT) AS lift_ppm
FROM cells ORDER BY lang, source
"""
