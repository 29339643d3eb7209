"""DuckDB oracles for MinHash-LSH / SimHash dedup. Every hash,
permutation constant, band width, and threshold is imported from
ext.dedup so Spark and oracle cannot drift.
"""

from __future__ import annotations

from youtube_etl_automated_pipeline_spark.ext.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    N_PERM,
    SIMHASH_BANDS,
    SIMHASH_BITS,
)
from youtube_etl_automated_pipeline_spark.ext.textstats import WS_CLASS
from youtube_etl_automated_pipeline_spark.functions.compat import sql_hround
from youtube_etl_automated_pipeline_spark.plans.queries_dedup_adv import (
    CONTAINMENT_PPM_MIN,
    HAMMING_THRESHOLD,
    INCREMENTAL_BATCH_MOD,
    JACCARD_PPM_THRESHOLD,
    JACCARD_THRESHOLD,
)

_TOKS = f"string_split_regex(trim(text), '{WS_CLASS}+')"
_SHINGLES = (
    f"list_transform(generate_series(1, len({_TOKS}) - 2),"
    f" i -> array_to_string(({_TOKS})[i:i+2], ' '))"
)
# distinct shingle hashes (8 hex chars = 32 bits, matches md5_long default)
_SH_HASHES = (
    f"list_distinct(list_transform({_SHINGLES},"
    f" s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)))"
)


def _sig(j: int, hashes_expr: str = "hs") -> str:
    a, b = MINHASH_A[j], MINHASH_B[j]
    return (
        f"list_min(list_transform({hashes_expr},"
        f" h -> ({a} * (h % {MINHASH_P}) + {b}) % {MINHASH_P}))"
    )


# 60-bit SimHash: per-bit majority vote over distinct-token 60-bit md5
# hashes, folded into one BIGINT. Empty/null text -> empty hash list ->
# all votes 0 -> sketch 0 (mirrors Spark's aggregate-with-init-0).
_TOK_HASHES = (
    "CASE WHEN text IS NULL OR trim(text) = '' THEN CAST([] AS BIGINT[]) "
    f"ELSE list_transform(list_distinct({_TOKS}),"
    " t -> CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)) END"
)
# CAST AS BIGINT is mandatory: DuckDB list_sum over integers returns
# HUGEINT (int128), which the bit-exact compare sees as a different
# type/value domain than Spark's long sketch.
_SKETCH = (
    "CAST(coalesce(list_sum(list_transform("
    f"generate_series(0, {SIMHASH_BITS - 1}), bb -> "
    "CASE WHEN coalesce(list_sum(list_transform(hs, h -> "
    "CASE WHEN ((h >> bb) & 1) = 1 THEN 1 ELSE -1 END)), 0) > 0 "
    "THEN (CAST(1 AS BIGINT) << bb) ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT)"
)

_BAND_W = SIMHASH_BITS // SIMHASH_BANDS
_BAND_MASK = (1 << _BAND_W) - 1


def _band(b: int, sketch_expr: str = "sketch") -> str:
    return f"(({sketch_expr} >> {b * _BAND_W}) & {_BAND_MASK})"


ORACLES_DEDUP_ADV: dict[str, str] = {}

_JACC = sql_hround(
    "CASE WHEN n_union > 0 THEN n_inter / n_union ELSE 0 END", 4
)
ORACLES_DEDUP_ADV["dedup_minhash_lsh"] = f"""
WITH base AS (
  SELECT doc_id,
    {_SH_HASHES} AS hs
  FROM documents
  WHERE len({_SH_HASHES}) >= 3
),
sigs AS (
  SELECT doc_id, hs,
    {", ".join(f"{_sig(j)} AS sig_{j}" for j in range(N_PERM))}
  FROM base
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    len(list_intersect(a.hs, b.hs)) AS n_inter,
    len(list_distinct(list_concat(a.hs, b.hs))) AS n_union
  FROM sigs a JOIN sigs b
    ON a.doc_id < b.doc_id
   AND ({" OR ".join(f"a.sig_{j} = b.sig_{j}" for j in range(N_PERM))})
)
SELECT doc_a, doc_b, {_JACC} AS jaccard
FROM pairs
WHERE ({_JACC}) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""

ORACLES_DEDUP_ADV["dedup_containment_pairs"] = f"""
WITH base AS (
  SELECT doc_id,
    {_SH_HASHES} AS hs
  FROM documents
  WHERE len({_SH_HASHES}) >= 3
),
sigs AS (
  SELECT doc_id, hs,
    {", ".join(f"{_sig(j)} AS sig_{j}" for j in range(N_PERM))}
  FROM base
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    CAST(len(list_intersect(a.hs, b.hs)) AS BIGINT) AS n_inter,
    CAST(len(a.hs) AS BIGINT) AS n_a,
    CAST(len(b.hs) AS BIGINT) AS n_b
  FROM sigs a JOIN sigs b
    ON a.doc_id < b.doc_id
   AND ({" OR ".join(f"a.sig_{j} = b.sig_{j}" for j in range(N_PERM))})
)
SELECT doc_a, doc_b, n_inter,
  CAST((n_inter * 1000000) // least(n_a, n_b) AS BIGINT) AS containment_ppm,
  CASE WHEN n_a <= n_b THEN doc_a ELSE doc_b END AS contained_doc
FROM pairs
WHERE (n_inter * 1000000) // least(n_a, n_b) >= {CONTAINMENT_PPM_MIN}
ORDER BY doc_a, doc_b
"""

ORACLES_DEDUP_ADV["dedup_simhash"] = f"""
WITH hashed AS (
  SELECT doc_id, {_TOK_HASHES} AS hs FROM documents
),
sk AS (
  SELECT doc_id, {_SKETCH} AS sketch FROM hashed
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(bit_count(xor(a.sketch, b.sketch)) AS INT) AS hamming
FROM sk a JOIN sk b
  ON a.doc_id < b.doc_id
 AND ({" OR ".join(f"{_band(b, 'a.sketch')} = {_band(b, 'b.sketch')}"
                   for b in range(SIMHASH_BANDS))})
WHERE bit_count(xor(a.sketch, b.sketch)) <= {HAMMING_THRESHOLD}
ORDER BY doc_a, doc_b
"""

ORACLES_DEDUP_ADV["dedup_simhash_sketches"] = f"""
WITH hashed AS (
  SELECT doc_id, {_TOK_HASHES} AS hs FROM documents
),
sk AS (
  SELECT doc_id, {_SKETCH} AS sketch FROM hashed
)
SELECT doc_id, sketch,
  {", ".join(f"{_band(b)} AS band_{b}" for b in range(SIMHASH_BANDS))}
FROM sk
ORDER BY doc_id
"""


# connected components over the verified pair set via recursive CTE —
# same pair SQL inlined twice (DuckDB has no CTE-of-CTE reuse here)
_PAIRS_SQL = ORACLES_DEDUP_ADV["dedup_minhash_lsh"]
ORACLES_DEDUP_ADV["dedup_minhash_clusters"] = f"""
WITH RECURSIVE edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM ({_PAIRS_SQL}) p
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM ({_PAIRS_SQL}) p
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
FROM reach GROUP BY src
ORDER BY doc_id
"""


# canonical-representative selection: components (recursive CTE as
# above) -> full corpus left-labeled -> longest-doc-wins window
ORACLES_DEDUP_ADV["dedup_keep_canonical"] = f"""
WITH RECURSIVE edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM ({_PAIRS_SQL}) p
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM ({_PAIRS_SQL}) p
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (
  SELECT src AS node, least(src, min(dst)) AS component
  FROM reach GROUP BY src
),
labeled AS (
  SELECT d.doc_id, d.n_chars,
         coalesce(c.component, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
),
ranked AS (
  SELECT cluster_id, doc_id, n_chars,
         row_number() OVER (
           PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id ASC
         ) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM labeled
)
SELECT cluster_id, doc_id, n_chars, n_members
FROM ranked WHERE rn = 1
ORDER BY cluster_id
"""


# two-phase (large-star/small-star) CC computes the SAME clustering as
# min-label propagation — one oracle pins both kernels
ORACLES_DEDUP_ADV["dedup_clusters_two_phase"] = ORACLES_DEDUP_ADV[
    "dedup_minhash_clusters"
]


# incremental-ingest dedup census: batch = doc_id % MOD = 0 vs corpus
_JPPM = (
    "(len(list_intersect(a.hs, b.hs)) * 1000000)"
    " // len(list_distinct(list_concat(a.hs, b.hs)))"
)
ORACLES_DEDUP_ADV["dedup_incremental_batch"] = f"""
WITH d AS (
  SELECT doc_id, coalesce(lang, '??') AS lang, text,
         md5(coalesce(text, '')) AS th
  FROM documents
),
batch AS (SELECT * FROM d WHERE doc_id % {INCREMENTAL_BATCH_MOD} = 0),
corpus AS (SELECT * FROM d WHERE doc_id % {INCREMENTAL_BATCH_MOD} <> 0),
exact AS (
  SELECT DISTINCT b.doc_id FROM batch b
  JOIN (SELECT DISTINCT th FROM corpus) c USING (th)
),
base AS (
  SELECT doc_id, {_SH_HASHES} AS hs
  FROM documents
  WHERE len({_SH_HASHES}) >= 3
),
sigs AS (
  SELECT doc_id, hs,
    {", ".join(f"{_sig(j)} AS sig_{j}" for j in range(N_PERM))}
  FROM base
),
bsig AS (SELECT * FROM sigs WHERE doc_id % {INCREMENTAL_BATCH_MOD} = 0),
csig AS (SELECT * FROM sigs WHERE doc_id % {INCREMENTAL_BATCH_MOD} <> 0),
near AS (
  SELECT DISTINCT a.doc_id
  FROM bsig a JOIN csig b
    ON ({" OR ".join(f"a.sig_{j} = b.sig_{j}" for j in range(N_PERM))})
  WHERE ({_JPPM}) >= {JACCARD_PPM_THRESHOLD}
    AND a.doc_id NOT IN (SELECT doc_id FROM exact)
)
SELECT b.lang,
  CAST(count(*) AS BIGINT) AS n_batch,
  CAST(sum(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_exact_dup,
  CAST(sum(CASE WHEN nr.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_near_dup,
  CAST(count(*)
       - sum(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END)
       - sum(CASE WHEN nr.doc_id IS NOT NULL THEN 1 ELSE 0 END)
       AS BIGINT) AS n_accepted
FROM batch b
LEFT JOIN exact e ON b.doc_id = e.doc_id
LEFT JOIN near nr ON b.doc_id = nr.doc_id
GROUP BY b.lang
ORDER BY b.lang
"""


# Persisted-index shard probe: the oracle recomputes everything from
# the table (SQL has no "persisted index"); the parquet round-trip is
# the Spark-side implementation detail under test, and
# tests/test_streaming.py separately proves round-trip == one-shot.
_BANDS_UNION = " UNION ALL ".join(
    f"SELECT doc_id, {j} AS band_id, sig_{j} AS sig FROM sigs"
    for j in range(N_PERM)
)
ORACLES_DEDUP_ADV["dedup_incremental_shard"] = f"""
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
bands AS MATERIALIZED ({_BANDS_UNION}),
idx AS (
  SELECT band_id, sig, min(doc_id) AS canon_doc
  FROM bands WHERE doc_id % {INCREMENTAL_BATCH_MOD} <> 0
  GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT i.canon_doc AS doc_a, b.doc_id AS doc_b
  FROM bands b JOIN idx i USING (band_id, sig)
  WHERE b.doc_id % {INCREMENTAL_BATCH_MOD} = 0
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


# sketch-quality QA: signature-agreement estimate vs exact Jaccard
_N_MATCH = " + ".join(
    f"(CASE WHEN a.sig_{j} = b.sig_{j} THEN 1 ELSE 0 END)" for j in range(N_PERM)
)
ORACLES_DEDUP_ADV["dedup_minhash_precision"] = f"""
WITH base AS (
  SELECT doc_id, {_SH_HASHES} AS hs
  FROM documents
  WHERE len({_SH_HASHES}) >= 3
),
sigs AS (
  SELECT doc_id, hs,
    {", ".join(f"{_sig(j)} AS sig_{j}" for j in range(N_PERM))}
  FROM base
),
pairs AS (
  SELECT ({_N_MATCH}) AS n_sig_match,
         ({_JPPM}) AS jacc_ppm
  FROM sigs a JOIN sigs b
    ON a.doc_id < b.doc_id
   AND ({" OR ".join(f"a.sig_{j} = b.sig_{j}" for j in range(N_PERM))})
)
SELECT CAST(n_sig_match AS INT) AS n_sig_match,
  CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(sum(CASE WHEN jacc_ppm >= {JACCARD_PPM_THRESHOLD} THEN 1 ELSE 0 END)
       AS BIGINT) AS n_verified,
  CAST(sum(jacc_ppm) // count(*) AS BIGINT) AS mean_jaccard_ppm
FROM pairs
GROUP BY n_sig_match
ORDER BY n_sig_match
"""
