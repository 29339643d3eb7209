"""DuckDB oracles for the multimodal kernels. The media payload is
UTF-8 bytes of ASCII document text, so byte arithmetic is expressible
as character-codepoint arithmetic; every statistic is an exact integer
accumulation with one final division, so numpy and DuckDB agree
bit-for-bit (see ext.multimodal module docstring).
"""

from __future__ import annotations

from youtube_etl_automated_pipeline_spark.ext.multimodal import (
    FRAME_BYTES,
    FRAME_EVERY,
    HIST_BINS,
)
from youtube_etl_automated_pipeline_spark.functions.compat import sql_hround

_BIN_W = 256 // HIST_BINS
# COALESCE: null text is the EMPTY payload (to_media_table encodes
# coalesce(text, '')), so the byte list must be [] here, not NULL
_BL = ("list_transform(generate_series(1, length(COALESCE(text, ''))),"
       " i -> ord(substr(COALESCE(text, ''), i, 1)))")
_MEDIA_TYPE = (
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'"
    " WHEN 1 THEN 'audio' ELSE 'video' END"
)

ORACLES_MULTIMODAL: dict[str, str] = {}

ORACLES_MULTIMODAL["multimodal_byte_stats"] = f"""
WITH b AS (
  SELECT doc_id, {_MEDIA_TYPE} AS media_type, {_BL} AS bl FROM documents
)
SELECT doc_id AS media_id, media_type,
  len(bl) AS n_bytes,
  CAST(coalesce(list_sum(bl), 0) AS BIGINT) AS byte_sum,
  coalesce(list_min(bl), 0) AS byte_min,
  coalesce(list_max(bl), 0) AS byte_max,
  array_to_string(list_transform(generate_series(0, {HIST_BINS - 1}),
    h -> CAST(len(list_filter(bl, x -> x // {_BIN_W} = h)) AS BIGINT)), '|') AS hist
FROM b
ORDER BY media_id
"""

ORACLES_MULTIMODAL["multimodal_audio_stats"] = f"""
WITH b AS (
  SELECT doc_id, {_BL} AS bl FROM documents WHERE doc_id % 3 = 1
)
SELECT doc_id AS media_id, len(bl) AS n_samples,
  CASE WHEN len(bl) = 0 THEN 0.0 ELSE
    {sql_hround(
        "sqrt(CAST(list_sum(list_transform(bl, x -> (x-128)*(x-128))) AS DOUBLE)"
        " / (len(bl) * 16384))", 6)}
  END AS rms,
  CASE WHEN len(bl) = 0 THEN 0.0 ELSE
    {sql_hround(
        "CAST(list_max(list_transform(bl, x -> abs(x-128))) AS DOUBLE) / 128.0", 6)}
  END AS peak
FROM b
ORDER BY media_id
"""

ORACLES_MULTIMODAL["multimodal_frame_sample"] = f"""
WITH v AS (
  SELECT doc_id, text, length(text) AS n FROM documents
  WHERE doc_id % 3 = 2 AND length(text) > 0
),
fr AS (
  SELECT doc_id, text,
    unnest(list_filter(
      generate_series(0, CAST((n + {FRAME_BYTES - 1}) // {FRAME_BYTES} AS INT) - 1),
      i -> i % {FRAME_EVERY} = 0)) AS frame_idx
  FROM v
),
ch AS (
  SELECT doc_id, frame_idx,
    substr(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES}) AS chunk
  FROM fr
)
SELECT doc_id AS media_id, CAST(frame_idx AS INT) AS frame_idx,
  length(chunk) AS frame_len,
  CAST(coalesce(list_sum(list_transform(
    generate_series(1, length(chunk)), j -> ord(substr(chunk, j, 1)))), 0) AS BIGINT)
    AS frame_sum
FROM ch
ORDER BY media_id, frame_idx
"""


def _quad(dr: int, dc: int) -> str:
    inner = (
        f"list_sum(list_transform(generate_series(0, half - 1), c ->"
        f" ord(substr(text, ({dr} * half + r) * w + ({dc} * half + c) + 1, 1))))"
    )
    s = f"list_sum(list_transform(generate_series(0, half - 1), r -> {inner}))"
    return sql_hround(f"CAST({s} AS DOUBLE) / (half * half)", 6)


ORACLES_MULTIMODAL["multimodal_image_features"] = f"""
WITH im AS (
  SELECT doc_id, text,
    CAST(floor(sqrt(length(text))) AS INT) AS w
  FROM documents WHERE doc_id % 3 = 0
),
f AS (
  SELECT doc_id, text, w, w // 2 AS half FROM im WHERE w >= 2
)
SELECT doc_id AS media_id, w AS width,
  {sql_hround(
      "CAST(list_sum(list_transform(generate_series(1, w * w),"
      " i -> ord(substr(text, i, 1)))) AS DOUBLE) / (w * w)", 6)} AS mean_pixel,
  array_to_string(list_transform(
    [{_quad(0, 0)}, {_quad(0, 1)}, {_quad(1, 0)}, {_quad(1, 1)}],
    q -> CAST(round(q * 1e6) AS BIGINT)), '|') AS thumb
FROM f
ORDER BY media_id
"""


from youtube_etl_automated_pipeline_spark.ext.multimodal import (  # noqa: E402
    SCENE_CUT_DELTA,
)

# Mirrors ext.multimodal.scene_cuts: integer frame means (sum DIV
# len), lag-window deltas, cut when |delta| >= threshold. Payloads
# are UTF-8 of ASCII text, so byte i == ord(char i).
ORACLES_MULTIMODAL["multimodal_scene_cuts"] = f"""
WITH v AS (
  SELECT doc_id, text, length(text) AS n FROM documents
  WHERE doc_id % 3 = 2 AND length(text) > 0
),
fr AS (
  SELECT doc_id,
    unnest(generate_series(0,
      CAST((n + {FRAME_BYTES - 1}) // {FRAME_BYTES} AS INT) - 1)) AS fi,
    text
  FROM v
),
m AS (
  SELECT doc_id, fi,
    CAST(list_sum(list_transform(
           generate_series(1, length(substr(text, fi * {FRAME_BYTES} + 1, {FRAME_BYTES}))),
           j -> ord(substr(substr(text, fi * {FRAME_BYTES} + 1, {FRAME_BYTES}), j, 1))))
         AS BIGINT)
      // length(substr(text, fi * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS mean
  FROM fr
),
d AS (
  SELECT doc_id, fi, mean,
    mean - lag(mean) OVER (PARTITION BY doc_id ORDER BY fi) AS delta
  FROM m
)
SELECT doc_id AS media_id,
  CAST(count(*) AS INT) AS n_frames,
  CAST(sum(CASE WHEN abs(delta) >= {SCENE_CUT_DELTA} THEN 1 ELSE 0 END) AS INT)
    AS n_cuts,
  CAST(coalesce(min(CASE WHEN abs(delta) >= {SCENE_CUT_DELTA} THEN fi END), -1)
       AS INT) AS first_cut,
  CAST(min(mean) AS BIGINT) AS min_mean,
  CAST(max(mean) AS BIGINT) AS max_mean
FROM d
GROUP BY doc_id
ORDER BY media_id
"""


from youtube_etl_automated_pipeline_spark.plans.queries_multimodal import (  # noqa: E402
    PHASH_HAM_MAX,
)

# dHash twin: the PNG roundtrip is lossless over the w*w byte matrix,
# so the oracle recomputes the same 8x9 block sums straight from text
# codepoints. Integer sqrt via floor(sqrt()) + exact-adjacent fixup
# (float sqrt can land one off near perfect squares; math.isqrt can't).
ORACLES_MULTIMODAL["multimodal_phash_dedup"] = f"""
WITH img AS (
  SELECT doc_id, text, length(text) AS n,
    CAST(floor(sqrt(CAST(length(text) AS DOUBLE))) AS BIGINT) AS w0
  FROM documents WHERE doc_id % 3 = 0 AND text IS NOT NULL
),
sized AS (
  SELECT doc_id, text,
    CASE WHEN (w0 + 1) * (w0 + 1) <= n THEN w0 + 1
         WHEN w0 * w0 > n THEN w0 - 1 ELSE w0 END AS w
  FROM img
),
dims AS (
  SELECT doc_id, text, w, w // 8 AS hr, w // 9 AS wc
  FROM sized WHERE w >= 9
),
cells AS (
  SELECT doc_id, i, j,
    list_sum(list_transform(generate_series(0, hr * wc - 1),
      t -> ord(substr(text,
        CAST((i * hr + t // wc) * w + (j * wc + t % wc) + 1 AS BIGINT),
        1)))) AS cell
  FROM dims,
    unnest(generate_series(0, 7)) AS ti(i),
    unnest(generate_series(0, 8)) AS tj(j)
),
bits AS (
  SELECT a.doc_id, (63 - (a.i * 8 + a.j)) AS p,
    CASE WHEN a.cell > b.cell THEN 1 ELSE 0 END AS bit
  FROM cells a JOIN cells b
    ON a.doc_id = b.doc_id AND a.i = b.i AND b.j = a.j + 1
  WHERE a.j < 8
),
bands AS (
  SELECT doc_id, CAST(p // 16 AS INT) AS band_i,
    CAST(sum(bit * (CAST(1 AS BIGINT) << CAST(p % 16 AS INT))) AS INT)
      AS band_v
  FROM bits GROUP BY 1, 2
),
bt AS (
  SELECT doc_id,
    max(CASE WHEN band_i = 0 THEN band_v END) AS b0,
    max(CASE WHEN band_i = 1 THEN band_v END) AS b1,
    max(CASE WHEN band_i = 2 THEN band_v END) AS b2,
    max(CASE WHEN band_i = 3 THEN band_v END) AS b3
  FROM bands GROUP BY doc_id
),
cand AS (
  SELECT DISTINCT a.doc_id AS media_a, b.doc_id AS media_b
  FROM bands a JOIN bands b
    ON a.band_i = b.band_i AND a.band_v = b.band_v
   AND a.doc_id < b.doc_id
)
SELECT media_a, media_b,
  CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
     + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS BIGINT)
    AS hamming_bits
FROM cand
JOIN bt x ON x.doc_id = media_a
JOIN bt y ON y.doc_id = media_b
WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
    + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
    <= {PHASH_HAM_MAX}
ORDER BY media_a, media_b
"""
