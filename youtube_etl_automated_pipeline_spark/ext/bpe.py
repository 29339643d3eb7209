"""Distributed BPE tokenizer training (pair-count + greedy merge).

The classic byte-pair-encoding trainer (Sennrich et al. 2016) run the
way a 100 TB corpus requires: statistics live on the WORD-TYPE table
(unique word, corpus frequency) — by Heaps' law orders of magnitude
smaller than the corpus — so each merge step is one tiny shuffle on
the pair key plus a map-only re-symbolization, never a corpus pass
after the initial word count.

Cross-engine determinism: a merge step is a greedy left-to-right
non-overlapping pass. Both engines express it as the SAME string fold
over a '|'-delimited symbol encoding — new symbols never re-merge
within a pass because merged(x,y) = x||y is strictly longer than x,
so the "last symbol == x" suffix check cannot match a symbol created
by the current pass's previous step at the same position. Ties on
pair count break by (x ASC, y ASC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from youtube_etl_automated_pipeline_spark.operators.lineage import (
    truncate_lineage,
)

# word-type universe: lowercase ascii words, bounded length so the
# symbol strings stay tiny and '|' is provably delimiter-safe
BPE_WORD_RE = "^[a-z]+$"
BPE_MIN_LEN = 2
BPE_MAX_LEN = 12
BPE_MERGES = 4

_SYMS = "filter(split(syms, '\\\\|'), s -> s <> '')"


def merge_fold_sql(x: str, y: str) -> str:
    """Spark SQL for one greedy merge pass of pair (x, y) over the
    delimited symbol string `syms` — returns the new delimited string.
    x and y are [a-z]+ literals (safe to inline)."""
    xy = x + y
    return (
        f"aggregate({_SYMS}, '|', (acc, c) -> "
        f"CASE WHEN c = '{y}' AND endswith(acc, '|{x}|') "
        f"THEN substr(acc, 1, length(acc) - {len(x) + 1}) || '{xy}|' "
        f"ELSE acc || c || '|' END)"
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """(x, y, cnt): adjacent-symbol pair counts weighted by word-type
    frequency. One explode over the word-type table, one shuffle on
    the pair key."""
    # size(sy) >= 2: Spark's sequence(1, 0) is the DESCENDING [1, 0],
    # not empty like DuckDB's generate_series — a fully-collapsed word
    # would hit element_at(sy, 0). Filtering matches the oracle, where
    # such words contribute no pairs.
    sy = words.selectExpr("freq", f"{_SYMS} AS sy").filter("size(sy) >= 2")
    return (
        sy.selectExpr(
            "freq",
            "explode(transform(sequence(1, size(sy) - 1), "
            "i -> struct(element_at(sy, i) AS x, element_at(sy, i + 1) AS y)"
            ")) AS p",
        )
        .selectExpr("p.x AS x", "p.y AS y", "freq")
        .groupBy("x", "y")
        .agg({"freq": "sum"})
        .withColumnRenamed("sum(freq)", "cnt")
    )


def train_bpe(words: DataFrame, n_merges: int = BPE_MERGES) -> list[dict]:
    """Run n_merges BPE steps over a (word, freq, syms) word-type
    table; returns [{step, left_sym, right_sym, merged, pair_count}].
    Each step: pair-count shuffle -> top-1 to the driver (a scalar,
    like k-means centroids) -> map-only re-symbolization,
    localCheckpoint-truncated so the plan depth stays O(1)."""
    from pyspark.sql import functions as F

    merges: list[dict] = []
    cur = words.transform(truncate_lineage)
    for step in range(1, n_merges + 1):
        top = (
            pair_counts(cur)
            .orderBy(F.desc("cnt"), F.asc("x"), F.asc("y"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        x, y, cnt = top[0]["x"], top[0]["y"], int(top[0]["cnt"])
        merges.append(
            {
                "step": step,
                "left_sym": x,
                "right_sym": y,
                "merged": x + y,
                "pair_count": cnt,
            }
        )
        cur = cur.selectExpr(
            "word", "freq", f"{merge_fold_sql(x, y)} AS syms"
        ).transform(truncate_lineage)
    return merges
