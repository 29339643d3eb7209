"""BPE trainer kernel semantics: greedy non-overlapping merges,
frequency weighting, deterministic tie-breaks — checked against
hand-computed expectations on tiny corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_etl_automated_pipeline_spark.ext.bpe import (
    merge_fold_sql,
    pair_counts,
    train_bpe,
)


def _words(spark, rows):
    df = spark.createDataFrame(rows, "word string, freq bigint")
    return df.selectExpr(
        "word",
        "freq",
        "concat('|', array_join(transform(sequence(1, length(word)),"
        " i -> substr(word, i, 1)), '|'), '|') AS syms",
    )


def test_greedy_run_merge_non_overlapping(spark):
    """'aaaa' has three (a,a) pairs but ONE greedy pass yields
    [aa, aa] — the merged token must not immediately re-merge."""
    w = _words(spark, [("aaaa", 1)])
    out = w.selectExpr(f"{merge_fold_sql('a', 'a')} AS syms").collect()
    assert out[0]["syms"] == "|aa|aa|"
    # odd run: 'aaa' -> [aa, a]
    w3 = _words(spark, [("aaa", 1)])
    out3 = w3.selectExpr(f"{merge_fold_sql('a', 'a')} AS syms").collect()
    assert out3[0]["syms"] == "|aa|a|"


def test_pair_counts_frequency_weighted(spark):
    w = _words(spark, [("ab", 3), ("abc", 2)])
    got = {
        (r["x"], r["y"]): r["cnt"] for r in pair_counts(w).collect()
    }
    assert got == {("a", "b"): 5, ("b", "c"): 2}


def test_train_bpe_hand_computed(spark):
    """Corpus: 'low' x5, 'lower' x2. Pair counts: (l,o)=7, (o,w)=7,
    (w,e)=2, (e,r)=2. Tie 7-7 breaks (x ASC): (l,o) wins step 1.
    After merging 'lo': (lo,w)=7 wins step 2; then (low,e)=2 ties
    (e,r)=2 -> 'e' < 'low' so (e,r) wins step 3."""
    w = _words(spark, [("low", 5), ("lower", 2)])
    merges = train_bpe(w, n_merges=3)
    assert [(m["left_sym"], m["right_sym"], m["pair_count"]) for m in merges] == [
        ("l", "o", 7),
        ("lo", "w", 7),
        ("e", "r", 2),
    ]
    assert merges[1]["merged"] == "low"


def test_train_bpe_exhausts_pairs(spark):
    """A corpus whose words collapse to single symbols stops early."""
    w = _words(spark, [("ab", 1)])
    merges = train_bpe(w, n_merges=5)
    assert len(merges) == 1
    assert merges[0]["merged"] == "ab"
