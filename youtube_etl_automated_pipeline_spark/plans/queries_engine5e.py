"""Round-5 engine extensions, fifth batch: two lifecycle families —
a leakage-safe corpus split and a storage-maintenance planner — each
with a DuckDB oracle twin.

- ``leakage_safe_split`` — train/val/test assignment keyed by the
  NEAR-DUP CLUSTER, not the document: if two near-duplicate docs land
  on opposite sides of a train/test split, the eval set is
  contaminated no matter how good the dedup report looks (the
  benchmark-leakage failure mode decontamination papers warn about —
  split-then-dedup is not dedup-then-split). Every doc inherits its
  LSH-connected-component id (singletons are their own cluster) and
  the md5 bucket of the CLUSTER id decides the split, so a whole
  duplicate group always moves together. Cross-split cluster
  integrity is contract-tested.
- ``compaction_bin_packing`` — the small-files maintenance planner:
  per-file row counts (via the ``_metadata`` hidden column — file
  identity without a filesystem listing) packed into target-sized
  compaction bins by size-descending prefix sum. At 100 TB the
  small-files problem is a scan-latency tax (every file opens a
  reader, footers dominate under ~32 MB); the planner emits which
  files merge into which output bin — the plan a compaction job
  executes. The bin rule (cumulative rows DIV target) is one window
  over the FILE relation, bounded by file count, never rows.

The reference has no analogue for either (SURVEY §0); they extend
the corpus-lifecycle surface of the engine's LLM-data mandate.

Cross-engine exactness: md5-bucket splits and integer row counts
only; the file relation joins Spark's ``_metadata.file_path`` to
DuckDB's ``filename=true`` via basename extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_automated_pipeline_spark.operators.cache_registry import (
    memo_persist,
)
from youtube_etl_automated_pipeline_spark.sources import load_wide

# split boundaries: [0,80) train, [80,90) val, [90,100) test — the
# same buckets as train_val_test_split, but keyed on cluster_id
LS_TRAIN_PCT = 80
LS_VAL_PCT = 90

# compaction: target rows per merged output file and the tables the
# planner sweeps (the big fact tables where small files accumulate)
COMPACT_TARGET_ROWS = 1_000_000
COMPACT_TABLES = ("orders", "lineitem", "events")


def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-keyed train/val/test split census.

    Plan shape: LSH-verified pairs (memoized relation shared with the
    dedup family) -> connected components -> broadcast LEFT join onto
    the corpus (the component table holds only docs that appear in
    some near-dup pair — broadcast-sized at any corpus scale since
    duplicates are a small fraction) -> md5(cluster_id) bucket -> one
    3-group rollup. The corpus is scanned once; the only wide state
    is the component table.

    Output per split: docs, distinct clusters, char mass — plus the
    count of multi-doc clusters, the rows that PROVE the split moved
    groups wholesale (each multi-doc cluster is counted in exactly
    one split; tests assert zero cross-split clusters).
    """
    from youtube_etl_automated_pipeline_spark.ext.dedup import (
        connected_components,
    )
    from youtube_etl_automated_pipeline_spark.ext.textstats import md5_long
    from youtube_etl_automated_pipeline_spark.plans.queries_dedup_adv import (
        dedup_minhash_lsh,
    )

    pairs = memo_persist(
        spark,
        ("lsh_pairs", sf_dir),
        lambda: dedup_minhash_lsh(spark, sf_dir).select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        ),
    )
    comp = connected_components(pairs)
    docs = load_wide(spark, sf_dir, "documents").select("doc_id", "n_chars")
    labeled = docs.join(
        F.broadcast(comp), docs.doc_id == comp.node, "left"
    ).select(
        "doc_id",
        "n_chars",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
    )
    bucket = md5_long(F.col("cluster_id").cast("string")) % 100
    split = (
        F.when(bucket < LS_TRAIN_PCT, "train")
        .when(bucket < LS_VAL_PCT, "val")
        .otherwise("test")
    )
    per_cluster = (
        labeled.select(split.alias("split"), "cluster_id", "n_chars", "doc_id")
        .groupBy("split", "cluster_id")
        .agg(
            F.count(F.lit(1)).alias("c_docs"),
            F.sum("n_chars").alias("c_chars"),
        )
    )
    return (
        per_cluster.groupBy("split")
        .agg(
            F.sum("c_docs").cast("long").alias("n_docs"),
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum(F.when(F.col("c_docs") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_multi_doc_clusters"),
            F.sum("c_chars").cast("long").alias("sum_chars"),
        )
        .orderBy("split")
    )


def _leakage_oracle() -> str:
    from youtube_etl_automated_pipeline_spark.plans.oracles_dedup_adv import (
        ORACLES_DEDUP_ADV,
    )

    pairs_sql = ORACLES_DEDUP_ADV["dedup_minhash_lsh"]
    h = "CAST('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8) AS BIGINT)"
    return f"""
WITH RECURSIVE edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM ({pairs_sql}) p
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM ({pairs_sql}) p
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
bucketed AS (
  SELECT doc_id, n_chars, cluster_id,
         CASE WHEN {h} % 100 < {LS_TRAIN_PCT} THEN 'train'
              WHEN {h} % 100 < {LS_VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
  FROM labeled
),
per_cluster AS (
  SELECT split, cluster_id, count(*) AS c_docs,
         CAST(sum(n_chars) AS BIGINT) AS c_chars
  FROM bucketed GROUP BY 1, 2
)
SELECT split,
       CAST(sum(c_docs) AS BIGINT) AS n_docs,
       count(*) AS n_clusters,
       CAST(sum(CASE WHEN c_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_multi_doc_clusters,
       CAST(sum(c_chars) AS BIGINT) AS sum_chars
FROM per_cluster GROUP BY split ORDER BY split
"""


def file_census(spark: SparkSession, paths: dict[str, str]) -> DataFrame:
    """Per-file row counts for each (table, parquet path): the
    ``_metadata.file_path`` hidden column makes file identity a plain
    grouping key — map-side combinable, no driver file listing. Only
    the metadata column is projected, so no data column is decoded."""
    per_table = []
    for t, path in paths.items():
        raw = spark.read.parquet(path)
        per_table.append(
            raw.select(
                F.lit(t).alias("table_name"),
                F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ).alias("file_name"),
            )
            .groupBy("table_name", "file_name")
            .agg(F.count(F.lit(1)).alias("n_rows"))
        )
    files = per_table[0]
    for p in per_table[1:]:
        files = files.unionByName(p)
    return files


def compaction_plan(files: DataFrame, target_rows: int) -> DataFrame:
    """Pack a (table_name, file_name, n_rows) file census into
    ``target_rows``-sized merge bins, size-descending, PER TABLE
    (files never merge across tables). Bin id = (running row total −
    own rows) DIV target — the deterministic next-fit-by-prefix-sum
    rule. The DIV rule caps each bin's START offset, not its total:
    a bin can exceed ``target_rows`` by up to its last file's rows
    (e.g. files [900, 800] at target 1000 share bin 0 with 1700
    rows), and a file larger than the target still gets a bin of its
    own because its start offset alone fills a full DIV stride. The
    overshoot bound is acceptable for merge planning (output files
    land in [target, 2*target)); consumers needing a hard cap should
    post-split oversized bins. One window over the file relation, which is bounded
    by file count (10^4-10^5 entries for a 100 TB table — listing
    scale, never data scale)."""
    return files.select(
        "table_name",
        "file_name",
        "n_rows",
        F.expr(
            "CAST((sum(n_rows) OVER (PARTITION BY table_name"
            " ORDER BY n_rows DESC, file_name ASC"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_rows)"
            f" DIV {target_rows} AS BIGINT)"
        ).alias("bin_id"),
    )


def compaction_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction MAINTENANCE plan over the swept fact tables: which
    parquet files merge into which target-sized output bin.

    Gate-layout note: the driver testdata ships each table as ONE
    parquet file (TESTDATA.md), so the oracle pins the file relation
    as (table, '<table>.parquet', count(*)) over the registered
    views; the Spark side computes the same census from the real
    ``_metadata`` column and generalizes to many files per table —
    the multi-file packing path is exercised by
    ``tests/test_engine5e.py`` on a multi-file fixture.
    """
    base = sf_dir.rstrip("/")
    files = file_census(
        spark, {t: f"{base}/{t}.parquet" for t in COMPACT_TABLES}
    )
    return compaction_plan(files, COMPACT_TARGET_ROWS)


ORACLE_COMPACTION = f"""
WITH files AS (
  {" UNION ALL ".join(
    f"SELECT '{t}' AS table_name, '{t}.parquet' AS file_name,"
    f" count(*) AS n_rows FROM {t}"
    for t in COMPACT_TABLES
  )}
)
SELECT table_name, file_name, CAST(n_rows AS BIGINT) AS n_rows,
       CAST((sum(n_rows) OVER (PARTITION BY table_name
             ORDER BY n_rows DESC, file_name ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_rows)
            // {COMPACT_TARGET_ROWS} AS BIGINT) AS bin_id
FROM files ORDER BY table_name, file_name
"""


QUERIES_ENGINE5E = {
    "leakage_safe_split": leakage_safe_split,
    "compaction_bin_packing": compaction_bin_packing,
}

ORACLES_ENGINE5E = {
    "leakage_safe_split": _leakage_oracle(),
    "compaction_bin_packing": ORACLE_COMPACTION,
}
