"""Semantics tests for the engine5e batch (leakage-safe split /
compaction planner) beyond the DuckDB oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from youtube_etl_automated_pipeline_spark.plans.queries_engine5e import (
    COMPACT_TARGET_ROWS,
    LS_TRAIN_PCT,
    LS_VAL_PCT,
    compaction_bin_packing,
    compaction_plan,
    file_census,
    leakage_safe_split,
)


def test_leakage_split_no_cluster_straddles_splits(spark):
    """The contract the operator exists for: every near-dup cluster
    lands in exactly ONE split. Recomputed doc-level here, then
    grouped by cluster to count distinct splits."""
    from youtube_etl_automated_pipeline_spark.ext.dedup import (
        connected_components,
    )
    from youtube_etl_automated_pipeline_spark.ext.textstats import md5_long
    from youtube_etl_automated_pipeline_spark.plans.queries_dedup_adv import (
        dedup_minhash_lsh,
    )
    from youtube_etl_automated_pipeline_spark.sources import load_wide

    pairs = dedup_minhash_lsh(spark, SF_SMOKE).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comp = connected_components(pairs)
    docs = load_wide(spark, SF_SMOKE, "documents").select("doc_id")
    labeled = docs.join(
        F.broadcast(comp), docs.doc_id == comp.node, "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
    )
    bucket = md5_long(F.col("cluster_id").cast("string")) % 100
    split = (
        F.when(bucket < LS_TRAIN_PCT, "train")
        .when(bucket < LS_VAL_PCT, "val")
        .otherwise("test")
    )
    straddlers = (
        labeled.select("cluster_id", split.alias("split"))
        .groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddlers == 0

    # and the census totals add up to the corpus
    census = leakage_safe_split(spark, SF_SMOKE).collect()
    assert sum(r["n_docs"] for r in census) == docs.count()
    # multi-doc clusters exist in the gate data (else the operator is
    # indistinguishable from a doc-keyed split)
    assert sum(r["n_multi_doc_clusters"] for r in census) > 0


def test_leakage_split_differs_from_doc_keyed_split(spark):
    """At least one doc of some multi-doc cluster would change split
    under doc-id keying — proving the cluster key is load-bearing."""
    from youtube_etl_automated_pipeline_spark.ext.dedup import (
        connected_components,
    )
    from youtube_etl_automated_pipeline_spark.ext.textstats import md5_long
    from youtube_etl_automated_pipeline_spark.plans.queries_dedup_adv import (
        dedup_minhash_lsh,
    )
    from youtube_etl_automated_pipeline_spark.sources import load_wide

    pairs = dedup_minhash_lsh(spark, SF_SMOKE).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comp = connected_components(pairs)
    docs = load_wide(spark, SF_SMOKE, "documents").select("doc_id")
    labeled = docs.join(
        F.broadcast(comp), docs.doc_id == comp.node, "inner"
    ).select("doc_id", F.col("component").alias("cluster_id"))
    b_doc = md5_long(F.col("doc_id").cast("string")) % 100
    b_cl = md5_long(F.col("cluster_id").cast("string")) % 100
    diverging = labeled.filter(
        (b_doc < LS_TRAIN_PCT) != (b_cl < LS_TRAIN_PCT)
    ).count()
    assert diverging > 0


def test_compaction_packs_multifile_table(spark, tmp_path):
    """Real multi-file packing: 7 files of known sizes against a
    1000-row target must produce first-fit-by-prefix-sum bins, and
    every bin except the last per table stays under target + its
    first file's slack."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sizes = [900, 800, 400, 300, 200, 100, 50]
    d = tmp_path / "t"
    d.mkdir()
    for i, n in enumerate(sizes):
        pq.write_table(
            pa.table({"x": list(range(n))}), str(d / f"part-{i:02d}.parquet")
        )
    files = file_census(spark, {"t": str(d)})
    got = {
        r["file_name"]: (r["n_rows"], r["bin_id"])
        for r in compaction_plan(files, 1000).collect()
    }
    assert len(got) == len(sizes)
    # python referee: sort by (rows desc, name asc), next-fit rule
    names = sorted(got, key=lambda f: (-got[f][0], f))
    cum = 0
    for f in names:
        n, b = got[f]
        assert b == cum // 1000, (f, n, b, cum)
        cum += n


def test_compaction_gate_layout_single_file_per_table(spark):
    """On driver testdata every table is one file, so every file is
    bin 0 of its table and counts equal the table row counts."""
    rows = compaction_bin_packing(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["file_name"] == f"{r['table_name']}.parquet"
        assert r["bin_id"] == 0
        assert 0 < r["n_rows"] < COMPACT_TARGET_ROWS
