"""Near-duplicate detection: MinHash+LSH and SimHash.

Both are built from portable md5-derived hashes (ext.textstats
.md5_long) so the DuckDB oracle reproduces signatures bit-for-bit —
Spark's murmur/xxhash64 are engine-private.

Scale shape (the point of these ops at 100 TB):
- MinHash: one projection computes the k signatures per doc; LSH
  banding turns all-pairs into per-band equi-joins (shuffle on the
  band key), and only candidates get the exact-Jaccard verify. Global
  cost is O(docs) + O(candidate pairs), never O(docs^2).
- SimHash: one projection per doc -> 64-bit sketch; banding on bit
  ranges gives the same equi-join candidate structure; verification is
  a popcount on XOR, no shingle sets needed at pair time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from youtube_etl_automated_pipeline_spark.operators.lineage import (
    truncate_lineage,
)

from youtube_etl_automated_pipeline_spark.ext.textstats import (
    md5_long,
    shingles,
    tokens,
)

# fixed MinHash permutation constants: h_j(x) = (A[j]*(x%P) + B[j]) % P
MINHASH_P = 2147483647  # 2^31 - 1: A*(x%P) stays < 2^62, no overflow
MINHASH_A = (3, 7, 31, 127, 8191, 131071, 524287, 1048573)
MINHASH_B = (11, 101, 1009, 10007, 100003, 1000003, 1999993, 999983)
N_PERM = len(MINHASH_A)

SIMHASH_BITS = 60  # md5_long(.., 15) yields 60-bit hashes
SIMHASH_BANDS = 4  # 15-bit bands for candidate blocking


def shingle_hashes(text: Column, n: int = 3) -> Column:
    """Distinct token-n-gram hashes (the MinHash input set)."""
    toks = tokens(text)
    return F.array_distinct(
        F.transform(shingles(toks, n), lambda s: md5_long(s))
    )


def minhash_signature(hashes: Column, j: int) -> Column:
    """j-th MinHash: min over the permuted shingle hashes."""
    a, b = MINHASH_A[j], MINHASH_B[j]
    return F.array_min(
        F.transform(hashes, lambda h: (F.lit(a) * (h % MINHASH_P) + F.lit(b)) % MINHASH_P)
    )


def with_minhash(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Adds sig_0..sig_{k-1} columns (one projection, no shuffle)."""
    hashes = shingle_hashes(F.col(text_col), n)
    out = df.withColumn("_sh_hashes", hashes)
    for j in range(N_PERM):
        out = out.withColumn(f"sig_{j}", minhash_signature(F.col("_sh_hashes"), j))
    return out


def band_explode(df: DataFrame) -> DataFrame:
    """Fan a signature frame (doc_id, sig_0..sig_{k-1}, ...) out to
    its LSH band keys: one (doc_id, band_id, sig) row per band. THE
    single definition of the banding layout — the batch LSH queries,
    the streaming signature index, and their tests all import this so
    the band fan-out cannot drift between them."""
    return df.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_id"),
                        F.col(f"sig_{j}").alias("sig"),
                    )
                    for j in range(N_PERM)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.sig")


def simhash(text: Column) -> Column:
    """60-bit SimHash over distinct tokens: per-bit majority vote of
    token-hash bits, folded into one long. Pure nested higher-order
    expressions — no UDF, no shuffle — and a SINGLE pass over the
    token hashes (the vote accumulator is a 60-long array zipped with
    a constant bitmask array)."""
    toks = F.array_distinct(tokens(text))
    hashes = F.transform(toks, lambda t: md5_long(t, 15))
    masks = F.array(*[F.lit(1 << b).cast("long") for b in range(SIMHASH_BITS)])
    bit_votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS),
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda a, m: a + F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    # fold votes into the sketch: bit b set iff vote > 0
    return F.aggregate(
        F.zip_with(
            bit_votes,
            masks,
            lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash_band(sketch: Column, band: int) -> Column:
    """15-bit band extract for LSH blocking on sketches."""
    width = SIMHASH_BITS // SIMHASH_BANDS
    return F.shiftright(sketch, band * width).bitwiseAND(F.lit((1 << width) - 1))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def connected_components_two_phase(edges: DataFrame, max_iters: int = 30) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contractions (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond"). Input ``edges`` needs (src, dst);
    returns (node, component) with component = min node id.

    Why a SECOND CC kernel: min-label propagation
    (``connected_components``) needs O(component diameter) rounds —
    fine for dense near-dup clusters, fatal for a 100 TB web/citation
    graph whose giant component can have diameter in the hundreds.
    Star operations contract whole paths each round and converge in
    O(log^2 n) rounds REGARDLESS of diameter, with the same per-round
    cost shape (one groupBy + one join, both shuffling on node id).

    Invariants per round (the paper's): large-star attaches every
    neighbor v > u to m = min(N(u) + {u}); small-star attaches u and
    all its smaller neighbors to their minimum. Both preserve
    connectivity and never raise a node's reachable minimum; the
    fixpoint is a star per component rooted at its minimum. Lineage
    is truncated per round with truncate_lineage (localCheckpoint by
    default; spark.graft.checkpoint.reliable=true routes to a real
    HDFS/S3 checkpoint on a cluster) so the plan stays O(1) deep.
    """
    nodes = (
        edges.selectExpr("src AS node")
        .union(edges.selectExpr("dst AS node"))
        .distinct()
    )
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
        .transform(truncate_lineage)
    )
    for _ in range(max_iters):
        # LARGE-STAR over the full neighborhood: edge (u,v), v > u
        # re-targets to (v, m(u)). m <= u < v so no self-edges appear.
        und = e.selectExpr("a AS u", "b AS v").union(e.selectExpr("b AS u", "a AS v"))
        mins = und.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least("u", "mn").alias("m"))
        large = (
            und.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.least("v", "m").alias("a"), F.greatest("v", "m").alias("b"))
            .distinct()
            .transform(truncate_lineage)
        )
        # SMALL-STAR over smaller neighbors only: in canonical (a,b)
        # a<b form, the smaller-neighborhood of b is exactly its `a`
        # set; attach b and every non-min smaller neighbor to the min.
        sm = large.groupBy("b").agg(F.min("a").alias("m"))
        small = large.join(sm, "b")
        new_e = (
            small.select(F.col("m").alias("a"), F.col("b"))
            .union(
                small.filter(F.col("a") != F.col("m")).select(
                    F.col("m").alias("a"), F.col("a").alias("b")
                )
            )
            .distinct()
            .transform(truncate_lineage)
        )
        if new_e.count() == e.count() and new_e.exceptAll(e).isEmpty():
            e = new_e
            break
        e = new_e
    children = e.select(F.col("b").alias("node"), F.col("a").alias("component"))
    roots = e.select(F.col("a").alias("node"), F.col("a").alias("component")).distinct()
    labels = children.union(roots).distinct()
    # self-loop-only nodes never enter the canonical edge set: label
    # them with themselves so the node universe matches the input
    return nodes.join(labels, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )


def connected_components(edges: DataFrame, max_iters: int = 20) -> DataFrame:
    """Connected components by iterative min-label propagation: each
    node's label becomes min(own, neighbors') until fixpoint. Input
    ``edges`` needs columns (src, dst) (undirected pairs, one
    direction is enough). Returns (node, component) where component =
    min node id in the component.

    Iterative DataFrame algorithm done the scalable way: every
    iteration is one join + one aggregate (both shuffle on node id),
    lineage truncated per iteration with truncate_lineage so the plan
    stays O(1) deep (on a cluster: checkpoint to HDFS instead).
    Convergence in O(component diameter) rounds — near-dup clusters
    are dense, so typically 2-3. RAISES if max_iters is reached
    without a fixpoint (diameter > max_iters): wrong labels must
    never be returned silently — a high-diameter graph should use
    ``connected_components_two_phase`` (O(log^2 n) rounds) instead.
    """
    from pyspark.sql import functions as F

    undirected = edges.selectExpr("src", "dst").union(
        edges.selectExpr("dst AS src", "src AS dst")
    )
    und = undirected.persist()
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .transform(truncate_lineage)
    )
    changed = -1
    for _ in range(max_iters):
        nbr_min = (
            und.join(labels, und.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
            )
            .transform(truncate_lineage)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    und.unpersist()
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(component diameter exceeds max_iters); use "
            "connected_components_two_phase for high-diameter graphs"
        )
    return labels
