"""Round-7 extension operators: JL random projection, ROUGE pair
overlap, streaming CMS, Bradley-Terry preference aggregation."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_random_projection_preserves_distances(spark):
    """The JL property for ±1 signs: E||y_a - y_b||^2 = D_OUT *
    ||x_a - x_b||^2 (in micro-units^2). With D_OUT=8 individual pairs
    fluctuate, so assert the MEDIAN per-pair ratio over consecutive-id
    pairs sits well inside [0.3, 3] and the MEAN within [0.7, 1.4]."""
    from youtube_etl_automated_pipeline_spark.plans.queries_engine6 import (
        RP_D_OUT,
        embedding_random_projection,
    )
    from youtube_etl_automated_pipeline_spark.sources import load_table

    proj = {
        r["vec_id"]: [r[f"y_{j}"] for j in range(RP_D_OUT)]
        for r in embedding_random_projection(spark, SF_SMOKE).collect()
    }
    # quantization identical to the query: floor(v*1e6+0.5)
    import math

    orig = {
        k: [math.floor(float(v) * 1e6 + 0.5) for v in r]
        for k, r in {
            r["vec_id"]: r["embedding"]
            for r in load_table(spark, SF_SMOKE, "embeddings").collect()
        }.items()
    }
    ids = sorted(proj)
    ratios = []
    for a, b in zip(ids, ids[1:]):
        dx2 = sum((xa - xb) ** 2 for xa, xb in zip(orig[a], orig[b]))
        dy2 = sum((ya - yb) ** 2 for ya, yb in zip(proj[a], proj[b]))
        if dx2 > 0:
            ratios.append(dy2 / (RP_D_OUT * dx2))
    ratios.sort()
    assert len(ratios) > 100
    median = ratios[len(ratios) // 2]
    mean = sum(ratios) / len(ratios)
    assert 0.3 < median < 3.0, median
    assert 0.7 < mean < 1.4, mean


@pytest.fixture()
def planted_docs_dir(tmp_path):
    """A testdata twin whose documents table contains one exact
    duplicate pair and one near-duplicate pair, both long enough to
    band-collide."""
    dst = str(tmp_path / "planted")
    os.makedirs(dst)
    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "embeddings",
    ):
        shutil.copy(
            os.path.join(SF_SMOKE, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
        )
    base = (
        "the quick brown fox jumps over the lazy dog while the "
        "festival crowd watches from the river bank in the rain"
    )
    near = base.replace("rain", "snow")
    rows = [
        (1, base, "en", "web", len(base)),
        (2, base, "en", "web", len(base)),  # exact dup of 1
        (3, near, "en", "web", len(near)),  # near dup of 1/2
        (4, "completely different text about spark plans", "en", "web", 44),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(dst, "documents.parquet"))
    return dst


def test_rouge_exact_duplicate_scores_unity(spark, planted_docs_dir):
    from youtube_etl_automated_pipeline_spark.plans.queries_engine6 import (
        pair_rouge_overlap,
    )

    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in pair_rouge_overlap(spark, planted_docs_dir).collect()
    }
    assert (1, 2) in out, sorted(out)
    exact = out[(1, 2)]
    n_toks = len(
        "the quick brown fox jumps over the lazy dog while the "
        "festival crowd watches from the river bank in the rain".split()
    )
    for m in ("r1_p_ppm", "r1_r_ppm", "r1_f_ppm", "r2_p_ppm", "r2_r_ppm", "r2_f_ppm"):
        assert exact[m] == 1_000_000, (m, exact[m])
    assert exact["r1_inter"] == n_toks
    assert exact["r2_inter"] == n_toks - 1
    # the near pair scores below unity on both orders but stays high
    for pair in ((1, 3), (2, 3)):
        if pair in out:
            r = out[pair]
            assert 800_000 < r["r1_f_ppm"] < 1_000_000
            assert r["r2_f_ppm"] < r["r1_f_ppm"]


def test_streaming_cms_equals_batch_twin(spark):
    """Associativity contract: the streamed complete-mode sketch over
    a fully-consumed source yields exactly the batch CMS estimates."""
    from youtube_etl_automated_pipeline_spark.plans.queries_engine6 import (
        streaming_cms_heavy_hitters,
    )
    from youtube_etl_automated_pipeline_spark.plans.queries_sketch import (
        cms_heavy_hitters,
    )

    got = sorted(map(tuple, streaming_cms_heavy_hitters(spark, SF_SMOKE).collect()))
    want = sorted(map(tuple, cms_heavy_hitters(spark, SF_SMOKE).collect()))
    assert got == want and len(got) > 0


def test_bradley_terry_invariants(spark):
    from youtube_etl_automated_pipeline_spark.plans.queries_engine6 import (
        preference_bradley_terry,
    )

    rows = preference_bradley_terry(spark, SF_SMOKE).collect()
    assert len(rows) == 5  # the five order priorities
    total_games = sum(r["games"] for r in rows)
    total_wins = sum(r["wins"] for r in rows)
    # every duel contributes one win and TWO directed game rows
    assert total_games == 2 * total_wins
    for r in rows:
        assert 0 < r["bt_micro"], r
        assert 0 <= r["wins"] <= r["games"], r
    # BT strength must be monotone with win RATE when the win-rate
    # leader also leads every pairwise matchup (true on this synthetic
    # data where priorities are price-symmetric and duel counts are
    # near-uniform: ranks reduce to rate order)
    by_rate = sorted(rows, key=lambda r: r["wins"] / r["games"], reverse=True)
    by_w = sorted(rows, key=lambda r: r["bt_micro"], reverse=True)
    assert by_rate[0]["priority"] == by_w[0]["priority"]


def test_bradley_terry_distributed_matches_collected(spark):
    """Round 8: the in-engine MM trainer (joins + keyed aggs over the
    games relation, weight relation localCheckpoint-ed per round, NO
    games.collect()) walks the identical integer fixed point as the
    collected driver loop — row-for-row equality, and the distributed
    plan carries the checkpointed weight relation (ExistingRDD) rather
    than an inlined literal CASE over driver-computed weights."""
    from youtube_etl_automated_pipeline_spark.plans.queries_engine6 import (
        preference_bradley_terry,
        preference_bradley_terry_distributed,
    )

    dist = preference_bradley_terry_distributed(spark, SF_SMOKE)
    got = sorted(map(tuple, dist.collect()))
    want = sorted(
        map(tuple, preference_bradley_terry(spark, SF_SMOKE).collect())
    )
    assert got == want and len(got) == 5
    # plan witness: final weights come from a checkpointed RDD scan,
    # not a driver-inlined CASE WHEN literal chain
    plan = dist._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan, plan
    assert "CASE WHEN (i =" not in plan, plan


def test_power_component_dominates_random_directions(spark):
    """Spectral sanity: after POW_ITERS rounds the returned loading
    vector's Rayleigh quotient on the centered data must beat every
    one of 25 deterministic pseudo-random directions (md5-seeded) —
    i.e. the iteration actually climbed toward the dominant
    eigenvector instead of stalling at the all-ones start."""
    import hashlib

    import numpy as np

    from youtube_etl_automated_pipeline_spark.plans.queries_engine6 import (
        embedding_power_component,
    )
    from youtube_etl_automated_pipeline_spark.sources import load_table

    rows = embedding_power_component(spark, SF_SMOKE).collect()
    v = np.array(
        [r["loading_micro"] for r in sorted(rows, key=lambda r: r["dim_idx"])],
        dtype=np.float64,
    )
    X = np.array(
        [
            r["embedding"]
            for r in load_table(spark, SF_SMOKE, "embeddings").collect()
        ],
        dtype=np.float64,
    )
    X = X - X.mean(axis=0)

    def rayleigh(u):
        u = u / np.linalg.norm(u)
        return float(np.sum((X @ u) ** 2))

    r_v = rayleigh(v)
    # direct spectral bound: within 10% of the true top eigenvalue
    # (the synthetic embeddings are near-isotropic — l2/l1 ~ 0.89 —
    # which is the hard case for power iteration)
    top = float(np.linalg.eigvalsh(X.T @ X)[-1])
    assert r_v >= 0.9 * top, (r_v, top)
    for k in range(25):
        h = hashlib.md5(f"dir|{k}".encode()).digest() * 32
        u = np.frombuffer(
            h[: X.shape[1] * 8], dtype=np.uint64
        ).astype(np.float64)
        u = (u / 2**64) - 0.5
        assert r_v >= rayleigh(u), k


def test_two_pass_median_equals_bruteforce(spark):
    """The histogram-refinement median must equal the lower median
    computed by brute-force per-nation sort."""
    from youtube_etl_automated_pipeline_spark.plans.queries_engine6 import (
        exact_median_two_pass,
    )
    from youtube_etl_automated_pipeline_spark.sources import load_table

    got = {
        r["nation_name"]: (r["n_orders"], r["median_cents"])
        for r in exact_median_two_pass(spark, SF_SMOKE).collect()
    }
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in load_table(spark, SF_SMOKE, "customer").collect()
    }
    nat = {
        r["n_nationkey"]: r["n_name"]
        for r in load_table(spark, SF_SMOKE, "nation").collect()
    }
    import math
    from collections import defaultdict

    vals = defaultdict(list)
    for r in load_table(spark, SF_SMOKE, "orders").collect():
        vals[nat[cust[r["o_custkey"]]]].append(
            math.floor(r["o_totalprice"] * 100.0 + 0.5)
        )
    assert set(got) == {k for k, v in vals.items() if v}
    for name, cents in vals.items():
        cents.sort()
        assert got[name] == (len(cents), cents[(len(cents) + 1) // 2 - 1]), name


def test_fs_pattern_scores_are_monotone(spark):
    """All-agree (pattern 15) must carry the maximum weight and
    all-disagree (pattern 0) the minimum; every per-feature agree
    weight exceeds its disagree weight (near-dups agree more often
    than the shifted-pair proxy on every field)."""
    from youtube_etl_automated_pipeline_spark.plans.queries_engine6 import (
        record_linkage_fs,
    )

    rows = {
        r["pattern"]: (r["n_pairs"], r["score_micro"])
        for r in record_linkage_fs(spark, SF_SMOKE).collect()
    }
    assert rows and all(n > 0 for n, _ in rows.values())
    scores = {p: s for p, (_, s) in rows.items()}
    if 15 in scores:
        assert scores[15] == max(scores.values())
    if 0 in scores:
        assert scores[0] == min(scores.values())
    # monotone in the pattern lattice: adding an agreement bit never
    # lowers the score (equivalent to w_agree >= w_disagree per field)
    for p, s in scores.items():
        for bit in range(4):
            q = p | (1 << bit)
            if q != p and q in scores:
                assert scores[q] >= s, (p, q)


def test_median_bucket_relation_is_range_invariant(spark):
    """Round 8: the fixed-bucket histogram median must (a) stay exact
    on a heavy-tailed column spanning ~1e16, and (b) keep its bucket
    relation bounded by groups x MED_BUCKETS — range-INVARIANT, where
    the round-7 value DIV width grain would have needed ~1e12 buckets."""
    from pyspark.sql import functions as F

    from youtube_etl_automated_pipeline_spark.plans.queries_engine6 import (
        MED_BUCKETS,
        _median_base,
        _median_hist,
        group_median_exact,
    )

    # deterministic heavy tail: v = id^3 * 1009 + id, span ~ 8.1e15
    df = spark.range(20001).select(
        (F.col("id") % 7).cast("int").alias("c_nationkey"),
        (F.col("id") * F.col("id") * F.col("id") * 1009 + F.col("id")).alias(
            "v"
        ),
    )
    got = {
        r["c_nationkey"]: (r["n"], r["median_val"])
        for r in group_median_exact(df, "v").collect()
    }
    # brute force lower median per group
    want = {}
    from collections import defaultdict

    groups = defaultdict(list)
    for r in df.collect():
        groups[r["c_nationkey"]].append(r["v"])
    for k, vs in groups.items():
        vs.sort()
        want[k] = (len(vs), vs[(len(vs) + 1) // 2 - 1])
    assert got == want

    # bucket-relation bound at the 1e16 span: groups x MED_BUCKETS max
    base, _ = _median_base(df, "v", MED_BUCKETS)
    hist_rows = _median_hist(base, "b1").count()
    assert hist_rows <= 7 * MED_BUCKETS, hist_rows
    # and b1 never escapes [0, B)
    mm = base.agg(F.min("b1").alias("lo"), F.max("b1").alias("hi")).first()
    assert 0 <= mm["lo"] and mm["hi"] < MED_BUCKETS, mm


def test_group_median_single_value_and_tiny_groups(spark):
    """Degenerate spans: all-equal values (span=1 -> every row lands
    in bucket 0 at both rounds) and 1-2 row groups still return the
    exact lower median."""
    from pyspark.sql import functions as F

    from youtube_etl_automated_pipeline_spark.plans.queries_engine6 import (
        group_median_exact,
    )

    df = spark.createDataFrame(
        [(0, 42), (0, 42), (0, 42), (1, 7), (2, 5), (2, 9)],
        "c_nationkey int, v long",
    )
    got = {
        r["c_nationkey"]: (r["n"], r["median_val"])
        for r in group_median_exact(df, "v").collect()
    }
    assert got == {0: (3, 42), 1: (1, 7), 2: (2, 5)}


def test_rouge_inflated_candidate_mass_stays_banded(spark, tmp_path):
    """Round 8 (r07 verdict item 7): when the banding threshold is
    effectively inflated — planted groups of IDENTICAL docs collide in
    every band — the candidate relation must stay exactly the banded
    census (C(k,2) per group, pairs distinct across bands), never
    all-pairs across groups, and every within-group pair scores unity
    ROUGE. This pins the 'linear in candidate mass' scaling claim in
    PLANS.md at ~20x this corpus's organic pair density."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from youtube_etl_automated_pipeline_spark.plans.queries_engine6 import (
        lsh_candidates,
        pair_rouge_overlap,
    )

    dst = str(tmp_path / "inflated")
    os.makedirs(dst)
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ):
        shutil.copy(
            os.path.join(SF_SMOKE, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
        )
    texts = [
        "the festival crowd gathered along the river bank to watch "
        "the lantern boats drift past the old stone bridge at dusk",
        "a completely different report about spark physical plans and "
        "shuffle partitioning strategies for large scale aggregation",
        "third corpus text describing tokenizer vocabularies byte "
        "pair encodings and the statistics of subword segmentation",
    ]
    K = 15  # docs per identical group -> C(15,2) = 105 pairs/group
    rows = [
        (g * 100 + i, texts[g]) for g in range(len(texts)) for i in range(K)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["web"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(dst, "documents.parquet"))

    cand = lsh_candidates(spark, dst).collect()
    per_group = K * (K - 1) // 2
    # banded census exactly: identical docs collide in ALL 8 bands but
    # pairs are distinct; different groups never collide
    assert len(cand) == len(texts) * per_group, len(cand)
    for r in cand:
        assert r["doc_a"] // 100 == r["doc_b"] // 100, tuple(r)

    out = pair_rouge_overlap(spark, dst).collect()
    assert len(out) == len(texts) * per_group
    for r in out:
        assert r["r1_f_ppm"] == 1_000_000 and r["r2_f_ppm"] == 1_000_000
