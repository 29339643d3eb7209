"""Semantic tests for the DP / bootstrap operators
(plans/queries_resample.py): exact Python reimplementation of the
noise draws and the full Poisson bootstrap, plus the statistical
properties a consumer relies on (noise centered, CI brackets the
point estimate, determinism across runs)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _uniform(h: int) -> float:
    return (h + 0.5) / 4294967296.0


def test_dp_noise_matches_python_and_is_centered(spark):
    from youtube_etl_automated_pipeline_spark.plans.queries_resample import (
        DP_SALT,
        dp_noise_histogram,
    )
    from youtube_etl_automated_pipeline_spark.sources import load_table

    true = {
        (r.c_nationkey, r.c_mktsegment): r.n
        for r in load_table(spark, SF, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }

    def noise(nk, seg):
        g = lambda tag: math.floor(  # noqa: E731
            -math.log(_uniform(_h32(f"{DP_SALT}|{tag}|{nk}|{seg}")))
        )
        return g("a") - g("b")

    got = {
        (r.c_nationkey, r.c_mktsegment): r.noisy_count
        for r in dp_noise_histogram(spark, SF).collect()
    }
    assert set(got) == set(true)
    diffs = []
    for k, v in got.items():
        assert v == true[k] + noise(*k)
        diffs.append(v - true[k])
    # eps=1 discrete Laplace: sd ~ 1.2; the mean noise over ~100
    # cells must sit well inside +-1 — catches any sign/offset bug
    # that per-cell equality alone would also catch, but documents
    # the distributional contract.
    assert abs(sum(diffs) / len(diffs)) < 1.0
    # determinism: a second build draws the identical noise
    again = {
        (r.c_nationkey, r.c_mktsegment): r.noisy_count
        for r in dp_noise_histogram(spark, SF).collect()
    }
    assert again == got


def test_bootstrap_ci_matches_python_and_brackets_mean(spark):
    from youtube_etl_automated_pipeline_spark.plans.queries_resample import (
        BOOT_HI_RN,
        BOOT_LO_RN,
        BOOT_R,
        BOOT_SALT,
        _POIS_CDF,
        bootstrap_ci_nation_revenue,
    )
    from youtube_etl_automated_pipeline_spark.sources import load_table

    cdf = [float(c) for c in _POIS_CDF]

    def weight(ok, r):
        # one md5 per block of 4 replicates; slot r%4 takes hex chars
        # [8*slot, 8*slot+8)
        hx = hashlib.md5(
            f"{BOOT_SALT}|{ok}|{r // 4}".encode()
        ).hexdigest()
        u = _uniform(int(hx[8 * (r % 4) : 8 * (r % 4) + 8], 16))
        for k, c in enumerate(cdf):
            if u < c:
                return k
        return 6

    rows = (
        load_table(spark, SF, "orders")
        .join(
            load_table(spark, SF, "customer").selectExpr(
                "c_custkey", "c_nationkey"
            ),
            F.expr("o_custkey = c_custkey"),
        )
        .selectExpr(
            "o_orderkey",
            "c_nationkey",
            "CAST(floor(o_totalprice * 1e2 + 5e-1) AS BIGINT) AS cents",
        )
        .collect()
    )
    reps: dict[tuple[int, int], list[int]] = {}
    for row in rows:
        for r in range(BOOT_R):
            w = weight(row.o_orderkey, r)
            if w:
                s, m = reps.get((row.c_nationkey, r), (0, 0))
                reps[(row.c_nationkey, r)] = (
                    s + w * row.cents,
                    m + w,
                )

    expect = {}
    per_nation: dict[int, list[tuple[int, int]]] = {}
    for (nk, r), (s, m) in reps.items():
        per_nation.setdefault(nk, []).append(
            (math.floor(s / m * 1e4 + 0.5), r)
        )
    for nk, means in per_nation.items():
        means.sort()
        expect[nk] = (
            len(means),
            means[BOOT_LO_RN - 1][0],
            means[BOOT_HI_RN - 1][0],
        )

    got = {
        r.c_nationkey: (r.n_reps, r.ci_lo_sub, r.ci_hi_sub)
        for r in bootstrap_ci_nation_revenue(spark, SF).collect()
    }
    assert got == expect

    # the CI must bracket the plain (unresampled) per-nation mean
    true_mean: dict[int, tuple[int, int]] = {}
    for row in rows:
        s, m = true_mean.get(row.c_nationkey, (0, 0))
        true_mean[row.c_nationkey] = (s + row.cents, m + 1)
    inside = sum(
        1
        for nk, (lo_hi) in got.items()
        if lo_hi[1] <= (true_mean[nk][0] / true_mean[nk][1]) * 1e4 <= lo_hi[2]
    )
    assert inside >= len(got) * 0.9
