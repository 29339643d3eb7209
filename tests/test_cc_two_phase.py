"""Two independent connected-components kernels must agree: min-label
propagation (O(diameter) rounds) and large-star/small-star alternation
(O(log^2 n) rounds — Kiveris et al. 2014). The test graphs stress
exactly the regimes that distinguish them: long paths (high diameter),
dense cliques (propagation's best case), stars, and seeded random
graphs with many small components."""

from __future__ import annotations

import random

from youtube_etl_automated_pipeline_spark.ext.dedup import (
    connected_components,
    connected_components_two_phase,
)


def _labels(df):
    return {(r["node"], r["component"]) for r in df.collect()}


def _check(spark, edges, prop_iters=50):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    a = _labels(connected_components(df, max_iters=prop_iters))
    b = _labels(connected_components_two_phase(df))
    assert a == b, f"kernels disagree: only-prop={a - b} only-star={b - a}"
    return b


def test_long_path_high_diameter(spark):
    # 0-1-2-...-40: diameter 40; star contraction must still land on 0
    n = 41
    out = _check(spark, [(i, i + 1) for i in range(n - 1)])
    assert out == {(i, 0) for i in range(n)}


def test_two_cliques_and_a_bridge(spark):
    k1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k2 = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    out = _check(spark, k1 + k2 + [(4, 10)])
    assert out == {(i, 0) for i in range(5)} | {(i, 0) for i in range(10, 15)}


def test_star_and_isolated_selfloop(spark):
    edges = [(100, c) for c in (3, 7, 9, 50)] + [(200, 200)]
    out = _check(spark, edges)
    assert (200, 200) in out  # self-loop-only node keeps itself
    assert (100, 3) in out and (50, 3) in out


def test_random_graphs_seeded(spark):
    for seed in (7, 23, 91):
        rng = random.Random(seed)
        nodes = list(range(60))
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(45)
        ]  # sparse: many components, some self-loops
        _check(spark, edges)


def test_duplicate_and_reversed_edges(spark):
    edges = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 2), (5, 6)]
    out = _check(spark, edges)
    assert out == {(1, 1), (2, 1), (3, 1), (5, 5), (6, 5)}


def test_propagation_raises_instead_of_wrong_labels(spark):
    """A diameter-40 path cannot converge in 10 propagation rounds —
    the kernel must fail loudly, never return unconverged labels."""
    import pytest

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "src bigint, dst bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iters=10)
