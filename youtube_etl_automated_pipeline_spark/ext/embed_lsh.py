"""Random-hyperplane (SimHash-for-vectors) LSH over embedding columns.

The scale path for embedding near-dup detection: per-row signature
bits (sign of dot with H fixed hyperplanes), banded into B keys;
only vectors sharing a band key ever meet in the verify join — the
classic candidates ≪ n² cut, mirroring what ``ext/dedup.py`` does
for text with MinHash.

Scale shape (the reason this replaces label/all-pairs blocking):
the signature pass is map-only (no shuffle) — an Arrow-batched
mapInPandas kernel computes all H dot products as a batch×dim matrix
sweep; the candidate join shuffles on (band, key) — collision groups
are small by construction, so no hot key; the exact-cosine verify
touches only candidate pairs. At 100 TB the corpus is scanned once
and the pairwise stage is linear in collisions, never global-
quadratic.

Why a kernel and not column expressions: H·dim unrolled multiply-add
terms (32×64 = 2048) cost ~30 s of Catalyst/codegen fixed overhead
per query compile — the round-1 rolling-hash lesson again. The numpy
kernel accumulates LEFT-TO-RIGHT over the dim axis (one vectorized
step per element index), so every per-row dot is the same IEEE
op-sequence as DuckDB's ``list_sum(list_transform(...))`` fold and
the sign bits — hence bands, candidates, verified pairs — agree
bit-for-bit with the oracle.

Parameters: H = R*B sign bits, R bits per band, B bands. For
near-dup thresholds (cos ≥ 0.99, bit-agreement p ≈ 0.97+) R=16, B=2
gives ~98% per-pair recall while a random pair (p=0.5) collides with
probability ≈ 2·2⁻¹⁶ ≈ 3e-5 — the candidate set is the true dups
plus a handful of collisions.

Reference parity: the reference pipeline has no vector search at all
(pandas + Sheets, Python-pipeline/dataprocessing.py); this module is
part of the LLM-training-data extension surface the brief mandates.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame

R_BITS = 16
B_BANDS = 2
N_PLANES = R_BITS * B_BANDS


def plane_coeff(h: int, i: int) -> float:
    """Deterministic pseudo-random hyperplane coefficient in [-1, 1):
    md5 of "plane:h:i" → 48-bit int → scaled. Stateless and portable —
    any engine (or the oracle generator) reproduces the same constant.
    """
    d = hashlib.md5(f"plane:{h}:{i}".encode()).hexdigest()
    return (int(d[:12], 16) / float(1 << 48)) * 2.0 - 1.0


def planes(dim: int, n_planes: int = N_PLANES) -> list[list[float]]:
    return [[plane_coeff(h, i) for i in range(dim)] for h in range(n_planes)]


def signatures(corpus: DataFrame, dim: int) -> DataFrame:
    """(emb_id, v: array<double>) → (emb_id, band, key): B_BANDS rows
    per vector, Arrow-batched mapInPandas, no shuffle."""
    import numpy as np
    import pandas as pd

    plane_mat = np.array(planes(dim), dtype=np.float64).T  # dim × H

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf["v"].tolist(), dtype=np.float64)  # n × dim
            acc = np.zeros((len(mat), N_PLANES), dtype=np.float64)
            # left-to-right over the dim axis: per (row, plane) this is
            # the exact scalar fold acc = acc + v[i]*p[i] — the same
            # IEEE sequence as the oracle's list_sum walk
            for i in range(dim):
                acc = acc + mat[:, i : i + 1] * plane_mat[i]
            bits = acc >= 0.0
            keys = np.zeros((len(mat), B_BANDS), dtype=np.int64)
            for b in range(B_BANDS):
                for r in range(R_BITS):
                    keys[:, b] |= bits[:, b * R_BITS + r].astype(np.int64) << r
            yield pd.DataFrame(
                {
                    "emb_id": np.repeat(pdf["emb_id"].to_numpy(), B_BANDS),
                    "band": np.tile(np.arange(B_BANDS, dtype=np.int32), len(mat)),
                    "key": keys.reshape(-1),
                }
            )

    return corpus.select("emb_id", "v").mapInPandas(
        kernel, "emb_id long, band int, key long"
    )


# --- DuckDB oracle twins (generated from the same constants) ---


def sql_dot_lit(vec_expr: str, coeffs: list[float]) -> str:
    """list_sum over generate_series is a left-to-right fold in
    DuckDB — same order as the kernel's accumulation loop."""
    arr = "[" + ", ".join(repr(c) for c in coeffs) + "]"
    return (
        f"list_sum(list_transform(generate_series(1, {len(coeffs)}),"
        f" i -> CAST({vec_expr}[i] AS DOUBLE) * ({arr})[i]))"
    )


def sql_band_keys(vec_expr: str, dim: int) -> list[str]:
    ps = planes(dim)
    bit = [
        f"(CASE WHEN {sql_dot_lit(vec_expr, ps[h])} >= 0 THEN 1 ELSE 0 END)"
        for h in range(N_PLANES)
    ]
    keys = []
    for b in range(B_BANDS):
        terms = " + ".join(
            f"{bit[b * R_BITS + r]} * {1 << r}" for r in range(R_BITS)
        )
        keys.append(f"CAST({terms} AS BIGINT)")
    return keys
