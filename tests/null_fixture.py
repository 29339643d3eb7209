"""Adversarial null-injected twin of a testdata directory.

The driver-generated parquet contains ZERO nulls in any column, so the
oracle gate alone never exercises null semantics (left-join miss
paths, SUM/COUNT null-skipping, null group keys, concat-vs-concat_ws
divergence...). This module derives a fixture with deterministic
~6% nulls in the non-key, non-timestamp columns and the same file
layout, so the SAME queries + oracles can be compared over it.

Key columns (ids, join keys) and event timestamps stay non-null: the
goal is to exercise VALUE null handling, not to redefine the data
model (null join keys/timestamps would mostly test engines' null
ORDER BY defaults, which genuinely differ and which every query
already pins explicitly where it matters).
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

NULL_PCT = 6

# columns to null per table; everything else is copied verbatim
NULLED: dict[str, tuple[str, ...]] = {
    "documents": ("text", "lang", "source", "n_chars"),
    "events": ("event_type", "value"),
    "orders": ("o_totalprice", "o_orderdate", "o_orderpriority"),
    "customer": ("c_acctbal", "c_mktsegment"),
    "lineitem": (
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_returnflag",
    ),
    # label only — NOT the vector itself: a null embedding is
    # contract-invalid input for the similarity family (no geometric
    # meaning; the constraint_violations / quarantine operators are
    # the documented upstream gate), and the column-expression kernels
    # (unit()/dot) already null-propagate consistently where vectors
    # can be absent.
    "embeddings": ("label",),
}

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Extra columns nulled ONLY for the streaming null twin: the batch
# fixture keeps user_id non-null (it is a grouping/join key across
# hundreds of batch queries and nulling it there would mostly re-test
# engine null-key defaults en masse), but the streaming family's
# verdict-named risk is precisely a null user_id flowing through
# stateful distinct-count / per-key state (md5(NULL) hashing, null
# grouping keys in applyInPandasWithState), so the streaming twin
# injects it.
STREAMING_EXTRA: dict[str, tuple[str, ...]] = {"events": ("user_id",)}


def _null_mask(table: str, col: str, n: int) -> list[bool]:
    return [
        int(
            hashlib.md5(f"nullfx|{table}|{col}|{i}".encode()).hexdigest()[:8],
            16,
        )
        % 100
        < NULL_PCT
        for i in range(n)
    ]


def build(
    src_dir: str,
    dst_dir: str,
    extra: dict[str, tuple[str, ...]] | None = None,
) -> str:
    to_null = dict(NULLED)
    for t, cols in (extra or {}).items():
        to_null[t] = tuple(dict.fromkeys(to_null.get(t, ()) + cols))
    os.makedirs(dst_dir, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(os.path.join(src_dir, f"{t}.parquet"))
        for col in to_null.get(t, ()):
            idx = tbl.schema.get_field_index(col)
            field = tbl.schema.field(idx)
            mask = _null_mask(t, col, len(tbl))
            vals = tbl.column(idx).to_pylist()
            nulled = [None if m else v for v, m in zip(vals, mask)]
            if t == "orders" and col == "o_orderdate":
                # Force at least one ALL-null-date customer: the
                # per-row ~6% mask almost never nulls every order of
                # one customer, so the "NULL lifetime / NULL group
                # after a per-key min-max" class (survival_kaplan_meier
                # round-3 advice) would stay unexercised. Pick the
                # customer of the first row deterministically and null
                # every one of their order dates.
                cust = tbl.column("o_custkey").to_pylist()
                victim = cust[0]
                nulled = [
                    None if ck == victim else v
                    for v, ck in zip(nulled, cust)
                ]
            tbl = tbl.set_column(
                idx, field, pa.array(nulled, type=field.type)
            )
        pq.write_table(tbl, os.path.join(dst_dir, f"{t}.parquet"))
    return dst_dir
