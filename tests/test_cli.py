"""CLI surface: list/run/explain over the query catalog in a real
subprocess (the way a reference user would drive the engine)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "youtube_etl_automated_pipeline_spark", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )


def test_cli_list_names_every_query():
    import __spark_entry__ as entry

    r = _cli("list")
    assert r.returncode == 0, r.stderr[-2000:]
    names = set(r.stdout.split())
    assert names == set(entry.queries())


def test_cli_run_and_explain():
    r = _cli(
        "run", "min_over_group", "--sf-dir", "/root/testdata/sf0.001",
        "--limit", "3",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "n_orders" in r.stdout

    r2 = _cli("explain", "top_k_orders", "--sf-dir", "/root/testdata/sf0.001")
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "TakeOrderedAndProject" in r2.stdout

    r3 = _cli("run", "no_such_query")
    assert r3.returncode == 2
