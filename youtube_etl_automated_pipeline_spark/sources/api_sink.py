"""Custom connector, write side: a batched-upload API SINK on Spark
4's Python Data Source writer API (``DataSourceArrowWriter``) — the
counterpart of the paged_api read connector.

The reference publishes results by batch-updating a Google Sheet
(gspread ``update``/``append_rows`` calls driven row-window by
row-window from one process). Re-expressed for Spark, each PARTITION
becomes one uploader task (1000 executors publish 1000 partitions
concurrently), rows inside a partition are grouped into
``batch_size``-row "requests" (the reference's 500-per-call contract),
and Spark's two-phase commit protocol provides the atomicity the
reference approximates with its truncate-then-rewrite dance:

- executors WRITE to a staging area and return a commit message
  (file, rows, request count) — nothing is visible yet;
- the driver COMMITs by publishing exactly the staged files named in
  the commit messages and writing a ``_MANIFEST.json`` (the "finalize"
  call a transactional API would expose); a task retry's orphaned
  attempt file is ignored because only message-named files publish;
- on any task failure the driver ABORTs: staging is dropped, the
  previously-published data stays untouched.

The simulated endpoint is the local filesystem (JSONL per partition);
a real deployment swaps ``_upload`` for HTTP PUTs and keeps the
protocol. No network in this container — same honesty contract as
paged_api.py.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import uuid
from dataclasses import dataclass
from typing import Iterator, List, Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

DEFAULT_BATCH_SIZE = 500  # the reference's rows-per-request contract


@dataclass
class ApiSinkCommit(WriterCommitMessage):
    staged_file: str
    rows: int
    requests: int


def _staging_dir(target: str) -> str:
    return os.path.join(target, "_staging")


def _abort_marker(target: str, token: str) -> str:
    # The marker lives OUTSIDE _staging so aborting can both signal
    # (touch marker) and clean (rmtree staging) without the signal
    # being destroyed by the cleanup.
    return os.path.join(target, f".abort-{token}")


class BatchedApiWriter(DataSourceArrowWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.target = options["path"]
        self.batch_size = int(options.get("batch_size", DEFAULT_BATCH_SIZE))
        self.overwrite = overwrite
        # Job-unique abort token, minted driver-side when the writer is
        # constructed and pickled into every task. abort() touches the
        # marker BEFORE sweeping staging; write() re-checks it AFTER
        # staging its file, so a task still draining when the driver
        # aborts cannot leave a zombie file (or a recreated empty
        # _staging dir) behind — it sees the marker and self-cleans.
        self.abort_token = options.get("_abort_token") or uuid.uuid4().hex

    # -- executor side -------------------------------------------------
    def write(self, iterator: Iterator) -> ApiSinkCommit:
        marker = _abort_marker(self.target, self.abort_token)
        if os.path.exists(marker):
            raise RuntimeError("api_batch_sink: job already aborted")
        os.makedirs(_staging_dir(self.target), exist_ok=True)
        # uuid per task ATTEMPT: a retried task stages a fresh file and
        # only the message the driver receives gets published.
        fname = f"part-{uuid.uuid4().hex}.jsonl"
        staged = os.path.join(_staging_dir(self.target), fname)
        rows = 0
        with open(staged, "w") as f:
            for batch in iterator:
                for rec in batch.to_pylist():
                    f.write(json.dumps(rec, sort_keys=True, default=str))
                    f.write("\n")
                rows += batch.num_rows
        if os.path.exists(marker):
            # Abort raced our staging: everything under _staging is
            # doomed regardless of owner, so sweep it (including the
            # dir itself, in case our makedirs recreated it after the
            # driver's rmtree) and fail the task.
            shutil.rmtree(_staging_dir(self.target), ignore_errors=True)
            raise RuntimeError("api_batch_sink: job aborted during write")
        requests = math.ceil(rows / self.batch_size) if rows else 0
        return ApiSinkCommit(staged_file=fname, rows=rows, requests=requests)

    # -- driver side ---------------------------------------------------
    def commit(self, messages: List[Optional[ApiSinkCommit]]) -> None:
        msgs = [m for m in messages if m is not None]
        if self.overwrite:
            for entry in os.listdir(self.target):
                if entry != "_staging":
                    path = os.path.join(self.target, entry)
                    (shutil.rmtree if os.path.isdir(path) else os.remove)(path)
        for m in msgs:
            os.replace(
                os.path.join(_staging_dir(self.target), m.staged_file),
                os.path.join(self.target, m.staged_file),
            )
        manifest = {
            "files": sorted(m.staged_file for m in msgs),
            "total_rows": sum(m.rows for m in msgs),
            "total_requests": sum(m.requests for m in msgs),
            "batch_size": self.batch_size,
        }
        with open(os.path.join(self.target, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        shutil.rmtree(_staging_dir(self.target), ignore_errors=True)
        # Sweep stale abort markers from PRIOR aborted jobs against the
        # same target (this job's own marker can't exist: commit and
        # abort are mutually exclusive for one job).
        for entry in os.listdir(self.target):
            if entry.startswith(".abort-"):
                try:
                    os.remove(os.path.join(self.target, entry))
                except OSError:
                    pass

    def abort(self, messages: List[Optional[ApiSinkCommit]]) -> None:
        # Marker FIRST, sweep second: any write() that stages (or
        # recreates _staging) after this rmtree must also observe the
        # marker in its post-write check and self-clean, so no zombie
        # staged file or empty _staging dir can outlive the abort.
        try:
            with open(_abort_marker(self.target, self.abort_token), "w"):
                pass
        except OSError:
            pass  # target dir itself gone — nothing to protect
        shutil.rmtree(_staging_dir(self.target), ignore_errors=True)


class BatchedApiStreamWriter(DataSourceStreamArrowWriter):
    """The STREAMING face of the same endpoint: per micro-batch, the
    executors stage uploads exactly like the batch writer, and the
    driver publishes them under ``batch=<id>/`` with a per-batch
    manifest. Publication is keyed by the checkpointed batchId, so a
    RESTARTED micro-batch republishes the same directory instead of
    appending twice — the sink-side half of exactly-once (the
    source-side half is the checkpointed offset, see paged_api)."""

    def __init__(self, options: dict):
        self.target = options["path"]
        self.batch_size = int(options.get("batch_size", DEFAULT_BATCH_SIZE))
        # One token per stream-writer instance (i.e. per query run); a
        # restarted query gets a fresh token, so a stale marker from an
        # aborted prior run never blocks the replay.
        self.abort_token = uuid.uuid4().hex

    def write(self, iterator: Iterator) -> ApiSinkCommit:
        return BatchedApiWriter(
            {
                "path": self.target,
                "batch_size": self.batch_size,
                "_abort_token": self.abort_token,
            },
            False,
        ).write(iterator)

    def commit(self, messages: List[Optional[ApiSinkCommit]], batchId: int) -> None:
        msgs = [m for m in messages if m is not None]
        batch_dir = os.path.join(self.target, f"batch={int(batchId)}")
        if os.path.isdir(batch_dir):  # replayed batch: republish clean
            shutil.rmtree(batch_dir)
        os.makedirs(batch_dir)
        for m in msgs:
            os.replace(
                os.path.join(_staging_dir(self.target), m.staged_file),
                os.path.join(batch_dir, m.staged_file),
            )
        manifest = {
            "batch_id": int(batchId),
            "files": sorted(m.staged_file for m in msgs),
            "total_rows": sum(m.rows for m in msgs),
            "total_requests": sum(m.requests for m in msgs),
        }
        with open(os.path.join(batch_dir, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        for entry in os.listdir(self.target):
            if entry.startswith(".abort-"):
                try:
                    os.remove(os.path.join(self.target, entry))
                except OSError:
                    pass

    def abort(self, messages: List[Optional[ApiSinkCommit]], batchId: int) -> None:
        # Same marker-first protocol as the batch writer (see
        # BatchedApiWriter.abort): draining tasks self-clean.
        try:
            with open(_abort_marker(self.target, self.abort_token), "w"):
                pass
        except OSError:
            pass
        shutil.rmtree(_staging_dir(self.target), ignore_errors=True)


class ApiSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "api_batch_sink"

    def writer(self, schema, overwrite: bool) -> BatchedApiWriter:
        return BatchedApiWriter(dict(self.options), overwrite)

    def streamWriter(self, schema, overwrite: bool) -> BatchedApiStreamWriter:
        return BatchedApiStreamWriter(dict(self.options))


def register(spark) -> None:
    """Idempotent registration of the sink connector on a session."""
    spark.dataSource.register(ApiSinkDataSource)
