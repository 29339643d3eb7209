"""Custom connector: a paginated-API source on Spark 4's Python Data
Source API (``pyspark.sql.datasource``).

The reference ingests by walking an API cursor page-by-page on one
machine (`Python-pipeline/dataingestion1.py:79-94` — the
``pageToken``/``nextPageToken`` loop) and then batching ids 500 per
request (`Python-pipeline/dataprocessing.py:77`). Re-expressed for
Spark, pagination becomes the PARTITIONING: every page is an
``InputPartition``, so a 1000-executor cluster fetches 1000 pages
concurrently instead of serially following a cursor, and Spark
retries a failed page (task retry) without restarting the crawl.

The simulated response body is deterministic integer arithmetic so
the correctness gate can reproduce it bit-for-bit in DuckDB (no
network in the container; a real deployment swaps `_page_rows` for
the HTTP call and keeps the partitioning).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

DEFAULT_PAGES = 20
DEFAULT_PAGE_SIZE = 500  # the reference's ids-per-request batch size

_SCHEMA = "page INT, item_id BIGINT, video_code STRING, score DOUBLE"

# Knuth multiplicative hash constant — scrambles item ids into
# plausible-looking opaque codes while staying exactly reproducible
# in ANSI SQL (bigint multiply + modulo, no overflow at these sizes).
_MIX = 2654435761
_MOD = 100_000_007


class _PagePartition(InputPartition):
    def __init__(self, page: int, page_size: int):
        self.page = page
        self.page_size = page_size


DEFAULT_MAX_RETRIES = 2
DEFAULT_BACKOFF_MS = 0  # simulated feed: no reason to wait by default

# What counts as "transient provider trouble" worth a re-request:
# network resets, timeouts, and OS-level I/O hiccups. TimeoutError is
# an OSError subclass but named for readers; anything outside this
# tuple (a code bug, bad options) fails fast instead of retrying.
_TRANSIENT_ERRORS = (ConnectionError, TimeoutError, OSError)


class _RetryOpts:
    """Connector-level retry/backoff. The reference's error branch
    (`Python-pipeline/dataprocessing.py:99-102`) sleeps 5 s on a quota
    error and then SKIPS the failed batch — the loop continues past
    it, silently dropping those rows. This connector replaces that
    with bounded retry + loud failure: a transient provider error
    costs a backoff'd re-request of the page, and a page that stays
    broken raises instead of vanishing. On Spark the retry belongs
    INSIDE the partition read — one page re-requested, not a full
    task (and stage) retry; Spark's task retry stays as the outer
    safety net. Only transient error classes are retried
    (``_TRANSIENT_ERRORS``); a deterministic failure — a bug in the
    record-batch builder, bad options — re-raises immediately rather
    than burning maxRetries+1 attempts of linear backoff.

    Options (all per-read, strings as Spark delivers them):
    - ``maxRetries``: re-request attempts per page after the first
      failure (default 2; 0 disables connector-level retry).
    - ``backoffMs``: base sleep before attempt k, scaled linearly
      (k * backoffMs — the reference's fixed 5 s nap, made
      proportional so repeated failures back off harder).
    - ``failOnceDir``: fault injection for tests — first fetch of
      each page consults ``{dir}/page_{p}`` and raises a simulated
      transient error if the marker is absent (creating it), so the
      retry path runs deterministically without a network."""

    def __init__(self, options: dict):
        self.max_retries = int(options.get("maxRetries", DEFAULT_MAX_RETRIES))
        self.backoff_ms = int(options.get("backoffMs", DEFAULT_BACKOFF_MS))
        self.fail_once_dir = options.get("failOnceDir")

    def fetch_page(self, page: int, page_size: int):
        import time

        last_err = None
        for attempt in range(self.max_retries + 1):
            if attempt > 0 and self.backoff_ms > 0:
                time.sleep(attempt * self.backoff_ms / 1000.0)
            try:
                self._maybe_inject_fault(page)
                return _page_record_batch(page, page_size)
            except _TRANSIENT_ERRORS as exc:
                last_err = exc
        raise RuntimeError(
            f"page {page} failed after {self.max_retries + 1} attempts"
        ) from last_err

    def _maybe_inject_fault(self, page: int) -> None:
        if not self.fail_once_dir:
            return
        import os

        marker = os.path.join(self.fail_once_dir, f"page_{page}")
        try:
            # O_CREAT|O_EXCL: atomic first-attempt detection even if
            # two tasks race on the same page (speculative execution)
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            return  # already failed once: succeed this time
        raise ConnectionError(f"simulated transient API error on page {page}")


def _page_record_batch(page: int, page_size: int):
    """One simulated page as an Arrow RecordBatch (the vectorized fast
    path — no pickled row tuples); shared by the batch and streaming
    readers so both surfaces serve bit-identical data."""
    import numpy as np
    import pyarrow as pa

    n = page_size
    base = page * n
    ids = np.arange(base, base + n, dtype=np.int64)
    code_nums = (ids * _MIX) % _MOD
    scores = ((ids * 7919) % 1000).astype(np.float64) / 10.0
    return pa.RecordBatch.from_arrays(
        [
            pa.array(np.full(n, page, dtype=np.int32)),
            pa.array(ids),
            pa.array([f"VID{c:09d}" for c in code_nums], type=pa.string()),
            pa.array(scores),
        ],
        names=["page", "item_id", "video_code", "score"],
    )


class PagedApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.pages = int(options.get("pages", DEFAULT_PAGES))
        self.page_size = int(options.get("page_size", DEFAULT_PAGE_SIZE))
        self.retry = _RetryOpts(options)

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per page = one "request" per task; at scale
        # the page count, not a driver-side cursor loop, bounds
        # parallelism.
        return [_PagePartition(p, self.page_size) for p in range(self.pages)]

    def read(self, partition: _PagePartition):
        yield self.retry.fetch_page(partition.page, partition.page_size)


class PagedApiStreamReader(DataSourceStreamReader):
    """The same connector as a STREAMING source: the offset is the
    page cursor, each micro-batch covers [start.page, end.page) with
    one InputPartition per page (pages within a batch still fetch in
    parallel across executors). The checkpointed offset is exactly
    the reference's persisted ``pageToken`` cursor
    (Python-pipeline/dataingestion1.py:94-96) — a restart resumes
    from the committed page, never re-reads, never skips.

    This simulated feed is finite (``pages``), so latestOffset caps
    there and an availableNow run drains it; a live API deployment
    returns the provider's current high-water mark instead and uses
    a bounded step per batch as admission control."""

    def __init__(self, options: dict):
        self.pages = int(options.get("pages", DEFAULT_PAGES))
        self.page_size = int(options.get("page_size", DEFAULT_PAGE_SIZE))
        self.retry = _RetryOpts(options)

    def initialOffset(self) -> dict:
        return {"page": 0}

    def latestOffset(self) -> dict:
        return {"page": self.pages}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        return [
            _PagePartition(p, self.page_size)
            for p in range(start["page"], end["page"])
        ]

    def read(self, partition: _PagePartition):
        yield self.retry.fetch_page(partition.page, partition.page_size)

    def commit(self, end: dict) -> None:
        # a real connector would release provider-side cursors here
        pass


class PagedApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paged_api_sim"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> PagedApiReader:
        return PagedApiReader(self.options)

    def streamReader(self, schema) -> PagedApiStreamReader:
        return PagedApiStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the connector on a session."""
    spark.dataSource.register(PagedApiDataSource)
