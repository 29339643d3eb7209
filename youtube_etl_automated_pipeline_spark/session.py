"""SparkSession factory.

Local-mode testing defaults; the confs are chosen so the same code is
cluster-ready: AQE handles runtime re-planning and skew joins, shuffle
partition count tracks available cores locally (a real cluster would
size it to ~2-3x total executor cores or rely on AQE coalescing),
Arrow is on for the few Pandas-UDF extension ops, session timezone is
pinned UTC so timestamp semantics are deterministic and match the
DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def _fast_tmp_dir() -> str | None:
    """tmpfs home for EPHEMERAL JVM temp state — shuffle/local dirs and
    the temporary streaming checkpoints every gate/bench streaming
    query creates and deletes per run. On this host /tmp is disk-backed
    ext4, so each streaming query pays checkpoint-WAL fsyncs to disk;
    on tmpfs those vanish (measured: streaming_tumbling_window 1.27s ->
    1.07s min-of-5 at sf0.1 — x ~30 streaming gates ≈ 6s of suite).

    Local-test posture ONLY, guarded accordingly: a real cluster puts
    spark.local.dir on fast local disks and streaming checkpoints on
    DURABLE shared storage (tmpfs checkpoints cannot survive a node
    loss — fine here because gate checkpoints are created fresh and
    deleted within one run; every recovery/restart-invariance test
    pins its own explicit on-disk checkpoint dir). Returns None (use
    defaults) when tmpfs is absent, unwritable, or short on headroom,
    or when SPARK_GRAFT_NO_TMPFS=1. Stale temp from crashed runs is
    RAM, so sweep anything older than 6h at session build."""
    if os.environ.get("SPARK_GRAFT_NO_TMPFS") == "1":
        return None
    shm = "/dev/shm"
    if not os.path.isdir(shm) or not os.access(shm, os.W_OK):
        return None
    try:
        st = os.statvfs(shm)
    except OSError:
        return None
    if st.f_bavail * st.f_frsize < (8 << 30):
        return None
    root = os.path.join(shm, "spark_graft_tmp")
    os.makedirs(root, exist_ok=True)
    import shutil
    import time
    import uuid

    # Each session gets its OWN pid-named subdir, and the sweep only
    # reclaims subdirs whose owning pid is dead — never by mtime, which
    # would delete the live shuffle/blockmgr dirs of a concurrent
    # session older than the cutoff (blockmgr dir mtimes are set at
    # creation and not refreshed while in use). Legacy un-named entries
    # (pre round-8 layout) still fall back to a conservative 6h mtime
    # sweep so old RAM is eventually reclaimed.
    cutoff = time.time() - 6 * 3600
    for name in os.listdir(root):
        p = os.path.join(root, name)
        try:
            if name.startswith("pid-"):
                owner = int(name.split("-")[1])
                try:
                    os.kill(owner, 0)  # signal 0: existence probe only
                except ProcessLookupError:
                    shutil.rmtree(p, ignore_errors=True)
                except PermissionError:
                    pass  # pid alive, owned by someone else: keep
            elif name == "runstate":
                # fast_scratch_dir's per-run state root. Its OWN mtime
                # refreshes every time any run creates a child, so the
                # generic rule below would never fire and crashed-run
                # leaks would accumulate in RAM (r08 advice). Sweep
                # one level down instead: per-run state is rebuilt on
                # every invocation (callers rmtree+recreate at start),
                # so a 6h-old child is a crashed run's leak, never a
                # live one. The root itself is kept.
                for sub in os.listdir(p):
                    sp = os.path.join(p, sub)
                    try:
                        if os.path.getmtime(sp) < cutoff:
                            shutil.rmtree(sp, ignore_errors=True)
                    except OSError:
                        pass
            elif os.path.getmtime(p) < cutoff:
                shutil.rmtree(p, ignore_errors=True)
        except (OSError, ValueError):
            pass
    d = os.path.join(root, f"pid-{os.getpid()}-{uuid.uuid4().hex[:8]}")
    os.makedirs(d, exist_ok=True)
    return d


def fast_scratch_dir(*parts: str) -> str:
    """Ephemeral PER-RUN state root on tmpfs when available, /tmp
    otherwise: the incremental-view gate queries (CDC merge, agg-state
    log, IVM join view) rebuild parquet state tables + checkpoints on
    every invocation, and on this host /tmp is disk-backed ext4 — the
    state rewrites pay fsyncs a warm cluster would not (r08; same
    rationale as _fast_tmp_dir for shuffle/checkpoint temp). Returns a
    path under the root; callers own create/cleanup exactly as they
    did under /tmp. Durable FIXTURES (memoized per-sf inputs) stay on
    /tmp — only state that is rebuilt per run belongs here."""
    root = None
    if os.environ.get("SPARK_GRAFT_NO_TMPFS") != "1":
        shm = "/dev/shm"
        if os.path.isdir(shm) and os.access(shm, os.W_OK):
            try:
                st = os.statvfs(shm)
                if st.f_bavail * st.f_frsize >= (8 << 30):
                    root = os.path.join(shm, "spark_graft_tmp", "runstate")
            except OSError:
                pass
    if root is None:
        root = "/tmp/spark_graft_runstate"
    return os.path.join(root, *parts)


def ensure_protobuf() -> None:
    """Make ``google.protobuf`` importable. If the real distribution
    is installed, do nothing. Otherwise add the vendored miniproto
    shim (vendor/google/protobuf — a minimal pure-Python protobuf
    runtime) to sys.path AND to PYTHONPATH, because pyspark's
    transformWithStateInPandas state-protocol client imports it from
    inside Python WORKER processes, which resolve only PYTHONPATH."""
    import importlib.util
    import sys

    try:
        real = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        real = False  # no `google` namespace at all
    if real:
        return
    vendor = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "vendor"
    )
    if vendor not in sys.path:
        sys.path.insert(0, vendor)
    pp = os.environ.get("PYTHONPATH", "")
    if vendor not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = vendor + (os.pathsep + pp if pp else "")
    importlib.invalidate_caches()


def ensure_protobuf_on_session(spark: SparkSession) -> None:
    """Worker-side protobuf for a CALLER-PROVIDED session (the driver
    builds its own SparkSession, so the PYTHONPATH-at-JVM-start path
    in ``ensure_protobuf`` never ran for it): ship the vendored
    miniproto package to workers via ``addPyFile`` — SparkContext
    distributes the zip and every Python worker appends it to
    sys.path. Idempotent per session; no-op when the real protobuf
    distribution exists."""
    import importlib.util
    import zipfile

    ensure_protobuf()  # driver-side import path
    spec = importlib.util.find_spec("google.protobuf")
    if spec is not None and "vendor" not in (spec.origin or ""):
        return  # a real distribution resolves first; workers have it
    sc = spark.sparkContext
    marker = "_graft_miniproto_shipped"
    if getattr(sc, marker, False):
        return
    vendor = os.path.join(os.path.dirname(os.path.abspath(__file__)), "vendor")
    zip_path = "/tmp/spark_graft_miniproto.zip"
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for root, _dirs, files in os.walk(os.path.join(vendor, "google")):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        zf.write(full, os.path.relpath(full, vendor))
        os.replace(tmp, zip_path)
    try:
        sc.addPyFile(zip_path)  # ordinary Python workers (task includes)
    except Exception:
        pass  # already added in this context: workers have it
    # The TWS companion process (StreamingPythonRunner ->
    # transform_with_state_driver_worker) never applies task includes;
    # its PYTHONPATH comes from the PythonFunction's envVars, which
    # PySpark populates from sc.environment — so route the vendor dir
    # through there for sessions whose JVM started without it.
    env_pp = sc.environment.get("PYTHONPATH", "")
    if vendor not in env_pp.split(os.pathsep):
        sc.environment["PYTHONPATH"] = vendor + (
            os.pathsep + env_pp if env_pp else ""
        )
    setattr(sc, marker, True)


def get_spark(app_name: str = "youtube_etl_spark", shuffle_partitions: int | None = None) -> SparkSession:
    # Python workers resolve imports from the driver's PYTHONPATH, not
    # its sys.path: a caller running from another cwd would otherwise
    # get ModuleNotFoundError inside every mapInPandas kernel that
    # references this package. Pin the repo root before the JVM starts.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + pp if pp else "")
        )
    ensure_protobuf()
    cpus = default_parallelism()
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # managed-table home for bucketed tables (bucketBy needs
        # saveAsTable); kept out of the repo tree
        .config("spark.sql.warehouse.dir", os.environ.get(
            "SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"))
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark has no
        # nanosecond timestamp type -> read as long, converted to a
        # microsecond timestamp in sources.readers.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The reference is stringly-typed with null-on-failure parses
        # everywhere (int(x or 0) / try-except, SURVEY section 1.1);
        # ANSI mode would turn those into runtime errors.
        .config("spark.sql.ansi.enabled", "false")
    )
    fast_tmp = _fast_tmp_dir()
    if fast_tmp:
        builder = builder.config("spark.local.dir", fast_tmp).config(
            # java.io.tmpdir is where ResolveWriteToStream creates the
            # temporary-* checkpoint dirs for queries without an
            # explicit checkpointLocation (all gate/bench streaming
            # queries); takes effect because the driver JVM has not
            # started yet at builder time
            "spark.driver.extraJavaOptions",
            f"-Djava.io.tmpdir={fast_tmp}",
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
