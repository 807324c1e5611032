"""SparkSession factory tuned for this engine.

Local-mode defaults follow the sandbox (local[N], single JVM); on a real
cluster the same builder settings apply — AQE on, Arrow on, UTC, shuffle
partitions sized to cores (overridden by AQE coalescing at runtime).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ensure_worker_pythonpath() -> None:
    """Make `langid_py_spark` importable in executor Python workers.

    Local mode: workers are spawned by the JVM and inherit the driver's
    env, NOT driver-side sys.path mutations — so export PYTHONPATH before
    the JVM starts. Cluster mode: ship the package with
    ``spark-submit --py-files langid_py_spark.zip`` instead (the model
    .npz artifacts ride along inside the package dir).
    """
    pp = os.environ.get("PYTHONPATH", "")
    if _REPO_ROOT not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _REPO_ROOT + (os.pathsep + pp if pp else "")
        )
    # one BLAS/OMP thread per Python UDF worker: with N workers per host,
    # per-worker thread pools oversubscribe N*threads and thrash; the
    # parallelism belongs to Spark, not BLAS
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")


def _default_local_dir() -> str | None:
    """Directory for Spark's shuffle/spill files (spark.local.dir).

    Spark defaults to /tmp, which on this VM is the slow rootfs disk —
    a measured anti-scaling trap (CLAUDE.md; guide §2.1: local disk
    bandwidth can be the tighter shuffle limit). Back-to-back sf1 A/B
    (r07): corpus_pipeline 16.0 -> 14.8 s, substring_dup_spans 4.2 ->
    3.5 s with shuffle files on the 126 GB tmpfs. Precedence:

    * SPARK_GRAFT_LOCAL_DIR env — the production knob: point it at the
      fast local-disk array (tmpfs is only right when RAM dwarfs the
      shuffle volume, which holds in this sandbox but NOT on a 100 TB
      cluster, where spills must land on real disks);
    * /dev/shm when present/writable (this sandbox's fast path);
    * None — keep Spark's default.
    Spark cleans its local dir on shutdown; a killed JVM can leave
    files behind, which on tmpfs means RAM until deleted — the
    standing trade of RAM-disk shuffle dirs.
    """
    env = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if env:
        return env
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        return "/dev/shm/spark-graft-local"
    return None


def get_spark(
    cores: int | None = None,
    app_name: str = "langid_py_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    _ensure_worker_pythonpath()
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bigger Arrow batches amortize UDF dispatch; scorer is matmul-bound
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    local_dir = _default_local_dir()
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
