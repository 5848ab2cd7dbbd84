"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads), but
every knob here is chosen for cluster scale:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting, and
  dynamic join-strategy switches survive a 100× scale-up without retuning.
- ``spark.sql.shuffle.partitions`` defaults to a small local value; at cluster
  scale AQE's ``advisoryPartitionSizeInBytes`` governs real partition sizing,
  so the static number only caps local parallelism.
- Arrow execution for any Pandas-UDF path (the slow path we keep narrow).
- UTC session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def cpu_count() -> str:
    return os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "binwatch-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) the tuned SparkSession. ``master`` overrides the
    default local[$SPARK_GRAFT_CPUS] (the CLI's --master flag)."""
    # Make the repo importable by the python-worker daemon: the JVM launches
    # `python -m binwatch_spark.worker_daemon` with the PYTHONPATH it
    # inherited from this process, which doesn't include a sys.path-injected
    # repo root. Prepend it BEFORE the JVM starts (no-op when installed).
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + existing if existing else "")
        )
    builder = (
        SparkSession.builder.master(master or f"local[{cpu_count()}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # Split small file scans to at least the core count so per-row
        # kernels (Arrow UDF stages) parallelize even on MB-sized inputs —
        # a 1.5 MB parquet otherwise scans as ONE partition and serializes
        # every downstream map stage on one core. Advisory only: inputs
        # bigger than cores × maxPartitionBytes are unaffected, so this is
        # a no-op at cluster scale.
        .config("spark.sql.files.minPartitionNum", cpu_count())
        # The events fixture stores ts as parquet TIMESTAMP(NANOS) which the
        # Spark reader rejects; read as raw nanos and convert in tables.load.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Fork python workers from a daemon that has numpy/pandas/pyarrow
        # pre-imported (see worker_daemon docstring): a fresh worker then
        # inherits the heavy modules copy-on-write instead of importing them
        # under full CPU load — the dominant cost of every UDF stage whose
        # worker demand exceeds the warm pool.
        .config("spark.python.daemon.module", "binwatch_spark.worker_daemon")
    )
    # Opt-in event logging for tools/profile_query.py (guide §1/§7: the UI
    # is disabled here, so the event log is the per-stage measurement
    # surface). Off unless the env var names a directory.
    evdir = os.environ.get("SPARK_GRAFT_EVENTLOG_DIR")
    if evdir:
        builder = (
            builder.config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", f"file://{evdir}")
            .config("spark.eventLog.compress", "false")
            .config("spark.eventLog.rolling.enabled", "false")
        )
    return builder.getOrCreate()
