"""Custom PySpark worker daemon that pre-imports the heavy Python stack.

Python workers are forked from the daemon process, so any module imported
HERE is inherited by every worker copy-on-write — the fork itself stays
O(ms). Without this, each fresh worker pays the numpy + pandas + pyarrow
import chain (~2.5 CPU-s) at first use; when a stage needs more workers
than the warm pool holds (chained ArrowEvalPython operators need two
workers per task), dozens of workers fork simultaneously under a fully
loaded CPU and the import storm turns a 500-row UDF stage into tens of
seconds of "time to initialize Python workers" (observed: 2,000+ summed
seconds across one 58-query benchmark run, the single largest cost in the
run). Preloading moves that cost to one daemon startup.

Enabled via ``spark.python.daemon.module=binwatch_spark.worker_daemon``
(set in session.get_spark; a public Spark conf, honored on any cluster
whose executor image ships this package). Every import is individually
best-effort so a slim executor image degrades to lazy imports instead of
failing worker startup.
"""

from __future__ import annotations

import importlib

for _mod in (
    "numpy",
    "pandas",
    "pyarrow",
    # pyarrow.pandas_compat is the lazily-imported half of the Arrow
    # serializer path; pulling it in here keeps first-batch latency flat.
    "pyarrow.pandas_compat",
    # The engine's own kernel module (MinHash/SimHash constants and
    # permutation matrices): importable only when the repo is on the
    # worker PYTHONPATH, which get_spark arranges for local mode.
    "binwatch_spark.functions.texthash",
):
    try:
        importlib.import_module(_mod)
    except Exception:  # noqa: BLE001 — slim image: workers import lazily
        pass

import sys  # noqa: E402
import zipimport  # noqa: E402

# pyspark's worker calls importlib.invalidate_caches() once PER TASK
# (worker_util.setup_spark_files), and zipimporter.invalidate_caches()
# re-reads the whole zip central directory each time. The Spark
# distribution zips on the worker path (pyspark.zip, py4j-*.zip) are
# immutable for the life of the application, so those re-reads are pure
# per-task overhead (sampled as the largest ACTIVE cost of an identity
# Arrow UDF stage: ~40% of worker CPU). Files added mid-run via
# sc.addPyFile are unaffected: a new path entry gets a fresh zipimporter
# that reads its directory on construction; invalidation only matters for
# a zip that is REWRITTEN in place mid-job, which Spark's file-distribution
# contract does not allow.
zipimport.zipimporter.invalidate_caches = lambda self: None  # type: ignore[method-assign]

import gc  # noqa: E402

# Freeze the pre-imported object graph into CPython's permanent generation:
# pyspark's reused-worker loop runs a FULL gc.collect() after every task
# (pyspark/daemon.py), which walks every tracked object — ~17 ms per task
# with the numpy/pandas/pyarrow stack loaded, paid by every worker after
# every task of every ArrowEvalPython stage. Frozen objects are exempt from
# collection (they are module-level and immortal anyway), so the per-task
# collection only walks objects created since the fork. Freezing before the
# fork also stops the collector from touching the shared pages' refcounts,
# keeping them copy-on-write — the same reason the imports are here.
gc.freeze()

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
