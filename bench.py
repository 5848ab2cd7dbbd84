"""Benchmark runner: executes every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a noop-format write so the full plan executes
distributed (no driver collect bottleneck in the measurement).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from binwatch_spark.plans import all_queries  # noqa: E402
from binwatch_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("binwatch-spark-bench")

    # Warm up the JVM/codegen and the file-system cache once so the first
    # timed query doesn't absorb session startup (~4 s otherwise).
    from binwatch_spark.tables import TABLE_NAMES, load

    for name in TABLE_NAMES:
        load(spark, sf_dir, name).write.format("noop").mode("overwrite").save()

    # Also spawn the Python UDF workers once (numpy/pandas import + Arrow
    # handshake, ~2 s) so it isn't attributed to the first UDF query.
    from pyspark.sql import functions as F  # noqa: PLC0415

    _warm = F.pandas_udf(lambda x: x, "long")
    spark.range(1000, numPartitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
        _warm(F.col("id"))
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name, fn in all_queries().items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
        # Isolate queries from each other: some operators persist()
        # intermediates (LSH signature/candidate tables) that are only
        # meaningful within their own query; dropping them between
        # measurements keeps executor memory flat across the run.
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 4)
    # The driver records the tail of stdout and parses the last JSON line;
    # with ~70 queries a pretty-printed line overflows the tail window and
    # truncates at the FRONT (BENCH_r02 arrived with parsed=null). Keep the
    # line as short as possible (compact separators, 2-decimal per-query
    # times) and ALSO write the full-precision result to BENCH_local.json so
    # the artifact survives any capture truncation.
    result = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": sf,
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"),
        "w",
    ) as fh:
        json.dump({**result, "queries": timings}, fh, indent=1)
        fh.write("\n")
    print(json.dumps(result, separators=(",", ":")))


if __name__ == "__main__":
    main()
