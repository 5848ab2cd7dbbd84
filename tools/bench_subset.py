"""Run a subset of registered queries N times each and report min/median/max.

Usage: python tools/bench_subset.py [-n 3] q23_minhash_lsh_dedup q24_...

Exists because bench.py times the full query suite; when tuning one
operator you want min-of-N on just that query so a 0.5 s swing is
attributable to the change and not single-run noise (VERDICT r03).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binwatch_spark.plans import all_queries  # noqa: E402
from binwatch_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("binwatch-spark-bench-subset")
    from binwatch_spark.tables import TABLE_NAMES, load
    from pyspark.sql import functions as F

    for name in TABLE_NAMES:
        load(spark, args.sf_dir, name).write.format("noop").mode("overwrite").save()
    _warm = F.pandas_udf(lambda x: x, "long")
    spark.range(1000, numPartitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
        _warm(F.col("id"))
    ).write.format("noop").mode("overwrite").save()

    registry = all_queries()
    out: dict[str, dict] = {}
    for qname in args.queries:
        fn = registry[qname]
        runs = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 4))
            spark.catalog.clearCache()
        out[qname] = {
            "min": min(runs),
            "median": round(statistics.median(runs), 4),
            "max": max(runs),
            "runs": runs,
        }
        print(f"{qname}: min={out[qname]['min']} runs={runs}", file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
