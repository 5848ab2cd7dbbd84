"""Scale-decade benchmark: time a query subset at one sf and capture the
FINAL adaptive physical plan of each query at that sf.

Usage:
    python tools/bench_scale.py --sf-dir /root/testdata/sf0.1 \
        --out /tmp/scale_sf0.1.json q23_minhash_lsh_dedup ...

Exists for VERDICT r08 #1: the 100 TB posture rested on sf0.1 plans alone;
this produces the measured evidence that the heavy families scale a full
decade (sf0.1 -> sf1.0, tools/gen_scale_fixture.py) without an unexpected
AQE plan flip. Run once per sf dir in a FRESH process so both scale points
get the identical warmup protocol (table scan + UDF-worker spawn) and
neither inherits the other's JIT state; combine the two outputs into
BENCH_sf1.json.

Plan capture detail: `.write(noop)` wraps the DataFrame in a NEW
QueryExecution, so the DataFrame's own AdaptiveSparkPlan would stay
isFinalPlan=false — and so does `.first()`, which wraps in limit(1)
(ADVICE r10: 12/18 committed plans were pre-AQE because of exactly this).
The plan run therefore wraps the query in ONE count aggregate and executes
that DataFrame's OWN QueryExecution via `.collect()` (returns a single
count row — bounded driver memory at any sf), then reads
`explain('formatted')` from the SAME DataFrame, which after execution
prints the final adaptive plan with AQE's actual join-strategy decisions.
The count wrapper adds one SinglePartition exchange + HashAggregate on top
of the query body — identical at both scale points, so it cancels in the
sf-to-sf signature diff. The signature extracted is the multiset of
physical join/exchange/scan-bucket operators — the things AQE can flip.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binwatch_spark.plans import all_queries  # noqa: E402
from binwatch_spark.session import get_spark  # noqa: E402

# formatted-mode node headers look like "(12) Exchange" with the
# partitioning spelled on a following "Arguments:" line, so node kinds are
# counted from the header lines and bucket pruning from the scan details
SIGNATURE_OPS = re.compile(
    r"\(\d+\) ("
    r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin"
    r"|CartesianProduct|Exchange|AQEShuffleRead"
    r")\b"
)
BUCKETS = re.compile(r"SelectedBucketsCount: (\d+ out of \d+)")


def plan_signature(plan: str) -> dict[str, int | list[str]]:
    sig: dict[str, int] = {}
    for m in SIGNATURE_OPS.finditer(plan):
        sig[m.group(1)] = sig.get(m.group(1), 0) + 1
    out: dict[str, int | list[str]] = dict(sorted(sig.items()))
    buckets = BUCKETS.findall(plan)
    if buckets:
        out["SelectedBucketsCount"] = buckets
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--plans-out", default=None,
                    help="also dump the full formatted plans here")
    args = ap.parse_args()

    spark = get_spark("binwatch-spark-bench-scale")
    from pyspark.sql import functions as F

    from binwatch_spark.tables import TABLE_NAMES, load

    for name in TABLE_NAMES:
        load(spark, args.sf_dir, name).write.format("noop").mode("overwrite").save()
    _warm = F.pandas_udf(lambda x: x, "long")
    spark.range(
        1000, numPartitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ).select(_warm(F.col("id"))).write.format("noop").mode("overwrite").save()

    registry = all_queries()
    out: dict[str, dict] = {}
    plans_full: dict[str, str] = {}
    for qname in args.queries:
        fn = registry[qname]
        try:
            _bench_one(spark, fn, qname, args, out, plans_full)
        except Exception as exc:  # noqa: BLE001 — record and continue
            out[qname] = {"error": f"{type(exc).__name__}: {exc}"[:500]}
            print(f"{qname}: ERROR {exc}", file=sys.stderr)
    payload = {
        "sf_dir": args.sf_dir,
        "runs_per_query": args.n,
        "queries": out,
    }
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)
    if args.plans_out:
        with open(args.plans_out, "w") as fh:
            json.dump(plans_full, fh, indent=1)
    print(json.dumps({q: v.get("min", v.get("error")) for q, v in out.items()}))


def _bench_one(spark, fn, qname, args, out, plans_full) -> None:
    from pyspark.sql import functions as F

    def steal_ticks() -> int:
        # /proc/stat field 8 (steal): a hypervisor burst inflates wall with
        # no in-VM evidence — recorded per run so a polluted scale point
        # self-labels (the r11 bench.py lesson, docs/BENCH_NOTES.md).
        return int(open("/proc/stat").readline().split()[8])

    clk = os.sysconf("SC_CLK_TCK")
    runs = []
    steals = []
    for _ in range(args.n):
        s0 = steal_ticks()
        t0 = time.perf_counter()
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 4))
        steals.append(round((steal_ticks() - s0) / clk, 1))
        spark.catalog.clearCache()
    # plan run: execute a count-wrapped DataFrame so AQE finalizes
    # with bounded driver memory at ANY sf (collect would pull q23's
    # ~3M/sf0.1 pair rows — ~30M at sf1.0), then read the final plan.
    # The count agg adds one SinglePartition exchange + HashAggregate
    # on top of the query body; identical at both scale points, so it
    # cancels in the sf-to-sf signature diff.
    df = fn(spark, args.sf_dir)
    cdf = df.select(F.count(F.lit(1)).alias("n"))
    # collect(), NOT first(): first() wraps the plan in limit(1), which
    # builds a NEW QueryExecution — explain() on cdf would then print a
    # plan that never executed (isFinalPlan=false, pre-AQE), defeating the
    # tool's whole purpose (ADVICE r10). collect() executes cdf's OWN
    # QueryExecution and returns exactly one row (the count), so driver
    # memory stays bounded at any sf and the subsequent explain prints the
    # finalized adaptive plan with AQE's actual join-strategy decisions.
    nrows = cdf.collect()[0]["n"]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cdf.explain("formatted")
    plan = buf.getvalue()
    spark.catalog.clearCache()
    out[qname] = {
        "min": min(runs),
        "median": round(statistics.median(runs), 4),
        "max": max(runs),
        "runs": runs,
        "steal_s": steals,
        "result_rows": nrows,
        "final_plan": "isFinalPlan=true" in plan,
        "plan_signature": plan_signature(plan),
    }
    plans_full[qname] = plan
    print(
        f"{qname}: min={out[qname]['min']} rows={nrows} "
        f"sig={out[qname]['plan_signature']}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
