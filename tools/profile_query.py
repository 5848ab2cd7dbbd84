"""Per-stage profile of one registered query (guide §1/§7: measure first).

Runs the query with the Spark event log enabled (UI is off in this
harness), materializes via the noop sink exactly like bench.py, then
parses the event log into a per-stage table: wall span, summed task time,
task count, shuffle read/write bytes, and the deepest call-site line so a
stage maps back to an operator. One warm run first (codegen + FS cache),
then the profiled run.

Usage: python tools/profile_query.py [-n 1] [--sf-dir DIR] q104_... [q120_...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--warm", type=int, default=1, help="untimed warm runs before the profiled run")
    args = ap.parse_args()

    evdir = "/tmp/spark-events-profile"
    os.makedirs(evdir, exist_ok=True)
    # get_spark reads this and enables the event log before the JVM starts.
    os.environ["SPARK_GRAFT_EVENTLOG_DIR"] = evdir

    from binwatch_spark.plans import all_queries  # noqa: E402
    from binwatch_spark.session import get_spark  # noqa: E402
    from binwatch_spark.tables import TABLE_NAMES, load  # noqa: E402
    from pyspark.sql import functions as F  # noqa: E402

    spark = get_spark("binwatch-profile")
    sc = spark.sparkContext
    for name in TABLE_NAMES:
        load(spark, args.sf_dir, name).write.format("noop").mode("overwrite").save()
    _warm = F.pandas_udf(lambda x: x, "long")
    spark.range(1000, numPartitions=32).select(_warm(F.col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    qs = all_queries()
    windows: dict[str, tuple[float, float]] = {}
    for qname in args.queries:
        fn = qs[qname]
        for _ in range(args.warm):
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        sc.setJobDescription(f"PROFILE:{qname}")
        w0 = time.time() * 1000
        t0 = time.perf_counter()
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        windows[qname] = (w0, time.time() * 1000)
        sc.setJobDescription(None)
        spark.catalog.clearCache()
        print(f"\n=== {qname}: wall {wall:.2f}s ===", flush=True)

    app_id = sc.applicationId
    spark.stop()
    time.sleep(1.0)

    # Parse the event log: map jobs -> description, stages -> job, tasks -> stage.
    paths: list[str] = []
    for f in os.listdir(evdir):
        full = os.path.join(evdir, f)
        if f.startswith(app_id):
            paths.append(full)
        elif app_id in f and os.path.isdir(full):  # eventlog_v2_<appid>/ dir
            paths.extend(
                os.path.join(full, g)
                for g in sorted(os.listdir(full))
                if g.startswith("events_")
            )
    assert paths, f"no event log for {app_id} in {evdir}"
    job_desc: dict[int, str] = {}
    job_span: dict[int, tuple[float, float]] = {}
    stage_job: dict[int, int] = {}
    stage_info: dict[int, dict] = {}
    stage_task_ms: dict[int, float] = {}
    stage_task_n: dict[int, int] = {}
    stage_sr: dict[int, int] = {}
    stage_sw: dict[int, int] = {}
    stage_pyt: dict[int, float] = {}
    def iter_lines():
        for p in paths:
            with open(p) as fh:
                yield from fh

    for line in iter_lines():
        if True:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                job_desc[jid] = ev.get("Properties", {}).get(
                    "spark.job.description", ""
                )
                job_span[jid] = [ev.get("Submission Time", 0), 0]
                for si in ev.get("Stage Infos", []):
                    stage_job[si["Stage ID"]] = jid
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in job_span:
                    job_span[jid][1] = ev.get("Completion Time", 0)
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                stage_info[sid] = {
                    "name": si.get("Stage Name", ""),
                    "n": si.get("Number of Tasks", 0),
                    "sub": si.get("Submission Time", 0),
                    "done": si.get("Completion Time", 0),
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                stage_task_ms[sid] = stage_task_ms.get(sid, 0.0) + tm.get(
                    "Executor Run Time", 0
                )
                stage_task_n[sid] = stage_task_n.get(sid, 0) + 1
                sr = tm.get("Shuffle Read Metrics") or {}
                sw = tm.get("Shuffle Write Metrics") or {}
                stage_sr[sid] = stage_sr.get(sid, 0) + sr.get(
                    "Remote Bytes Read", 0
                ) + sr.get("Local Bytes Read", 0)
                stage_sw[sid] = stage_sw.get(sid, 0) + sw.get(
                    "Shuffle Bytes Written", 0
                )

    # Group by profiled query description.
    for qname in args.queries:
        w0, w1 = windows[qname]
        # jobs whose submission falls in the query's wall window (streaming
        # micro-batch jobs run on other threads and don't inherit the
        # description, so membership is by time, not by tag)
        jids = sorted(
            j
            for j, sp in job_span.items()
            if w0 - 100 <= sp[0] <= w1 + 100
        )
        if not jids:
            print(f"\n### {qname}: no jobs captured")
            continue
        print(f"\n### {qname}: {len(jids)} jobs")
        tmin = min(job_span[j][0] for j in jids)
        tmax = max(job_span[j][1] for j in jids)
        print(f"jobs wall span: {(tmax - tmin) / 1000:.2f}s")
        # gaps between jobs = driver-side time (planning, codegen, collect)
        spans = sorted(job_span[j] for j in jids)
        gap = 0.0
        prev_end = spans[0][0]
        for s, e2 in spans:
            if s > prev_end:
                gap += s - prev_end
            prev_end = max(prev_end, e2)
        print(f"driver gaps between jobs: {gap / 1000:.2f}s")
        rows = []
        for j in jids:
            sids = sorted(s for s, jj in stage_job.items() if jj == j and s in stage_info)
            for sid in sids:
                si = stage_info[sid]
                rows.append(
                    (
                        (si["done"] - si["sub"]) / 1000.0,
                        stage_task_ms.get(sid, 0) / 1000.0,
                        stage_task_n.get(sid, 0),
                        stage_sr.get(sid, 0) // 1024,
                        stage_sw.get(sid, 0) // 1024,
                        j,
                        sid,
                        si["name"].split("\n")[0][:90],
                    )
                )
        rows.sort(reverse=True)
        print(
            f"{'wall_s':>7} {'task_s':>7} {'ntask':>5} {'srKB':>7} {'swKB':>7}"
            f" {'job':>4} {'stage':>5}  name"
        )
        for w, t, n, sr, sw, j, sid, nm in rows[:25]:
            print(f"{w:7.2f} {t:7.2f} {n:5d} {sr:7d} {sw:7d} {j:4d} {sid:5d}  {nm}")


if __name__ == "__main__":
    main()
