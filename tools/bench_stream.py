"""Streaming-throughput record for the CDC parity layer (VERDICT r11 #2).

The reference's actual workload is sustained event relay (binlog →
routes → connector sends, blsenderwork.go:151-219). Every bench entry so
far is a batch query; this tool measures the readStream → route fan-out →
template render → connector send path as SUSTAINED ROWS/SEC over a large
staged replay backlog, drained with availableNow across many micro-batches
(maxFilesPerTrigger bounds each trigger, so the drain is a sequence of
bounded batches — the steady-state shape, not one giant batch).

Variants measured (the trades the reference documents, README.md:38 —
"senderWorkers ... Set it to 1 to preserve event order" — and
README.md:76-85 — single instance because replication loses order):

- topology: SHARED query (one stream, routes evaluated in order inside one
  foreachBatch — the reference's single-relay shape) vs PER-ROUTE
  (run_routes_concurrent: N independent queries, independent checkpoints —
  the decoupled-lifecycle shape; the source is read once PER route).
- senderWorkers: 1 (ordered: sort + coalesce(1) per batch — the
  reference's order-preserving mode) vs N (repartition(N), unordered).
- trigger size: maxFilesPerTrigger (server.pool.size) sweep — batches per
  drain vs per-batch overhead.

Output: one JSON line (and $BENCH_STREAM_OUT, default BENCH_stream.json)
with rows/sec per variant, delivered-count validation, and the /proc/stat
steal/iowait captured around the sweep (host-contention audit, same
discipline as bench.py).

Usage: python tools/bench_stream.py [--files N] [--rows-per-file N]
                                    [--repeats N]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLK = os.sysconf("SC_CLK_TCK")


def machine_counters() -> dict:
    f = open("/proc/stat").readline().split()[1:]
    return {
        "busy_cpu_s": sum(int(v) for i, v in enumerate(f) if i not in (3, 4)) / CLK,
        "iowait_s": int(f[4]) / CLK,
        "steal_s": (int(f[7]) / CLK) if len(f) > 7 else 0.0,
    }


def stage_backlog(path: str, n_files: int, rows_per_file: int) -> dict:
    """Deterministic envelope JSONL backlog: 60% INSERT / 30% UPDATE /
    10% DELETE on testdb.users (both routes match INSERTs, the all-ops
    route matches everything), plus 5% noise on a non-routed table."""
    os.makedirs(path, exist_ok=True)
    etype = {
        "INSERT": "WriteRowsEventV2",
        "UPDATE": "UpdateRowsEventV2",
        "DELETE": "DeleteRowsEventV2",
    }
    counts = {"INSERT": 0, "UPDATE": 0, "DELETE": 0, "noise": 0}
    seq = 0
    for fi in range(n_files):
        with open(os.path.join(path, f"replay-{fi:05d}.jsonl"), "w") as fh:
            for ri in range(rows_per_file):
                seq += 1
                r = (fi * 7919 + ri * 104729) % 100  # deterministic mix
                if r < 5:
                    db, tbl, op = "testdb", "audit_log", "INSERT"
                    counts["noise"] += 1
                else:
                    db, tbl = "testdb", "users"
                    op = (
                        "INSERT" if r < 62 else "UPDATE" if r < 90 else "DELETE"
                    )
                    counts[op] += 1
                fh.write(
                    json.dumps(
                        {
                            "event_type": etype[op],
                            "binlog_file": f"mysql-bin.{1 + fi:06d}",
                            "binlog_position": 4 + ri * 100,
                            "database": db,
                            "table": tbl,
                            "operation": op,
                            "rows": [
                                {
                                    "id": str(seq),
                                    "name": f"user-{seq % 1000}",
                                    "v": str(r),
                                }
                            ],
                        }
                    )
                    + "\n"
                )
    counts["total"] = seq
    return counts


def make_doc(tmp: str, replay: str, workers: int, pool_size: int) -> dict:
    return {
        "server": {
            "id": "stream-bench",
            "host": "0.0.0.0",
            "port": 8080,
            "senderWorkers": workers,
            "pool": {"size": pool_size},
            "checkpointDir": f"{tmp}/checkpoint",
        },
        "source": {"dbTables": {"testdb": ["users"]}, "replayDir": replay},
        "sharding": {},
        "connectors": [
            {
                "name": "sink-insert",
                "type": "file",
                "path": f"{tmp}/out/inserts.jsonl",
            },
            {"name": "sink-all", "type": "file", "path": f"{tmp}/out/all.jsonl"},
        ],
        "routes": [
            {
                "name": "inserts-only",
                "connector": "sink-insert",
                "operations": ["INSERT"],
                "dbTable": "testdb.users",
                "template": (
                    '{"itemID":"{{ .ItemID }}","op":"{{ .Data.Operation }}",'
                    '"rows":{{ .Data.Rows | toJson }}}'
                ),
            },
            {
                "name": "all-ops",
                "connector": "sink-all",
                "operations": ["INSERT", "UPDATE", "DELETE"],
                "dbTable": "testdb.users",
            },
        ],
    }


def count_lines(path: str) -> int:
    if not os.path.exists(path):
        return 0
    with open(path, "rb") as fh:
        return sum(1 for _ in fh)


def run_variant(
    spark, replay: str, expected: dict, topology: str, workers: int,
    pool_size: int,
) -> dict:
    from binwatch_spark.config import parse
    from binwatch_spark.streaming.pipeline import (
        run_pipeline,
        run_routes_concurrent,
    )

    tmp = tempfile.mkdtemp(prefix=f"sb-{topology}-w{workers}-p{pool_size}-")
    try:
        cfg = parse(make_doc(tmp, replay, workers, pool_size))
        os.makedirs(f"{tmp}/out", exist_ok=True)
        t0 = time.monotonic()
        if topology == "shared":
            q = run_pipeline(spark, cfg, available_now=True)
            q.awaitTermination()
            batches = q.lastProgress["batchId"] + 1 if q.lastProgress else 0
        else:
            qs = run_routes_concurrent(spark, cfg, available_now=True)
            for q in qs.values():
                q.awaitTermination()
            batches = sum(
                (q.lastProgress["batchId"] + 1) if q.lastProgress else 0
                for q in qs.values()
            )
        wall = time.monotonic() - t0
        inserts = count_lines(f"{tmp}/out/inserts.jsonl")
        allops = count_lines(f"{tmp}/out/all.jsonl")
        delivered = inserts + allops
        exp_inserts = expected["INSERT"]
        exp_all = expected["INSERT"] + expected["UPDATE"] + expected["DELETE"]
        ok = inserts == exp_inserts and allops == exp_all
        return {
            "wall_sec": round(wall, 2),
            "source_rows_per_sec": round(expected["total"] / wall, 1),
            "delivered_rows_per_sec": round(delivered / wall, 1),
            "delivered": delivered,
            "delivery_correct": ok,
            "micro_batches": batches,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--rows-per-file", type=int, default=4000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from binwatch_spark.session import get_spark

    spark = get_spark("bench-stream", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    stage_root = tempfile.mkdtemp(prefix="sb-replay-")
    try:
        expected = stage_backlog(stage_root, args.files, args.rows_per_file)
        variants = [
            # (topology, senderWorkers, pool_size=maxFilesPerTrigger)
            ("shared", 1, 16),
            ("shared", 8, 16),
            ("shared", 32, 16),
            ("per_route", 1, 16),
            ("per_route", 8, 16),
            # trigger-size sweep at the parallel shared point
            ("shared", 8, 4),
            ("shared", 8, 64),
        ]
        before = machine_counters()
        t_sweep = time.monotonic()
        results = {}
        for topo, w, p in variants:
            key = f"{topo}_w{w}_files{p}"
            runs = [
                run_variant(spark, stage_root, expected, topo, w, p)
                for _ in range(args.repeats)
            ]
            best = max(runs, key=lambda r: r["source_rows_per_sec"])
            best["all_runs_wall_sec"] = [r["wall_sec"] for r in runs]
            best["all_correct"] = all(r["delivery_correct"] for r in runs)
            results[key] = best
            print(f"{key}: {best['source_rows_per_sec']} ev/s "
                  f"({best['wall_sec']}s, batches={best['micro_batches']}, "
                  f"correct={best['all_correct']})", flush=True)
        after = machine_counters()
        record = {
            "metric": "stream_source_rows_per_sec",
            "value": max(r["source_rows_per_sec"] for r in results.values()),
            "unit": "rows/sec",
            "backlog_events": expected["total"],
            "backlog_files": args.files,
            "expected": expected,
            "variants": results,
            "sweep_wall_sec": round(time.monotonic() - t_sweep, 1),
            "host": {
                "steal_cpu_total": round(after["steal_s"] - before["steal_s"], 1),
                "iowait_cpu_total": round(
                    after["iowait_s"] - before["iowait_s"], 1
                ),
                "busy_cpu_total": round(after["busy_cpu_s"] - before["busy_cpu_s"], 1),
                "ncpus": os.cpu_count(),
            },
        }
        out = os.environ.get("BENCH_STREAM_OUT", "BENCH_stream.json")
        with open(out, "w") as f:
            json.dump(record, f, indent=1)
        print(json.dumps({k: v for k, v in record.items() if k != "variants"}))
    finally:
        shutil.rmtree(stage_root, ignore_errors=True)


if __name__ == "__main__":
    main()
