"""Assemble a scale-decade record (BENCH_sf1.json / BENCH_sf1_heaps.json)
from two bench_scale outputs.

Usage: python tools/assemble_scale_record.py /tmp/scale_sf0.1.json \
    /tmp/scale_sf1.0.json [--prod lo_prod.json hi_prod.json] > BENCH_sf1.json

Emits, per query: min/median at both scale points, the wall-clock ratio
(the hi point is 10x the rows of the lo point), the EXECUTED final-adaptive
plan signatures at both points (bench_scale r11: collect() on the
count-wrapped DataFrame's own QueryExecution — ADVICE r10 fixed the
first()/limit(1) capture that printed never-executed plans), and whether
the signature changed (the AQE plan-flip check VERDICT r08 #1 asked for).
Result-row counts ride along because on the DRIVER-MATCHED fixture several
dedup-family queries have output cardinality that scales super-linearly BY
FIXTURE CONSTRUCTION (fixed 30-word vocabulary / loose-threshold pairs on
noise embeddings) — time per output row is emitted for those; the
Heaps-vocabulary record (gen_scale_fixture --vocab heaps) and the
--prod section (bench_semdedup_prod on planted fixtures) exist so the
text and semantic families also carry ratios that stand WITHOUT that
normalization (VERDICT r10 #2/#3).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    args = list(sys.argv[1:])
    prod = None
    if "--prod" in args:
        k = args.index("--prod")
        with open(args[k + 1]) as fh:
            prod_lo = json.load(fh)
        with open(args[k + 2]) as fh:
            prod_hi = json.load(fh)
        prod = {"lo": prod_lo, "hi": prod_hi}
        del args[k : k + 3]
    with open(args[0]) as fh:
        lo = json.load(fh)
    with open(args[1]) as fh:
        hi = json.load(fh)
    out = {
        "metric": "scale_decade_wall_sec",
        "lo_sf_dir": lo["sf_dir"],
        "hi_sf_dir": hi["sf_dir"],
        "runs_per_query": lo["runs_per_query"],
        "queries": {},
    }
    for q, a in lo["queries"].items():
        b = hi["queries"].get(q)
        if not b:
            continue
        ratio = round(b["min"] / max(a["min"], 1e-9), 2)
        rows_ratio = round(
            b["result_rows"] / max(a["result_rows"], 1), 2
        )
        per_row = (
            round(
                (b["min"] / max(b["result_rows"], 1))
                / max(a["min"] / max(a["result_rows"], 1), 1e-12),
                2,
            )
            if a["result_rows"] and b["result_rows"]
            else None
        )
        out["queries"][q] = {
            "lo_min_s": a["min"],
            "hi_min_s": b["min"],
            "lo_median_s": a["median"],
            "hi_median_s": b["median"],
            "time_ratio": ratio,
            "lo_rows": a["result_rows"],
            "hi_rows": b["result_rows"],
            "rows_ratio": rows_ratio,
            "time_per_row_ratio": per_row,
            "lo_plan": a["plan_signature"],
            "hi_plan": b["plan_signature"],
            "plan_flip": a["plan_signature"] != b["plan_signature"],
            "final_plan_captured": bool(
                a.get("final_plan") and b.get("final_plan")
            ),
        }
    if prod:
        sec = {"target_occupancy": prod["lo"].get("target_occupancy")}
        for cfg_lo in prod["lo"]["configs"]:
            name = cfg_lo["name"]
            cfg_hi = next(
                c for c in prod["hi"]["configs"] if c["name"] == name
            )
            sec[name] = {
                "lo": cfg_lo,
                "hi": cfg_hi,
                "time_ratio": round(
                    cfg_hi["wall_s_min"] / max(cfg_lo["wall_s_min"], 1e-9), 2
                ),
                "truth_ratio": round(
                    cfg_hi["truth_pairs"] / max(cfg_lo["truth_pairs"], 1), 2
                ),
            }
        out["semdedup_production"] = sec
    json.dump(out, sys.stdout, indent=1)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main()
