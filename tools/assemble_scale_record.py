"""Assemble BENCH_sf1.json from the two bench_scale outputs.

Usage: python tools/assemble_scale_record.py /tmp/scale_sf0.1.json \
    /tmp/scale_sf1.0.json > BENCH_sf1.json

Emits, per query: min/median at both scale points, the wall-clock ratio
(sf1.0 is 10x the rows of sf0.1), the count-wrapped final-plan signatures
at both points, and whether the signature changed (the AQE plan-flip
check VERDICT r08 #1 asked for). Result-row counts ride along because
several dedup-family queries have output cardinality that scales
super-linearly BY FIXTURE CONSTRUCTION (the 30-word vocabulary does not
grow with the corpus, so candidate-pair density rises with n) — the fair
throughput figure for those is time per output row, also emitted.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    with open(sys.argv[1]) as fh:
        lo = json.load(fh)
    with open(sys.argv[2]) as fh:
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
    json.dump(out, sys.stdout, indent=1)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main()
