"""Generate docs/PLANS_r{N}.md — `df.explain('simple')` for the top-K most
expensive queries in BENCH_local.json — the human-readable plan snapshot the
per-round verdicts audit (plan REGRESSIONS are enforced by
tests/test_plans.py; this file is for reading).

Usage: python tools/gen_plan_audit.py --round 7 [--top 10]

Streaming-harness queries execute their bounded stream run and expose the
BATCH plan of the sink read-back (the micro-batch plans are pinned by the
harness tests) — noted in the header, as in prior rounds.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    with open(os.path.join(REPO, "BENCH_local.json")) as fh:
        bench = json.load(fh)
    top = sorted(
        bench["queries"].items(), key=lambda kv: -kv[1]
    )[: args.top]

    from binwatch_spark.plans import all_queries
    from binwatch_spark.session import get_spark

    spark = get_spark("plan-audit")
    qs = all_queries()
    lines = [
        f"# Physical-plan audit — round {args.round}",
        "",
        f"`df.explain('simple')` for the {args.top} most expensive queries in",
        "`BENCH_local.json` (sf0.1, local[32], min-of-3). Regenerate with",
        "`python tools/gen_plan_audit.py`; plan regressions are enforced by",
        "`tests/test_plans.py`, this file is the human-readable snapshot.",
        "Streaming queries expose their BATCH result plan here; the",
        "streaming micro-batch plans are pinned by harness tests.",
        "",
    ]
    from binwatch_spark import plancap

    for name, sec in top:
        # capture inner-round kernels (VERDICT r12 #3): iterative queries
        # otherwise show only the driver-assembled ExistingRDD result
        with plancap.capturing() as inner:
            df = qs[name](spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("simple")
        lines += [f"## {name} — {sec} s", "", "```", buf.getvalue().rstrip(), "```", ""]
        for tag in sorted(inner):
            lines += [
                f"### {name} inner kernel: `{tag}` (round-1 representative)",
                "",
                "```",
                inner[tag],
                "```",
                "",
            ]
    out = os.path.join(REPO, "docs", f"PLANS_r{args.round:02d}.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
