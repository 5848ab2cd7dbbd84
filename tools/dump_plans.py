"""Dump .explain('formatted') for the given queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/dump_plans.py --tag r13 --suffix before q119_png_decode ...
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from binwatch_spark.plans import all_queries  # noqa: E402
    from binwatch_spark.session import get_spark  # noqa: E402

    spark = get_spark("binwatch-dump-plans")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(outdir, exist_ok=True)
    qs = all_queries()
    for qname in args.queries:
        df = qs[qname](spark, args.sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{qname}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
