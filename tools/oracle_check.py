"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on a PLAIN SparkSession (no
binwatch_spark.session configs — the driver builds its own session, so this
catches any hidden dependency on our session defaults) and compares against
``oracle_sql()`` executed by DuckDB over the same parquet files.

Compare semantics mirror the driver: row count, column-name set, and a
value comparison over rows sorted by all columns with column order
normalized by name.  Floats compare with a small relative tolerance (the
driver hashes exact values; a tolerance failure here means "risk", an exact
failure means "broken").

Usage:  python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, "/root/repo")


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(
        out,
        key=lambda t: tuple(
            (v is None, str(type(v)), str(v)) for v in t
        ),
    )


def values_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-12)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    return a == b


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    # Plain session, like the driver's: only master + shuffle partitions.
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("oracle-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    results = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        rec = {"rows_match": None, "schema_match": None, "values_match": None}
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            rec["spark_rows"] = len(rows)
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"SPARK: {type(e).__name__}: {e}"
            results[name] = rec
            print(f"{name}: SPARK ERR {e}", flush=True)
            continue
        sql = oracles.get(name)
        if sql is None:
            rec["oracle"] = "none (rows-only)"
            rec["rows_match"] = rec["spark_rows"] >= 0
            results[name] = rec
            print(f"{name}: rows-only ({rec['spark_rows']} rows)", flush=True)
            continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = [tuple(r) for r in cur.fetchall()]
            rec["oracle_rows"] = len(orows)
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"ORACLE: {type(e).__name__}: {e}"
            results[name] = rec
            print(f"{name}: ORACLE ERR {e}", flush=True)
            continue
        rec["rows_match"] = len(rows) == len(orows)
        rec["schema_match"] = sorted(cols) == sorted(ocols)
        if rec["rows_match"] and rec["schema_match"]:
            sn, on_ = norm(rows, cols), norm(orows, ocols)
            bad = None
            for i, (sr, orow) in enumerate(zip(sn, on_)):
                if not all(values_equal(x, y) for x, y in zip(sr, orow)):
                    bad = (i, sr, orow)
                    break
            rec["values_match"] = bad is None
            if bad is not None:
                rec["first_diff"] = repr(bad)[:400]
        ok = rec["rows_match"] and rec["schema_match"] and rec["values_match"]
        tag = "OK" if ok else f"FAIL {json.dumps({k: v for k, v in rec.items() if k != 'first_diff'})}"
        print(f"{name}: {tag}", flush=True)
        if not ok and "first_diff" in rec:
            print(f"   diff: {rec['first_diff']}", flush=True)
        results[name] = rec

    n_ok = sum(
        1
        for r in results.values()
        if r.get("err") is None
        and r.get("rows_match")
        and r.get("schema_match") is not False
        and r.get("values_match") is not False
    )
    print(f"\n{n_ok}/{len(results)} green")
    # ORACLE_CHECK_OUT lets a round commit the artifact in-repo
    # (VERDICT r03 #1: durable local-oracle evidence each round).
    out = os.environ.get("ORACLE_CHECK_OUT", "/tmp/oracle_check.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=str)


if __name__ == "__main__":
    main()
