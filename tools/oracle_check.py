"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on a PLAIN SparkSession (no
binwatch_spark.session configs — the driver builds its own session, so this
catches any hidden dependency on our session defaults) and compares against
``oracle_sql()`` executed by DuckDB over the same parquet files.

Compare semantics mirror the driver: row count, column-name set, and an
ORDER-INSENSITIVE VALUE-HASH over rows sorted by all columns with column
order normalized by name.  The hash is exact (sha256 over a canonical
serialization — floats by IEEE-754 bit pattern, decimals normalized), the
same strength as the driver's hash_match.  A secondary tolerance compare
(rel 1e-9) distinguishes "bit-level float drift" from "wrong values":
``hash_match`` false + ``values_match_tol`` true means last-ulp float
summation-order drift; both false means broken.

Usage:  python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import json
import math
import os
import struct
import sys

sys.path.insert(0, "/root/repo")


def canon(v):
    """Canonical serialization of one value — exact, driver-hash strength.

    Floats serialize by IEEE-754 bit pattern (with -0.0 → 0.0 and all NaNs
    collapsed, matching Spark's own hash semantics for doubles); Decimals
    numerically (1.10 == 1.1); temporal types by ISO string; nested
    arrays/structs recursively.
    """
    if v is None:
        return "\x00"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return "f:" + struct.pack(">d", v).hex()
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, decimal.Decimal):
        if v.is_nan():
            return "f:nan"
        n = v.normalize()
        return f"d:{n:f}"
    if isinstance(v, str):
        return "s:" + v
    if isinstance(v, (bytes, bytearray)):
        return "y:" + bytes(v).hex()
    if isinstance(v, datetime.datetime):
        return "t:" + v.isoformat()
    if isinstance(v, datetime.date):
        return "D:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{"
            + ",".join(
                f"{canon(k)}={canon(v[k])}" for k in sorted(v, key=str)
            )
            + "}"
        )
    return f"o:{type(v).__name__}:{v}"


def value_hash(rows, cols):
    """Driver-style order-insensitive value hash: columns sorted by name,
    rows canonically serialized then sorted, sha256 over the result."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8", "surrogatepass"))
        h.update(b"\x1e")
    return h.hexdigest()


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
    """Tolerant compare (rel 1e-9) — the fallback diagnostic, not the gate."""
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float) or isinstance(
        a, decimal.Decimal
    ) or isinstance(b, decimal.Decimal):
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
        # large-SF sweeps hash FULL result sets; pair-family outputs can
        # exceed the 1g default collect budget long before they exceed RAM
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("ORACLE_CHECK_MAXRESULT", "4g"),
        )
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
        rec = {"rows_match": None, "schema_match": None, "hash_match": None}
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
            rec["hash_match"] = value_hash(rows, cols) == value_hash(
                orows, ocols
            )
            if not rec["hash_match"]:
                # Diagnose: tolerance-level float drift, or truly wrong?
                sn, on_ = norm(rows, cols), norm(orows, ocols)
                bad = None
                for i, (sr, orow) in enumerate(zip(sn, on_)):
                    if not all(
                        values_equal(x, y) for x, y in zip(sr, orow)
                    ):
                        bad = (i, sr, orow)
                        break
                rec["values_match_tol"] = bad is None
                if bad is not None:
                    rec["first_diff"] = repr(bad)[:400]
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        tag = "OK" if ok else (
            "TOL-ONLY (float last-ulp drift)"
            if rec.get("values_match_tol")
            else f"FAIL {json.dumps({k: v for k, v in rec.items() if k != 'first_diff'})}"
        )
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
        and r.get("hash_match") is not False
    )
    print(f"\n{n_ok}/{len(results)} green (hash-exact)")
    # ORACLE_CHECK_OUT lets a round commit the artifact in-repo
    # (VERDICT r03 #1: durable local-oracle evidence each round).
    out = os.environ.get("ORACLE_CHECK_OUT", "/tmp/oracle_check.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=str)


if __name__ == "__main__":
    main()
