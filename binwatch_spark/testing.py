"""Local mirror of the driver's oracle harness.

Runs a registered query on Spark and its oracle SQL on DuckDB over the same
parquet tables and compares: row count, sorted column names, and the exact
multiset of values (floats compared by full-precision repr — the driver
hash-matches values, so approximate equality is NOT good enough here).
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from binwatch_spark.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if pd.isna(v) if not isinstance(v, (list, tuple, dict)) else False:
        return "<null>"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    return f"{type(v).__name__}:{v}"


def _canon_frame(df: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(row[c]) for c in cols)
        for _, row in df[cols].iterrows()
    ]
    return cols, sorted(rows)


def compare(
    spark: SparkSession, sf_dir: str, name: str, fn, oracle: str
) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    spark_pd = fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        duck_pd = con.execute(oracle).fetchdf()
    finally:
        con.close()

    problems: list[str] = []
    s_cols, s_rows = _canon_frame(spark_pd)
    d_cols, d_rows = _canon_frame(duck_pd)
    if s_cols != d_cols:
        problems.append(f"{name}: columns differ spark={s_cols} duck={d_cols}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(
            f"{name}: row count differs spark={len(s_rows)} duck={len(d_rows)}"
        )
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        if a != b:
            problems.append(f"{name}: first row mismatch at sorted idx {i}: spark={a} duck={b}")
            break
    return problems
