"""S3 — per-table schema discovery and positional row binding.

The reference probes each watched table with ``SELECT * FROM db.tbl LIMIT 0``
at startup and keeps ``map["db.tbl"] -> []columnName`` (utils.go:101-129);
binlog row events carry POSITIONAL values, and this map is what turns them
into named rows. The Spark twin:

- ``discover_table_columns``: the same LIMIT-0 probe through the Spark JDBC
  source (``spark.read.format("jdbc")`` with a zero-row pushdown query —
  only the ResultSet metadata crosses the wire, exactly like the
  reference's ``rows.Columns()``). Needs a MySQL JDBC driver on the Spark
  classpath; the probe is injectable so the binding logic is testable
  without a live server.
- ``bind_positional_rows``: turns the envelope's positional row maps
  (keys "0".."n-1", the shape a raw binlog RowsEvent produces) into
  column-named maps using the discovered column lists — pure column
  expressions (transform + map_from_arrays under a per-table CASE), no
  Python in the plan, valid for batch and streaming DataFrames alike.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from binwatch_spark.config import SourceConfig


def jdbc_url(src: SourceConfig) -> str:
    """JDBC URL for the watched server (no database path — the probe
    queries fully qualified ``db.tbl`` names, utils.go:102 parity)."""
    return f"jdbc:mysql://{src.host}:{src.port}/"


def _jdbc_probe(spark: SparkSession, src: SourceConfig, db: str, table: str):
    """Default prober: LIMIT-0 pushdown query; returns the table schema."""
    return (
        spark.read.format("jdbc")
        .option("url", jdbc_url(src))
        .option("query", f"SELECT * FROM `{db}`.`{table}` WHERE 1=0")
        .option("user", src.user)
        .option("password", src.password)
        .load()
        .schema
    )


def discover_table_columns(
    spark: SparkSession,
    src: SourceConfig,
    probe: Callable | None = None,
) -> dict[str, list[str]]:
    """``GetTableColumns`` parity (utils.go:101-129): probe every table in
    the allowlist and return ``{"db.tbl": [col, ...]}`` in server column
    order. ``probe(spark, src, db, table) -> StructType`` is injectable for
    tests and non-MySQL sources."""
    probe = probe or _jdbc_probe
    out: dict[str, list[str]] = {}
    for db, tables in src.db_tables.items():
        for table in tables:
            schema = probe(spark, src, db, table)
            out[f"{db}.{table}"] = [f.name for f in schema.fields]
    return out


def _named_row(row: Column, cols: list[str]) -> Column:
    """Positional map {"0": v0, ...} → named map {col0: v0, ...}."""
    return F.map_from_arrays(
        F.array(*[F.lit(c) for c in cols]),
        F.array(*[F.try_element_at(row, F.lit(str(i))) for i in range(len(cols))]),
    )


def arity_gate(
    df: DataFrame,
    columns_by_table: dict[str, list[str]],
    observation=None,
    metric_name: str = "arity_gate",
    drop_unknown: bool = False,
) -> DataFrame:
    """Arity contract (blreaderwork.go:255-273 parity): an event containing
    ANY row whose value count disagrees with the discovered column count is
    DROPPED WHOLE — the reference logs the mismatch and ``continue``s past
    the event; it never pads short rows with NULLs or truncates long ones,
    because a corrupt or schema-drifted upstream (e.g. an ALTER TABLE after
    the startup probe) must surface as a counted skip, not as
    plausible-looking NULLs downstream. Works on positional AND named row
    maps — only the map cardinality is checked, which is exactly the
    reference's ``len(colNames) != len(re.Rows[ri])``.

    Dropped events are counted through an observed metric (columns
    ``arity_mismatch_events`` / ``events_seen``) riding the same plan — no
    second evaluation. Pass a ``pyspark.sql.Observation`` to read it after
    a batch action, or None for streaming, where it surfaces per-batch in
    ``StreamingQueryProgress.observedMetrics`` under ``metric_name``
    (ProgressListener accumulates the ``positional_binder`` metric —
    the pipeline path's name — and deliberately ignores other streams'
    metrics so concurrent pipelines don't cross-count).

    ``drop_unknown=False`` (default): tables absent from the map pass
    through unchecked — right when the gate runs on an already-named
    stream whose allowlist is wider than the probed map.
    ``drop_unknown=True`` (the positional-binder path): events for tables
    absent from the map are DROPPED and counted (``unknown_table_events``)
    — the reference's handler skips any table it has no column map for
    (blreaderwork.go:248-250, ``colNames == nil → continue``), and a
    positional row that never gets named is useless downstream anyway.
    An EMPTY map under drop_unknown=True therefore drops (and counts)
    every event — the all-tables-unknown limit of the same rule, not a
    pass-through; only the no-drop mode short-circuits."""
    if not columns_by_table and not drop_unknown:
        return df

    def mismatch(n: int):
        return lambda r: F.size(r) != F.lit(n)

    bad: Column | None = None
    known: Column = F.lit(False)
    for key, cols in columns_by_table.items():
        db, table = key.split(".", 1)
        has_bad = F.exists(F.col("rows"), mismatch(len(cols)))
        cond = (F.col("database") == db) & (F.col("table") == table)
        bad = (
            F.when(cond, has_bad) if bad is None else bad.when(cond, has_bad)
        )
        known = known | cond
    flagged = df.withColumn(
        "_arity_mismatch",
        F.coalesce(bad, F.lit(False)) if bad is not None else F.lit(False),
    ).withColumn(
        "_unknown_table", ~known if drop_unknown else F.lit(False)
    )
    metrics = (
        F.sum(F.col("_arity_mismatch").cast("long")).alias(
            "arity_mismatch_events"
        ),
        F.sum(F.col("_unknown_table").cast("long")).alias(
            "unknown_table_events"
        ),
        F.count(F.lit(1)).alias("events_seen"),
    )
    flagged = (
        flagged.observe(observation, *metrics)
        if observation is not None
        else flagged.observe(metric_name, *metrics)
    )
    return flagged.filter(
        ~F.col("_arity_mismatch") & ~F.col("_unknown_table")
    ).drop("_arity_mismatch", "_unknown_table")


def bind_positional_rows(
    df: DataFrame,
    columns_by_table: dict[str, list[str]],
    observation=None,
) -> DataFrame:
    """P1 binding over the discovered schemas: rewrite ``rows`` so each
    positional map gains its column names, per (database, table). Tables
    ABSENT from the map are dropped and counted (``unknown_table_events``)
    — a positional row with no discovered schema can never be named, and
    the reference skips exactly these events (blreaderwork.go:248-250);
    named streams that need a pass-through gate call arity_gate directly
    with its default ``drop_unknown=False``.

    Events failing the ``arity_gate`` check are dropped and counted BEFORE
    binding (metric name ``positional_binder``) — see arity_gate for the
    reference-parity contract. An empty discovered map (allowlist matched
    no tables / probe failed soft) drops and counts EVERY event rather
    than letting raw positional maps flow downstream unnamed."""
    df = arity_gate(
        df,
        columns_by_table,
        observation,
        metric_name="positional_binder",
        drop_unknown=True,
    )

    def binder(cols: list[str]):
        # single-arg lambda on purpose: F.transform passes (element, index)
        # to two-arg callables, which would clobber a default argument
        return lambda r: _named_row(r, cols)

    expr: Column | None = None
    for key, cols in columns_by_table.items():
        db, table = key.split(".", 1)
        bound = F.transform(F.col("rows"), binder(cols))
        cond = (F.col("database") == db) & (F.col("table") == table)
        expr = F.when(cond, bound) if expr is None else expr.when(cond, bound)
    if expr is None:  # empty map: the gate above already dropped everything
        return df
    return df.withColumn("rows", expr.otherwise(F.col("rows")))
