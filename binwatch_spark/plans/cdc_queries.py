"""CDC-operator queries (q01–q11): batch-checkable analogs of the reference's
dataflow stages, exercised on the ``events`` fixture (FIXTURES.md maps the
event columns onto the RowEventItemT envelope, pools.go:17-35).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binwatch_spark.operators import cdc
from binwatch_spark.operators.sharding import make_shard_udf
from binwatch_spark.plans.registry import register
from binwatch_spark.tables import load

# The fixture's event_type values mapped onto DML ops for the decode queries
# (utils.go:74-90 analog on synthetic data): signup≙INSERT, purchase≙UPDATE,
# error≙DELETE, everything else → '' (unknown binlog event).
EVENT_DML_MAP = {"signup": "INSERT", "purchase": "UPDATE", "error": "DELETE"}

_DML_CASE_SQL = (
    "CASE event_type WHEN 'signup' THEN 'INSERT' WHEN 'purchase' THEN 'UPDATE' "
    "WHEN 'error' THEN 'DELETE' ELSE '' END"
)


@register(
    "q01_source_scan",
    oracle="SELECT event_id, event_type, value FROM events WHERE value > 100.0",
)
def q01_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + filter that must reach the parquet scan (PushedFilters /
    ReadSchema) — the batch analog of the source stage S1/S3
    (blreaderwork.go:51-61)."""
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("value") > 100.0)
        .select("event_id", "event_type", "value")
    )


@register(
    "q02_table_filter",
    oracle=(
        "SELECT event_id, event_type, user_id FROM events "
        "WHERE event_type IN ('view', 'click', 'purchase')"
    ),
)
def q02_table_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allowlist filter F1 (blreaderwork.go:247-250): only allowlisted
    db.tables pass; expressed as isin → pushed to the scan."""
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("event_id", "event_type", "user_id")
    )


@register(
    "q03_dml_decode",
    oracle=f"SELECT event_id, event_type, {_DML_CASE_SQL} AS operation FROM events",
)
def q03_dml_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DML decode F2 (utils.go:74-90): CASE-map event type → operation class,
    unknown → ''. Pure when-chain, stays in whole-stage codegen."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        cdc.dml_decode(F.col("event_type"), EVENT_DML_MAP).alias("operation"),
    )


@register(
    "q04_route_predicate",
    oracle=(
        "SELECT event_id, user_id, event_type FROM ("
        f"  SELECT event_id, user_id, event_type, {_DML_CASE_SQL} AS operation,"
        "   'db' || CAST(user_id % 3 AS VARCHAR) || '.' || event_type AS db_table"
        "  FROM events)"
        " WHERE operation IN ('INSERT', 'UPDATE') AND db_table = 'db1.purchase'"
    ),
)
def q04_route_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route predicate R2 (blsenderwork.go:183-184): operation-set membership
    AND composite db.table string equality."""
    ev = load(spark, sf_dir, "events")
    db_table = F.concat(
        F.lit("db"),
        (F.col("user_id") % 3).cast("string"),
        F.lit("."),
        F.col("event_type"),
    )
    op = cdc.dml_decode(F.col("event_type"), EVENT_DML_MAP)
    return ev.filter(
        cdc.route_predicate(op, db_table, ["INSERT", "UPDATE"], "db1.purchase")
    ).select("event_id", "user_id", "event_type")


@register(
    "q05_explode_rows",
    oracle=(
        "SELECT event_id, k, CAST(row_idx AS INTEGER) AS row_idx FROM ("
        "  SELECT event_id, k, unnest(range(1, k % 5 + 2)) AS row_idx FROM ("
        "    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k"
        "    FROM events))"
    ),
)
def q05_explode_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row explode P3 / itemByRow (blreaderwork.go:275-295): a multi-row event
    becomes one item per row. JSON payload → per-row items via explode; Spark
    pipelines explode without a shuffle."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.select("event_id", k.alias("k"))
        .select(
            "event_id",
            "k",
            F.explode(F.sequence(F.lit(1), F.col("k") % 5 + 1)).alias("row_idx"),
        )
    )


@register(
    "q06_before_image_drop",
    oracle=(
        "SELECT event_id, CAST(ord - 1 AS INTEGER) AS pos,"
        "       CAST(val AS INTEGER) AS row_val FROM ("
        "  SELECT event_id, unnest(arr) AS val, generate_subscripts(arr, 1) AS ord"
        "  FROM (SELECT event_id, range(1, k % 6 + 3) AS arr FROM ("
        "    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k"
        "    FROM events)))"
        " WHERE (ord - 1) % 2 = 1"
    ),
)
def q06_before_image_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Before-image drop P2 (blreaderwork.go:261-263): UPDATE rows arrive as
    (before, after) pairs; keep odd positions — the after-images."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    arr = F.sequence(F.lit(1), k % 6 + 2)
    exploded = ev.select(
        "event_id", F.posexplode(arr).alias("pos", "row_val")
    )
    return exploded.filter(F.col("pos") % 2 == 1)


@register(
    "q07_monotonic_ids",
    oracle=(
        "SELECT event_id, CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT)"
        " AS item_id FROM events"
    ),
)
def q07_monotonic_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gapless monotonic sequencing Q1 (pools.go:57-74) in stream order.
    Scale note in cdc.monotonic_item_ids — the streaming source carries the
    offset natively; this is the batch-checkable shape."""
    ev = load(spark, sf_dir, "events").select("event_id", "ts")
    return cdc.monotonic_item_ids(ev, [F.col("ts"), F.col("event_id")]).select(
        "event_id", "item_id"
    )


def _fnv1a64_le8_sql(count: int) -> str:
    """Pure-SQL FNV-1a64 over the 8 LE bytes of ``event_id`` for DuckDB.

    Eight unrolled xor+multiply rounds with 64-bit wraparound done in
    HUGEINT (128-bit) arithmetic — max intermediate is 2^64 · prime ≈ 2^104,
    well inside hugeint range.  xor only ever touches the low byte
    (operand < 256), so ``h ^ b == h - (h % 256) + xor(h % 256, b)`` and
    DuckDB's bigint ``xor`` suffices.  Mirrors _fnv1a64_u64_le8
    (operators/sharding.py:35-47) / Go hash/fnv (blsenderwork.go:142-147).
    """
    two64 = "CAST(18446744073709551616 AS HUGEINT)"
    prime = 1099511628211
    ctes = [
        "u AS (SELECT event_id, CASE WHEN event_id < 0 THEN"
        f" CAST(event_id AS HUGEINT) + {two64} ELSE"
        " CAST(event_id AS HUGEINT) END AS v FROM events)",
        "r0 AS (SELECT v, CAST(14695981039346656037 AS HUGEINT) AS h FROM u)",
    ]
    for i in range(8):
        byte = f"CAST((v // {256 ** i}) % 256 AS BIGINT)"
        ctes.append(
            f"r{i + 1} AS (SELECT v, ((h - (h % 256)"
            f" + xor(CAST(h % 256 AS BIGINT), {byte})) * {prime})"
            f" % {two64} AS h FROM r{i})"
        )
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT CAST(h % {count} AS BIGINT) AS shard,"
        " count(*) AS n_events FROM r8 GROUP BY shard"
    )


@register("q08_shard_assign", oracle=_fnv1a64_le8_sql(4))
def q08_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard assignment R1 (blsenderwork.go:126-149): FNV-1a64 of the 8 LE
    bytes of the position, unsigned % 4 — per-shard event counts. The DuckDB
    oracle spells FNV-1a64 as 8 unrolled xor+multiply rounds in HUGEINT
    arithmetic (_fnv1a64_le8_sql); the ported property tests
    (tests/test_sharding.py) cover the Go test vectors."""
    ev = load(spark, sf_dir, "events")
    shard = make_shard_udf(4)(F.col("event_id"))
    return (
        ev.select(shard.alias("shard"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "q09_template_render",
    oracle=(
        "SELECT event_id, CAST(json_object('event_id', event_id, 'event_type',"
        " event_type, 'user_id', user_id) AS VARCHAR) AS payload FROM events"
    ),
)
def q09_template_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template render T1 (tmpl.go:114-121): the documented JSON output shape
    rendered natively with to_json(struct(...)) — JVM-side, no UDF."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        cdc.render_json(
            F.col("event_id"), F.col("event_type"), F.col("user_id")
        ).alias("payload"),
    )


@register(
    "q10_fanout_union",
    oracle=(
        "SELECT 'route_a' AS route, event_id, user_id FROM events"
        " WHERE event_type = 'purchase' AND value > 100.0"
        " UNION ALL "
        "SELECT 'route_b' AS route, event_id, user_id FROM events"
        " WHERE event_type = 'signup'"
    ),
)
def q10_fanout_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-route fan-out R3 (blsenderwork.go:182-199): the same stream tested
    against every route; each match is delivered independently. One upstream
    scan, two filter branches, unionByName."""
    ev = load(spark, sf_dir, "events")
    route_a = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 100.0)
    ).select(F.lit("route_a").alias("route"), "event_id", "user_id")
    route_b = ev.filter(F.col("event_type") == "signup").select(
        F.lit("route_b").alias("route"), "event_id", "user_id"
    )
    return route_a.unionByName(route_b)


@register(
    "q11_checkpoint_frontier",
    oracle=(
        "SELECT event_type, max(event_id) AS max_position,"
        " count(*) AS n_events FROM events GROUP BY event_type"
    ),
)
def q11_checkpoint_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint frontier C1 (blsenderwork.go:204-213): highest storable
    offset per stream — map-side partial agg then one small shuffle."""
    ev = load(spark, sf_dir, "events")
    return cdc.checkpoint_frontier(ev, "event_type", "event_id")


@register(
    "q77_cdc_apply",
    oracle=f"""
WITH ch AS (
  SELECT user_id AS custkey, {_DML_CASE_SQL} AS operation, ts, event_id,
         CAST(value AS DOUBLE) AS acctbal
  FROM events WHERE {_DML_CASE_SQL} <> ''),
latest AS (
  SELECT custkey, operation, acctbal FROM (
    SELECT *, row_number() OVER (PARTITION BY custkey
        ORDER BY ts DESC, event_id DESC) AS rn FROM ch)
  WHERE rn = 1),
snap AS (
  SELECT c_custkey AS custkey, c_name AS name, CAST(c_acctbal AS DOUBLE) AS acctbal
  FROM customer)
SELECT COALESCE(s.custkey, l.custkey) AS custkey,
  s.name AS name,
  CASE WHEN l.operation IS NOT NULL AND l.operation <> 'DELETE'
       THEN COALESCE(l.acctbal, s.acctbal) ELSE s.acctbal END AS acctbal
FROM snap s FULL OUTER JOIN latest l ON s.custkey = l.custkey
WHERE l.operation IS NULL OR l.operation <> 'DELETE'
""",
)
def q77_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply/merge (operators.cdc.apply_cdc): replay the decoded change
    stream onto the customer snapshot — latest event per key wins by
    (ts, event_id); INSERT/UPDATE upsert acctbal, DELETE removes the row,
    untouched customers pass through. The consumer-side inverse of the
    reference's delivery path (blsenderwork.go:186-213): two shuffles (one
    keyed window, one full-outer join), no global sort."""
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer")
    op = cdc.dml_decode(F.col("event_type"), EVENT_DML_MAP)
    changes = (
        ev.select(
            F.col("user_id").alias("custkey"),
            op.alias("operation"),
            "ts",
            "event_id",
            F.col("value").cast("double").alias("acctbal"),
        )
        .filter(F.col("operation") != "")
    )
    snapshot = cust.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").cast("double").alias("acctbal"),
    )
    return cdc.apply_cdc(
        snapshot,
        changes,
        "custkey",
        position_cols=("ts", "event_id"),
    )


@register(
    "q78_scd2_history",
    oracle=f"""
WITH ch AS (
  SELECT user_id AS custkey, {_DML_CASE_SQL} AS operation, ts, event_id,
         CAST(value AS DOUBLE) AS acctbal
  FROM events WHERE {_DML_CASE_SQL} <> ''),
v AS (
  SELECT custkey, operation, event_id, ts AS valid_from,
    lead(ts) OVER (PARTITION BY custkey ORDER BY ts, event_id) AS valid_to,
    acctbal
  FROM ch)
SELECT custkey, event_id, valid_from, valid_to,
       valid_to IS NULL AS is_current, acctbal
FROM v WHERE operation <> 'DELETE'
""",
)
def q78_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 (operators.cdc.scd2_history): the change stream becomes
    versioned rows with [valid_from, valid_to) intervals — q77 keeps only
    latest state; this keeps every version for time-travel joins (q31's
    as-of join consumes exactly this shape). DELETEs close the prior
    version without emitting one. One keyed window, no history self-join."""
    ev = load(spark, sf_dir, "events")
    op = cdc.dml_decode(F.col("event_type"), EVENT_DML_MAP)
    changes = (
        ev.select(
            F.col("user_id").alias("custkey"),
            op.alias("operation"),
            "ts",
            "event_id",
            F.col("value").cast("double").alias("acctbal"),
        )
        .filter(F.col("operation") != "")
    )
    hist = cdc.scd2_history(
        changes, "custkey", "ts", tiebreak_cols=("event_id",)
    )
    return hist.select(
        "custkey", "event_id", "valid_from", "valid_to", "is_current", "acctbal"
    )
