"""Derived relational capability layer (q12–q17, q21/q22): joins, multi-join
aggregation, rollup, window top-k, event-time windows, set ops, sketches —
the query surface Catalyst optimizes for free (SURVEY.md §2.4, §4.2).

Float determinism: every double aggregate accumulates as DECIMAL(18,4)
(exact, order-independent) and only the final value is cast back to double,
so Spark's partial/final aggregation and DuckDB produce bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binwatch_spark.plans.registry import register
from binwatch_spark.tables import load


def dsum(col: Column) -> Column:
    """Order-independent double sum: exact decimal accumulation, double out."""
    return F.sum(col.cast("decimal(18,4)")).cast("double")


def _dsum_sql(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"


@register(
    "q12_join_orders_customer",
    oracle=(
        "SELECT o.o_orderkey, c.c_name, o.o_totalprice"
        " FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
        " WHERE c.c_mktsegment = 'BUILDING'"
    ),
)
def q12_join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join + dimension filter. customer is the small dimension →
    broadcast hash join (no shuffle of the orders fact at any scale)."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner"
        )
        .select("o_orderkey", "c_name", "o_totalprice")
    )


@register(
    "q13_multijoin_pricing",
    oracle=(
        "SELECT l.l_orderkey,"
        f"  {_dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,"
        "  o.o_orderdate, o.o_orderpriority"
        " FROM customer c"
        " JOIN orders o ON c.c_custkey = o.o_custkey"
        " JOIN lineitem l ON l.l_orderkey = o.o_orderkey"
        " WHERE c.c_mktsegment = 'BUILDING'"
        "   AND o.o_orderdate < TIMESTAMP '1998-06-01'"
        "   AND l.l_shipdate > TIMESTAMP '1998-06-01'"
        " GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority"
        " ORDER BY revenue DESC, l_orderkey LIMIT 10"
    ),
)
def q13_multijoin_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: customer⋈orders⋈lineitem with selective filters, grouped
    revenue, deterministic top-10. Dimensions filter *before* the join (Catalyst
    pushes them into the scans); customer broadcasts; the lineitem⋈orders join
    shuffles on orderkey — the unavoidable big shuffle, minimized by pushed
    filters and column pruning."""
    cutoff = "1998-06-01"
    customer = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
    )
    lineitem = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    )
    joined = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    revenue = dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q14_groupby_rollup",
    oracle=(
        "SELECT l_returnflag, l_linestatus,"
        f"  {_dsum_sql('l_quantity')} AS sum_qty,"
        f"  {_dsum_sql('l_extendedprice')} AS sum_price,"
        f"  {_dsum_sql('l_discount')} / count(*) AS avg_disc,"
        "  count(*) AS cnt"
        " FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"
    ),
)
def q14_groupby_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape with ROLLUP subtotals. Two-phase (partial+final)
    aggregation is automatic; decimal accumulation keeps doubles deterministic
    under any partial-agg order."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_price"),
            (dsum(F.col("l_discount")) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@register(
    "q15_window_topk",
    oracle=(
        "SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn"
        " FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,"
        "   row_number() OVER (PARTITION BY o_orderpriority"
        "     ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)"
        " WHERE rn <= 3"
    ),
)
def q15_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-per-group top-k via window row_number with a total-order tiebreak.
    Shuffles once on the partition key; at scale AQE handles skewed groups."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q16_sliding_window_agg",
    oracle=(
        "SELECT date_trunc('hour', ts) AS window_start, count(*) AS n_events,"
        f"  {_dsum_sql('value')} AS total_value"
        " FROM events GROUP BY date_trunc('hour', ts)"
    ),
)
def q16_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window aggregation — the batch-checkable shape of
    the streaming windowed agg (streaming/ uses F.window + watermark)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("window_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
    )


@register(
    "q17_set_ops",
    oracle=(
        "SELECT 'intersect' AS part, c_custkey FROM ("
        "  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
        "  INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 1000.0)"
        " UNION ALL "
        "SELECT 'except' AS part, c_custkey FROM ("
        "  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
        "  EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal > 1000.0)"
    ),
)
def q17_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT of customer segments, tagged and unioned."""
    customer = load(spark, sf_dir, "customer")
    seg_a = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    seg_b = customer.filter(F.col("c_acctbal") > 1000.0).select("c_custkey")
    both = seg_a.intersect(seg_b).select(
        F.lit("intersect").alias("part"), "c_custkey"
    )
    only_a = seg_a.exceptAll(seg_b).distinct().select(
        F.lit("except").alias("part"), "c_custkey"
    )
    return both.unionByName(only_a)


@register("q21_approx_distinct", oracle=None)
def q21_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct users per event type — the sketch
    path for 100 TB cardinality estimation (one pass, fixed memory). Sketch
    internals differ from DuckDB's → rows-only check; q22 is the exact twin
    with a full oracle."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users")
    )


@register(
    "q22_exact_distinct",
    oracle=(
        "SELECT event_type, count(DISTINCT user_id) AS n_users,"
        " count(*) AS n_events FROM events GROUP BY event_type"
    ),
)
def q22_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count twin of q21 (two-phase distinct aggregation)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
