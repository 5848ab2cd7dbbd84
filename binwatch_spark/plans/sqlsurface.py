"""SQL-surface extensions (q59–q62, q68–q69): window frames, the rank
family, exact moment statistics, median/deterministic mode, windowed
first/last, and calendar arithmetic.

These widen the relational surface a reference user would expect from a
general analytics engine (the reference itself has no relational layer —
SURVEY.md §2.3), each with a DuckDB oracle twin. Determinism notes:

- Moment statistics (q61) are derived from EXACT integer/decimal sums cast
  to double at the end, with the variance/correlation formula written in
  the identical operation order in both engines — native stddev/corr
  aggregates are NOT hash-matchable across engines because Welford-style
  streaming updates are order- and implementation-dependent.
- Median (q62) is only oracle-safe over integer-valued data: both engines
  interpolate even-count midpoints with different float expressions
  ((a+b)/2 vs a+(b-a)*0.5), which agree exactly when a, b are integers.
- Mode (q62) is computed manually (count desc, value asc, row_number=1):
  native mode() ties are engine-arbitrary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binwatch_spark.plans.registry import register
from binwatch_spark.plans.relational import _dsum_sql, dsum
from binwatch_spark.tables import load


@register(
    "q46_window_frames",
    oracle="""
SELECT o_custkey, o_orderkey,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum,
  count(*) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS frame_n
FROM orders
""",
)
def q46_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS frame (3-row moving sum per customer). One shuffle on
    o_custkey; the frame is evaluated streaming within each sorted
    partition — no per-row re-scan. Decimal accumulation keeps the moving
    double sum bit-identical across engines."""
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("moving_sum"),
        F.count(F.lit(1)).over(w).alias("frame_n"),
    )


@register(
    "q60_rank_family",
    oracle="""
SELECT o_orderkey, o_orderstatus,
  row_number() OVER w AS rn,
  ntile(4)     OVER w AS quartile,
  percent_rank() OVER w AS pct_rank,
  cume_dist()    OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
""",
)
def q60_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank-function family over a totally ordered window (o_orderkey
    tiebreak makes every rank deterministic). percent_rank/cume_dist are
    ratios of identical integers in both engines, so the doubles match
    bit-for-bit."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


_Q61_MOMENTS = """
SELECT l_returnflag,
  count(*) AS n,
  CAST(sum(CAST(l_quantity AS DECIMAL(38,0))) AS DOUBLE) AS sx,
  CAST(sum(CAST(l_linenumber AS DECIMAL(38,0))) AS DOUBLE) AS sy,
  CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
  CAST(sum(CAST(l_linenumber * l_linenumber AS DECIMAL(38,0))) AS DOUBLE) AS syy,
  CAST(sum(CAST(l_quantity * l_linenumber AS DECIMAL(38,0))) AS DOUBLE) AS sxy
FROM lineitem GROUP BY l_returnflag
"""

_Q61_SQL = f"""
SELECT l_returnflag, n,
  sx / CAST(n AS DOUBLE) AS mean_qty,
  (sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS var_qty,
  (sxy - sx * sy / CAST(n AS DOUBLE)) /
    sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) *
         (syy - sy * sy / CAST(n AS DOUBLE))) AS corr_qty_line
FROM ({_Q61_MOMENTS})
"""


@register("q47_stats_moments", oracle=_Q61_SQL)
def q47_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/variance/correlation from exact integer moments: l_quantity and
    l_linenumber are integer-valued, so Σx, Σx², Σxy accumulate exactly as
    DECIMAL(38,0) (one map-side partial per group; products stay < 2^63
    per row and the decimal sum never overflows at any SF). The float
    formula then runs once per GROUP on identical doubles — this is also
    the 100 TB shape: one aggregation pass, O(groups) float math, versus
    native corr/stddev whose streaming updates don't reproduce across
    engines or partitionings."""
    li = load(spark, sf_dir, "lineitem")
    q, ln = F.col("l_quantity"), F.col("l_linenumber")
    dec = "decimal(38,0)"
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q.cast(dec)).cast("double").alias("sx"),
        F.sum(ln.cast(dec)).cast("double").alias("sy"),
        F.sum((q * q).cast(dec)).cast("double").alias("sxx"),
        F.sum((ln * ln).cast(dec)).cast("double").alias("syy"),
        F.sum((q * ln).cast(dec)).cast("double").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    nm1 = (F.col("n") - 1).cast("double")
    var_qty = (F.col("sxx") - F.col("sx") * F.col("sx") / nd) / nm1
    corr = (F.col("sxy") - F.col("sx") * F.col("sy") / nd) / F.sqrt(
        (F.col("sxx") - F.col("sx") * F.col("sx") / nd)
        * (F.col("syy") - F.col("sy") * F.col("sy") / nd)
    )
    return m.select(
        "l_returnflag",
        "n",
        (F.col("sx") / nd).alias("mean_qty"),
        var_qty.alias("var_qty"),
        corr.alias("corr_qty_line"),
    )


_Q62_SQL = """
WITH med AS (
  SELECT l_returnflag, median(l_quantity) AS median_qty
  FROM lineitem GROUP BY l_returnflag),
cnt AS (
  SELECT l_returnflag, l_quantity, count(*) AS c
  FROM lineitem GROUP BY l_returnflag, l_quantity),
md AS (
  SELECT l_returnflag, l_quantity AS mode_qty
  FROM (SELECT l_returnflag, l_quantity,
          row_number() OVER (PARTITION BY l_returnflag
                             ORDER BY c DESC, l_quantity ASC) AS rn
        FROM cnt)
  WHERE rn = 1)
SELECT med.l_returnflag, med.median_qty, md.mode_qty
FROM med JOIN md ON med.l_returnflag = md.l_returnflag
"""


@register("q62_median_mode", oracle=_Q62_SQL)
def q62_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median + deterministic mode per group. Median is exact (not
    approx_percentile) — the honest local answer; the docstring-declared
    100 TB swap is approx_percentile with a bounded error. Mode avoids the
    native aggregate's arbitrary tie-break by ranking (count desc, value
    asc) over the tiny (group, value) count table."""
    li = load(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(F.median("l_quantity").alias("median_qty"))
    cnt = li.groupBy("l_returnflag", "l_quantity").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("c").desc(), F.col("l_quantity").asc()
    )
    md = (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"))
    )
    return med.join(md, "l_returnflag").select(
        "l_returnflag", "median_qty", "mode_qty"
    )


@register(
    "q68_first_last_value",
    oracle="""
SELECT DISTINCT user_id,
  first_value(event_type) OVER w AS first_type,
  last_value(event_type)  OVER w AS last_type,
  count(*) OVER w AS n_events
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def q68_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over an unbounded frame (per-user first and
    last event type), collapsed with DISTINCT — every row of a user
    carries identical window values, so the distinct is exact. The
    event_id tiebreak makes first/last deterministic under equal
    timestamps."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.count(F.lit(1)).over(w).alias("n_events"),
    ).distinct()


@register(
    "q69_ship_delay_calendar",
    oracle=f"""
SELECT CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS order_month,
  count(*) AS n,
  {_dsum_sql("date_diff('day', o.o_orderdate, l.l_shipdate)")} / count(*)
    AS avg_delay_days
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY 1
""",
)
def q69_ship_delay_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic: per order-month average order→ship delay in
    days. datediff counts date boundaries in both engines (timestamps cast
    to dates), so the per-row integers are identical; the average divides
    a decimal-exact sum. Join is fact-to-fact on l_orderkey — at scale
    this is the bucketed-join candidate (operators/storage.py)."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    j = o.join(li, o.o_orderkey == li.l_orderkey)
    return (
        j.select(
            # timestamp on BOTH sides: DuckDB's date_trunc('month') yields
            # DATE, which pandas-side comparison renders as midnight
            # timestamps — matching types beats matching renderings.
            F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("_d"),
        )
        .groupBy("order_month")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (dsum(F.col("_d")) / F.count(F.lit(1))).alias("avg_delay_days"),
        )
    )


HIER_ROOTS = 10  # doc_id < HIER_ROOTS are forest roots; parent = id div 2


@register(
    "q127_recursive_hierarchy",
    oracle=f"""
WITH RECURSIVE walk(doc_id, root, depth) AS (
  SELECT doc_id, doc_id, 0 FROM documents WHERE doc_id < {HIER_ROOTS}
  UNION ALL
  SELECT c.doc_id, w.root, w.depth + 1
  FROM documents c JOIN walk w ON c.doc_id // 2 = w.doc_id
  WHERE c.doc_id >= {HIER_ROOTS})
SELECT doc_id, root, CAST(depth AS BIGINT) AS depth FROM walk
""",
)
def q127_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (hierarchy traversal) through Spark 4's native
    WITH RECURSIVE — the BOM-explosion / org-chart / thread-ancestry query
    shape an analytics-engine user expects from the SQL surface. The
    hierarchy is derived (parent(id) = id div 2, ids below {HIER_ROOTS}
    are forest roots), so both engines traverse the identical forest and
    every (node, root, depth) row hash-checks.

    Spark executes the recursion as iterative UnionLoop steps over the
    base relation — each step is one equi-join of the frontier against
    the child scan, so at 100 TB the cost is depth × one shuffled join
    with a shrinking frontier, the same plan a hand-rolled loop would
    build (and what operators/dedup's pointer-jumping does for the
    unbounded-depth case; this is the SQL-native bounded-forest form)."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    docs.createOrReplaceTempView("q127_docs")
    return spark.sql(
        f"""
WITH RECURSIVE walk(doc_id, root, depth) AS (
  SELECT doc_id, doc_id, 0 FROM q127_docs WHERE doc_id < {HIER_ROOTS}
  UNION ALL
  SELECT c.doc_id, w.root, w.depth + 1
  FROM q127_docs c JOIN walk w ON c.doc_id div 2 = w.doc_id
  WHERE c.doc_id >= {HIER_ROOTS})
SELECT doc_id, root, CAST(depth AS BIGINT) AS depth FROM walk
"""
    )


@register(
    "q128_unpivot_measures",
    oracle=f"""
WITH a AS (
  SELECT l_returnflag, l_linestatus,
         {_dsum_sql("l_quantity")} AS sum_qty,
         {_dsum_sql("l_extendedprice")} AS sum_price,
         {_dsum_sql("l_discount")} AS sum_disc
  FROM lineitem GROUP BY l_returnflag, l_linestatus)
SELECT l_returnflag, l_linestatus, measure, value
FROM a UNPIVOT (value FOR measure IN (sum_qty, sum_price, sum_disc))
""",
)
def q128_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long relational melt): the q14-family measure
    aggregate flipped into (group, measure, value) rows — the long-format
    export shape metric stores and plotting layers consume. Uses Spark's
    native DataFrame ``unpivot`` (SQL UNPIVOT underneath); aggregation
    happens BEFORE the melt, so the corpus-sized scan aggregates
    two-phase as usual and the unpivot touches only the tiny grouped
    frame (never melt-then-aggregate, which would triple the shuffle).
    Decimal accumulation keeps the doubles bit-identical."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_price"),
        dsum(F.col("l_discount")).alias("sum_disc"),
    )
    return agg.unpivot(
        ["l_returnflag", "l_linestatus"],
        ["sum_qty", "sum_price", "sum_disc"],
        "measure",
        "value",
    )


LATERAL_TOPK = 2


@register(
    "q129_lateral_topk",
    oracle=f"""
SELECT c.c_custkey, s.o_orderkey, s.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT {LATERAL_TOPK}) s
""",
)
def q129_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (per-customer top-{LATERAL_TOPK}
    orders) — the "for each row, run this parameterized subquery" SQL
    surface. Spark 4 plans the correlated LIMIT as a partitioned window
    under the hood (DomainJoin rewrite), so this is the same physical
    work as q15's explicit window top-k — the point here is the SQL
    spelling users port from other warehouses, checked end-to-end.
    Customers with no orders contribute no rows (inner lateral) in both
    engines."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("q129_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("q129_orders")
    return spark.sql(
        f"""
SELECT c.c_custkey, s.o_orderkey, s.o_totalprice
FROM q129_customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM q129_orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT {LATERAL_TOPK}) s
"""
    )
