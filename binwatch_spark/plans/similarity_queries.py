"""Similarity-search query inventory (q31 as-of join, q33 LSH ANN)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binwatch_spark.functions.texthash import lsh_bucket_sql
from binwatch_spark.operators.similarity import lsh_knn
from binwatch_spark.plans.registry import register
from binwatch_spark.tables import load


@register(
    "q31_asof_join",
    oracle="""
WITH o AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate)
SELECT e.event_id, e.user_id, o.o_orderkey
FROM events e ASOF JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
)
def q31_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the user's most recent order at or
    before the event time. Spark lacks a native ASOF JOIN; the scalable
    pattern is union-then-window: tag both sides, sort within user by
    (time, side), and carry the last seen order key forward with
    last(ignorenulls) — one shuffle on user, no per-row probing, no range
    explosion. Ties inside a timestamp are pre-collapsed (max orderkey) so
    the result is deterministic in both engines."""
    orders = load(spark, sf_dir, "orders")
    events = load(spark, sf_dir, "events")
    o = (
        orders.groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("t"),
            "o_orderkey",
            F.lit(None).cast("bigint").alias("event_id"),
            F.lit(0).alias("kind"),
        )
    )
    e = events.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(None).cast("bigint").alias("o_orderkey"),
        "event_id",
        F.lit(1).alias("kind"),
    )
    merged = o.unionByName(e)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn(
            "matched", F.last("o_orderkey", ignorenulls=True).over(w)
        )
        .filter((F.col("kind") == 1) & F.col("matched").isNotNull())
        .select("event_id", "user_id", F.col("matched").alias("o_orderkey"))
    )


_COS = (
    "list_dot_product(CAST(q_emb AS DOUBLE[]), CAST(c_emb AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST(q_emb AS DOUBLE[]), CAST(q_emb AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST(c_emb AS DOUBLE[]), CAST(c_emb AS DOUBLE[]))))"
)


def _ann_sql() -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb,
         {lsh_bucket_sql("embedding")} AS bucket
  FROM embeddings WHERE vec_id < 20),
c AS (
  SELECT vec_id AS cand_id, embedding AS c_emb,
         {lsh_bucket_sql("embedding")} AS bucket
  FROM embeddings WHERE vec_id >= 20),
p AS (
  SELECT query_id, cand_id, {_COS} AS sim FROM q JOIN c USING (bucket))
SELECT query_id, cand_id, sim, CAST(rn AS INTEGER) AS rank FROM (
  SELECT query_id, cand_id, sim,
    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rn
  FROM p)
WHERE rn <= 3
"""


@register("q33_ann_lsh", oracle=_ann_sql())
def q33_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors via random-hyperplane LSH buckets:
    bucket assignment is map-side; the cross join becomes an equi-join on
    bucket id. Fully oracle-checked because the hyperplanes are fixed seeded
    constants shared with the generated SQL."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cands = emb.filter(F.col("vec_id") >= 20).select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb")
    )
    res = lsh_knn(queries, cands, 3)
    return res.select("query_id", "cand_id", "sim", F.col("rank").cast("int").alias("rank"))
