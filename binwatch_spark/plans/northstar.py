"""North-star scale operators (q18+): dedup, text analysis, similarity search
— the LLM-data-pipeline layer the engine adds beyond reference parity
(SURVEY.md §2.4). Implementations live in ``operators/``; these are the
registered, oracle-checked query shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binwatch_spark.plans.registry import register
from binwatch_spark.tables import load


@register(
    "q18_exact_dedup",
    oracle=(
        "SELECT min(doc_id) AS keeper_doc_id, count(*) AS dup_count,"
        " min(lang) AS lang FROM documents GROUP BY text"
    ),
)
def q18_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication: group identical texts, keep the lowest doc_id.
    One hash-shuffle on the text (at 100 TB: group on sha2(text) instead so
    the shuffle key is 32 bytes, not the document — see operators.dedup)."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("dup_count"),
        F.min("lang").alias("lang"),
    ).drop("text")


@register(
    "q19_text_analysis",
    oracle=(
        "SELECT token, count(*) AS cnt FROM ("
        "  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)"
        " WHERE token <> '' GROUP BY token ORDER BY cnt DESC, token LIMIT 20"
    ),
)
def q19_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + global token counts, deterministic top-20. explode is
    pipelined (no shuffle); the count is one partial-agg shuffle; top-k via
    TakeOrdered, not a global sort."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(20)
    )


@register(
    "q20_similarity_knn",
    oracle=(
        "SELECT query_id, cand_id, CAST(rn AS INTEGER) AS rank FROM ("
        "  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,"
        "    row_number() OVER (PARTITION BY q.vec_id ORDER BY"
        "      list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))"
        "      / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))"
        "       * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))"
        "      DESC, c.vec_id) AS rn"
        "  FROM embeddings q CROSS JOIN embeddings c"
        "  WHERE q.vec_id < 5 AND c.vec_id >= 5)"
        " WHERE rn <= 3"
    ),
)
def q20_similarity_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: 5 query vectors × all candidates.

    The query side is broadcast (tiny), so the cross join is a map-side
    nested loop over the candidate partitions — embarrassingly parallel and
    the correct *baseline* at any scale. The LSH-bucketed variant
    (operators.similarity) is the 100 TB path: it prunes candidates per
    bucket before scoring."""
    from binwatch_spark.operators.similarity import brute_force_knn

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cands = emb.filter(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb")
    )
    return brute_force_knn(queries, cands, 3).select(
        "query_id", "cand_id", "rank"
    )
