"""Similarity search over embedding columns: exact cosine kNN (baseline) and
random-hyperplane-LSH bucketed ANN (the scale path).

Cosine similarity is computed as a *sequential* double fold (zip_with +
aggregate) so results are bit-identical to DuckDB's list_dot_product — this
keeps even the approximate-ANN query oracle-checkable, because the "random"
hyperplanes are fixed seeded constants shared with the generated SQL
(functions.texthash.HYPERPLANES).

Scale posture: brute force is a broadcast nested-loop over candidate
partitions — right for one-off queries; the LSH variant buckets candidates
map-side (bucket = 8 sign bits), turning the cross join into an equi-join on
bucket id — the candidate set per query drops ~2^8 and the join shuffles only
bucket-matched rows. At 100 TB add multi-probe (flip one bit) for recall.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from binwatch_spark.functions.texthash import lsh_bucket


def cosine(a: Column, b: Column) -> Column:
    """Deterministic cosine similarity of two float-array columns."""

    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def brute_force_knn(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    query_id: str = "query_id",
    cand_id: str = "cand_id",
    q_emb: str = "q_emb",
    c_emb: str = "c_emb",
) -> DataFrame:
    """Exact top-k per query by cosine; queries broadcast (small side)."""
    pairs = candidates.crossJoin(F.broadcast(queries))
    sim = cosine(F.col(q_emb), F.col(c_emb))
    w = Window.partitionBy(query_id).orderBy(F.col("sim").desc(), F.col(cand_id))
    return (
        pairs.select(query_id, cand_id, sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_knn(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    query_id: str = "query_id",
    cand_id: str = "cand_id",
    q_emb: str = "q_emb",
    c_emb: str = "c_emb",
) -> DataFrame:
    """Approximate top-k: only candidates in the query's LSH bucket are
    scored. Equi-join on bucket id instead of a cross join."""
    q = queries.withColumn("_bucket", lsh_bucket(F.col(q_emb)))
    c = candidates.withColumn("_bucket", lsh_bucket(F.col(c_emb)))
    pairs = c.join(F.broadcast(q), on="_bucket")
    sim = cosine(F.col(q_emb), F.col(c_emb))
    w = Window.partitionBy(query_id).orderBy(F.col("sim").desc(), F.col(cand_id))
    return (
        pairs.select(query_id, cand_id, sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def neardup_pairs(df: DataFrame, id_col: str, emb_col: str, threshold: float) -> DataFrame:
    """All embedding pairs with cosine >= threshold (i < j). Exact — the
    LSH-bucketed variant applies the same predicate after bucket blocking."""
    a = df.select(F.col(id_col).alias("i"), F.col(emb_col).alias("_ea"))
    b = df.select(F.col(id_col).alias("j"), F.col(emb_col).alias("_eb"))
    pairs = a.join(F.broadcast(b), F.col("i") < F.col("j"))
    sim = cosine(F.col("_ea"), F.col("_eb"))
    return pairs.select("i", "j", sim.alias("sim")).filter(
        F.col("sim") >= threshold
    )
