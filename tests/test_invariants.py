"""Cross-query semantic invariants: mathematical properties that must hold
between the approximate rungs and their exact baselines — the relationships
the docstrings claim, enforced as tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_cms_estimate_upper_bounds_exact_for_every_token(spark):
    """Count-min sketch invariant (Cormode & Muthukrishnan): the estimate
    NEVER under-counts — est(tok) >= exact(tok) for EVERY token, not just
    the top-k the query returns. Checked over the full fixture vocabulary
    by recomputing est/exact from the same building blocks q105 uses."""
    from binwatch_spark.functions.texthash import (
        MINHASH_A,
        MINHASH_B,
        POLY_PRIME,
        make_polyhash_udf,
    )
    from binwatch_spark.plans.relational import _CMS_D, _CMS_W
    from binwatch_spark.tables import load

    docs = load(spark, SF_SMALL, "documents")
    ph = make_polyhash_udf()
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok")
    )
    hashed = toks.select("tok", ph(F.col("tok")).alias("_h")).persist()

    def cell(j):
        return (
            (F.lit(MINHASH_A[j]) * F.col("_h") + F.lit(MINHASH_B[j]))
            % POLY_PRIME
        ) % _CMS_W

    jc = F.explode(
        F.array(
            *[
                F.struct(F.lit(j).alias("j"), cell(j).cast("bigint").alias("cell"))
                for j in range(_CMS_D)
            ]
        )
    )
    sketch = (
        hashed.select(jc.alias("jc"))
        .select("jc.j", "jc.cell")
        .groupBy("j", "cell")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    est = (
        hashed.distinct()
        .select("tok", jc.alias("jc"))
        .select("tok", "jc.j", "jc.cell")
        .join(F.broadcast(sketch), ["j", "cell"])
        .groupBy("tok")
        .agg(F.min("c").alias("est"))
    )
    exact = hashed.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    under = est.join(exact, "tok").filter(F.col("est") < F.col("n")).count()
    assert under == 0
    hashed.unpersist()


def test_blocked_semantic_pairs_subset_of_exact_with_equal_sims(spark):
    """q104's LSH-blocked pair generator must emit a SUBSET of q85/q26's
    exact all-pairs output (blocking can only miss pairs, never invent or
    re-score them), and on the shared pairs the verified cosine must be
    IDENTICAL (same sequential-fold arithmetic)."""
    from binwatch_spark.operators.similarity import (
        neardup_pairs,
        neardup_pairs_lsh,
    )
    from binwatch_spark.plans.dedup_queries import COSINE_NEARDUP_THRESHOLD
    from binwatch_spark.tables import load

    emb = load(spark, SF_SMALL, "embeddings")
    exact = {
        (r["i"], r["j"]): r["sim"]
        for r in neardup_pairs(
            emb, "vec_id", "embedding", COSINE_NEARDUP_THRESHOLD
        ).collect()
    }
    blocked = {
        (r["i"], r["j"]): r["sim"]
        for r in neardup_pairs_lsh(
            emb, "vec_id", "embedding", COSINE_NEARDUP_THRESHOLD
        ).collect()
    }
    assert set(blocked) <= set(exact)
    for pair, sim in blocked.items():
        assert sim == exact[pair]
    # Recall floor at the fixture's deliberately LOOSE 0.4 threshold:
    # each hyperplane splits a pair with probability θ/π ≈ 0.37 there
    # (expected hamming ≈ 3/8), so hamming<=1 recovers ~0.2-0.3 — the
    # operator docstring derives why production thresholds (>=0.95,
    # θ/π ≈ 0.10) sit at ~0.8 with the same radius. This floor guards
    # against the generator silently degenerating (e.g. a bucket bug
    # emitting near-zero candidates), not against the geometry.
    assert len(blocked) >= 0.15 * len(exact)
