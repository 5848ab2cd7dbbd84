"""Cardinality-sketch semantics: q103's deterministic KMV estimator and
q55's HLL both track the exact distinct count, and the KMV per-partition
k-min prune is partitioning-invariant (the property that makes it safe to
run map-side at 100 TB)."""

from __future__ import annotations

from pyspark.sql import functions as F

from binwatch_spark.plans.registry import REGISTRY
from binwatch_spark.tables import load
from tests.conftest import SF_MEDIUM, SF_SMALL


def _exact(spark, sf_dir) -> dict[str, int]:
    ev = load(spark, sf_dir, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    )
    return {r["event_type"]: r["n"] for r in rows}


def test_kmv_exact_branch_below_k(spark):
    # sf0.001 has 15 distinct users per type, far below k=128 — the sketch
    # must fall back to the exact count, not extrapolate.
    est = {
        r["event_type"]: r["approx_users"]
        for r in REGISTRY["q103_kmv_distinct"].fn(spark, SF_SMALL).collect()
    }
    exact = _exact(spark, SF_SMALL)
    assert est == {t: float(n) for t, n in exact.items()}


def test_kmv_estimate_branch_accuracy(spark):
    # sf0.01 has 150 distinct users per type (> k=128): the (k-1)·2^64/h(k)
    # branch runs. k=128 → stderr ≈ 1/sqrt(k-2) ≈ 8.9%; 15% is ~1.7σ.
    est = {
        r["event_type"]: r["approx_users"]
        for r in REGISTRY["q103_kmv_distinct"].fn(spark, SF_MEDIUM).collect()
    }
    exact = _exact(spark, SF_MEDIUM)
    assert set(est) == set(exact)
    for t, n in exact.items():
        assert abs(est[t] - n) / n < 0.15
        # and the estimate branch actually ran (not the exact fallback)
        assert est[t] != float(n)


def test_kmv_prune_partitioning_invariant(spark):
    # The per-partition k-min prune must give the same answer no matter how
    # rows are split across tasks (union of local k-mins ⊇ global k-min).
    from binwatch_spark.plans import relational as rel

    base = rel.q103_kmv_distinct(spark, SF_MEDIUM)
    ev = load(spark, SF_MEDIUM, "events").repartition(7)
    view = "events_repart_kmv"
    ev.createOrReplaceTempView(view)

    # Re-run the same plan body against the repartitioned frame by patching
    # load for the duration of the call.
    orig = rel.load
    try:
        rel.load = lambda s, d, t: s.table(view) if t == "events" else orig(s, d, t)
        repart = rel.q103_kmv_distinct(spark, SF_MEDIUM)
        got = {r["event_type"]: r["approx_users"] for r in repart.collect()}
    finally:
        rel.load = orig
    want = {r["event_type"]: r["approx_users"] for r in base.collect()}
    assert got == want


def test_hll_tracks_exact(spark):
    # q55 stays rows-only in the oracle matrix (engine-specific sketch), so
    # pin its accuracy here instead: rsd=0.01 → well within 5% at sf0.01.
    est = {
        r["event_type"]: r["approx_users"]
        for r in REGISTRY["q55_approx_distinct"].fn(spark, SF_MEDIUM).collect()
    }
    exact = _exact(spark, SF_MEDIUM)
    assert set(est) == set(exact)
    for t, n in exact.items():
        assert abs(est[t] - n) / n < 0.05
