"""connected_components: the cluster-collapse step after near-dup pair
generation. Pinned on hand-built graphs where the expected labeling is
checkable by eye — chains (worst-case diameter for label propagation),
disjoint components, and singleton-free behavior (nodes only exist if they
appear in a pair).
"""

from __future__ import annotations

from binwatch_spark.operators.dedup import connected_components


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "i long, j long")
    rows = connected_components(df).collect()
    return {r.doc_id: r.cluster_id for r in rows}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: worst case for plain propagation (diameter 4);
    # pointer jumping must still converge and label everything 1.
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_components_keep_separate_labels(spark):
    got = _cc(spark, [(10, 11), (11, 12), (20, 21), (30, 31)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}


def test_pair_order_does_not_matter(spark):
    # (j, i) pairs with j > i: symmetrization inside the operator must make
    # the labeling identical to the sorted form.
    got = _cc(spark, [(5, 4), (4, 3), (3, 2), (2, 1)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_clique_single_round(spark):
    got = _cc(spark, [(1, 2), (1, 3), (2, 3), (7, 8)])
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}
