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


# ---------------------------------------------------------------------------
# Alternating large-star/small-star CC (Kiveris et al.): must produce the
# exact same labeling as pointer jumping on any graph shape.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from binwatch_spark.operators.dedup import connected_components_star

_SPARK = None


def _cc_star(spark, pairs):
    df = spark.createDataFrame(pairs, "i long, j long")
    rows = connected_components_star(df).collect()
    return {r.doc_id: r.cluster_id for r in rows}


def test_star_chain_collapses_to_min(spark):
    got = _cc_star(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_star_disjoint_components(spark):
    got = _cc_star(spark, [(10, 11), (11, 12), (20, 21), (30, 31)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}


def test_star_long_path_converges(spark):
    # 32-node path: diameter 31 — the shape the star algorithm exists for.
    n = 32
    got = _cc_star(spark, [(i, i + 1) for i in range(1, n)])
    assert got == {i: 1 for i in range(1, n + 1)}


def test_star_self_loop_only_node_labels_itself(spark):
    got = _cc_star(spark, [(7, 7), (1, 2)])
    assert got == {7: 7, 1: 1, 2: 1}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=14),
            st.integers(min_value=0, max_value=14),
        ),
        min_size=1,
        max_size=18,
    )
)
def test_star_matches_pointer_jumping_on_random_graphs(spark, edges):
    assert _cc_star(spark, edges) == _cc(spark, edges)
