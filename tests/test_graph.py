"""connected_components / connected_components_star: the cluster-collapse
step after near-dup pair generation. Every behavior is pinned on BOTH
execution paths — the bounded driver union-find fast path (small graphs)
and the distributed loops (driver_max_edges=0 forces them) — on hand-built
graphs where the expected labeling is checkable by eye, plus
hypothesis-generated random graphs where all four (algorithm × path)
combinations must agree exactly.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from binwatch_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)

# (label, callable) pairs: each algorithm on each execution path
ALGOS = [
    ("jump-driver", lambda df: connected_components(df)),
    ("jump-distributed", lambda df: connected_components(df, driver_max_edges=0)),
    ("star-driver", lambda df: connected_components_star(df)),
    (
        "star-distributed",
        lambda df: connected_components_star(df, driver_max_edges=0),
    ),
]


def _labels(spark, pairs, fn):
    df = spark.createDataFrame(pairs, "i long, j long")
    return {r.doc_id: r.cluster_id for r in fn(df).collect()}


@pytest.mark.parametrize("name,fn", ALGOS, ids=[a[0] for a in ALGOS])
def test_chain_collapses_to_min(spark, name, fn):
    # 1-2-3-4-5 chain: worst case for plain propagation (diameter 4).
    got = _labels(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], fn)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


@pytest.mark.parametrize("name,fn", ALGOS, ids=[a[0] for a in ALGOS])
def test_disjoint_components_keep_separate_labels(spark, name, fn):
    got = _labels(spark, [(10, 11), (11, 12), (20, 21), (30, 31)], fn)
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}


@pytest.mark.parametrize("name,fn", ALGOS, ids=[a[0] for a in ALGOS])
def test_pair_order_does_not_matter(spark, name, fn):
    got = _labels(spark, [(5, 4), (4, 3), (3, 2), (2, 1)], fn)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


@pytest.mark.parametrize("name,fn", ALGOS, ids=[a[0] for a in ALGOS])
def test_clique_and_self_loop(spark, name, fn):
    got = _labels(spark, [(1, 2), (1, 3), (2, 3), (7, 7)], fn)
    assert got == {1: 1, 2: 1, 3: 1, 7: 7}


def test_star_long_path_converges_distributed(spark):
    # 32-node path: diameter 31 — the shape the star algorithm exists for;
    # forced distributed so the loop itself (not the fast path) is proven.
    n = 32
    got = _labels(
        spark,
        [(i, i + 1) for i in range(1, n)],
        lambda df: connected_components_star(df, driver_max_edges=0),
    )
    assert got == {i: 1 for i in range(1, n + 1)}


@settings(
    max_examples=8,
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
def test_all_paths_agree_on_random_graphs(spark, edges):
    results = [_labels(spark, edges, fn) for _, fn in ALGOS]
    assert all(r == results[0] for r in results[1:])


def test_star_max_iter_exhaustion_degrades_to_one_label_per_node(spark):
    # ADVICE r04: with max_iter too low for the fixed point, the star
    # extraction must still emit exactly ONE (doc_id, cluster_id) row per
    # node (labels may split a component — the documented contract) rather
    # than duplicate rows for nodes still attached to two centers.
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "i long, j long"
    )
    out = connected_components_star(df, max_iter=1, driver_max_edges=0).collect()
    ids = [r.doc_id for r in out]
    assert len(ids) == len(set(ids)) == 40
