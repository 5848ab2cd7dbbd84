"""Physical-plan regression tests: the scale properties we rely on must be
visible in the plan — filters reaching the parquet scan, column pruning,
broadcast joins for dimensions, two-phase aggregation. A refactor that
silently turns a broadcast join into a sort-merge join or un-pushes a filter
fails here, not at 100 TB.
"""

from __future__ import annotations

import contextlib
import io

from binwatch_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMALL


def plan_of(spark, name: str, mode: str = "formatted") -> str:
    df = REGISTRY[name].fn(spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_q01_filter_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q01_source_scan")
    assert "PushedFilters" in plan
    assert "GreaterThan(value,100.0)" in plan
    # column pruning: the scan must not read props/ts
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "props" not in read_schema and "user_id" not in read_schema


def test_q02_isin_pushdown(spark):
    plan = plan_of(spark, "q02_table_filter")
    assert "In(event_type" in plan


def test_q12_broadcasts_dimension(spark):
    plan = plan_of(spark, "q12_join_orders_customer")
    assert "BroadcastHashJoin" in plan
    # the dimension filter reaches the customer scan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_q13_pushdown_both_fact_filters(spark):
    plan = plan_of(spark, "q13_multijoin_pricing")
    assert "BroadcastHashJoin" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThan(l_shipdate" in plan
    assert "LessThan(o_orderdate" in plan


def test_q14_two_phase_aggregation(spark):
    plan = plan_of(spark, "q14_groupby_rollup", mode="simple")
    # partial + final HashAggregate (map-side combine before the shuffle)
    assert plan.count("HashAggregate") >= 2


def test_q19_partial_agg_before_shuffle(spark):
    plan = plan_of(spark, "q19_text_analysis", mode="simple")
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_q20_broadcast_queries_side(spark):
    plan = plan_of(spark, "q20_similarity_knn", mode="simple")
    assert "Broadcast" in plan  # broadcast nested loop / exchange of queries


def test_q33_equijoin_on_bucket_not_crossjoin(spark):
    plan = plan_of(spark, "q33_ann_lsh", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan


def test_register_views_sql_surface(spark):
    from binwatch_spark.tables import TABLE_NAMES, register_views

    register_views(spark, SF_SMALL)
    # every fixture table is queryable through plain SQL...
    for name in TABLE_NAMES:
        assert spark.sql(f"SELECT * FROM {name} LIMIT 1").count() >= 0
    # ...with the same normalized schema the DataFrame API sees (nanos ts
    # already converted, so event-time SQL works unmodified)
    row = spark.sql("SELECT max(ts) AS m FROM events").first()
    assert row.m is not None


def test_q70_multiprobe_stays_broadcast_equijoin(spark):
    # multi-probe explodes the QUERY side only; the join must remain a
    # broadcast hash equi-join on bucket id, never a nested loop
    plan = plan_of(spark, "q70_ann_multiprobe", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan


def test_q72_sequence_pack_single_shuffle(spark):
    # packing = one window over the stream key; exactly one exchange
    plan = plan_of(spark, "q72_sequence_pack", mode="simple")
    assert plan.count("Exchange") == 1


def test_q73_hash_split_map_side_only(spark):
    plan = plan_of(spark, "q73_hash_split", mode="simple")
    assert "Exchange" not in plan


def test_q74_chunk_overlap_no_shuffle(spark):
    # explode is map-side row generation; no exchange anywhere
    plan = plan_of(spark, "q74_chunk_overlap", mode="simple")
    assert "Exchange" not in plan
    assert "Generate" in plan  # the stride-sequence explode


def test_q38_ivf_no_shuffle_before_cell_join(spark):
    # VERDICT r04 #6: cell assignment must be map-side (broadcast centroid
    # scores + per-row Arrow top-n), so the ONLY hash exchange in the plan
    # is the final per-query top-k window — never a shuffle of the full
    # candidate set before the cell-id equi-join.
    plan = plan_of(spark, "q38_ann_ivf", mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastHashJoin" in plan
    # partial top-k runs before the one shuffle (WindowGroupLimit pushdown)
    assert "WindowGroupLimit" in plan.split("Exchange hashpartitioning")[1]


def test_q84_topk_is_take_ordered_not_full_sort(spark):
    # deterministic top-k must plan as TakeOrderedAndProject (per-partition
    # k + merge), never a global Sort feeding a Limit
    plan = plan_of(spark, "q84_dup_span_audit", mode="simple")
    assert "TakeOrderedAndProject" in plan


def test_q83_total_is_broadcast_single_row(spark):
    # the corpus-total join must be a broadcast nested loop over ONE row,
    # not a shuffled join of the per-doc aggregate
    plan = plan_of(spark, "q83_token_commonness", mode="simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_q88_bounds_join_is_broadcast(spark):
    # per-language bounds frame is #languages rows: the join back to the
    # corpus must be a broadcast hash join, never a shuffled sort-merge
    plan = plan_of(spark, "q88_length_trim_filter", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q87_distinct_count_is_staged_aggregate(spark):
    # count(DISTINCT token) must expand to partial/final hash aggregates
    # (scalable two-stage shape), not a per-group set collect
    plan = plan_of(spark, "q87_type_token_ratio", mode="simple")
    assert "HashAggregate" in plan
    assert "collect_set" not in plan


def test_q86_window_runs_on_aggregated_frame(spark):
    # the unpartitioned normalizing window is safe ONLY because it runs on
    # the post-aggregate #sources-row frame: the window node must sit above
    # the aggregate in the plan, never directly over the scan
    plan = plan_of(spark, "q86_mixture_weights", mode="simple")
    w = plan.index("Window")
    assert "HashAggregate" in plan[w:]


def test_q92_lm_joins_are_keyed_not_broadcast_corpus(spark):
    # LM tables are corpus-scale: scoring must join on the bigram/context
    # KEYS; the only broadcast-nested-loop allowed is the single-row
    # vocabulary-size frame. Partial aggregation must precede each LM
    # count's exchange.
    plan = plan_of(spark, "q92_bigram_lm_score", mode="simple")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # the 1-row vocab only
    assert plan.count("HashAggregate") >= 4  # partial+final for both LM tables


def test_q93_dim_stats_single_shuffle_no_python(spark):
    # per-dimension moments: ONE hash exchange on dim with map-side partial
    # aggregation, and the whole plan stays JVM-side (no Arrow/Python eval)
    plan = plan_of(spark, "q93_embedding_dim_stats", mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "EvalPython" not in plan  # ArrowEvalPython / BatchEvalPython
    assert plan.count("HashAggregate") >= 2


def test_q94_truth_is_broadcast_bnlj_candidates_keyed(spark):
    # the O(n²) truth side must be a BroadcastNestedLoopJoin over the tiny
    # mask frame (never an un-broadcast CartesianProduct), and the LSH
    # candidate stage must remain a hash equi-join on the band key
    plan = plan_of(spark, "q94_lsh_recall", mode="simple")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Exchange hashpartitioning" in plan


def test_q95_curation_composes_keyed_stages(spark):
    # composed pipeline: digest dedup is a two-phase hash aggregate; the
    # verdict/keeper joins are keyed (broadcast or shuffled hash) — no
    # nested loop anywhere in the composition
    plan = plan_of(spark, "q95_curation_pipeline", mode="simple")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2


def test_q97_salt_reaches_join_keys(spark):
    # the salted join must key on (partkey, _salt) — a salt that gets
    # projected away before the join would silently revert to the plain
    # (skew-prone) exchange while still producing correct results
    plan = plan_of(spark, "q97_salted_join_brand_revenue", mode="simple")
    join_part = plan[plan.index("Join") if "Join" in plan else 0:]
    assert "_salt" in join_part
    assert "CartesianProduct" not in plan


def test_q98_assignment_is_map_side(spark):
    # Lloyd's assignment must be ONE map-side Arrow kernel over the
    # closure-shipped centroid matrix — no pair join, no pair shuffle.
    # The only exchange allowed is spread()'s round-robin repartition of
    # the (single-file fixture) scan.
    plan = plan_of(spark, "q98_kmeans_refine", mode="simple")
    assert "Join" not in plan
    assert "ArrowEvalPython" in plan
    # the live plan above the persisted InMemoryRelation must be
    # exchange-free (the relation's own fill shows spread()'s repartition,
    # printed twice by AQE as Initial/Final — not part of the per-round
    # work)
    live = plan.split("InMemoryRelation")[0]
    assert "Exchange" not in live


def test_q104_blocked_semantic_dedup_never_all_pairs(spark):
    # the scale rung's contract: candidate edges come from the probe-bucket
    # EQUI-join and the cosine verify joins embeddings back by id — no
    # CartesianProduct, no nested loop anywhere (q85 is the exact O(n²)
    # baseline; this plan must never degenerate into it). The full query's
    # plan ends at connected_components' driver-gate ExistingRDD at test
    # scale, so pin the pair GENERATOR's plan — the part that goes
    # quadratic if it regresses.
    import contextlib
    import io

    from binwatch_spark.operators.similarity import neardup_pairs_lsh
    from binwatch_spark.plans.dedup_queries import COSINE_NEARDUP_THRESHOLD
    from binwatch_spark.tables import load

    emb = load(spark, SF_SMALL, "embeddings")
    pairs = neardup_pairs_lsh(emb, "vec_id", "embedding", COSINE_NEARDUP_THRESHOLD)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pairs.explain("simple")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan
    # probe-bucket candidate join + two by-id verify joins, all keyed
    # equi-joins (broadcast at fixture scale, shuffled-hash at corpus
    # scale — either way a HashJoin, never a nested loop over pairs)
    assert plan.count("HashJoin") >= 3


def test_q105_cms_sketch_build_is_bounded_and_topk_is_take_ordered(spark):
    # the CMS build must be a two-phase hash aggregate on (j, cell) — the
    # partial side bounds every task at d*w rows — the sketch must reach
    # the probe join as a BROADCAST, the top-k must run as TakeOrdered
    # (never a full sort), and nothing may go nested-loop
    plan = plan_of(spark, "q105_cms_heavy_hitters", mode="simple")
    assert "TakeOrdered" in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 4  # partial+final, sketch+exact


def test_q107_incremental_dedup_is_index_shaped(spark):
    # incremental dedup must candidate through the (band_idx, band_key)
    # equi-join and verify/join by id — never a corpus×batch nested loop
    plan = plan_of(spark, "q107_incremental_dedup", mode="simple")
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "HashJoin" in plan


def test_q108_mixture_gate_is_broadcast_map_side(spark):
    # the #sources-row rate table must broadcast back; the sample gate is a
    # filter on the scan side of that broadcast join (no corpus-wide
    # sort-merge, no nested loop)
    plan = plan_of(spark, "q108_mixture_sample", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q111_embed_pipeline_single_exchange(spark):
    # chunk explode is map-side Generate; hashing is one Arrow kernel; dims,
    # bucket and norm are codegen expressions; the ONLY exchange is the
    # final small-key aggregate - no joins anywhere
    plan = plan_of(spark, "q111_embed_index_pipeline", mode="simple")
    assert "Generate" in plan
    assert "ArrowEvalPython" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_q117_ann_hard_negatives_is_bucket_equijoin(spark):
    # the semi-hard mining scale rung: probe explosion rides the broadcast
    # anchor side; the corpus join must stay a hash equi-join on bucket id
    # (q116 is the exact cross-join baseline; this plan must never
    # degenerate into it)
    plan = plan_of(spark, "q117_hard_negatives_ann", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_q120_multitable_generator_never_all_pairs(spark):
    # multi-table candidates: per-table probe-bucket equi-joins unioned
    # with first-table-collision filters — no CartesianProduct, no nested
    # loop, and a hash join per table plus the two by-id verify joins
    import contextlib
    import io

    from binwatch_spark.operators.similarity import (
        neardup_pairs_lsh_multitable,
    )
    from binwatch_spark.plans.dedup_queries import COSINE_NEARDUP_THRESHOLD
    from binwatch_spark.tables import load

    emb = load(spark, SF_SMALL, "embeddings")
    pairs = neardup_pairs_lsh_multitable(
        emb, "vec_id", "embedding", COSINE_NEARDUP_THRESHOLD
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pairs.explain("simple")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan
    assert plan.count("HashJoin") >= 5  # 3 table joins + 2 verify joins


def test_q123_pools_take_ordered_no_global_sort_on_corpus(spark):
    # both retrieval pools must reduce via TakeOrderedAndProject
    # (per-partition top-N + merge); the only nested-loop join is the
    # broadcast of the single-row query vector; the rank windows run
    # post-limit on constant-bounded pools
    plan = plan_of(spark, "q123_hybrid_retrieval", mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q124_single_shuffle_on_source(spark):
    # the running sum is one window partitioned by source: exactly one
    # exchange, hash-partitioned on the mixture axis — no global sort
    plan = plan_of(spark, "q124_token_budget_select", mode="simple")
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(source" in plan
    assert "CartesianProduct" not in plan


def test_q126_sizes_broadcast_gate_map_side(spark):
    # cluster sizes (k rows) must broadcast back; the keep gate is a
    # map-side expression — no extra corpus-sized exchange beyond q98's
    plan = plan_of(spark, "q126_cluster_balanced_sample", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q150_encode_is_codegen_projection_no_udf(spark):
    """The BPE APPLY stage must be a pure expression projection (chained
    replace literals) — no Python UDF in the corpus-wide encode path (the
    training loop's k winner-collects are the only driver round trips)."""
    plan = plan_of(spark, "q150_bpe_encode_corpus", mode="simple")
    assert "replace(" in plan  # the merge chain reached the plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # map-side partial aggregation before the per-source exchange
    assert plan.count("HashAggregate") >= 2


def test_q151_scoring_is_broadcast_bound_projection(spark):
    """Scoring is a map-side projection under three weight literals; the
    p95 bound joins back as a broadcast single row (q88/q114's shape) —
    no second scan-sized shuffle."""
    plan = plan_of(spark, "q151_quality_residual_filter")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
