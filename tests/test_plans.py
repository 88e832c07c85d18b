"""Physical-plan property tests — the 100 TB design rules asserted against
what Catalyst actually planned (README 'Design for scale').

These guard regressions: a future edit that silently turns a broadcast join
into a cartesian product, or breaks parquet pushdown, fails here long before
a benchmark would catch it.
"""

from __future__ import annotations

from pipeline_calculator_v3_spark.queries import QUERIES


def plan_of(spark, name, sf_dir):
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, "q_filter_pred", sf_dir)
    # the plan string elides long filter lists with '...' — assert pushdown
    # is non-empty and includes the quantity range start
    assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan
    assert "GreaterThanOrEqual(l_quan" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, "q_scan_project", sf_dir)
    # only the 5 referenced columns in ReadSchema — not the full 11-col table
    rs = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_quantity" not in rs and "l_shipdate" not in rs
    assert "l_extendedprice" in rs


def test_dim_joins_broadcast(spark, sf_dir):
    plan = plan_of(spark, "q_join_multi_way", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_distance_join_is_equi_join(spark, sf_dir):
    plan = plan_of(spark, "q_spatial_distance_join", sf_dir)
    # grid-bucket join must plan as a hash equi-join on the cell key with the
    # haversine as residual — NEVER a cartesian/BNL join
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = plan_of(spark, "q_sort_limit", sf_dir)
    assert "TakeOrderedAndProject" in plan


def test_semi_anti_plan_shapes(spark, sf_dir):
    assert "LeftSemi" in plan_of(spark, "q_join_left_semi", sf_dir)
    assert "LeftAnti" in plan_of(spark, "q_join_left_anti", sf_dir)


def test_geodesic_window_and_agg_share_shuffle(spark, sf_dir):
    # window partitionBy(pipeline_id) then groupBy(pipeline_id): the
    # aggregate must reuse the window's hash partitioning — exactly one
    # exchange on pipeline_id-derived keys in the whole plan
    plan = plan_of(spark, "q_geodesic_length", sf_dir)
    assert plan.count("Exchange hashpartitioning") <= 2  # pid for rownum + window


def test_segments_xl_has_no_window(spark, sf_dir):
    # the xl stress field derives its station index arithmetically from the
    # contiguous orderkeys (VERDICT r02 #9): a 64-partition row_number window
    # would funnel ~2.3 M rows/partition through single tasks at sf1
    from pipeline_calculator_v3_spark.queries_spatial import _segments_xl

    seg = _segments_xl(spark, sf_dir)
    plan = seg._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Exchange" not in plan
    # index must stay dense per pipeline (contract of the derivation)
    from pyspark.sql import functions as F

    chk = seg.groupBy("pipeline_id").agg(
        F.count("*").alias("n"), F.max("seg_index").alias("mx"),
        F.countDistinct("seg_index").alias("nd"),
    )
    bad = chk.where((F.col("mx") != F.col("n") - 1) | (F.col("nd") != F.col("n")))
    assert bad.count() == 0


def test_contamination_joins_broadcast(spark, sf_dir):
    plan = plan_of(spark, "q_contamination", sf_dir)
    # benchmark shingle set and flagged-id set both broadcast; corpus text
    # never shuffles through a sort-merge join
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sample_hash_filter_is_scan_side(spark, sf_dir):
    plan = plan_of(spark, "q_sample_hash", sf_dir)
    # the md5-threshold predicate must evaluate below the (single) aggregate
    # exchange: no join, no extra shuffle for the sampling itself
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # partial->final agg only


def test_vocab_topk_is_take_ordered(spark, sf_dir):
    plan = plan_of(spark, "q_vocab_topk", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "GlobalLimit" not in plan or "Sort" not in plan.split("GlobalLimit")[0]


def test_tpch_q4_plans_semi_join(spark, sf_dir):
    plan = plan_of(spark, "q_tpch_q4_order_priority", sf_dir)
    # EXISTS must become a semi join: orders rows never multiply
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q7_dims_broadcast(spark, sf_dir):
    plan = plan_of(spark, "q_tpch_q7_nation_volume", sf_dir)
    # supplier/customer/nation x2 all broadcast; only lineitem⋈orders may
    # shuffle
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_tpch_q14_single_pass_ratio(spark, sf_dir):
    plan = plan_of(spark, "q_tpch_q14_promo_share", sf_dir)
    # numerator and denominator in ONE aggregation over ONE scan of the
    # filtered lineitem — a second scan would double the 100 TB read
    assert plan.count("FileScan parquet") == 2  # lineitem + part, once each
    assert plan.count("BroadcastHashJoin") == 1


def test_tpch_q18_semi_then_broadcast(spark, sf_dir):
    plan = plan_of(spark, "q_tpch_q18_large_orders", sf_dir)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_range_binned_join_is_equi(spark, sf_dir):
    plan = plan_of(spark, "q_join_range_binned", sf_dir)
    # the whole point: a pure interval join planned WITHOUT nested-loop
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cdc_upsert_single_shuffle(spark, sf_dir):
    plan = plan_of(spark, "q_cdc_upsert", sf_dir)
    # union + window + final rollup: the merge itself costs ONE key shuffle
    assert plan.count("Exchange hashpartitioning") <= 2  # key window + rollup


def test_pack_sequences_shuffle_excludes_text(spark, sf_dir):
    # the packing claim: only (doc_id, shard, ntok) enter the per-shard
    # window exchange — the text column must be projected away BELOW it
    plan = plan_of(spark, "q_pack_sequences", sf_dir)
    exchange_lines = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert exchange_lines, plan
    assert all("text" not in l for l in exchange_lines)
    assert "text" not in plan.split("Exchange", 1)[0], (
        "text column visible above the first exchange"
    )


def test_snapshot_diff_full_outer_with_pushdown(spark, sf_dir):
    plan = plan_of(spark, "q_snapshot_diff", sf_dir)
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # both snapshot date cuts reach the parquet scan
    assert plan.count("LessThan(o_orderdate") >= 2


def test_table_checksum_single_exchange(spark, sf_dir):
    plan = plan_of(spark, "q_table_checksum", sf_dir)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan


def test_tpch_q16_anti_before_distinct(spark, sf_dir):
    plan = plan_of(spark, "q_tpch_q16_supplier_cnt", sf_dir)
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_window_time_range_single_exchange(spark, sf_dir):
    # RANGE frame per user: one hash exchange on user_id feeds sort+window
    plan = plan_of(spark, "q_window_time_range", sf_dir)
    assert plan.count("Exchange hashpartitioning") == 1


def test_scd2_single_exchange_serves_both_windows(spark, sf_dir):
    # lag -> filter -> lead all key on user_id: exactly one exchange
    plan = plan_of(spark, "q_scd2_history", sf_dir)
    assert plan.count("Exchange hashpartitioning") == 1


def test_funnel_stages_never_cartesian_on_data(spark, sf_dir):
    # the only nested-loop joins are the single-row count cross-joins;
    # every data-bearing join is keyed on user_id
    plan = plan_of(spark, "q_funnel_conversion", sf_dir)
    assert "CartesianProduct" not in plan


def test_gopher_rules_is_scan_side(spark, sf_dir):
    # the whole rule set is a projection: no joins, no shuffles — one
    # linear pass over text bytes (the q_quality_classifier shape)
    plan = plan_of(spark, "q_gopher_rules", sf_dir)
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_embed_project_is_scan_side(spark, sf_dir):
    # literal plane weights fold into the projection: no per-row hashing
    # join, no shuffle — a pure map over the corpus
    plan = plan_of(spark, "q_embed_project", sf_dir)
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_zorder_layout_single_agg_exchange(spark, sf_dir):
    # Morton key is scan-side bit arithmetic; the only exchange pair is
    # the partial->final tile aggregate (bounded key domain)
    plan = plan_of(spark, "q_zorder_layout", sf_dir)
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2


def test_gap_fill_one_exchange_family(spark, sf_dir):
    # bucket agg, span agg, grid join and the LOCF window all key on
    # user_id(+bucket): no broadcast of the big side, no global sort
    plan = plan_of(spark, "q_gap_fill", sf_dir)
    assert "CartesianProduct" not in plan
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert all("user_id" in ln for ln in exchanges), plan


def test_spatial_rollups_reuse_the_persisted_pair_join(spark, sf_dir):
    # r08: the mirror/explode unions read the distance self-join twice —
    # both branches must hit ONE persisted materialization, not re-run
    # the grid join + haversine recheck per branch
    for name in ("q_effective_length", "q_overlap_rollup", "q_overlap_summary"):
        plan = plan_of(spark, name, sf_dir)
        assert plan.count("InMemoryTableScan") >= 2, (name, plan)
        from pipeline_calculator_v3_spark import release_caches

        release_caches(spark)
