"""Plan-property regression tests: the scale contract.

Each test pins a physical-plan property that the 100 TB design relies
on. If Catalyst stops pushing a filter, prunes fewer columns, or
demotes a broadcast join, these fail long before a cluster does.
"""

from __future__ import annotations

from go_http_data_pipeline_spark.plans.inspect import (
    codegen_stage_count,
    exchange_count,
    join_strategies,
    plan_str,
    pushed_filters,
    read_schemas,
)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    from pyspark.sql import functions as F

    from go_http_data_pipeline_spark.catalog import table

    df = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    assert any("o_orderpriority" in f for f in pushed_filters(df))


def test_projection_prunes_scan_columns(spark, sf_dir):
    from go_http_data_pipeline_spark.catalog import table

    df = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    schemas = read_schemas(df)
    assert schemas, "no ReadSchema in plan"
    # The parquet scan must read exactly the two projected columns.
    assert all(
        "l_orderkey" in s and "l_quantity" in s and "l_extendedprice" not in s
        for s in schemas
    )


def test_revenue_by_nation_broadcasts_dims(spark, sf_dir):
    from go_http_data_pipeline_spark.operators.joins import revenue_by_nation

    strategies = join_strategies(revenue_by_nation(spark, sf_dir))
    # Dimension joins (nation, region, customer-side chain) broadcast;
    # no cartesian products anywhere.
    assert "BroadcastHashJoin" in strategies
    assert "CartesianProduct" not in strategies


def test_q1_single_wide_shuffle(spark, sf_dir):
    from go_http_data_pipeline_spark.operators.aggregates import (
        q1_pricing_summary,
    )

    df = q1_pricing_summary(spark, sf_dir)
    # Partial+final hash agg -> exactly one hash exchange (plus an
    # optional range exchange for the final sort).
    assert exchange_count(df) <= 2
    assert codegen_stage_count(df) >= 1


def test_market_share_no_cartesian_all_dims_broadcast(spark, sf_dir):
    from go_http_data_pipeline_spark.operators.analytics import (
        market_share_evolution,
    )

    df = market_share_evolution(spark, sf_dir)
    strategies = join_strategies(df)
    assert "CartesianProduct" not in strategies
    assert strategies.count("BroadcastHashJoin") >= 4


def test_exact_dedup_partial_aggregation(spark, sf_dir):
    from go_http_data_pipeline_spark.llm.dedup import dedup_exact

    plan = plan_str(dedup_exact(spark, sf_dir))
    # Two HashAggregate nodes (partial + final) around one exchange:
    # map-side combine before the shuffle.
    assert plan.count("HashAggregate") >= 2
    assert exchange_count(dedup_exact(spark, sf_dir)) == 1


def test_disjunctive_predicate_pushes_into_part_scan(spark, sf_dir):
    from go_http_data_pipeline_spark.operators.analytics2 import (
        disjunctive_brand_revenue,
    )

    df = disjunctive_brand_revenue(spark, sf_dir)
    strategies = join_strategies(df)
    # One broadcast equi-join on partkey — not a union of three scans,
    # not a nested loop.
    assert "BroadcastHashJoin" in strategies
    assert "CartesianProduct" not in strategies
    # The brand/size legs of the OR reach the part scan as pushed
    # filters (Or(...) over p_brand/p_size).
    assert any("Or" in f and "p_brand" in f for f in pushed_filters(df))


def test_volume_shipping_dims_broadcast(spark, sf_dir):
    from go_http_data_pipeline_spark.operators.analytics2 import volume_shipping

    strategies = join_strategies(volume_shipping(spark, sf_dir))
    assert "CartesianProduct" not in strategies
    assert strategies.count("BroadcastHashJoin") >= 3


def test_global_scalar_threshold_is_broadcast_not_recompute(spark, sf_dir):
    from go_http_data_pipeline_spark.operators.analytics2 import (
        important_parts_value,
    )

    df = important_parts_value(spark, sf_dir)
    plan = plan_str(df)
    strategies = join_strategies(df)
    # The 1-row global total joins via broadcast nested loop (fine for
    # 1 row), never a CartesianProduct repartitioned across the fleet.
    assert "CartesianProduct" not in strategies
    # lineitem is scanned for per-part AND total aggregates; both are
    # partial+final hash aggs (map-side combine before each shuffle).
    assert plan.count("HashAggregate") >= 4


def test_exists_compiles_to_semi_join(spark, sf_dir):
    from go_http_data_pipeline_spark.operators.analytics3 import (
        late_order_priority,
    )

    df = late_order_priority(spark, sf_dir)
    plan = plan_str(df)
    strategies = join_strategies(df)
    # Q4's EXISTS must be a single semi join (equi on orderkey, the
    # lateness comparison as residual) — never a per-order subquery,
    # never an inner-join-then-distinct.
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in strategies
    # The date-range filter reaches the orders scan.
    assert any("o_orderdate" in f for f in pushed_filters(df))


def test_not_in_compiles_to_broadcast_anti_join(spark, sf_dir):
    from go_http_data_pipeline_spark.operators.analytics3 import (
        supplier_count_by_part,
    )

    df = supplier_count_by_part(spark, sf_dir)
    plan = plan_str(df)
    strategies = join_strategies(df)
    assert "LeftAnti" in plan
    # Both the exclusion set and the filtered part dim broadcast: the
    # fact table never shuffles before the final distinct agg.
    assert strategies.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in strategies


def test_lone_late_supplier_one_fact_fact_shuffle(spark, sf_dir):
    from go_http_data_pipeline_spark.operators.analytics3 import (
        lone_late_supplier,
    )

    df = lone_late_supplier(spark, sf_dir)
    strategies = join_strategies(df)
    # The double-correlated EXISTS/NOT EXISTS pair must not introduce
    # cartesian products or nested-loop joins; supplier broadcasts.
    assert "CartesianProduct" not in strategies
    assert "BroadcastHashJoin" in strategies
    # One orderkey hash exchange feeds groupBy AND window (subset
    # clustering), plus the final supplier agg — never a third
    # shuffle of the collapsed set.
    assert exchange_count(df) <= 2


def test_correlated_min_rewrite_single_lineitem_pass(spark, sf_dir):
    from go_http_data_pipeline_spark.operators.analytics2 import (
        min_price_supplier_per_part,
    )

    df = min_price_supplier_per_part(spark, sf_dir)
    plan = plan_str(df)
    strategies = join_strategies(df)
    # Q2's correlated MIN subquery must compile to ONE lineitem scan
    # feeding agg + window — not one subquery execution per part.
    # ("formatted" prints each node twice: tree line + detail header,
    # so 5 real scans — lineitem, the part-keys semi-join side, and
    # 3 broadcast dims — count as 10.)
    assert plan.count("Scan parquet") <= 10
    assert "CartesianProduct" not in strategies
    assert strategies.count("BroadcastHashJoin") >= 3
    # The part predicate reaches below the aggregation as a semi-join.
    assert "LeftSemi" in plan


def test_stats_moments_single_shuffle(spark, sf_dir):
    from go_http_data_pipeline_spark.operators.aggregates import (
        stats_moments_profile,
    )

    df = stats_moments_profile(spark, sf_dir)
    # One partial+final hash agg; the moment derivation is projection.
    assert exchange_count(df) <= 1
    assert codegen_stage_count(df) >= 1


def test_cleaning_ops_have_no_shuffle(spark, sf_dir):
    from go_http_data_pipeline_spark.llm.cleaning import (
        pii_redaction,
        stopword_stripped_docs,
    )

    assert exchange_count(pii_redaction(spark, sf_dir)) == 0
    assert exchange_count(stopword_stripped_docs(spark, sf_dir)) == 0


def test_stratified_sample_broadcasts_counts(spark, sf_dir):
    from go_http_data_pipeline_spark.llm.sampling import (
        stratified_sample_per_lang,
    )

    df = stratified_sample_per_lang(spark, sf_dir)
    strategies = join_strategies(df)
    # stratum counts join the corpus as a broadcast, never a shuffle
    # of the documents themselves
    assert "BroadcastHashJoin" in strategies
    assert "SortMergeJoin" not in strategies


def test_kmeans_estep_is_pure_projection(spark, sf_dir):
    from go_http_data_pipeline_spark.llm.clustering import (
        _best_expr,
        _cent_literal,
        _quantized,
    )
    from pyspark.sql import functions as F

    vecs = _quantized(spark, sf_dir)
    cents = [
        (r["vec_id"], r["q"]) for r in vecs.filter(F.col("vec_id") < 2).collect()
    ]
    assign = vecs.select(
        "vec_id", F.expr(f"{_best_expr(_cent_literal(cents))}.cid").alias("cid")
    )
    # centroid literals fold into codegen: no join, no exchange beyond
    # the cached table's own layout
    plan = plan_str(assign)
    assert "Join" not in plan


def test_embedding_neardup_is_blocked_cogroup_no_collect(spark, sf_dir):
    from go_http_data_pipeline_spark.llm import similarity
    from go_http_data_pipeline_spark.llm.similarity import (
        embedding_neardup_pairs,
    )

    df = embedding_neardup_pairs(spark, sf_dir)
    plan = plan_str(df)
    # The exact all-pairs verify runs as a blocked cogroup: every task
    # holds two corpus blocks, nothing is collected to the driver.
    assert "FlatMapCoGroupsInPandas" in plan
    # No driver-side corpus materialization helper exists anymore.
    assert not hasattr(similarity, "_corpus_broadcast")


def test_ngram_jaccard_df_cap_before_self_join(spark, sf_dir):
    from go_http_data_pipeline_spark.llm.dedup import (
        DF_CAP,
        ngram_jaccard_pairs,
    )

    df = ngram_jaccard_pairs(spark, sf_dir)
    plan = plan_str(df)
    strategies = join_strategies(df)
    # The hot-shingle cap is a semi-join of the shingle table against
    # the df<=cap keys — it must appear below the pair-building join.
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in strategies
    assert DF_CAP >= 1


def test_contamination_probe_broadcasts_benchmark(spark, sf_dir):
    from go_http_data_pipeline_spark.llm.decontam import (
        benchmark_contamination,
    )

    df = benchmark_contamination(spark, sf_dir)
    strategies = join_strategies(df)
    # The benchmark gram set broadcasts; the corpus side must never
    # shuffle for the probe (only surviving candidates aggregate).
    assert "BroadcastHashJoin" in strategies
    assert "CartesianProduct" not in strategies
    assert "SortMergeJoin" not in strategies


def test_repetition_scores_zero_shuffle(spark, sf_dir):
    from go_http_data_pipeline_spark.llm.decontam import repetition_scores

    assert exchange_count(repetition_scores(spark, sf_dir)) == 0


def test_bucketed_join_is_exchange_free(spark, sf_dir):
    from go_http_data_pipeline_spark.operators.storage import (
        bucketed_join,
        bucketed_priority_revenue,
    )

    join_df = bucketed_join(spark, sf_dir)
    # Both sides arrive hash-distributed by orderkey from the bucketed
    # scan: a sort-merge join with ZERO shuffle exchanges under it.
    assert "SortMergeJoin" in join_strategies(join_df)
    assert exchange_count(join_df) == 0
    # The full query's only shuffle is the final 5-group aggregation.
    assert exchange_count(bucketed_priority_revenue(spark, sf_dir)) <= 1


def test_partitioned_scan_prunes_by_date(spark, sf_dir):
    from go_http_data_pipeline_spark.operators.storage import (
        partition_pruned_scan,
    )

    df = partition_pruned_scan(spark, sf_dir)
    plan = plan_str(df)
    # The date range lands in PartitionFilters (directory pruning at
    # planning time), not as a post-scan filter over every file.
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1)


def test_watermark_late_audit_two_exchanges_no_global_sort(spark, sf_dir):
    """The late-data audit must stay parallel: one hash exchange for
    the per-shard frontier window, one for the final groupBy — and no
    single-partition global sort (the reason arrival order is modeled
    per ingest shard)."""
    from go_http_data_pipeline_spark.operators.time_windows import (
        watermark_late_audit,
    )

    df = watermark_late_audit(spark, sf_dir)
    assert exchange_count(df) == 2
    plan = plan_str(df)
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan  # no global ORDER BY


def test_multiprobe_ann_broadcast_probe_no_cartesian(spark, sf_dir):
    """Multi-probe ANN keeps the single-probe plan shape: exploded
    (qid, probe_bucket) side broadcast, corpus probed by bucket
    equi-join, top-1 via the partial-combining min(struct) aggregate —
    never a cartesian / nested-loop pairing. (Pin updated in round 16:
    the previous WindowGroupLimit form only CAPPED candidate rows per
    partition before the per-qid sort exchange; the aggregate combines
    them to <= |queries| partial rows — strictly less shuffled.)"""
    from go_http_data_pipeline_spark.llm.similarity import (
        ann_lsh_multiprobe_top1,
    )

    df = ann_lsh_multiprobe_top1(spark, sf_dir)
    strategies = join_strategies(df)
    assert "BroadcastHashJoin" in strategies
    assert "CartesianProduct" not in strategies
    assert "BroadcastNestedLoopJoin" not in strategies
    plan = plan_str(df)
    # Top-1 is a map-side-combining aggregate now, not a window sort.
    assert "Window" not in plan  # covers WindowGroupLimit too
    assert "partial_min" in plan or "min(" in plan


def test_source_mixture_weights_single_corpus_pass(spark, sf_dir):
    """The corpus is aggregated exactly once; total + normalizer are
    windows over the sources-sized table, not scalar-subquery cross
    joins that would rescan the corpus per branch."""
    from go_http_data_pipeline_spark.llm.sampling import (
        source_mixture_weights,
    )

    df = source_mixture_weights(spark, sf_dir)
    # simple mode prints each physical node once (formatted repeats
    # scans in the details section).
    assert plan_str(df, "simple").count("Scan parquet") == 1
    assert exchange_count(df) <= 3


def test_semantic_dedup_no_cartesian_assignment_inline(spark, sf_dir):
    """SemDeDup's candidate generation is an intra-cluster equi-join
    on cid — never a cartesian/nested-loop all-pairs — and the
    centroid assignment is folded into codegen (no join producing
    cid). The verdict aggregation joins pairs back by vec_id only."""
    from go_http_data_pipeline_spark.llm.semdedup import (
        semantic_dedup_verdicts,
    )

    df = semantic_dedup_verdicts(spark, sf_dir)
    strategies = join_strategies(df)
    assert "CartesianProduct" not in strategies
    assert "BroadcastNestedLoopJoin" not in strategies


def test_token_rarity_vocab_join_has_no_broadcast_hint(spark, sf_dir):
    """The token->vocabulary enrichment must not carry a broadcast
    HINT: a web-scale vocabulary is NOT broadcast-sized (the
    benchmark_contamination lesson). Catalyst may still auto-
    broadcast a small vocab from stats — that is the desired
    adaptive behavior — so the contract is pinned by disabling
    auto-broadcast: the term join must degrade to a shuffle join,
    while the explicitly-hinted 1-row totals join stays broadcast."""
    from go_http_data_pipeline_spark.llm.textstats import token_rarity_scores

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # simple mode prints each physical node once (formatted
        # repeats nodes in the details section).
        plan = plan_str(token_rarity_scores(spark, sf_dir), "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert plan.count("BroadcastExchange") == 1  # the hinted totals row


def test_trending_windows_rank_over_small_aggregate(spark, sf_dir):
    """Both window functions (rank per window, lag per type) run over
    the windowed-count AGGREGATE — corpus-size-independent — and the
    top-N filter after row_number is pushed as WindowGroupLimit."""
    from go_http_data_pipeline_spark.operators.time_windows import (
        trending_event_types,
    )

    df = trending_event_types(spark, sf_dir)
    plan = plan_str(df)
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in join_strategies(df)


def test_funnel_single_scan_one_user_partitioning(spark, sf_dir):
    """The funnel reads events ONCE and chains its three stage-mins
    over the same user_id hash partitioning — no per-stage rescans,
    no correlated-subquery joins."""
    from go_http_data_pipeline_spark.operators.eventflow import (
        funnel_view_click_purchase,
    )

    df = funnel_view_click_purchase(spark, sf_dir)
    plan = plan_str(df, "simple")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert exchange_count(df) == 1  # one hash partition by user_id


def test_retention_collapses_stream_before_joins(spark, sf_dir):
    """Retention's only event-stream-sized op is the first DISTINCT
    (user, week) aggregate; the cohort join and every later step run
    on the collapsed table."""
    from go_http_data_pipeline_spark.operators.eventflow import (
        retention_cohorts,
    )

    df = retention_cohorts(spark, sf_dir)
    plan = plan_str(df, "simple")
    assert "CartesianProduct" not in join_strategies(df)
    # the raw scan feeds exactly one aggregate before any join
    assert plan.count("Scan parquet") <= 2  # Catalyst may share or split the scan


def test_error_burst_single_exchange_shared_windows(spark, sf_dir):
    """Both row_number windows (all events, errors only) share ONE
    user_id hash partitioning, and the run aggregate adds at most one
    more exchange — the islands idiom must not re-shuffle per window."""
    from go_http_data_pipeline_spark.operators.eventflow import (
        error_burst_runs,
    )

    df = error_burst_runs(spark, sf_dir)
    assert exchange_count(df) <= 2
    assert "Join" not in plan_str(df, "simple")


def test_sketch_eval_is_one_pass_per_table(spark, sf_dir):
    """Each accuracy branch computes exact + approx distinct in ONE
    aggregation pass over its table (partial+final, mergeable HLL
    registers) — no per-metric rescans."""
    from go_http_data_pipeline_spark.operators.aggregates import (
        sketch_accuracy_eval,
    )

    df = sketch_accuracy_eval(spark, sf_dir)
    plan = plan_str(df, "simple")
    assert plan.count("Scan parquet") == 4  # one per table branch
    assert "CartesianProduct" not in join_strategies(df)


def test_split_assignment_zero_shuffle(spark, sf_dir):
    """Split assignment is pure per-row codegen: no exchange, no join
    — the property that makes it reproducible as the corpus grows."""
    from go_http_data_pipeline_spark.llm.sharding import (
        dataset_split_assignment,
    )

    df = dataset_split_assignment(spark, sf_dir)
    assert exchange_count(df) == 0
    assert "Join" not in plan_str(df, "simple")


def test_shard_manifest_single_bounded_aggregate(spark, sf_dir):
    """The manifest is one partial+final aggregate over N_SHARDS
    groups — the shuffle carries at most N_SHARDS rows per task."""
    from go_http_data_pipeline_spark.llm.sharding import (
        training_shard_manifest,
    )

    df = training_shard_manifest(spark, sf_dir)
    assert exchange_count(df) == 1
    assert plan_str(df).count("HashAggregate") >= 2  # partial + final


def test_budget_selection_no_corpus_global_sort(spark, sf_dir):
    """The budget cutoff must never sort the whole corpus in one
    partition: the only unpartitioned window runs on the 256-row
    bucket aggregate; the corpus-side running sum is partitioned by
    bucket. Both small-table joins broadcast."""
    from go_http_data_pipeline_spark.llm.sharding import (
        token_budget_selection,
    )

    df = token_budget_selection(spark, sf_dir)
    plan = plan_str(df, "simple")
    strategies = join_strategies(df)
    assert "CartesianProduct" not in strategies
    # corpus side: the within-bucket window is hash-partitioned; the
    # single-partition exchange exists only below the bucket-prefix
    # window, which consumes a HashAggregate (256 rows), not a scan.
    assert "hashpartitioning(bucket" in plan
    assert plan.count("Scan parquet") == 2  # bucket sums + join side


def test_bpe_pairs_two_bounded_aggregates(spark, sf_dir):
    """BPE pair counting runs over the VOCABULARY, not the token
    stream: two partial+final aggregates (term counts, pair sums) and
    a WindowGroupLimit top-k over the charset²-bounded pair table."""
    from go_http_data_pipeline_spark.llm.textstats import bpe_pair_counts

    df = bpe_pair_counts(spark, sf_dir)
    plan = plan_str(df)
    assert plan.count("HashAggregate") >= 4  # 2x (partial+final)
    # Catalyst compiles the global row_number<=k filter down to
    # TakeOrderedAndProject — per-partition top-k then a k-row merge
    # (strictly better than a WindowGroupLimit over a full sort).
    assert "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan
    assert "Join" not in plan_str(df, "simple")


def test_zorder_pair_no_global_fact_sort(spark, sf_dir):
    """The z-order rewrite's scale contract: equal-frequency buckets
    come from broadcast-joined control-plane histograms, so NO
    single-partition exchange consumes raw scan rows (the old exact
    ``ntile`` formulation sorted the whole fact table in one task —
    VERDICT r4 item 2), and the cell->bucket maps broadcast."""
    from go_http_data_pipeline_spark.operators.storage import (
        layout_skipping_eval,
        zorder_file_stats,
    )
    from go_http_data_pipeline_spark.plans.inspect import (
        unaggregated_global_sorts,
    )

    for fn in (zorder_file_stats, layout_skipping_eval):
        df = fn(spark, sf_dir)
        assert unaggregated_global_sorts(df) == []
        assert "BroadcastHashJoin" in join_strategies(df)


def test_rolling_wau_is_explosion_not_nested_loop(spark, sf_dir):
    """Pair-explosion WAU: a fixed 7x fan-out plus one aggregate —
    no BroadcastNestedLoopJoin against the day grid (O(days x pairs)
    in the old range-join form), and the grid filter is a broadcast
    semi-join."""
    from go_http_data_pipeline_spark.operators.time_windows import (
        rolling_7day_active_users,
    )

    df = rolling_7day_active_users(spark, sf_dir)
    strategies = join_strategies(df)
    assert "BroadcastNestedLoopJoin" not in strategies
    assert "CartesianProduct" not in strategies
    assert "BroadcastHashJoin" in strategies
    plan = plan_str(df, "simple")
    assert "Explode" in plan or "Generate" in plan


# Queries whose BroadcastNestedLoopJoin over raw scan rows is the
# DOCUMENTED physical strategy: the ANN/top-k family broadcasts the
# QUERY-VECTOR side, a scan bounded to 10 rows by a literal pushed
# filter (vec_id < 10) rather than by an aggregate — genuinely small,
# just invisible to the aggregate-on-path rule. Everything else must
# stay out of this list.
_BNLJ_ALLOWED: frozenset = frozenset(
    {
        "cosine_topk",
        "ivf_ann_top1",
        # unions every ANN family's probe plus the brute-force
        # baseline, so it inherits all of their documented bounded
        # broadcasts (10-row query scans, 16-row centroid scans —
        # each bounded by a literal pushed filter). The retired
        # standalone rows it folds (ann_recall_eval,
        # ann_multiprobe_recall_eval, pq_recall_eval, ivf_ann_nprobe2,
        # ann_lsh_multiprobe_top1) were on this list for the same
        # reason. The r13 explicit-miss swap adds one more bounded
        # BNLJ: the (family x qid) grid cross join, |families| rows x
        # a broadcast of the 10-row ``vec_id < N_QUERIES`` embeddings
        # scan (a pushed parquet filter — deliberately NOT a re-execution
        # of the brute top-k lineage; see llm/recall.py).
        "ann_family_recall_eval",
        # cell assignment crossJoins the broadcast 16-row centroid
        # scan (bounded by the literal vec_id < 496 pushed filter) —
        # the same documented strategy as ivf_ann_top1's
        "ivf_pq_ann_top1",
        # the per-query LUT broadcast row set embeds the 10-row query
        # scan (bounded by the literal vec_id < 10 pushed filter) —
        # the corpus side is never under the broadcast
        "pq_ann_top1_wide",
    }
)


def test_no_registry_query_global_sorts_a_fact_scan(spark, sf_dir):
    """Registry-wide scale sweep (generalizes the z-order fix), three
    contracts over every registered batch query's physical plan:

    1. no raw parquet-scan rows through a single-partition exchange
       (control-plane global windows over Aggregate outputs are the
       allowed exception — the aggregate-on-path rule
       ``unaggregated_global_sorts`` encodes);
    2. no CartesianProduct anywhere;
    3. no BroadcastNestedLoopJoin whose broadcast side is raw
       (un-aggregated) scan rows, outside the documented allowlist.
    """
    from go_http_data_pipeline_spark import registry
    from go_http_data_pipeline_spark.plans.inspect import (
        unaggregated_global_sorts,
        unbounded_nested_loops,
    )

    # Streaming-backed twins execute real micro-batch streams on
    # construction; their batch plans are covered by their own tests.
    skip = {
        name
        for name in registry.all_queries()
        if name.startswith("streaming_")
        or name in ("stateful_session_ttl", "stateful_user_profiles")
    }
    bad: dict[str, list[str]] = {}
    for name, fn in registry.all_queries().items():
        if name in skip:
            continue
        df = fn(spark, sf_dir)
        offenders = unaggregated_global_sorts(df)
        if "CartesianProduct" in plan_str(df, "simple"):
            offenders.append("CartesianProduct")
        if name not in _BNLJ_ALLOWED:
            offenders.extend(unbounded_nested_loops(df))
        if offenders:
            bad[name] = offenders
    assert bad == {}, f"scale-contract violations: {bad}"


def test_no_forced_broadcast_of_sf_scaled_tables(spark, sf_dir):
    """Registry-wide: no query carries a forced ``F.broadcast()`` hint
    whose subtree is raw SF-scaled base-table rows (supplier/part/
    customer/orders/lineitem/events — VERDICT r5 item 1). An explicit
    hint can never be demoted by AQE, so at 100 TB it forces an OOM
    where the unhinted plan would shuffle-join. Derived sides
    (aggregates, 1-row scalars, ranked winner sets) stay hintable —
    the aggregate-on-path rule allows them."""
    from go_http_data_pipeline_spark import registry
    from go_http_data_pipeline_spark.plans.inspect import (
        hinted_sf_scaled_broadcasts,
    )

    skip = {
        name
        for name in registry.all_queries()
        if name.startswith("streaming_")
        or name in ("stateful_session_ttl", "stateful_user_profiles")
    }
    bad: dict[str, list[str]] = {}
    for name, fn in registry.all_queries().items():
        if name in skip:
            continue
        offenders = hinted_sf_scaled_broadcasts(fn(spark, sf_dir))
        if offenders:
            bad[name] = offenders
    assert bad == {}, f"forced SF-scaled broadcast hints: {bad}"


def test_unhinted_dim_joins_still_autobroadcast_at_test_scale(spark, sf_dir):
    """The de-hinting is plan-neutral at test scale: AQE/CBO still
    auto-broadcasts the (small here) supplier/part sides in the ten
    queries whose explicit hints were removed, so local latency and
    bench numbers are unchanged — the hint was pure downside."""
    from go_http_data_pipeline_spark.operators.analytics import (
        market_share_evolution,
        top_supplier,
    )
    from go_http_data_pipeline_spark.operators.analytics2 import (
        min_price_supplier_per_part,
        nation_profit_by_year,
        volume_shipping,
    )
    from go_http_data_pipeline_spark.operators.analytics3 import (
        lone_late_supplier,
        supplier_count_by_part,
    )
    from go_http_data_pipeline_spark.operators.joins import (
        local_supplier_revenue,
    )

    for fn in (
        market_share_evolution,
        top_supplier,
        min_price_supplier_per_part,
        volume_shipping,
        nation_profit_by_year,
        supplier_count_by_part,
        lone_late_supplier,
        local_supplier_revenue,
    ):
        df = fn(spark, sf_dir)
        df.collect()  # finalize the adaptive plan
        strategies = join_strategies(df)
        assert "BroadcastHashJoin" in strategies, fn.__name__
        assert "CartesianProduct" not in strategies, fn.__name__


# --- pure-string unit tests for the tree-walk helpers ----------------------
# The registry sweep exercises these on live plans; these pin the
# parser itself on hand-built simple-mode plan text, so a behavior
# change in the walker (not in any query) fails with a readable diff.


def test_node_depths_ignores_tree_glyphs():
    from go_http_data_pipeline_spark.plans.inspect import _node_depths

    lines = [
        "*(3) Sort [x ASC NULLS FIRST], true, 0",
        "+- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=5]",
        "   +- *(2) Window [ntile(8)]",
        "   :- *(1) ColumnarToRow",
        "      +- Scan parquet [o_custkey]",
    ]
    # Depth = column of the node name: glyphs (+- : spaces) skipped,
    # the *(N) codegen marker counts as the node start.
    assert _node_depths(lines) == [0, 3, 6, 6, 9]


def _walk(lines, root):
    from go_http_data_pipeline_spark.plans.inspect import (
        _node_depths,
        _scan_lines_without_aggregate_ancestor,
    )

    return _scan_lines_without_aggregate_ancestor(
        lines, _node_depths(lines), root
    )


def test_scan_under_single_partition_without_aggregate_is_flagged():
    lines = [
        "+- Exchange SinglePartition, ENSURE_REQUIREMENTS",
        "   +- *(2) Window [ntile(8) windowspecdefinition(...)]",
        "      +- *(1) ColumnarToRow",
        "         +- Scan parquet [o_custkey,o_orderdate]",
    ]
    assert _walk(lines, 0) == ["+- Scan parquet [o_custkey,o_orderdate]"]


def test_scan_bounded_by_aggregate_is_allowed():
    lines = [
        "+- Exchange SinglePartition, ENSURE_REQUIREMENTS",
        "   +- *(3) Window [sum(c)]",
        "      +- *(2) HashAggregate(keys=[cx], functions=[count(1)])",
        "         +- Exchange hashpartitioning(cx, 32)",
        "            +- *(1) HashAggregate(keys=[cx], functions=[partial_count(1)])",
        "               +- Scan parquet [o_custkey]",
    ]
    assert _walk(lines, 0) == []


def test_scan_behind_cache_printout_is_skipped():
    # An InMemoryRelation's child plan is the cached intermediate's
    # build recipe (executed once at materialization), not work this
    # query performs — its scans must not be charged to the query.
    lines = [
        "+- Exchange SinglePartition, ENSURE_REQUIREMENTS",
        "   +- Window [row_number()]",
        "      +- InMemoryTableScan [sh_h]",
        "            +- InMemoryRelation [sh_h], StorageLevel(...)",
        "                  +- Scan parquet [doc_id,text]",
    ]
    assert _walk(lines, 0) == []


def test_sibling_subtree_outside_root_is_not_walked():
    # The scan lives in a SIBLING of the exchange (depth pops back to
    # the root's level before the scan) — nothing inside root's
    # subtree, so nothing flagged.
    lines = [
        "+- BroadcastHashJoin [k], [k], Inner, BuildRight",
        "   :- Exchange SinglePartition, ENSURE_REQUIREMENTS",
        "   :  +- HashAggregate(keys=[], functions=[count(1)])",
        "   +- Scan parquet [k,v]",
    ]
    assert _walk(lines, 1) == []


def test_join_strategies_for_key_isolates_one_join(spark, sf_dir):
    """The scaling study's demotion check inspects the SUPPLIER join
    node specifically; pin that the helper finds exactly that join
    (by its s_suppkey key) in a multi-join plan, and that at test
    scale it is the auto-broadcast AQE picks."""
    import __spark_entry__ as e

    from go_http_data_pipeline_spark.plans.inspect import (
        join_strategies,
        join_strategies_for_key,
    )

    df = e.queries()["volume_shipping"](spark, sf_dir)
    df.count()  # finalize the adaptive plan
    sup = join_strategies_for_key(df, "s_suppkey")
    assert sup == ["BroadcastHashJoin"]
    # The helper is a strict subset of the whole-plan listing.
    assert len(sup) < len(join_strategies(df))
    # A key that appears in no join condition matches nothing.
    assert join_strategies_for_key(df, "no_such_key_anywhere") == []


def test_contiguous_global_ids_no_single_partition_sort(spark, sf_dir):
    """The naive ``row_number() OVER (ORDER BY key)`` funnels the
    whole table through ONE task (Exchange SinglePartition — asserted
    present on that shape as the control); the two-phase assignment
    must instead sort in parallel ranges with no single-partition
    exchange anywhere, while producing the identical contiguous ids.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from go_http_data_pipeline_spark.catalog import table
    from go_http_data_pipeline_spark.llm.sharding import (
        assign_contiguous_ids,
    )

    naive = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (
            F.row_number().over(Window.orderBy("o_orderkey")) - 1
        ).alias("gid"),
    )
    assert "Exchange SinglePartition" in plan_str(naive, "simple")

    out, src = assign_contiguous_ids(
        spark, table(spark, sf_dir, "orders"), "o_orderkey"
    )
    try:
        assert "SinglePartition" not in plan_str(out, "simple")
        got = sorted(map(tuple, out.collect()))
    finally:
        src.unpersist()
    want = sorted(map(tuple, naive.collect()))
    assert got == want


def test_host_cap_shuffles_only_capped_rows(spark, sf_dir):
    """The per-host cap's scale contract, both halves of the folded
    query (round 10 moved the audit columns onto the kept rows): the
    rank filter is pushed below the shuffle as a PARTIAL
    WindowGroupLimit (each map task keeps <= HOST_CAP rows per host
    before the exchange, so the shuffle carries capped rows, not the
    corpus) with the FINAL limit above it; and the audit side stays
    windowless — one partial-aggregated groupBy, kept =
    min(count, cap) computed from counts alone, so the fold adds NO
    second window over the corpus."""
    import re

    from go_http_data_pipeline_spark.llm.sampling import host_document_caps

    plan = plan_str(host_document_caps(spark, sf_dir), "simple")
    lines = plan.splitlines()
    partials = [
        i
        for i, l in enumerate(lines)
        if "WindowGroupLimit" in l and "Partial" in l
    ]
    finals = [
        i
        for i, l in enumerate(lines)
        if "WindowGroupLimit" in l and "Final" in l
    ]
    # Exactly one window-limited branch (the kept side); Final prints
    # above Partial with the hash exchange between them — the shuffle
    # reads a WindowGroupLimit output, never the raw scan.
    assert len(partials) == 1 and len(finals) == 1, plan
    assert finals[0] < partials[0], plan
    assert any(
        "Exchange hashpartitioning" in lines[i]
        for i in range(finals[0] + 1, partials[0])
    ), plan
    # Audit side: an aggregate, and NO second Window node anywhere —
    # the only Window in the whole plan is the kept side's row_number
    # (WindowGroupLimit lines contain the substring "Window", hence
    # the word-boundary node match).
    assert "HashAggregate" in plan
    win_nodes = [l for l in lines if re.search(r"\bWindow \[", l)]
    assert len(win_nodes) == 1, plan


def test_runtime_bloom_filter_reduces_fact_side_of_smj(spark, sf_dir):
    """The engine's runtime semi-join reduction, pinned as a scale
    lever: when a shuffle join's build side carries a selective
    filter, Catalyst injects a bloom filter built from the filtered
    keys into the probe side's scan (BloomFilterMightContain), so at
    100 TB most of the fact table is dropped BEFORE the exchange. The
    application-side size threshold defaults to 10 GB — it never
    fires at fixture scale, so this test lowers it (and disables
    broadcast to force the shuffle join the rule targets) to prove
    the injection works and changes nothing about the answer; on a
    real cluster the DEFAULT thresholds fire for exactly this plan
    shape."""
    from pyspark.sql import functions as F

    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def run():
        return (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("l_quantity").alias("qty"),
            )
        )

    want = sorted(map(tuple, run().collect()))
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    thr_key = (
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold"
    )
    prev_thr = spark.conf.get(thr_key)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(thr_key, "1KB")
    try:
        df = run()
        plan = df._jdf.queryExecution().executedPlan().toString().lower()
        assert "might_contain" in plan or "bloomfilter" in plan, plan
        assert sorted(map(tuple, df.collect())) == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set(thr_key, prev_thr)
