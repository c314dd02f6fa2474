"""Query registry: collects every operator's demo query + oracle SQL.

Each operator module registers named queries with the :func:`query`
decorator. ``__spark_entry__.py`` exposes the merged registry to the
driver's correctness harness (Spark result vs DuckDB oracle at
sf=0.01). Queries without oracle SQL (non-SQL-expressible ops) get a
rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}

# Modules that register queries on import.
_MODULES = (
    "go_http_data_pipeline_spark.operators.relational",
    "go_http_data_pipeline_spark.operators.aggregates",
    "go_http_data_pipeline_spark.operators.joins",
    "go_http_data_pipeline_spark.operators.analytics",
    "go_http_data_pipeline_spark.operators.analytics2",
    "go_http_data_pipeline_spark.operators.analytics3",
    "go_http_data_pipeline_spark.operators.sqlapi",
    "go_http_data_pipeline_spark.operators.quality",
    "go_http_data_pipeline_spark.operators.skew",
    "go_http_data_pipeline_spark.operators.storage",
    "go_http_data_pipeline_spark.streaming.stateful",
    "go_http_data_pipeline_spark.operators.windows",
    "go_http_data_pipeline_spark.operators.setops",
    "go_http_data_pipeline_spark.operators.time_windows",
    "go_http_data_pipeline_spark.operators.eventflow",
    "go_http_data_pipeline_spark.functions.record_functions",
    "go_http_data_pipeline_spark.functions.extensions",
    "go_http_data_pipeline_spark.pipelines.parity",
    "go_http_data_pipeline_spark.streaming.core",
    "go_http_data_pipeline_spark.sources.http_json",
    "go_http_data_pipeline_spark.sources.jdbc",
    "go_http_data_pipeline_spark.llm.dedup",
    "go_http_data_pipeline_spark.llm.similarity",
    "go_http_data_pipeline_spark.llm.semdedup",
    "go_http_data_pipeline_spark.llm.chunking",
    "go_http_data_pipeline_spark.llm.clustering",
    "go_http_data_pipeline_spark.llm.textstats",
    "go_http_data_pipeline_spark.llm.cleaning",
    "go_http_data_pipeline_spark.llm.decontam",
    "go_http_data_pipeline_spark.llm.sampling",
    "go_http_data_pipeline_spark.llm.sharding",
    "go_http_data_pipeline_spark.llm.multimodal",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as queries()[name]; ``oracle`` is DuckDB SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def _load() -> None:
    for mod in _MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Tolerate not-yet-written modules during incremental build.
            if mod.split(".")[-1] not in str(e):
                raise


# Queries with a green (rows+schema+hash) driver row in
# CORRECTNESS_r01.json. The round-1 driver recorded only the first 50
# registry entries, so ordering is leverage: queries WITHOUT a prior
# green row go first so a capped/timed driver run verifies new ground
# before re-verifying old. Already-green queries keep working (pytest +
# tools/check.py still run everything); they just sort last.
_DRIVER_GREEN_R1 = frozenset(
    {
        "asof_purchase_signup", "count_distinct_segments", "cube_order_totals",
        "customer_order_distribution", "customers_with_urgent_orders",
        "customers_without_orders", "deterministic_sample",
        "disjunctive_brand_revenue", "distinct_values", "existence_check",
        "filter_date_range", "filter_predicates", "full_scan",
        "grouping_sets_revenue", "having_filter", "idle_rich_customers",
        "important_parts_value", "large_volume_orders", "late_order_priority",
        "late_shipment_priority", "local_supplier_revenue",
        "market_share_evolution", "min_price_supplier_per_part",
        "multi_key_sort_limit", "nation_account_stats",
        "nation_pairs_same_region", "nation_presence_reconciliation",
        "nation_profit_by_year", "pivot_returnflag_status", "point_lookup",
        "projected_scan", "promo_revenue_ratio", "q1_pricing_summary",
        "q3_shipping_priority", "range_join_ship_lag", "returned_items_report",
        "revenue_by_nation", "revenue_percentiles", "rollup_order_totals",
        "scalar_agg_forecast", "significant_promo_suppliers",
        "small_quantity_orders", "stats_moments_profile", "top_orders_by_price",
        "top_revenue_orders", "top_supplier", "volume_shipping",
        # rows-only by design (approx sketches) — re-recording their
        # rows-only row adds nothing, so they also sort last.
        "approx_distinct_parts", "approx_revenue_percentiles",
    }
)


# Queries with a green driver row in CORRECTNESS_r02.json. Same
# leverage argument as _DRIVER_GREEN_R1: the driver caps at ~50 rows,
# so the 34 never-checked queries (llm/*, media_*) plus the 6 r2 reds
# fixed this round (≈40 names) must occupy the front of the window.
# Ordering is front < r2-green < r1-green, so the ~10 spare slots
# naturally re-verify the oldest-green r2 queries (ADVICE: rotate
# stale green rows).
_DRIVER_GREEN_R2 = frozenset(
    {
        "ship_priority_classes", "supplier_count_by_part",
        "lone_late_supplier", "sql_api_revenue_by_year",
        "sql_api_segment_nations", "skew_salted_user_revenue",
        "rank_events_per_user", "running_total_per_user", "lag_lead_gaps",
        "top3_customers_per_nation", "moving_avg_value",
        "nation_share_of_region", "acctbal_quartiles", "price_band_density",
        "union_all_parties", "union_distinct_nations", "intersect_nations",
        "except_nations", "unpivot_part_measures",
        "embedding_value_histogram", "except_all_priorities",
        "intersect_all_priorities", "tumbling_window_counts",
        "sliding_window_volume", "session_window_stats",
        "daily_active_users", "access_log_lines", "client_ip_extraction",
        "bearer_token_strip", "json_roundtrip", "generated_users",
        "udaf_user_stats", "udtf_parse_access_logs", "salary_etl_merge",
        "employee_upsert", "login_register_if_absent", "employees_json",
        "employee_salary_history_scd2", "streaming_dedup_exact",
        "streaming_enrich_nation_activity", "streaming_minhash_signatures",
        "http_ingest_scan", "jdbc_roundtrip_scan", "dedup_exact",
    }
)


# Queries with a green driver row in CORRECTNESS_r03.json (the r3
# registry reorder put the whole LLM suite through the window; 47 of
# 50 checked rows were green).
_DRIVER_GREEN_R3 = frozenset(
    {
        "ann_lsh_top1", "ann_recall_eval", "benchmark_contamination",
        "bigram_lang_stats", "bm25_relevance", "bucketed_priority_revenue",
        "cosine_topk", "cosine_topk_vectorized", "cross_source_overlap",
        "curation_verdicts", "dedup_components", "doc_chunks",
        "doc_fingerprints", "doc_keywords_tfidf", "embedding_dim_stats",
        "embedding_neardup_pairs", "ivf_ann_nprobe2", "ivf_ann_top1",
        "kmeans_iteration", "language_id", "login_response_map",
        "media_features", "media_frame_samples", "media_metadata",
        "media_resize_plan", "minhash_lsh_pairs", "ngram_jaccard_pairs",
        "partition_pruned_week_activity", "pii_redaction", "repetition_scores",
        "sequence_packing", "sessionize_events", "ship_priority_classes",
        "simhash_fingerprints", "simhash_neardup_pairs",
        "simhash_neardup_pairs_d3", "stateful_user_profiles",
        "stopword_stripped_docs", "stratified_sample_per_lang",
        "streaming_click_purchase_join", "streaming_repetition_filter",
        "streaming_session_windows", "streaming_tumbling_counts",
        "text_quality_scores", "token_counts", "vocab_term_frequencies",
        "winnowing_fingerprints",
    }
)

# Queries with a green driver row in CORRECTNESS_r04.json (a perfect
# 50/50 window: 42 new queries, 3 r3-red rewrites, 5 rotation
# re-verifies of the core relational scans).
_DRIVER_GREEN_R4 = frozenset(
    {
        "ann_lsh_multiprobe_top1", "ann_multiprobe_recall_eval",
        "bcrypt_login_roundtrip", "bpe_apply_merge", "bpe_pair_counts",
        "column_profile", "compaction_bin_packing", "data_quality_checks",
        "dataset_split_assignment", "dedup_keep_best_quality",
        "dup_span_coverage", "ema_event_value", "embedding_int8_quantize",
        "error_burst_runs", "filter_date_range", "filter_predicates",
        "full_scan", "funnel_view_click_purchase", "gap_filled_daily_activity",
        "heavy_hitters_eval", "incremental_daily_counts", "jwt_auth_chain",
        "layout_skipping_eval", "neardup_edit_distance", "neardup_graph_stats",
        "point_lookup", "projected_scan", "quality_classifier_logits",
        "quantile_sketch_accuracy_eval", "retention_cohorts",
        "rolling_7day_active_users", "semantic_dedup_verdicts",
        "semdedup_multiassign_recall", "semdedup_recall_eval",
        "sketch_accuracy_eval", "snapshot_diff", "source_mixture_weights",
        "sql_api_components_recursive", "streaming_dedup_within_watermark",
        "streaming_ema_stateful", "streaming_left_outer_attrib",
        "supplier_balance_standing", "tfidf_cosine_verify",
        "token_budget_selection", "token_rarity_scores",
        "trailing_30min_user_load", "training_shard_manifest",
        "trending_event_types", "watermark_late_audit", "zorder_file_stats",
    }
)

# Queries with a green driver row in CORRECTNESS_r05.json (a perfect
# 50/50 window: the 42-query r1-stale backlog drained + the round-5
# rewrites and review-fix refreshes + stateful_session_ttl).
_DRIVER_GREEN_R5 = frozenset(
    {
        "asof_purchase_signup", "count_distinct_segments",
        "cube_order_totals", "customer_order_distribution",
        "customers_with_urgent_orders", "customers_without_orders",
        "deterministic_sample", "disjunctive_brand_revenue",
        "distinct_values", "employee_upsert", "except_nations",
        "existence_check", "grouping_sets_revenue", "having_filter",
        "idle_rich_customers", "important_parts_value", "jwt_auth_chain",
        "large_volume_orders", "late_order_priority",
        "late_shipment_priority", "layout_skipping_eval",
        "local_supplier_revenue", "market_share_evolution",
        "min_price_supplier_per_part", "multi_key_sort_limit",
        "nation_account_stats", "nation_pairs_same_region",
        "nation_presence_reconciliation", "nation_profit_by_year",
        "pivot_returnflag_status", "promo_revenue_ratio",
        "q1_pricing_summary", "q3_shipping_priority", "range_join_ship_lag",
        "returned_items_report", "revenue_by_nation", "revenue_percentiles",
        "rolling_7day_active_users", "rollup_order_totals",
        "scalar_agg_forecast", "significant_promo_suppliers",
        "small_quantity_orders", "snapshot_diff", "stateful_session_ttl",
        "stats_moments_profile", "top_orders_by_price", "top_revenue_orders",
        "top_supplier", "volume_shipping", "zorder_file_stats",
    }
)

# Round-6/7 refreshes that MUST re-enter the driver window: the ten
# queries whose forced F.broadcast() hints on SF-scaled supplier/part
# scans were removed (VERDICT r5 item 1 — round 6 was cut short after
# catalog.py + 2 sites, round 7 finished the rest). Results are
# bit-identical (hints never change output), but the driver record
# must show green on the de-hinted code to clear their weak flags.
_REFRESH_R7 = frozenset(
    {
        "market_share_evolution", "top_supplier",
        "min_price_supplier_per_part", "volume_shipping",
        "nation_profit_by_year", "disjunctive_brand_revenue",
        "significant_promo_suppliers", "supplier_count_by_part",
        "lone_late_supplier", "local_supplier_revenue",
    }
)

# rows-only by design (approx sketches): a driver re-check adds
# nothing, so they always sort dead last.
_ROWS_ONLY = frozenset({"approx_distinct_parts", "approx_revenue_percentiles"})


def _ordered(d: dict) -> dict:
    """Driver-window ordering (the driver checks ~the first 50 rows):
    never-checked/new queries and this round's refreshes first, then
    green queries by staleness (r2 oldest -> r5 freshest) so the
    spare window slots re-verify the rows whose last green is oldest
    — VERDICT r5 item 2: drain the 41-query r2-stale tranche (the
    windows/setops/streaming/parity/SQL-API block) this round."""
    greens = (
        _DRIVER_GREEN_R1 | _DRIVER_GREEN_R2 | _DRIVER_GREEN_R3
        | _DRIVER_GREEN_R4 | _DRIVER_GREEN_R5
    )

    def rank(k: str) -> int:
        if k in _ROWS_ONLY:
            return 9
        if k in _REFRESH_R7 or k not in greens:
            return 0
        # Staleness = LATEST green round, checked newest-first: a query
        # re-verified in a later round must not hog a rotation slot
        # meant for genuinely stale rows (ship_priority_classes is in
        # both the r2 and r3 sets).
        if k in _DRIVER_GREEN_R5:
            return 5
        if k in _DRIVER_GREEN_R4:
            return 4
        if k in _DRIVER_GREEN_R3:
            return 3
        if k in _DRIVER_GREEN_R2:
            return 2
        return 1

    keys = sorted(d, key=lambda k: rank(k))  # stable: keeps module order
    return {k: d[k] for k in keys}


def all_queries() -> dict[str, QueryFn]:
    _load()
    return _ordered(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load()
    return _ordered(_ORACLE)
