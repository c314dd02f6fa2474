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
