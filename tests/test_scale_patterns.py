"""Scale-pattern tests: bucketed co-located joins, salted skew joins,
and the custom stateful streaming operator.

These pin the 100 TB mechanics locally: bucketing removes the
fact⋈fact shuffle entirely; salting spreads hot keys without changing
results; applyInPandasWithState accumulates per-key state across
micro-batches exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_http_data_pipeline_spark.plans.inspect import exchange_count


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("warehouse")
    yield d
    for t in ("li_bucketed", "ord_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_is_shuffle_free(spark, sf_dir, warehouse):
    """lineitem ⋈ orders bucketed by orderkey on both sides: the join
    runs with ZERO shuffle exchanges — the plan property that makes
    the fact⋈fact join at 100 TB a map-side merge instead of a
    cluster-wide repartition. (Locally: parquet bucketed tables via
    saveAsTable; in production the same DDL on the lake tables.)"""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(warehouse / "li"))
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(warehouse / "ord"))
        .mode("overwrite")
        .saveAsTable("ord_bucketed")
    )
    lb = spark.table("li_bucketed")
    ob = spark.table("ord_bucketed")
    joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
    assert exchange_count(joined) == 0, "bucketed join must not shuffle"
    # and it is still correct:
    plain = li.join(o, li.l_orderkey == o.o_orderkey)
    assert joined.count() == plain.count()


def test_salted_join_equals_plain_join(spark, sf_dir):
    from go_http_data_pipeline_spark.catalog import table
    from go_http_data_pipeline_spark.operators.skew import salted_join

    ev = table(spark, sf_dir, "events").select("event_id", "user_id")
    dim = ev.select("user_id").distinct().withColumn(
        "tier", (F.col("user_id") % 3).cast("string")
    )
    salted = salted_join(ev, dim, key="user_id", n_salts=8)
    plain = ev.join(dim, "user_id")
    assert salted.count() == plain.count()
    diff = salted.select("event_id", "tier").exceptAll(
        plain.select("event_id", "tier")
    )
    assert diff.isEmpty()


def test_stateful_profiles_match_batch(spark, sf_dir):
    from go_http_data_pipeline_spark.streaming.stateful import (
        run_user_profiles,
    )

    from go_http_data_pipeline_spark.catalog import table

    prof = run_user_profiles(spark, sf_dir).collect()
    ev = table(spark, sf_dir, "events")
    batch = {
        r.user_id: (r.n, float(r.total))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert len(prof) == len(batch)
    for r in prof:
        n, total = batch[r.user_id]
        assert r.n_events == n
        assert abs(r.total_value - total) < 1e-6 * max(1.0, abs(total))


def test_aqe_coalesces_shuffle_partitions(spark, sf_dir):
    # session.py promises AQE runtime coalescing; prove it engages.
    # A tiny groupBy under 32 static shuffle partitions must coalesce
    # to far fewer actual partitions after execution.
    from pyspark.sql import functions as F

    from go_http_data_pipeline_spark.catalog import table

    df = table(spark, sf_dir, "nation").groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    df.collect()  # materialize so AQE finalizes the plan
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in final
    assert "coalesced" in final


def test_dedup_components_plan_depth_constant(spark, sf_dir):
    """The label-propagation loop localCheckpoints each round, so the
    RESULT plan must not chain N rounds of joins — lineage is
    truncated to the final checkpointed labels (a scan + project),
    keeping analysis cost and stack depth constant regardless of how
    many rounds the graph diameter forces."""
    from go_http_data_pipeline_spark.llm.dedup import dedup_components

    df = dedup_components(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "Join" not in analyzed  # all rounds collapsed into a scan
    assert df.count() > 0
