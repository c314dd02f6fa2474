"""Structured Streaming tests: bounded replays must agree with batch,
and the foreachBatch merge sink must land exactly-once results."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    from go_http_data_pipeline_spark.operators.time_windows import (
        tumbling_window_counts,
    )
    from go_http_data_pipeline_spark.streaming.core import (
        streaming_tumbling_counts,
    )

    batch = {tuple(r) for r in tumbling_window_counts(spark, sf_dir).collect()}
    stream = {tuple(r) for r in streaming_tumbling_counts(spark, sf_dir).collect()}
    assert stream == batch


def test_foreach_batch_merge_writeback(spark):
    from go_http_data_pipeline_spark.streaming.core import foreach_batch_merge

    with tempfile.TemporaryDirectory() as tmp:
        base_path = os.path.join(tmp, "employee")
        spark.createDataFrame(
            [(1, 100), (2, 200), (3, 300)], "id long, salary long"
        ).write.parquet(base_path)

        # Stream of salary updates: a file stream fed one parquet file.
        upd_dir = os.path.join(tmp, "updates")
        os.makedirs(upd_dir)
        spark.createDataFrame(
            [(2, 999), (4, 400)], "id long, salary long"
        ).write.mode("overwrite").parquet(upd_dir)
        updates = spark.readStream.schema("id long, salary long").parquet(upd_dir)

        q = foreach_batch_merge(
            spark,
            updates,
            base_path,
            key="id",
            checkpoint_dir=os.path.join(tmp, "ckpt"),
        )
        q.awaitTermination()

        final = {
            tuple(r) for r in spark.read.parquet(base_path).collect()
        }
        assert final == {(1, 100), (2, 999), (3, 300), (4, 400)}


def test_rate_user_stream_schema_and_determinism(spark):
    from go_http_data_pipeline_spark.streaming.core import rate_user_stream

    sdf = rate_user_stream(spark, rows_per_second=10)
    assert sdf.isStreaming
    assert [f.name for f in sdf.schema.fields] == [
        "sent_at",
        "seq",
        "name",
        "role",
        "age",
    ]
    # The record transform is the same seeded LCG as generated_users:
    # applying it to a batch range must reproduce those records.
    from go_http_data_pipeline_spark.functions.record_functions import (
        generated_users,
    )

    gen = generated_users(spark, "")
    rows = {(r.name, r.role, r.age) for r in gen.collect()}
    assert len(rows) == 10
    ages = [r.age for r in gen.collect()]
    assert all(18 <= a < 58 for a in ages)


def test_stream_stream_join_equals_batch(spark, sf_dir):
    from go_http_data_pipeline_spark.catalog import table
    from go_http_data_pipeline_spark.streaming.core import (
        streaming_click_purchase_join,
    )

    ev = table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    batch = {
        tuple(r)
        for r in c.join(
            p,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
            & (F.col("c_ts") <= F.col("p_ts")),
        )
        .select(
            "purchase_id",
            "click_id",
            "user_id",
            (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")).alias(
                "secs_before"
            ),
        )
        .collect()
    }
    stream = {
        tuple(r) for r in streaming_click_purchase_join(spark, sf_dir).collect()
    }
    assert stream == batch and stream
