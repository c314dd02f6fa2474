"""File-format coverage (SURVEY.md §2.1 'formats ABSENT in reference'):
parquet fixtures round-trip through csv, json, and orc unchanged.

The reference speaks only MySQL + JSON-over-HTTP; Spark's readers and
writers supply the format surface for free — these tests pin that the
engine preserves values (including timestamps) across every format.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _sample(spark, sf_dir):
    from go_http_data_pipeline_spark.catalog import table

    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .orderBy("o_orderkey")
        .limit(200)
    )


def _assert_same(a, b, key="o_orderkey"):
    ra = {tuple(r) for r in a.collect()}
    rb = {tuple(r) for r in b.collect()}
    assert ra == rb and ra


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    df = _sample(spark, sf_dir)
    path = os.path.join(str(tmp_path), "orders_csv")
    df.write.option("header", "true").option(
        "timestampNTZFormat", "yyyy-MM-dd HH:mm:ss"
    ).csv(path)
    back = (
        spark.read.option("header", "true")
        .schema(df.schema)  # schema-on-read: csv carries no types
        .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path)
    )
    _assert_same(df, back)


def test_json_roundtrip(spark, sf_dir, tmp_path):
    df = _sample(spark, sf_dir)
    path = os.path.join(str(tmp_path), "orders_json")
    df.write.json(path)
    back = spark.read.schema(df.schema).json(path)
    _assert_same(df, back)


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    df = _sample(spark, sf_dir)
    path = os.path.join(str(tmp_path), "orders_orc")
    df.write.orc(path)
    back = spark.read.orc(path)
    _assert_same(df, back)


def test_partitioned_parquet_prunes(spark, sf_dir, tmp_path):
    from go_http_data_pipeline_spark.plans.inspect import plan_str

    df = _sample(spark, sf_dir)
    path = os.path.join(str(tmp_path), "orders_part")
    df.withColumn("status", F.col("o_orderstatus")).write.partitionBy(
        "status"
    ).parquet(path)
    back = spark.read.parquet(path).filter(F.col("status") == "F")
    # Partition pruning: only the status=F directory is scanned.
    assert back.count() == df.filter(F.col("o_orderstatus") == "F").count()
    plan = plan_str(back)
    assert "PartitionFilters" in plan or "partitionFilters" in plan
