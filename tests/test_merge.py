"""merge_into: upsert semantics on hand-built DataFrames, mirroring
the reference's write paths (UPDATE :280, INSERT :217, auto-register
:112-120)."""

from __future__ import annotations

from go_http_data_pipeline_spark.pipelines.merge import merge_into


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_update_wins_and_insert_appends(spark):
    base = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300)], "id long, salary long"
    )
    updates = spark.createDataFrame(
        [(2, 999), (4, 400)], "id long, salary long"
    )
    out = merge_into(base, updates, key="id")
    assert _rows(out) == {(1, 100), (2, 999), (3, 300), (4, 400)}


def test_empty_updates_is_identity(spark):
    base = spark.createDataFrame([(1, 100)], "id long, salary long")
    empty = spark.createDataFrame([], "id long, salary long")
    assert _rows(merge_into(base, empty, key="id")) == {(1, 100)}


def test_empty_base_is_insert_all(spark):
    empty = spark.createDataFrame([], "id long, salary long")
    updates = spark.createDataFrame([(7, 700)], "id long, salary long")
    assert _rows(merge_into(empty, updates, key="id")) == {(7, 700)}


def test_column_order_mismatch_ok(spark):
    base = spark.createDataFrame([(1, 100)], "id long, salary long")
    updates = spark.createDataFrame(
        [(999, 2)], "salary long, id long"
    )  # reversed order — unionByName must align
    assert _rows(merge_into(base, updates, key="id")) == {(1, 100), (2, 999)}
