"""JDBC option construction (no live DB in this container)."""

import pytest

from go_http_data_pipeline_spark.sources.jdbc import jdbc_options


def test_basic_options():
    opts = jdbc_options("dbhost", "mydb", "employee", "u", "p")
    assert opts["url"] == "jdbc:mysql://dbhost:3306/mydb"
    assert opts["dbtable"] == "employee"
    assert "partitionColumn" not in opts


def test_parallel_scan_options():
    opts = jdbc_options(
        "h", "d", "employee", "u", "p",
        partition_column="id", lower_bound=1, upper_bound=100000,
        num_partitions=32,
    )
    assert opts["numPartitions"] == "32"
    assert opts["partitionColumn"] == "id"


def test_partial_parallel_options_rejected():
    with pytest.raises(ValueError):
        jdbc_options("h", "d", "t", "u", "p", partition_column="id")


def test_jdbc_parallel_range_scan_live(spark, sf_dir):
    # The parallel-scan knobs against the LIVE embedded Derby DB:
    # 4 concurrent range partitions must return exactly the same rows
    # as the single-cursor scan (the reference's Server/main.go:230
    # full scan, parallelized).
    from go_http_data_pipeline_spark.sources.jdbc import (
        _DERBY_PROPS,
        _derby_customer_url,
    )

    url = _derby_customer_url(spark, sf_dir)
    serial = spark.read.jdbc(url, "customer", properties=_DERBY_PROPS)
    hi = serial.agg({"c_custkey": "max"}).first()[0]
    parallel = spark.read.jdbc(
        url,
        "customer",
        column="c_custkey",
        lowerBound=0,
        upperBound=int(hi) + 1,
        numPartitions=4,
        properties=_DERBY_PROPS,
    )
    assert parallel.rdd.getNumPartitions() == 4
    assert {tuple(r) for r in parallel.collect()} == {
        tuple(r) for r in serial.collect()
    }
