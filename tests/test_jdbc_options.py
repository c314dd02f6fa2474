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
