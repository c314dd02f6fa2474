"""JDBC connectors (S7): the reference's two pooled MySQL connections
(``connectDBs``, ``Server/main.go:68-89``) and its per-request
``sql.Open`` anti-pattern (``:285-290``) re-expressed as Spark JDBC
source/sink configuration.

Spark-first mapping:
* connection *pooling* is a non-concern — executors open per-task
  connections governed by ``numPartitions``; there is no shared
  mutable pool to manage;
* the parallel-scan options (``partitionColumn/lowerBound/upperBound/
  numPartitions``) are what turn the reference's single-cursor full
  scan (``Server/main.go:230``) into N concurrent range scans;
* predicate/projection pushdown into the remote DB is automatic for
  JDBC relations (Catalyst emits the WHERE/SELECT into the generated
  query), which is exactly the "total pushdown" the reference gets by
  shipping literal SQL (SURVEY.md §4).

No database exists in this container, so these helpers are exercised
by construction-level tests only; the semantics they delegate to are
Spark built-ins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_options(
    host: str,
    database: str,
    table: str,
    user: str,
    password: str,
    port: int = 3306,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> dict[str, str]:
    """Build the option map for a (MySQL-style) JDBC relation; the
    parallel-read knobs are included only when all are provided."""
    opts = {
        "url": f"jdbc:mysql://{host}:{port}/{database}",
        "dbtable": table,
        "user": user,
        "password": password,
        "driver": "com.mysql.cj.jdbc.Driver",
    }
    parallel = (partition_column, lower_bound, upper_bound, num_partitions)
    if all(v is not None for v in parallel):
        opts.update(
            partitionColumn=str(partition_column),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    elif any(v is not None for v in parallel):
        raise ValueError(
            "parallel JDBC read needs all of partition_column, lower_bound,"
            " upper_bound, num_partitions"
        )
    return opts


def read_table(spark: SparkSession, **kwargs) -> DataFrame:
    """``employee``/``users`` scans (S2/S3) against a live RDBMS."""
    return spark.read.format("jdbc").options(**jdbc_options(**kwargs)).load()


def append_table(df: DataFrame, **kwargs) -> None:
    """Keyed insert path (S4): append rows into a JDBC table."""
    df.write.format("jdbc").options(**jdbc_options(**kwargs)).mode(
        "append"
    ).save()
