"""The SQL front door: ANSI queries executed verbatim by BOTH engines.

Everything else in the repo pairs a DataFrame program with a DuckDB
oracle; these queries go further — one portable SQL string IS both
the Spark program (``spark.sql`` over the registered fixture views)
and the oracle. That exercises the engine surface a SQL-first user
touches (view catalog, parser, ANSI function dialect) and proves the
dialect subset used is genuinely portable.

Scale: identical to the DataFrame twins — ``spark.sql`` compiles to
the same Catalyst plans (broadcast dim joins, partial+final aggs);
the API is syntax, not a different engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from ..registry import query

# Portable ANSI subset: CAST, DECIMAL-exact sums, EXTRACT, CASE, JOIN,
# GROUP BY ordinal-free, no engine-specific functions.
_PORTABLE_REVENUE = """
    SELECT l_returnflag AS returnflag,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS ship_year,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_quantity < 50
    GROUP BY l_returnflag, CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT)
"""

_PORTABLE_SEGMENT_NATIONS = """
    SELECT n.n_name AS nation, c.c_mktsegment AS segment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_balance
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name <> 'REGION_0'
    GROUP BY n.n_name, c.c_mktsegment
"""


@query("sql_api_revenue_by_year", oracle=_PORTABLE_REVENUE)
def sql_api_revenue_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The revenue rollup as ONE portable SQL string — Spark runs it
    through ``spark.sql`` on the fixture views; DuckDB runs the
    byte-identical text as the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_PORTABLE_REVENUE)


@query("sql_api_segment_nations", oracle=_PORTABLE_SEGMENT_NATIONS)
def sql_api_segment_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-join rollup via the same one-string portable-SQL
    contract; Catalyst still broadcasts the nation/region dims
    exactly as the DataFrame twins do."""
    register_views(spark, sf_dir)
    return spark.sql(_PORTABLE_SEGMENT_NATIONS)
