"""Set operations: UNION ALL / UNION / INTERSECT / EXCEPT.

Absent in the reference (SURVEY.md §2.7 — its closest analog is the
two-server `SERVER_ID` deployment, a union-view Spark partitioning
subsumes natively). Engine surface here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "union_all_parties",
    oracle="""
    SELECT c_custkey AS party_key, c_name AS party_name, 'customer' AS kind
    FROM customer WHERE c_acctbal > 5000
    UNION ALL
    SELECT s_suppkey AS party_key, s_name AS party_name, 'supplier' AS kind
    FROM supplier WHERE s_acctbal > 5000
    """,
)
def union_all_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two conformed projections."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(
            F.col("c_custkey").alias("party_key"),
            F.col("c_name").alias("party_name"),
            F.lit("customer").alias("kind"),
        )
    )
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(
            F.col("s_suppkey").alias("party_key"),
            F.col("s_name").alias("party_name"),
            F.lit("supplier").alias("kind"),
        )
    )
    return c.unionByName(s)


@query(
    "union_distinct_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def union_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): union all + dedup aggregate."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations having both customers and suppliers."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): nations with customers but no suppliers."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)
