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


@query(
    "unpivot_part_measures",
    oracle="""
    SELECT p_partkey AS partkey, measure, val
    FROM (
        SELECT p_partkey,
               CAST(p_size AS DOUBLE) AS size,
               p_retailprice AS retailprice
        FROM part
    )
    UNPIVOT (val FOR measure IN (size, retailprice))
    """,
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide part measures into (key, measure, value)
    rows — the inverse of the pivot query. Narrow map-side transform:
    2x row expansion, no shuffle at any scale."""
    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    return p.unpivot(
        "p_partkey", ["size", "retailprice"], "measure", "val"
    ).select(F.col("p_partkey").alias("partkey"), "measure", "val")


@query(
    "embedding_value_histogram",
    oracle="""
    SELECT dim_bucket, COUNT(*) AS n, 
           CAST(SUM(CASE WHEN v >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonneg
    FROM (
        SELECT (i.i - 1) // 8 AS dim_bucket, e.embedding[i.i] AS v
        FROM embeddings e,
             (SELECT unnest(generate_series(1, 64)) AS i) i
        WHERE e.vec_id < 100
    )
    GROUP BY dim_bucket
    """,
)
def embedding_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (lateral array expansion): unroll embedding vectors
    into (position, value) rows and profile them per 8-dim bucket —
    the table-function shape feature-store audits use. The explode is
    a narrow transform; only the tiny bucket agg shuffles."""
    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return (
        emb.select(F.posexplode("embedding").alias("pos", "v"))
        .groupBy(F.expr("pos div 8").alias("dim_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("v") >= 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_nonneg"),
        )
    )


@query(
    "except_all_priorities",
    oracle="""
    SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'O'
    """,
)
def except_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset): per-priority surplus of finished over
    open orders, keeping duplicate counts — bag semantics where the
    distinct EXCEPT would collapse to at most five rows. Compiles to
    a count-compare aggregation, not a row-at-a-time subtract."""
    o = table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("priority")
    )
    op = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("priority")
    )
    return f.exceptAll(op)


@query(
    "intersect_all_priorities",
    oracle="""
    SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'O'
    """,
)
def intersect_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset): per-priority min(count_F, count_O)
    occurrences — the bag-intersection twin of except_all."""
    o = table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("priority")
    )
    op = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("priority")
    )
    return f.intersectAll(op)
