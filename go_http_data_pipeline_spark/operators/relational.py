"""Scans, projections, filters, sorts, limits, top-k.

Reference parity (SURVEY.md §2.1-2.2, §2.6):
* full-table scan + egress  — ``Server/main.go:229-259`` (S2/P1)
* projected scan            — ``Server/main.go:261-277`` (S3/P2)
* equality point lookups    — ``Server/main.go:110, 280`` (P3/P4)
* theta/range/IN/LIKE preds — absent in reference; engine surface
* ORDER BY / LIMIT / top-k  — absent in reference; engine surface

Scale notes: all queries are single declarative plans — Catalyst
pushes the filters and projections into the parquet scan
(``PushedFilters`` / narrow ``ReadSchema``), and top-k plans as
``TakeOrderedAndProject`` (per-partition heap + driver merge of k
rows — no global sort at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..determinism import md5_int, md5_int_sql
from ..registry import query


@query(
    "full_scan",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
)
def full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: full scan of the row table (employee analog: customer)."""
    return table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )


@query(
    "projected_scan",
    oracle="SELECT c_custkey, c_nationkey, c_acctbal FROM customer",
)
def projected_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: 3-column projection (``SELECT id, yearsofexp, salary``)."""
    return table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")


@query(
    "point_lookup",
    oracle="SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey = 42",
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P4: equality point filter on the key (``WHERE id = ?``)."""
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") == F.lit(42))
        .select("c_custkey", "c_name", "c_acctbal")
    )


@query(
    "filter_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size, p_retailprice
    FROM part
    WHERE p_size IN (5, 10, 15, 20)
      AND p_type LIKE '%AR%'
      AND p_retailprice BETWEEN 500 AND 1500
      AND p_brand IS NOT NULL
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / LIKE / BETWEEN / IS NOT NULL predicates (absent in ref)."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_size").isin(5, 10, 15, 20)
        & F.col("p_type").like("%AR%")
        & F.col("p_retailprice").between(500, 1500)
        & F.col("p_brand").isNotNull()
    ).select("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")


@query(
    "filter_date_range",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderstatus <> 'F'
    """,
)
def filter_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp range predicate — pushed to the parquet scan."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderstatus") != "F")
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")


@query(
    "top_orders_by_price",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def top_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: plans as TakeOrderedAndProject (no global sort).

    The unique-key tiebreak (``o_orderkey``) makes the k-row result
    deterministic across engines and partitionings.
    """
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@query(
    "multi_key_sort_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus, l_orderkey, l_linenumber
    LIMIT 50
    """,
)
def multi_key_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column sort + limit over the fact table."""
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_quantity")
        .orderBy("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber")
        .limit(50)
    )


@query(
    "existence_check",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(COUNT(*) = 0 AS BOOLEAN) AS is_empty
    FROM customer
    WHERE c_acctbal < -999999
    """,
)
def existence_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/A1: empty-result check (the reference's 404 branch,
    ``Server/main.go:249-253``) as a degenerate COUNT(*)."""
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < -999999)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) == 0).alias("is_empty"),
        )
    )


@query(
    "deterministic_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {md5_int_sql('CAST(doc_id AS VARCHAR)')} % 100 < 10
    """,
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% corpus sample keyed on a hash of doc_id — the
    reproducible alternative to rand()-based TABLESAMPLE for training
    -data curation: the same document set is selected on every run,
    every engine, and every partitioning, so downstream experiments
    are comparable. Pure per-row predicate: pushes to the scan,
    no shuffle, trivially parallel at any scale."""
    docs = table(spark, sf_dir, "documents")
    return docs.filter(
        md5_int(F.col("doc_id").cast("string")) % 100 < 10
    ).select("doc_id", "lang", "n_chars")
