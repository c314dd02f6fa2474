"""Third TPC-H-flavored suite: the EXISTS / NOT-IN / lone-witness
query shapes — Q4 (EXISTS semi-join with a non-equi leg), Q16
(NOT IN rewritten as broadcast anti-join + distinct agg), Q21
(double-correlated EXISTS/NOT EXISTS rewritten as one grouped pass).

The reference (SURVEY.md §2.3) has no subqueries at all; these cover
the remaining ABSENT categories of correlated-predicate analytics.
The fixture has no l_commitdate/l_receiptdate, so "late" is defined
against the order date: a lineitem is late when it ships more than
N days after o_orderdate (FIXTURES.md schema).

Plan/scale notes (verified via .explain("formatted")):
* Q4's EXISTS is a LeftSemi join on the orderkey equi-leg with the
  lateness comparison as the join residual — one shuffle pair, no
  per-order subquery, and the semi-join stops probing an order after
  its first late match;
* Q16's NOT IN becomes a *broadcast* anti-join (the excluded-supplier
  set is tiny and NULL-free by construction), so the only shuffle is
  the final distinct aggregation;
* Q21's "only late supplier on a multi-supplier order" is computed
  from ONE lineitem⋈orders pass: collapse to (order, supplier,
  is_late), then per-order counts via a second grouped pass over that
  already-small intermediate — never N correlated re-scans. At 100 TB
  both groupBys shuffle on l_orderkey first, so AQE can coalesce and
  the second agg is nearly local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "late_order_priority",
    oracle="""
    SELECT o.o_orderpriority AS priority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY 1
    """,
)
def late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order counts by priority for a half-year
    window, restricted to orders with at least one lineitem shipped
    60+ days after the order date. EXISTS compiles to a left-semi
    join: equi on orderkey, lateness as the join residual."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "supplier_count_by_part",
    oracle="""
    SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'BRAND_1'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
)
def supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type,
    size) for selected sizes, excluding one brand and all
    negative-balance suppliers. The NOT IN subquery is rewritten as a
    left-anti join; NOT IN and anti-join agree only when
    BOTH sides are null-free — s_suppkey by schema on the build side,
    and an explicit isNotNull on the probe side (a NULL l_suppkey
    evaluates NOT IN to NULL and is dropped by SQL, while left_anti
    would keep it — the filter makes the Spark plan match the SQL
    semantics instead of assuming the fixture). Brand/size predicates
    push into the part scan. part/supplier are SF-scaled, so neither
    join carries a forced broadcast hint — AQE auto-broadcasts them
    while small and shuffle-joins at scale."""
    l = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .filter(F.col("l_suppkey").isNotNull())
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "BRAND_1")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        l.join(bad, l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "lone_late_supplier",
    oracle="""
    WITH flagged AS (
        SELECT l.l_orderkey, l.l_suppkey,
               MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                        THEN 1 ELSE 0 END) AS is_late
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY 1, 2
    ),
    per_order AS (
        SELECT l_orderkey,
               COUNT(*) AS n_suppliers,
               SUM(is_late) AS n_late
        FROM flagged GROUP BY 1
    )
    SELECT s.s_name AS supplier_name, COUNT(*) AS numwait
    FROM flagged f
    JOIN per_order po ON po.l_orderkey = f.l_orderkey
    JOIN supplier s ON s.s_suppkey = f.l_suppkey
    WHERE f.is_late = 1 AND po.n_suppliers > 1 AND po.n_late = 1
    GROUP BY 1
    """,
)
def lone_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: per supplier, how many finished multi-supplier
    orders it alone shipped late (90+ days after order date). The
    classic EXISTS(other supplier) AND NOT EXISTS(other late supplier)
    pair collapses into per-order counts over one (order, supplier,
    is_late) intermediate — one fact-fact shuffle, then the per-order
    counts as window aggregates over the collapsed set (the join
    subtree is computed once, not once per reference)."""
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    s = table(spark, sf_dir, "supplier")
    # Hash on l_orderkey ALONE before the grouped collapse: orderkey
    # partitioning satisfies both the (orderkey, suppkey) groupBy (a
    # superset clustering) and the window's partitionBy(orderkey), so
    # the collapsed set flows into the window with NO second shuffle —
    # one exchange where the naive plan takes two.
    flagged = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late.cast("int")).alias("is_late"))
    )
    w = Window.partitionBy("l_orderkey")
    counted = flagged.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.count(F.lit(1)).over(w).alias("n_suppliers"),
        F.sum("is_late").over(w).alias("n_late"),
    )
    return (
        counted.filter(
            (F.col("is_late") == 1)
            & (F.col("n_suppliers") > 1)
            & (F.col("n_late") == 1)
        )
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy(F.col("s_name").alias("supplier_name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
