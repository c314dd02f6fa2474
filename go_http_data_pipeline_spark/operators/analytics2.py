"""Second TPC-H-flavored suite: the remaining classic query shapes —
correlated-subquery rewrites, global-scalar thresholds, disjunctive
predicate pushdown, and anti-join analytics — adapted to the fixture
star schema (no partsupp/shipmode columns; see FIXTURES.md).

The reference (SURVEY.md §2.3-2.4) has no multi-table SQL at all;
these queries are the engine-proper surface for the ABSENT categories
(correlated subqueries, NOT EXISTS, OR-of-conjunctions predicates).

Plan/scale notes (verified via .explain("formatted")):
* every correlated subquery is rewritten as a window function or a
  self-aggregation join — one pass over the fact table, never N+1;
* global scalar thresholds (Q11/Q20/Q22 shapes) become single-row
  broadcast cross-joins: the scalar agg is computed once, shipped to
  every executor, and the compare stays in codegen;
* Q19's OR-of-conjunctions is expressed so the common `p_partkey`
  equi-join runs once and the disjunction is a post-join filter on
  broadcast part attributes — Catalyst pushes the brand/size legs
  into the part scan (PushedFilters: Or(...)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..determinism import dsum, dsum_sql
from ..registry import query

# Revenue expression single-sourced from analytics.py: two hand-kept
# copies would let a future change (tax term, decimal scale) skew half
# the suite's oracles relative to the other half.
from .analytics import _REV, _rev_col  # noqa: F401


@query(
    "min_price_supplier_per_part",
    oracle=f"""
    WITH unit AS (
        SELECT l_partkey, l_suppkey,
               {dsum_sql("l_extendedprice")} / {dsum_sql("l_quantity")} AS unit_price
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ),
    ranked AS (
        SELECT l_partkey, l_suppkey, unit_price,
               MIN(unit_price) OVER (PARTITION BY l_partkey) AS min_price
        FROM unit
    )
    SELECT p.p_partkey AS partkey, p.p_name AS part_name,
           s.s_name AS supplier_name, n.n_name AS nation, r.unit_price
    FROM ranked r
    JOIN part p ON p.p_partkey = r.l_partkey
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE r.unit_price = r.min_price
      AND p.p_type = 'STANDARD' AND p.p_size < 10
    """,
)
def min_price_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each small STANDARD part, the supplier(s)
    selling it at the minimum average unit price. The correlated
    MIN-per-part subquery is a window over one self-aggregation —
    a single lineitem scan, no per-part re-execution.

    The part predicate is pushed BELOW the aggregation as a semi-join:
    each part's min is computed only from that part's own rows, so
    pre-filtering the fact table to qualifying parts is
    semantics-preserving and shrinks the agg + window input to the
    predicate's selectivity — the difference between shuffling every
    (part, supplier) group and only the interesting ones at 100 TB.
    part/supplier are SF-scaled, so none of their joins carries a
    forced broadcast hint — AQE auto-broadcasts them while small and
    shuffle-joins at scale; only constant-size nation is hinted."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") < 10)
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    pk = p.select("p_partkey")
    l = l.join(pk, l.l_partkey == pk.p_partkey, "left_semi")
    # Hash on l_partkey alone: satisfies the (partkey, suppkey)
    # groupBy and the per-part window with ONE exchange (same subset-
    # clustering trick as lone_late_supplier).
    unit = (
        l.repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg((dsum("l_extendedprice") / dsum("l_quantity")).alias("unit_price"))
    )
    w = Window.partitionBy("l_partkey")
    ranked = unit.withColumn("min_price", F.min("unit_price").over(w))
    return (
        ranked.filter(F.col("unit_price") == F.col("min_price"))
        .join(p, F.col("l_partkey") == p.p_partkey)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            F.col("s_name").alias("supplier_name"),
            F.col("n_name").alias("nation"),
            "unit_price",
        )
    )


@query(
    "volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           EXTRACT(year FROM l.l_shipdate) AS l_year,
           {dsum_sql(_REV)} AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. Both nation joins broadcast (constant 25 rows); the
    SF-scaled supplier join is left unhinted for AQE. The disjunctive
    nation-pair predicate filters after the dim joins."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    cn = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year")
        )
        .agg(dsum(_rev_col()).alias("revenue"))
    )


@query(
    "nation_profit_by_year",
    oracle=f"""
    SELECT n.n_name AS nation, EXTRACT(year FROM l.l_shipdate) AS l_year,
           {dsum_sql("l_extendedprice * (1 - l_discount) - 0.1 * p.p_retailprice * l_quantity")} AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def nation_profit_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on 'widget' parts by supplier nation and
    ship year (supply cost adapted to 10% of retail price — the
    fixture has no partsupp). LIKE filter pushes into the part scan
    (StringContains); part/supplier are SF-scaled so their joins are
    unhinted (AQE auto-broadcasts while small)."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    profit = _rev_col() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("l_shipdate").cast("bigint").alias("l_year")
        )
        .agg(dsum(profit).alias("profit"))
    )


@query(
    "important_parts_value",
    oracle=f"""
    WITH per_part AS (
        SELECT l_partkey, {dsum_sql(_REV)} AS part_value
        FROM lineitem GROUP BY l_partkey
    ),
    total AS (SELECT {dsum_sql(_REV)} AS total_value FROM lineitem)
    SELECT pp.l_partkey AS partkey, pp.part_value
    FROM per_part pp, total t
    WHERE pp.part_value > t.total_value * 0.0008
    """,
)
def important_parts_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue exceeds a fraction of the
    global total. The global scalar is a single-row broadcast
    cross-join — computed once, shipped everywhere, compare stays in
    codegen (no recompute per row, no driver collect)."""
    l = table(spark, sf_dir, "lineitem")
    per_part = l.groupBy("l_partkey").agg(dsum(_rev_col()).alias("part_value"))
    total = l.agg(dsum(_rev_col()).alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("total_value") * 0.0008)
        .select(F.col("l_partkey").alias("partkey"), "part_value")
    )


@query(
    "ship_priority_classes",
    oracle="""
    SELECT CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
)
def ship_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: lines shipped per year split by order
    priority class — conditional aggregation after the fact-fact
    join (shipmode adapted to ship year; fixture has no shipmode)."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "disjunctive_brand_revenue",
    oracle=f"""
    SELECT {dsum_sql(_REV)} AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions over part attributes and
    line quantity. The brand/size legs of the disjunction push into
    the part scan; the quantity legs stay as a codegen'd post-join
    filter — one equi-join, no union-of-three-scans. part is
    SF-scaled so the join is unhinted (AQE decides)."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum(_rev_col()).alias("revenue"))
    )


@query(
    "significant_promo_suppliers",
    oracle=f"""
    WITH per_supp AS (
        SELECT l.l_suppkey, {dsum_sql("l.l_quantity")} AS promo_qty
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_type = 'PROMO'
        GROUP BY l.l_suppkey
    ),
    avg_supp AS (
        SELECT {dsum_sql("promo_qty")} / COUNT(*) AS avg_qty FROM per_supp
    )
    SELECT s.s_name AS supplier_name, n.n_name AS nation, ps.promo_qty
    FROM per_supp ps, avg_supp a
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE ps.promo_qty > a.avg_qty * 1.1
    """,
)
def significant_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers moving >110% of the average PROMO
    part volume. Nested-subquery original rewritten as agg →
    broadcast scalar threshold → dim joins. Only the single-row
    threshold and constant-size nation carry broadcast hints;
    part/supplier are SF-scaled and left to AQE."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    per_supp = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(dsum("l_quantity").alias("promo_qty"))
    )
    avg_supp = per_supp.agg(
        (dsum("promo_qty") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        per_supp.crossJoin(F.broadcast(avg_supp))
        .filter(F.col("promo_qty") > F.col("avg_qty") * 1.1)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("s_name").alias("supplier_name"),
            F.col("n_name").alias("nation"),
            "promo_qty",
        )
    )


@query(
    "idle_rich_customers",
    oracle=f"""
    WITH rich AS (
        SELECT {dsum_sql("c_acctbal", 2)} / COUNT(*) AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name AS nation, COUNT(*) AS numcust,
           {dsum_sql("c.c_acctbal", 2)} AS totacctbal
    FROM customer c, rich
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > rich.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY 1
    """,
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average balances and no
    recent (2000+) orders, counted per nation. The NOT EXISTS is a
    left-anti join against the filtered orders key set (the filter
    pushes into the orders scan before the anti-join shuffles); the
    global average is a broadcast single-row cross-join
    (phone-prefix grouping adapted to nation — the fixture has no
    phone column)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    n = table(spark, sf_dir, "nation")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum("c_acctbal", 2) / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", 2).alias("totacctbal"),
        )
    )
