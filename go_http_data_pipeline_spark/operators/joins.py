"""Joins: broadcast, sort-merge, semi, anti, theta, range, as-of.

The reference's only join-shaped dataflow is the salary writeback
(``Server/main.go:292-316``, an app-level equi-match on ``id``);
everything else here is engine surface (SURVEY.md §2.3).

Scale notes:
* dimension tables (region/nation/supplier) are broadcast explicitly —
  no shuffle of the 100 TB fact side;
* fact⋈fact (lineitem⋈orders) is a shuffle join on the join key; with
  production tables bucketed by orderkey it becomes shuffle-free;
* the as-of join uses the union+window pattern (one shuffle, sorted
  within user partitions) rather than a per-row lookup — this is the
  pattern that survives 100 TB, unlike a correlated subquery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..determinism import dsum, dsum_sql
from ..registry import query


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "revenue_by_nation",
    oracle=f"""
    SELECT n.n_name AS nation, r.r_name AS region,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP: the salary-ETL pipeline re-expressed relationally
    (SURVEY.md §7.1) — scan → multi-join → hash agg.

    lineitem⋈orders is a shuffle (sort-merge) join on the key both
    sides scale on; customer⋈nation⋈region are broadcast.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("nation"), r.r_name.alias("region"))
        .agg(
            dsum(_revenue(), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "top_revenue_orders",
    oracle=f"""
    SELECT o.o_orderkey, o.o_orderdate,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: selective join + agg + deterministic top-k
    (exact decimal revenue makes the cross-engine ordering stable)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(_revenue(), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "local_supplier_revenue",
    oracle=f"""
    SELECT n.n_name AS nation,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'AFRICA'
    GROUP BY n.n_name
    """,
)
def local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: customer and supplier in the same nation.
    Only constant-size nation/region carry broadcast hints; supplier
    is SF-scaled so its join is left to AQE (auto-broadcast while
    small, shuffle-join at scale)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("nation"))
        .agg(dsum(_revenue(), 4).alias("revenue"))
    )


@query(
    "late_shipment_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o.o_orderpriority
    """,
)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped EXISTS -> left-semi join with a non-equi term."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "customers_without_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT'
          AND EXTRACT(year FROM o.o_orderdate) = 1997
    )
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (the reference's insert-if-absent shape, P5):
    customers with no urgent 1997 order. The anti-join's right side
    is filtered first — every fixture customer has *some* order, so
    the unfiltered variant would be vacuously empty."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.year("o_orderdate") == 1997)
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "customers_with_urgent_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
)
def customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "nation_pairs_same_region",
    oracle="""
    SELECT a.n_name AS nation_a, b.n_name AS nation_b, a.n_regionkey AS regionkey
    FROM nation a
    JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def nation_pairs_same_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join (equi + inequality) — broadcast nested loop on tiny
    dims; at scale the equi part still hash-partitions."""
    a = table(spark, sf_dir, "nation").alias("a")
    b = table(spark, sf_dir, "nation").alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_name").alias("nation_a"),
        F.col("b.n_name").alias("nation_b"),
        F.col("a.n_regionkey").alias("regionkey"),
    )


@query(
    "range_join_ship_lag",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           {dsum_sql('l.l_quantity', 2)} AS total_qty
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
       AND l.l_shipdate >= o.o_orderdate + INTERVAL 30 DAY
       AND l.l_shipdate <  o.o_orderdate + INTERVAL 60 DAY
    GROUP BY o.o_orderpriority
    """,
)
def range_join_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: equi key + timestamp band. The equi term keeps it a
    hash/sort-merge join (the band is a post-join filter) — no BNLJ."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        & (li.l_shipdate < F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    )
    return (
        li.join(o, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity", 2).alias("total_qty"),
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Generic as-of join: for each left row, attach the latest right
    row with ``right_ts <= left_ts`` within the same ``on`` key.

    Implemented as union + last-ignorenulls window: ONE shuffle on the
    key, linear scan within partitions — the formulation that scales,
    unlike a correlated lookup or a time-banded cross join. A right
    row tied on timestamp with a left row counts as "already seen"
    (<= semantics) via the is_left sort tiebreak.

    SQL join semantics on NULLs: right rows with a NULL key or NULL
    timestamp are dropped up front (``s.key = p.key AND s.ts <= p.ts``
    matches neither), so a NULL-key left row gets NULL asof columns
    instead of inheriting values from other NULL-key right rows.
    The value columns travel as ONE struct, so the attached values
    always come from the SAME right row (per-column last-ignorenulls
    would forward-fill each column independently and could stitch a
    tuple no right row ever contained); rows tied on (key, timestamp)
    order by the ORDERABLE subset of the value columns, so ties
    deterministically attach the greatest-by-values row under any
    partitioning. Unorderable value columns (maps, or arrays/structs
    containing maps) still ride in the transport struct — they just
    can't serve as a tiebreak, so ties that differ ONLY in
    unorderable columns attach an arbitrary (but single-row-
    consistent) winner.
    ``value_cols=[]`` means "attach only the as-of timestamp";
    ``None`` (default) attaches every non-key right column.
    """

    def _orderable(dt) -> bool:
        from pyspark.sql import types as T

        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]
    r_types = {f.name: f.dataType for f in right.schema.fields}
    tie_cols = [c for c in value_cols if _orderable(r_types[c])]
    l_tagged = left.withColumn("_is_left", F.lit(1)).withColumn("_ts", F.col(left_ts))
    r_proj = [on, F.col(right_ts).alias("_r_ts")]
    if value_cols:
        r_proj.append(
            F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_r_vals")
        )
    # Tie-ordering column: in the common all-orderable case the value
    # struct itself is the tiebreak — projecting a second identical
    # struct would ship the full value payload twice through the
    # shuffle and window sort. Only when some value columns are
    # unorderable (maps) does a separate orderable-subset struct exist.
    tie_ref = None
    if tie_cols == value_cols and value_cols:
        tie_ref = "_r_vals"
    elif tie_cols:
        tie_ref = "_r_tie"
        r_proj.append(
            F.struct(*[F.col(c).alias(c) for c in tie_cols]).alias("_r_tie")
        )
    r_tagged = (
        right.filter(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
        .select(*r_proj)
        .withColumn("_is_left", F.lit(0))
        .withColumn("_ts", F.col("_r_ts"))
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    order = ["_ts", "_is_left"]
    if tie_ref:
        order.append(F.col(tie_ref).asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        F.last("_r_ts", ignorenulls=True).over(w).alias(f"asof_{right_ts}"),
        *(
            [F.last("_r_vals", ignorenulls=True).over(w).alias("_asof_vals")]
            if value_cols
            else []
        ),
    )
    out = filled.filter(F.col("_is_left") == 1).select(
        *left.columns,
        f"asof_{right_ts}",
        *[F.col(f"_asof_vals.{c}").alias(f"asof_{c}") for c in value_cols],
    )
    return out


@query(
    "asof_purchase_signup",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts, MAX(s.ts) AS asof_ts
    FROM events p
    LEFT JOIN events s
      ON s.user_id = p.user_id AND s.event_type = 'signup' AND s.ts <= p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id, p.ts
    """,
)
def asof_purchase_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent
    signup at-or-before it (NULL if none)."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    return asof_join(
        purchases, signups, on="user_id", left_ts="purchase_ts", right_ts="ts",
        value_cols=[],
    ).select("event_id", "user_id", "purchase_ts", "asof_ts")


@query(
    "nation_presence_reconciliation",
    oracle="""
    WITH cust AS (
        SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
        FROM customer GROUP BY 1
    ),
    supp AS (
        SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
        FROM supplier GROUP BY 1
    )
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           c.n_customers, s.n_suppliers,
           CASE WHEN c.nationkey IS NULL THEN 'supplier_only'
                WHEN s.nationkey IS NULL THEN 'customer_only'
                ELSE 'both' END AS presence
    FROM cust c
    FULL OUTER JOIN supp s ON s.nationkey = c.nationkey
    """,
)
def nation_presence_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: reconcile which nations have customers,
    suppliers, or both — the two-source audit shape (nulls on either
    side are the signal, not an error). Shuffles only the two tiny
    per-nation aggregates; the fact scans pre-aggregate map-side."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    cust = c.groupBy(F.col("c_nationkey").alias("c_key")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    supp = s.groupBy(F.col("s_nationkey").alias("s_key")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return cust.join(supp, cust.c_key == supp.s_key, "full_outer").select(
        F.coalesce("c_key", "s_key").alias("nationkey"),
        "n_customers",
        "n_suppliers",
        F.when(F.col("c_key").isNull(), "supplier_only")
        .when(F.col("s_key").isNull(), "customer_only")
        .otherwise("both")
        .alias("presence"),
    )
