"""Window functions: ranking, lag/lead, running totals, frames,
per-group top-k.

Absent in the reference (SURVEY.md §2.5); full engine surface over the
``events`` stream table and the star schema.

Scale notes: every window below partitions by a high-cardinality key
(user_id / nation) — one shuffle, then a sorted scan per partition.
Running sums use the exact-decimal pattern so the cross-engine hash
matches at any partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

_DEC = "decimal(18,4)"


@query(
    "rank_events_per_user",
    oracle="""
    SELECT event_id, user_id, value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn,
           RANK()       OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk,
           DENSE_RANK() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS drnk
    FROM events
    """,
)
def rank_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per user by value."""
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
    )


@query(
    "running_total_per_user",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value
    FROM events
    """,
)
def running_total_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per user, event-time ordered."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast(_DEC)).over(w).cast("double").alias("running_value"),
    )


@query(
    "lag_lead_gaps",
    oracle="""
    SELECT event_id, user_id, ts,
           LAG(ts)  OVER w AS prev_ts,
           LEAD(ts) OVER w AS next_ts,
           epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) AS gap_ms
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def lag_lead_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead + inter-event gap in milliseconds."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        # ts is TIMESTAMP_NTZ; unix_millis needs an instant — the cast
        # uses the session tz (pinned UTC by the catalog), and the tz
        # offset cancels in the subtraction anyway.
        (
            F.unix_millis(F.col("ts").cast("timestamp"))
            - F.unix_millis(F.lag("ts").over(w).cast("timestamp"))
        ).alias("gap_ms"),
    )


@query(
    "top3_customers_per_nation",
    oracle="""
    SELECT c_nationkey, c_custkey, c_name, c_acctbal
    FROM (
        SELECT c_nationkey, c_custkey, c_name, c_acctbal,
               ROW_NUMBER() OVER (
                   PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
               ) AS rn
        FROM customer
    ) WHERE rn <= 3
    """,
)
def top3_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number — the scalable top-k-per-key
    (single shuffle; no global sort)."""
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        table(spark, sf_dir, "customer")
        .select("c_nationkey", "c_custkey", "c_name", "c_acctbal", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "moving_avg_value",
    oracle="""
    SELECT event_id, user_id, ts,
           (CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
            / COUNT(*) OVER w) AS moving_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def moving_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average (bounded frame), decimal-exact."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (
            F.sum(F.col("value").cast(_DEC)).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg"),
    )


@query(
    "nation_share_of_region",
    oracle="""
    SELECT n_regionkey, n_nationkey, n_customers,
           (CAST(n_customers AS DOUBLE)
            / SUM(n_customers) OVER (PARTITION BY n_regionkey)) AS region_share
    FROM (
        SELECT n.n_regionkey, n.n_nationkey, COUNT(*) AS n_customers
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_regionkey, n.n_nationkey
    )
    """,
)
def nation_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agg + analytic window over the aggregate (share-of-total)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    per_nation = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey", "n_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    w = Window.partitionBy("n_regionkey")
    return per_nation.select(
        "n_regionkey",
        "n_nationkey",
        "n_customers",
        (F.col("n_customers").cast("double") / F.sum("n_customers").over(w)).alias(
            "region_share"
        ),
    )


@query(
    "acctbal_quartiles",
    oracle="""
    SELECT c_custkey AS custkey, c_mktsegment AS segment,
           ntile(4) OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal, c_custkey) AS quartile,
           percent_rank() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey) AS pct_rank
    FROM customer
    """,
)
def acctbal_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + percent_rank over account balances per market segment.
    The order-by includes the key column so tied balances rank
    deterministically in both engines."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


@query(
    "price_band_density",
    oracle="""
    SELECT o_orderkey AS orderkey, o_orderpriority AS priority,
           o_totalprice AS totalprice,
           COUNT(*) OVER (
               PARTITION BY o_orderpriority ORDER BY o_totalprice
               RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW
           ) AS n_in_band,
           first_value(o_orderkey) OVER (
               PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cheapest_so_far
    FROM orders
    """,
)
def price_band_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (value-based, not row-based): how many
    same-priority orders fall within 1000 price units below each
    order — the density/banding shape RANGE frames exist for (ties
    are peers by value, so the count is deterministic without a
    tiebreak). Plus first_value over a fully-ordered ROWS frame
    (cheapest order seen so far)."""
    o = table(spark, sf_dir, "orders")
    w_range = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 0)
    )
    w_rows = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("totalprice"),
        F.count(F.lit(1)).over(w_range).alias("n_in_band"),
        F.first("o_orderkey").over(w_rows).alias("cheapest_so_far"),
    )


@query(
    "trailing_30min_user_load",
    oracle=f"""
    WITH secs AS (
        SELECT event_id, user_id, ts, value,
               epoch_us(ts) // 1000000 AS sec
        FROM events
    )
    SELECT event_id, user_id, ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_last_30min,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
               AS load_last_30min
    FROM secs
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW)
    """,
)
def trailing_30min_user_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: for every event, how many events (and
    how much total value) its user produced in the trailing 30
    minutes INCLUDING simultaneous events — the rolling-load shape
    behind rate limiting and burst pricing. Unlike the ROWS frames
    elsewhere, the frame is defined by event-TIME distance, so
    same-second peers are always in frame together (both engines
    share RANGE peer semantics on the integer seconds key).

    The frame key is NTZ-safe integer epoch seconds (timestampdiff
    from the epoch literal — floor(us/1e6), matching the oracle's
    epoch_us // 1e6); the sum is the exact-decimal window pattern so
    float order inside the frame can't drift the hash.

    Physical plan: one hash partition by user_id + one sort — the
    running-frame aggregation is a single pass per partition; no
    self-join-per-row (the naive O(n²) formulation)."""
    ev = table(spark, sf_dir, "events")
    secs = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.expr(
            "timestampdiff(SECOND, timestamp_ntz'1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-1800, Window.currentRow)
    )
    return secs.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_last_30min"),
        F.sum(F.col("value").cast(_DEC))
        .over(w)
        .cast("double")
        .alias("load_last_30min"),
    )


@query(
    "supplier_balance_standing",
    oracle="""
    SELECT s.s_suppkey, n.n_name AS nation, s.s_acctbal,
           percent_rank() OVER w AS balance_pct_rank,
           cume_dist() OVER w AS balance_cume_dist
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WINDOW w AS (PARTITION BY n.n_name ORDER BY s.s_acctbal)
    """,
)
def supplier_balance_standing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window functions: each supplier's
    ``percent_rank`` ((rank-1)/(n-1)) and ``cume_dist`` (fraction of
    peers at or below) of account balance WITHIN its nation — the
    relative-standing shape behind percentile-based alerting. Both
    functions are tie-aware by the SQL standard, so ordering by the
    bare balance is deterministic without a tiebreaker column, and
    the single-row-partition edge (percent_rank = 0, cume_dist = 1)
    is pinned by the cross-engine hash.

    One broadcast dim join, one hash partition by nation for both
    window functions (same spec, one sort)."""
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    w = Window.partitionBy("nation").orderBy("s_acctbal")
    return (
        sup.join(
            F.broadcast(nat),
            sup["s_nationkey"] == nat["n_nationkey"],
        )
        .select(
            "s_suppkey", F.col("n_name").alias("nation"), "s_acctbal"
        )
        .withColumn("balance_pct_rank", F.percent_rank().over(w))
        .withColumn("balance_cume_dist", F.cume_dist().over(w))
    )
