"""Event-flow analytics: conversion funnels, retention cohorts, and
consecutive-failure (gaps-and-islands) burst detection.

Absent in the reference (its events are synthetic CRUD traffic); these
are the canonical product-analytics shapes a warehouse of event
streams must answer, built on the same `events` table the window and
sessionization operators use.

Week bucketing is epoch-aligned integer arithmetic (NTZ-pure
``timestampdiff`` from the 1970 epoch, floor-divided to weeks), NOT
`window('7 days')` vs DuckDB `time_bucket`: DuckDB's day-width
buckets originate at 2000-01-03 while Spark's tumbling windows
originate at the 1970 epoch — a silent 4-day offset. Integer division
against the epoch is bit-identical in both engines and keeps the week
index a plain BIGINT the cohort offset can subtract directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

_WEEK_US = 604_800_000_000  # 7 days in microseconds


@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS view_ts
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS click_ts
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > v.view_ts
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS purchase_ts
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
        GROUP BY e.user_id
    )
    SELECT u.user_id, v.view_ts, c.click_ts, p.purchase_ts,
           CAST(CASE WHEN p.purchase_ts IS NOT NULL THEN 3
                     WHEN c.click_ts IS NOT NULL THEN 2
                     WHEN v.view_ts IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS stage
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN v ON v.user_id = u.user_id
    LEFT JOIN c ON c.user_id = u.user_id
    LEFT JOIN p ON p.user_id = u.user_id
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel per user: first `view`, first `click`
    strictly AFTER that view, first `purchase` strictly after that
    click — the strict-sequence semantics of MATCH_RECOGNIZE's
    ``A B+ C`` without the operator. `stage` is how deep the user got
    (0 = never viewed .. 3 = full conversion); the stage histogram is
    one further groupBy for the caller.

    Physical plan: ONE scan, one hash partition by user_id, three
    chained Window mins over the SAME partitioning (Catalyst reuses
    the exchange — no per-stage rescans, no correlated subqueries),
    then a per-user dedup aggregate. Each successive min is
    conditional on the previous stage's timestamp, which is already a
    per-user constant column at that point."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "view_ts",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "click_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("view_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "purchase_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("click_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    return (
        staged.groupBy("user_id")
        .agg(
            F.max("view_ts").alias("view_ts"),
            F.max("click_ts").alias("click_ts"),
            F.max("purchase_ts").alias("purchase_ts"),
        )
        .select(
            "user_id",
            "view_ts",
            "click_ts",
            "purchase_ts",
            F.when(F.col("purchase_ts").isNotNull(), 3)
            .when(F.col("click_ts").isNotNull(), 2)
            .when(F.col("view_ts").isNotNull(), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("stage"),
        )
    )


@query(
    "retention_cohorts",
    oracle=f"""
    WITH weekly AS (
        SELECT DISTINCT user_id,
               epoch_us(ts) // {_WEEK_US} AS wk
        FROM events
    ),
    cohorts AS (
        SELECT user_id, MIN(wk) AS cohort_wk FROM weekly GROUP BY user_id
    ),
    cells AS (
        SELECT c.cohort_wk, w.wk - c.cohort_wk AS week_offset,
               -- weekly is DISTINCT (user_id, wk) and wk maps 1:1 to
               -- week_offset per user, so each user is at most one
               -- row per cell: plain COUNT(*) equals COUNT(DISTINCT)
               -- without the two-phase dedup aggregate.
               CAST(COUNT(*) AS BIGINT) AS n_active
        FROM weekly w JOIN cohorts c ON c.user_id = w.user_id
        GROUP BY c.cohort_wk, w.wk - c.cohort_wk
    )
    SELECT make_timestamp(cohort_wk * {_WEEK_US}) AS cohort_week,
           week_offset, n_active,
           MAX(CASE WHEN week_offset = 0 THEN n_active END)
               OVER (PARTITION BY cohort_wk) AS cohort_size,
           CAST(n_active AS DOUBLE)
               / MAX(CASE WHEN week_offset = 0 THEN n_active END)
                 OVER (PARTITION BY cohort_wk) AS retention
    FROM cells
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: users are cohorted by their first
    active epoch-week; each (cohort_week, week_offset) cell counts
    how many of that cohort were active `offset` weeks later, with
    retention = cell / cohort size (offset 0 is 100% by
    construction). The product-analytics staple for "does week-1
    activation persist to week N".

    Physical plan: the corpus collapses to DISTINCT (user, week) in
    one agg (map-side combine does the collapsing), cohort weeks are
    a per-user min over that SMALL table, and every later step —
    cohort join, cell agg, cohort-size window — runs on
    users×weeks-sized data, never the raw event stream. At 100 TB
    the only event-stream-sized op is the first distinct."""
    ev = table(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ: timestampdiff/timestampadd from the epoch
    # literal stay NTZ-pure (no session-timezone dependence, unlike
    # unix_micros/timestamp_seconds). floor(floor(us/1e6)/604800) ==
    # floor(us/604800e6), so this equals the oracle's epoch_us
    # division exactly.
    weekly = ev.select(
        "user_id",
        F.expr(
            "timestampdiff(SECOND, timestamp_ntz'1970-01-01 00:00:00', ts)"
            " div 604800"
        ).alias("wk"),
    ).distinct()
    cohorts = weekly.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    cells = (
        weekly.join(cohorts, "user_id")
        .groupBy(
            F.col("cohort_wk"),
            (F.col("wk") - F.col("cohort_wk")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    w = Window.partitionBy("cohort_wk")
    size = F.max(F.when(F.col("week_offset") == 0, F.col("n_active"))).over(w)
    return cells.select(
        F.expr(
            "timestampadd(SECOND, cohort_wk * 604800,"
            " timestamp_ntz'1970-01-01 00:00:00')"
        ).alias("cohort_week"),
        "week_offset",
        "n_active",
        size.alias("cohort_size"),
        (F.col("n_active").cast("double") / size).alias("retention"),
    )


MIN_BURST = 3


@query(
    "error_burst_runs",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, ts, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn_all
        FROM events
    ),
    errs AS (
        SELECT user_id, event_id, ts,
               rn_all - ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS grp
        FROM ordered WHERE event_type = 'error'
    ),
    runs AS (
        SELECT user_id, grp, ts, event_id,
               -- the id of the run's FIRST event in (ts, event_id)
               -- run order, not the numerically smallest id (ids
               -- need not be chronological in a real stream)
               FIRST_VALUE(event_id) OVER (
                   PARTITION BY user_id, grp ORDER BY ts, event_id
               ) AS first_event_id
        FROM errs
    )
    SELECT user_id,
           MIN(ts) AS start_ts,
           MAX(ts) AS end_ts,
           CAST(COUNT(*) AS BIGINT) AS n_errors,
           MIN(first_event_id) AS first_event_id
    FROM runs
    GROUP BY user_id, grp
    HAVING COUNT(*) >= {MIN_BURST}
    """,
)
def error_burst_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal runs of CONSECUTIVE error events per user (>= 3 in a
    row with no other event type between them) — the gaps-and-islands
    shape behind alerting ("this user is stuck in a failure loop"),
    solved with the row_number-difference idiom: rn over all events
    minus rn over errors only is constant exactly within a
    consecutive-error run. Ordering is (ts, event_id) — event_id
    breaks timestamp ties, so runs are deterministic.

    Physical plan: one scan, ONE hash partition by user_id shared by
    both row_number windows (same partitioning — Catalyst reuses the
    exchange), then a per-(user, run) aggregate whose map-side
    combine collapses each run before the (small) final shuffle."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.withColumn("rn_all", F.row_number().over(w))
    errs = ordered.filter(F.col("event_type") == "error").withColumn(
        "grp", F.col("rn_all") - F.row_number().over(w)
    )
    return (
        errs.groupBy("user_id", "grp")
        .agg(
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.count(F.lit(1)).alias("n_errors"),
            # min over the (ts, event_id) struct = the run's first
            # event in run order; MIN(event_id) would anchor on the
            # smallest id, which is only the same thing when ids
            # happen to be chronological.
            F.min(F.struct("ts", "event_id"))["event_id"].alias(
                "first_event_id"
            ),
        )
        .filter(F.col("n_errors") >= MIN_BURST)
        .select("user_id", "start_ts", "end_ts", "n_errors", "first_event_id")
    )
