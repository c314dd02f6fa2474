"""Event-time windows (batch form): tumbling, sliding, session.

Absent in the reference (SURVEY.md §2.9 — its only timestamps are
wall-clock TTL and log lines); these are the batch twins of the
Structured Streaming operators in ``streaming/`` — same semantics,
oracle-checkable here, re-used with watermarks there.

Oracle mapping: Spark ``window(ts, w)`` == DuckDB ``time_bucket``
(both align to the epoch); sliding windows enumerate the two
5-min-sliding 10-min windows per event; session windows are the
classic gap-based sessionization (new session when gap >= 30 min),
matching ``session_window``'s merge semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..determinism import dsum, dsum_sql
from ..registry import query


@query(
    "tumbling_window_counts",
    oracle=f"""
    SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS w_start,
           event_type,
           COUNT(*) AS n_events,
           {dsum_sql('value', 4)} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling windows × event_type."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "sliding_window_volume",
    oracle=f"""
    WITH assigned AS (
        SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS w_start, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE AS w_start, value
        FROM events
    )
    SELECT w_start, COUNT(*) AS n_events, {dsum_sql('value', 4)} AS total_value
    FROM assigned
    GROUP BY w_start
    """,
)
def sliding_window_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes (each event lands in
    exactly two windows)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("w_start"), "n_events", "total_value")
    )


SESSION_STATS_ORACLE = f"""
    WITH flagged AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, value,
               -- event_id tiebreak here too: without it the ROWS
               -- running sum is free to order tied (user_id, ts) rows
               -- differently from the flagged CTE, assigning a tied
               -- row to the PREVIOUS session nondeterministically.
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS n_events, {dsum_sql('value', 4)} AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """


@query(
    "session_window_stats",
    oracle=SESSION_STATS_ORACLE,
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap.

    Uses Spark's native ``session_window`` (same operator Structured
    Streaming uses with a watermark); the oracle replays the
    equivalent gap-based sessionization with window functions.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "daily_active_users",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(DISTINCT user_id) AS dau,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1
    """,
)
def daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct-user rollup (date_trunc tumbling day window)."""
    ev = table(spark, sf_dir, "events")
    # date_trunc always yields tz-typed TIMESTAMP; cast back to NTZ
    # (session tz pinned UTC by the catalog) for tz-proof results.
    return ev.groupBy(
        F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day")
    ).agg(
        F.countDistinct("user_id").alias("dau"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "sessionize_events",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    ids AS (
        SELECT user_id, ts, value,
               -- DuckDB widens SUM(int) to DECIMAL(38,0); Spark keeps
               -- BIGINT — cast so the hash compare sees one type.
               -- ORDER BY carries the same event_id tiebreak as gaps:
               -- tied (user_id, ts) rows at a session boundary must
               -- accumulate in one deterministic order in both engines.
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM gaps
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_secs
    FROM ids
    GROUP BY 1, 2
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization with explicit session IDs: a new
    session starts after a >30-minute silence; the ID is the running
    count of session breaks per user (lag + cumulative sum), then
    sessions aggregate to (start, length, event count).

    This is the window-function companion of the built-in
    ``session_window_stats`` — unlike session_window it yields stable
    per-event session IDs joinable back onto the raw stream, which is
    what downstream feature pipelines need. One shuffle on user_id;
    the two window passes and the final agg share that partitioning.
    Boundary convention: a session closes on gap STRICTLY greater
    than 30 min (the TTL convention shared with
    ``stateful_session_ttl``), whereas Spark's native session_window
    closes at gap >= 30 min — an event landing exactly on the
    boundary belongs to the previous session here and to a new one
    there.

    Ties on ts break by event_id so lag() sees one deterministic
    order in both engines. The gap compares FULL-precision
    microseconds: flooring to whole seconds first would keep a
    1800.5 s gap (floored diff exactly 1800) in one session while the
    oracle's interval comparison splits it."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; unix_micros needs an instant — session tz
    # is pinned UTC by the catalog, and the offset cancels in the
    # subtraction anyway.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    ids = ev.select(
        "user_id",
        "ts",
        "value",
        F.sum(
            F.when(gap > 30 * 60 * 1_000_000, 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_id"),
    )
    return ids.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").cast("timestamp_ntz").alias("session_start"),
        (
            F.max(F.unix_seconds(F.col("ts").cast("timestamp")))
            - F.min(F.unix_seconds(F.col("ts").cast("timestamp")))
        ).alias("duration_secs"),
    )


WATERMARK_DELAY_MIN = 10  # matches streaming_tumbling_counts' watermark
N_INGEST_SHARDS = 8


@query(
    "watermark_late_audit",
    oracle=f"""
    WITH arrivals AS (
        SELECT event_type, ts,
               MAX(ts) OVER (
                   PARTITION BY event_id % {N_INGEST_SHARDS}
                   ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS frontier
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(COUNT(*) FILTER (
               WHERE ts < frontier - INTERVAL {WATERMARK_DELAY_MIN} MINUTE
           ) AS BIGINT) AS n_rejected,
           CAST(COUNT(*) FILTER (
               WHERE ts < frontier - INTERVAL {WATERMARK_DELAY_MIN} MINUTE
           ) AS DOUBLE) / COUNT(*) AS rejected_ratio,
           CAST(MAX(CASE WHEN ts < frontier - INTERVAL {WATERMARK_DELAY_MIN} MINUTE
                    THEN date_diff('second', ts, frontier) END) AS BIGINT)
               AS max_late_secs
    FROM arrivals
    GROUP BY event_type
    """,
)
def watermark_late_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``withWatermark``'s late-data REJECTION policy:
    which rows would a 10-minute watermark drop, per event type?

    Watermark semantics, made explicit: each ingest shard advances an
    event-time frontier (running max of event time in arrival order);
    a row arriving with ``ts < frontier - delay`` is too late — its
    window's state has been evicted — and is dropped. Arrival order
    is modeled as ``event_id`` order within ``event_id % 8`` shards:
    per-PARTITION frontiers are exactly how Spark tracks watermarks
    before taking the global min, and sharding keeps the window
    function parallel (no global sort) at 100 TB.

    The streaming engine enforcing this drop for real — multi-batch
    replay, late rows vanishing from the aggregation — is pinned in
    ``tests/test_streaming.py``; this query is the oracle-checkable
    audit a pipeline runs to SIZE its watermark (rejected_ratio vs
    delay tradeoff)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy(F.col("event_id") % N_INGEST_SHARDS)
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    delay = F.expr(f"INTERVAL {WATERMARK_DELAY_MIN} MINUTES")
    arr = ev.select(
        "event_type",
        "ts",
        F.max("ts").over(w).alias("frontier"),
    ).withColumn("is_late", F.col("ts") < F.col("frontier") - delay)
    return arr.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("is_late").cast("bigint")).alias("n_rejected"),
        (
            F.sum(F.col("is_late").cast("bigint")).cast("double")
            / F.count(F.lit(1))
        ).alias("rejected_ratio"),
        # Floor-each seconds (unix_timestamp difference), NOT
        # timestampdiff(SECOND, ...): Spark's timestampdiff truncates
        # ELAPSED time while DuckDB's date_diff('second') counts
        # second-boundary crossings — off by one whenever the late
        # row's sub-second fraction exceeds the frontier's. Flooring
        # each side matches the boundary-count semantics exactly
        # (same pattern as streaming_left_outer_attrib).
        F.max(
            F.when(
                F.col("is_late"),
                F.unix_timestamp("frontier") - F.unix_timestamp("ts"),
            )
        ).cast("bigint").alias("max_late_secs"),
    )


TRENDING_TOP_N = 3


@query(
    "trending_event_types",
    oracle=f"""
    WITH wc AS (
        SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS w_start,
               event_type, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    ),
    r AS (
        SELECT w_start, event_type, n_events,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY w_start
                   ORDER BY n_events DESC, event_type) AS BIGINT) AS rk,
               n_events - LAG(n_events) OVER (
                   PARTITION BY event_type ORDER BY w_start) AS delta
        FROM wc
    )
    SELECT w_start, event_type, n_events, rk, delta
    FROM r WHERE rk <= {TRENDING_TOP_N}
    """,
)
def trending_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending dashboard: per 10-minute tumbling window, the top-3
    event types by count, each with its count delta vs that type's
    previous window — the classic "what's rising right now" feed.
    The delta is computed over ALL windows (lag by event_type across
    the full series) BEFORE the top-k filter, so a type that just
    broke into the top-3 still shows its true rise.

    Physical plan: one windowed count agg (map-side combine → one
    shuffle on (window, type)), then two window functions over the
    SMALL aggregate (windows × types rows, corpus-size-independent)
    — rank partitioned by window, lag partitioned by type. Top-N
    filtering after rank is Spark's WindowGroupLimit pushdown shape."""
    ev = table(spark, sf_dir, "events")
    wc = (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n_events")
    )
    w_rank = Window.partitionBy("w_start").orderBy(
        F.desc("n_events"), "event_type"
    )
    w_lag = Window.partitionBy("event_type").orderBy("w_start")
    # delta BEFORE rank: the top-N filter then sits directly above the
    # rank window, so Catalyst prunes per-window rows beyond N map-side
    # (WindowGroupLimit) without disturbing the full-series lag.
    return (
        wc.withColumn("delta", F.col("n_events") - F.lag("n_events").over(w_lag))
        .withColumn("rk", F.row_number().over(w_rank).cast("bigint"))
        .filter(F.col("rk") <= TRENDING_TOP_N)
        .select("w_start", "event_type", "n_events", "rk", "delta")
    )


@query(
    "gap_filled_daily_activity",
    oracle=f"""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               COUNT(*) AS n, {dsum_sql('value', 4)} AS day_value
        FROM events GROUP BY 1, 2
    ),
    span AS (
        SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ),
    cal AS (
        SELECT user_id,
               CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                   AS day
        FROM span
    ),
    filled AS (
        SELECT c.user_id, c.day, d.n, d.day_value
        FROM cal c LEFT JOIN daily d USING (user_id, day)
    )
    SELECT user_id, day,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
           last_value(day_value IGNORE NULLS) OVER w AS ffill_value,
           CAST(day - last_value(CASE WHEN n IS NOT NULL THEN day END
                                 IGNORE NULLS) OVER w AS BIGINT)
               AS days_since_active
    FROM filled
    WINDOW w AS (PARTITION BY user_id ORDER BY day)
    """,
)
def gap_filled_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with forward fill: densify each user's
    daily activity to a complete calendar (their first..last active
    day), carrying the last known daily value forward across gaps and
    reporting staleness (days since last activity) — the
    dashboard/feature-store shape Spark has no built-in for.

    Scale: the calendar derives from a per-user 2-column span agg and
    explodes to |span| rows per user — O(users × days), independent
    of event volume; the heavy event table is reduced FIRST (daily
    agg with map-side combine), so the explode and the forward-fill
    window touch only the densified daily grid, partitioned by
    user_id. Forward fill is ``last(col, ignorenulls=True)`` over a
    running frame — one window pass, no self-join, no UDF; filled
    values are bit-copies of the exact-decimal daily sums, so the
    oracle hash-matches."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "value"
    )
    daily = ev.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n"), dsum("value", 4).alias("day_value")
    )
    cal = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id", F.explode(F.expr("sequence(d0, d1)")).alias("day")
        )
    )
    filled = cal.join(daily, ["user_id", "day"], "left")
    w = Window.partitionBy("user_id").orderBy("day")
    active_day = F.when(F.col("n").isNotNull(), F.col("day"))
    return filled.select(
        "user_id",
        "day",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
        F.last("day_value", ignorenulls=True).over(w).alias("ffill_value"),
        F.datediff(
            F.col("day"), F.last(active_day, ignorenulls=True).over(w)
        )
        .cast("bigint")
        .alias("days_since_active"),
    )


# Trailing-8 EMA with power-of-2 decay: every term is value / 2^k —
# halving a double is EXACT (exponent decrement), and the add order is
# pinned left-to-right in both engines, so the smoothed series is
# bit-identical cross-engine with no decimal detour.
EMA_TAPS = 8


def _ema_terms_sql() -> str:
    terms = ["value"] + [
        f"COALESCE(lag(value, {k}) OVER w, 0) / {float(2 ** k)}"
        for k in range(1, EMA_TAPS)
    ]
    return " + ".join(terms)


# Shared with streaming_ema_stateful: the streaming/batch parity
# check is "same oracle string, two execution paradigms".
EMA8_ORACLE = f"""
    SELECT event_id, user_id, ts, value,
           {_ema_terms_sql()} AS ema8
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


@query("ema_event_value", oracle=EMA8_ORACLE)
def ema_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's event
    value over their trailing 8 events (decay 1/2) — the smoothed
    rate/load signal behind per-key throttling decisions. EMA is
    recursive in its textbook form (not windowable); truncating at 8
    taps with 2^-k weights makes it a finite lag-chain: one window
    pass, 7 ``lag`` reads sharing a single sort, no recursion, and —
    because the weights are powers of two — bit-exact across engines
    (see module constant). Missing taps (a user's first events)
    contribute 0, matching the truncated-kernel definition."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ema = F.col("value")
    for k in range(1, EMA_TAPS):
        ema = ema + F.coalesce(F.lag("value", k).over(w), F.lit(0)) / float(
            2**k
        )
    return ev.select("event_id", "user_id", "ts", "value", ema.alias("ema8"))


@query(
    "rolling_7day_active_users",
    oracle="""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events)
    SELECT d.day,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
    FROM days d
    JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
)
def rolling_7day_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users (WAU) per day — the metric
    shape windowed COUNT(DISTINCT) cannot express in either engine
    (distinct doesn't decompose over sliding frames). Each distinct
    (day, user) pair is EXPLODED into the ≤7 trailing grid days it
    makes the user active on (``sequence(day, day+6)``), then one
    groupBy counts distinct users per grid day; a broadcast semi-join
    against the observed-day grid drops synthetic days past the data's
    edge, matching the range-join formulation the oracle keeps.

    Scale: events reduce FIRST to distinct (day, user) pairs — one
    dedup shuffle over pairs, ~0.1% of event volume — then the
    explosion is a fixed 7× fan-out of pairs with NO join against the
    day grid (the prior formulation broadcast-nested-loop-joined the
    grid: O(days × pairs) comparisons, ~3650× the necessary work at a
    10-year span; this is O(7 × pairs) regardless of span). The
    exact-distinct-over-sliding-window alternative at extreme scale
    is per-day HLL sketch MERGE, which ``sketch_accuracy_eval``
    grades the error of."""
    ev = table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    du = ev.distinct()
    days = du.select("day").distinct()
    covered = du.select(
        F.explode(F.expr("sequence(day, date_add(day, 6))")).alias("day"),
        "user_id",
    )
    return (
        covered.join(F.broadcast(days), "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
