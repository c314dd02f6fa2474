"""Scale-stress study: measured scaling exponents for the headline
plans (VERDICT r4 item 6).

Two experiments, results written to docs/SCALING.md:

A. **Generator 10x**: the driver's own fixtures sf0.01 -> sf0.1 are a
   true 10x scale-up from the same generator. Each studied query runs
   at both sizes (min-of-REPEATS, same discipline as bench.py) and we
   report the scaling exponent ``log10(t_big / t_small)`` — 1.0 is
   linear, < 1 sublinear (fixed planning/dispatch overhead amortizing
   plus sublinear plan work), > 1 superlinear (a plan that would NOT
   survive 100 TB).

B. **Amplified 10x on top of sf0.1** for the z-order pair: orders is
   replicated 10x with disjoint key spaces (shard semantics — the same
   thing a bigger generator run produces), and the NEW broadcast
   grid-histogram bucketing is raced against the OLD exact-ntile
   formulation (global single-task sort) it replaced. This is the
   direct evidence that the rewrite beats the straggler plan at scale.

C. **Time-span stretch for the rolling-WAU pair**: the OLD
   formulation (broadcast day-grid range join) does O(observed_days x
   pairs) comparisons, so its cost axis is the CALENDAR, not the row
   count — invisible in experiment A/B where the fixture spans 30
   days. Here the same 100k events are deterministically re-dated
   across a ~3000-day window (row count, user set and answer
   semantics unchanged) and the old range-join is raced against the
   NEW pair-explosion (O(7 x pairs), span-independent); both outputs
   are asserted equal first.

Usage: python tools/scaling_study.py [out_md]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL = "/root/testdata/sf0.01"
BIG = "/root/testdata/sf0.1"
AMP_DIR = "/tmp/scale10_sf1"
AMP_COPIES = 10
SPAN_DIR = "/tmp/span100_sf1"
SPAN_BLOCKS = 100  # events re-dated across 100 x 30-day blocks
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

# The study set: the most expensive headline queries (VERDICT r4 perf
# audit) plus every plan this round's rewrites touched.
STUDY = (
    "q1_pricing_summary",
    "revenue_by_nation",
    "market_share_evolution",
    "sql_api_revenue_by_year",
    "ngram_jaccard_pairs",
    "simhash_neardup_pairs",
    "minhash_lsh_pairs",
    "cosine_topk",
    "dedup_exact",
    "zorder_file_stats",
    "layout_skipping_eval",
    "rolling_7day_active_users",
)


def _timed(fn, *args) -> float:
    samples = []
    for _ in range(max(1, REPEATS)):
        t0 = time.perf_counter()
        fn(*args).count()
        samples.append(time.perf_counter() - t0)
    return round(min(samples), 3)


def _build_amplified(spark) -> None:
    """orders + events from sf0.1, replicated AMP_COPIES times with
    disjoint key spaces (shard semantics: copy i's keys are offset by
    i * (max_key + 1), dates/values untouched)."""
    import duckdb

    os.makedirs(AMP_DIR, exist_ok=True)
    # Skip only if BOTH outputs exist: a crash between the two COPYs
    # must not poison the cache into a half-built fixture forever.
    if os.path.exists(f"{AMP_DIR}/orders.parquet") and os.path.exists(
        f"{AMP_DIR}/events.parquet"
    ):
        return
    con = duckdb.connect()
    rng = f"range({AMP_COPIES})"
    con.execute(
        f"""
        COPY (
            SELECT o_orderkey + i * 6000000 AS o_orderkey,
                   o_custkey + i * 1500000 AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{BIG}/orders.parquet', (SELECT unnest({rng}) AS i)
        ) TO '{AMP_DIR}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT event_id + i * 100000000 AS event_id, ts,
                   user_id + i * 1000000 AS user_id,
                   event_type, value, props
            FROM '{BIG}/events.parquet', (SELECT unnest({rng}) AS i)
        ) TO '{AMP_DIR}/events.parquet' (FORMAT PARQUET)
        """
    )


def _build_span_stretched() -> None:
    """sf0.1 events re-dated over a ~3000-day window: each event's ts
    is shifted by an md5-derived whole number of 30-day blocks
    (deterministic, same idiom as the fixture subsampler). Row count
    and user ids are untouched; only the calendar widens — precisely
    the axis the legacy WAU range-join is quadratic in."""
    import duckdb

    os.makedirs(SPAN_DIR, exist_ok=True)
    if os.path.exists(f"{SPAN_DIR}/events.parquet"):
        return
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            SELECT event_id,
                   ts + (CAST(('0x' || substr(md5('sp' ||
                             CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)
                         % {SPAN_BLOCKS}) * INTERVAL 30 DAY AS ts,
                   user_id, event_type, value, props
            FROM '{BIG}/events.parquet'
        ) TO '{SPAN_DIR}/events.parquet' (FORMAT PARQUET)
        """
    )


def _legacy_wau(spark, sf_dir):
    """The formulation the round-5 rewrite REPLACED (kept here only
    as the scaling-study baseline): broadcast the observed-day grid
    and range-join it to the distinct (day, user) pairs — a
    BroadcastNestedLoopJoin doing O(observed_days x pairs)
    comparisons, so cost grows with the corpus TIME-SPAN."""
    from pyspark.sql import functions as F

    from go_http_data_pipeline_spark.catalog import table

    ev = table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    du = ev.distinct()
    days = du.select("day").distinct()
    return (
        F.broadcast(days.alias("d"))
        .join(
            du.alias("u"),
            (F.col("u.day") >= F.date_sub(F.col("d.day"), 6))
            & (F.col("u.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("u.user_id").alias("wau"))
    )


def _legacy_ntile_zorder(spark, sf_dir):
    """The formulation this round REPLACED (kept here only as the
    scaling-study baseline): exact ntile over the whole orders table
    = all rows through one task's sort, twice."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from go_http_data_pipeline_spark.catalog import table
    from go_http_data_pipeline_spark.operators.storage import (
        _Z_FILES_SHIFT,
        _zkey_spark,
        Z_BITS,
    )

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff("o_orderdate", F.lit("1970-01-01")).alias("day"),
    )
    n = 2 ** Z_BITS
    wx = Window.orderBy("o_custkey", "o_orderkey")
    wy = Window.orderBy("day", "o_orderkey")
    bucketed = o.select(
        "o_custkey",
        "day",
        (F.ntile(n).over(wx) - 1).alias("bx"),
        (F.ntile(n).over(wy) - 1).alias("by"),
    )
    keyed = bucketed.select(
        "o_custkey", "day", F.expr(_zkey_spark("bx", "by")).alias("zkey")
    )
    return keyed.groupBy(
        F.expr(f"CAST(shiftright(zkey, {_Z_FILES_SHIFT}) AS BIGINT)").alias(
            "file_id"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_custkey").cast("bigint").alias("min_cust"),
        F.max("o_custkey").cast("bigint").alias("max_cust"),
        F.min("day").cast("bigint").alias("min_day"),
        F.max("day").cast("bigint").alias("max_day"),
    )


def main() -> int:
    out_md = sys.argv[1] if len(sys.argv) > 1 else "docs/SCALING_MEASURED.md"

    import __spark_entry__ as e
    from go_http_data_pipeline_spark.llm.dedup import (
        lsh_bands_cached,
        shingles_cached,
    )
    from go_http_data_pipeline_spark.operators.storage import (
        zorder_file_stats,
    )
    from go_http_data_pipeline_spark.session import get_spark

    spark = get_spark("scaling-study")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()

    # Untimed: warm JVM + build the dedup ingest caches at both sizes
    # (one-time artifacts, their build is bench.py's own phase).
    for d in (SMALL, BIG):
        qs["q1_pricing_summary"](spark, d).count()
        shingles_cached(spark, d).count()
        lsh_bands_cached(spark, d).count()

    rows = []
    for name in STUDY:
        t_small = _timed(qs[name], spark, SMALL)
        t_big = _timed(qs[name], spark, BIG)
        exp = round(math.log10(max(t_big, 1e-3) / max(t_small, 1e-3)), 2)
        rows.append((name, t_small, t_big, exp))
        print(f"# {name}: sf0.01={t_small}s sf0.1={t_big}s exp={exp}", flush=True)

    _build_amplified(spark)
    z_new_1 = _timed(zorder_file_stats, spark, BIG)
    z_new_10 = _timed(zorder_file_stats, spark, AMP_DIR)
    z_old_1 = _timed(_legacy_ntile_zorder, spark, BIG)
    z_old_10 = _timed(_legacy_ntile_zorder, spark, AMP_DIR)
    print(
        f"# zorder new: {z_new_1}s -> {z_new_10}s | "
        f"old(ntile): {z_old_1}s -> {z_old_10}s"
    )

    wau_1 = _timed(qs["rolling_7day_active_users"], spark, BIG)
    wau_10 = _timed(qs["rolling_7day_active_users"], spark, AMP_DIR)
    print(f"# rolling_wau sf0.1={wau_1}s amp10={wau_10}s", flush=True)

    # C. time-span stretch: same rows, ~100x the observed days.
    _build_span_stretched()
    new_out = sorted(
        map(tuple, qs["rolling_7day_active_users"](spark, SPAN_DIR).collect())
    )
    old_out = sorted(map(tuple, _legacy_wau(spark, SPAN_DIR).collect()))
    assert new_out == old_out, "WAU formulations diverge on span fixture"
    w_new_30 = _timed(qs["rolling_7day_active_users"], spark, BIG)
    w_old_30 = _timed(_legacy_wau, spark, BIG)
    w_new_3k = _timed(qs["rolling_7day_active_users"], spark, SPAN_DIR)
    w_old_3k = _timed(_legacy_wau, spark, SPAN_DIR)
    print(
        f"# wau span race: new {w_new_30}s -> {w_new_3k}s | "
        f"old {w_old_30}s -> {w_old_3k}s"
    )

    lines = [
        "# SCALING — measured scale-stress evidence (round 5)",
        "",
        "Method: every time is min-of-%d (the bench discipline: this"
        % max(1, REPEATS),
        "box shows CPU-steal spikes; the min estimates engine cost).",
        "Exponent = log10(t_10x / t_1x); 1.0 = linear. Sub-second",
        "queries carry ~0.1-0.3 s fixed planning/dispatch overhead, so",
        "their exponents UNDERSTATE growth; the point of the table is",
        "that nothing is superlinear.",
        "",
        "## A. Generator 10x: sf0.01 -> sf0.1 (driver fixtures)",
        "",
        "| query | sf0.01 (s) | sf0.1 (s) | exponent |",
        "|---|---|---|---|",
    ]
    for name, t_small, t_big, exp in rows:
        lines.append(f"| {name} | {t_small} | {t_big} | {exp} |")
    amp_rows_o = AMP_COPIES
    lines += [
        "",
        "## B. Amplified 10x over sf0.1 (orders/events x%d, disjoint"
        % amp_rows_o,
        "key shards): the z-order rewrite vs the plan it replaced",
        "",
        "| plan | sf0.1 (s) | 10x (s) | growth |",
        "|---|---|---|---|",
        f"| zorder NEW (grid-histogram, broadcast) | {z_new_1} |"
        f" {z_new_10} | {round(z_new_10 / z_new_1, 2)}x |",
        f"| zorder OLD (exact ntile, single-task sort) | {z_old_1} |"
        f" {z_old_10} | {round(z_old_10 / z_old_1, 2)}x |",
        f"| rolling_7day_active_users (pair-explosion) | {wau_1} |"
        f" {wau_10} | {round(wau_10 / wau_1, 2)}x |",
        "",
        f"At 10x the new z-order plan is {round(z_old_10 / z_new_10, 2)}x"
        " faster than the ntile formulation it replaced, and the gap is",
        "structural: the old plan funnels every row through ONE task's",
        "sort (growth tracks data size on a single core), the new one",
        "does two distributed groupBys + broadcast joins, so its",
        "per-task work stays constant as executors scale out. The WAU",
        "pair-explosion grows with distinct (day,user) pairs only.",
        "",
        "",
        "## C. Time-span stretch: the WAU rewrite vs the replaced range join",
        "",
        "Same 100k events re-dated from 30 to ~3000 observed days;",
        "outputs of both formulations asserted equal first.",
        "",
        "| plan | 30-day span (s) | ~3000-day span (s) | growth |",
        "|---|---|---|---|",
        f"| WAU NEW (pair-explosion) | {w_new_30} | {w_new_3k} |"
        f" {round(w_new_3k / w_new_30, 2)}x |",
        f"| WAU OLD (broadcast range join) | {w_old_30} | {w_old_3k} |"
        f" {round(w_old_3k / w_old_30, 2)}x |",
        "",
        "The old plan's comparisons scale with observed_days x pairs",
        "(the calendar axis experiments A/B cannot see on a 30-day",
        "fixture); the explosion's 7x pair fan-out is span-independent.",
        "",
        "Generated by tools/scaling_study.py.",
        "",
    ]
    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print(f"# wrote {out_md}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
