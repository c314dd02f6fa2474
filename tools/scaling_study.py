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
        "Generated by tools/scaling_study.py.",
        "",
    ]
    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print(f"# wrote {out_md}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
