"""Driver-contract invariants: every query registered, every oracle
paired, import works without a SparkSession."""

from __future__ import annotations

import subprocess
import sys


def test_registry_loads_without_session():
    # Run in a fresh interpreter so no fixture-created session leaks in.
    code = (
        "import sys; sys.path.insert(0, '/root/repo');"
        "from go_http_data_pipeline_spark import registry;"
        "qs = registry.all_queries(); assert len(qs) >= 50, len(qs)"
    )
    subprocess.run([sys.executable, "-c", code], check=True, timeout=120)


def test_every_oracle_has_a_query():
    from go_http_data_pipeline_spark import registry

    qs, oracles = registry.all_queries(), registry.all_oracles()
    assert set(oracles) <= set(qs)


def test_newest_green_matches_files_on_disk():
    """The driver-window ordering is derived from CORRECTNESS_r*.json
    at import time (VERDICT r7 item 2: no more hand-copied frozensets).
    Recompute newest-green independently here and pin the result."""
    import json
    import re
    from pathlib import Path

    from go_http_data_pipeline_spark import registry

    newest = registry._newest_green_rounds()

    expected: dict[str, int] = {}
    for path in Path("/root/repo").glob("CORRECTNESS_r*.json"):
        rnd = int(re.fullmatch(r"CORRECTNESS_r(\d+)\.json", path.name).group(1))
        for name, rec in json.loads(path.read_text()).items():
            full = rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match")
            rows_only = rec.get("err") == "no_oracle" and rec.get("spark_rows") is not None
            if full or rows_only:
                expected[name] = max(expected.get(name, 0), rnd)
    assert newest == expected
    # Sanity anchors from the known driver history (r1..r7): the two
    # approx sketches were last recorded in r1; the LLM tranche's
    # stalest rows are r3; round 7 recorded a full 50-green window.
    assert expected["approx_distinct_parts"] == 1
    assert expected["minhash_lsh_pairs"] >= 3
    assert sum(1 for v in expected.values() if v == 7) >= 50


def test_window_order_never_checked_then_stalest_first():
    """First-50 window = refreshes/new queries, then greens stalest-
    first; rows-only sketches dead last."""
    from go_http_data_pipeline_spark import registry

    qs = list(registry.all_queries())
    newest = registry._newest_green_rounds()

    defer_active = (
        max(newest.values(), default=0) <= registry._DEFER_THROUGH_ROUND
    )
    ranks = [
        (9, 0) if k in registry._ROWS_ONLY
        else (2, 0)
        if defer_active and k in registry._DEFER and k not in newest
        else (0, 0) if k in registry._REFRESH or k not in newest
        else (1, newest[k])
        for k in qs
    ]
    assert ranks == sorted(ranks), "registry order must be rank-sorted"
    # Every rows-only sketch sorts after every checkable query.
    for k in registry._ROWS_ONLY:
        assert k in qs[-len(registry._ROWS_ONLY):]


def test_entry_contract_surface():
    import __spark_entry__ as e

    assert callable(e.entry)
    assert set(e.oracle_sql()) <= set(e.queries())


def test_results_invariant_under_partitioning(spark, sf_dir):
    # The determinism contract behind every oracle: results (including
    # float aggregates) must not depend on how the input is split.
    # Exercise the exact-decimal sum path on 1 vs 32 partitions.
    from pyspark.sql import functions as F

    from go_http_data_pipeline_spark.determinism import dsum

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def agg(df):
        return {
            tuple(r)
            for r in df.groupBy("l_returnflag")
            .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
            .collect()
        }

    assert agg(l.repartition(1)) == agg(l.repartition(32))


def test_deferral_expires_once_next_round_recorded(monkeypatch):
    """_DEFER holds a new query's first driver check back ONLY while
    the round it was added in is still being recorded; as soon as a
    newer CORRECTNESS round exists on disk the query must rank at the
    front as a normal never-checked row — no hand-edit in the next
    round (hand-maintained green state was the VERDICT r7 item 2
    hazard)."""
    from go_http_data_pipeline_spark import registry

    real = registry._newest_green_rounds()
    name = next(iter(registry._DEFER))
    assert name not in real, "deferred query must have no driver row yet"

    probe = {name: None, "q1_pricing_summary": None}
    # Current state (newest recorded round <= _DEFER_THROUGH_ROUND):
    # the deferred query sorts AFTER green rows.
    assert list(registry._ordered(probe)) == ["q1_pricing_summary", name]

    # Simulate the next round's file having landed: one green row
    # newer than the deferral horizon -> deferral expired, the
    # never-checked query jumps to the front.
    fake = dict(real)
    fake["q1_pricing_summary"] = registry._DEFER_THROUGH_ROUND + 1
    monkeypatch.setattr(
        registry._newest_green_rounds, "_cache", fake, raising=False
    )
    assert list(registry._ordered(probe)) == [name, "q1_pricing_summary"]
