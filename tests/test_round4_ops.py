"""Unit tests for the round-4 operators: exact expected outputs on
hand-built inputs (greedy BPE merge, EMA, gap fill, classifier
weights) plus fixture invariants and plan pins for the new joins."""

from __future__ import annotations

import datetime
import hashlib

from pyspark.sql import functions as F

from go_http_data_pipeline_spark.plans.inspect import join_strategies


def _docs_dir(spark, tmp_path, texts):
    """Write a minimal documents.parquet into tmp_path and return the
    dir (str) usable as sf_dir by the query functions."""
    rows = [
        (i + 1, t, "en", "unit", len(t)) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _events_dir(spark, tmp_path, rows):
    """rows: (event_id, ts datetime, user_id, event_type, value)."""
    df = spark.createDataFrame(
        [(e, ts, u, et, v, "{}") for e, ts, u, et, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


# --- BPE greedy merge semantics ---------------------------------------------


def test_bpe_apply_merge_greedy_nonoverlapping(spark, tmp_path):
    """x == y is the subtle case: 'aaaa' must become [aa][aa] and
    'aaa' must become [aa][a] (greedy left-to-right, non-overlapping),
    never a double-merge of the shared middle."""
    from go_http_data_pipeline_spark.llm.textstats import bpe_apply_merge

    # Top iteration-1 pair is 'aa' (weight 5: three from aaaa, two
    # from aaa); every other pair is rarer.
    d = _docs_dir(spark, tmp_path, ["aaaa aaa bc"])
    out = {r.pair: (r.merged_symbol, r.weight) for r in bpe_apply_merge(spark, d).collect()}
    assert set(out) == {"aa+aa", "aa+a", "b+c"}
    assert out["aa+aa"] == ("aa", 1)
    assert out["aa+a"] == ("aa", 1)
    assert out["b+c"] == ("aa", 1)


def test_bpe_apply_merge_distinct_chars(spark, tmp_path):
    """x != y: adjacent matches cannot overlap; all occurrences merge.
    'xyxy' -> [xy][xy]; 'axyb' -> [a][xy][b]."""
    from go_http_data_pipeline_spark.llm.textstats import bpe_apply_merge

    d = _docs_dir(spark, tmp_path, ["xyxy xyxy axyb"])
    out = {r.pair: r.weight for r in bpe_apply_merge(spark, d).collect()}
    assert out["xy+xy"] == 2
    assert out["a+xy"] == 1
    assert out["xy+b"] == 1


# --- EMA and gap fill --------------------------------------------------------


def test_ema_trailing8_hand_computed(spark, tmp_path):
    from go_http_data_pipeline_spark.operators.time_windows import (
        ema_event_value,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 7, "view", 1.0),
        (2, t0 + datetime.timedelta(minutes=1), 7, "view", 2.0),
        (3, t0 + datetime.timedelta(minutes=2), 7, "view", 4.0),
    ]
    d = _events_dir(spark, tmp_path, rows)
    got = {
        r.event_id: r.ema8 for r in ema_event_value(spark, d).collect()
    }
    assert got[1] == 1.0
    assert got[2] == 2.0 + 1.0 / 2
    assert got[3] == 4.0 + 2.0 / 2 + 1.0 / 4


def test_gap_fill_densifies_and_carries_forward(spark, tmp_path):
    from go_http_data_pipeline_spark.operators.time_windows import (
        gap_filled_daily_activity,
    )

    d1 = datetime.datetime(2024, 1, 1, 8, 0, 0)
    d4 = datetime.datetime(2024, 1, 4, 8, 0, 0)
    rows = [(1, d1, 7, "view", 10.0), (2, d4, 7, "view", 3.0)]
    d = _events_dir(spark, tmp_path, rows)
    out = {
        r.day.isoformat(): r
        for r in gap_filled_daily_activity(spark, d).collect()
    }
    assert sorted(out) == [
        "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
    ]
    assert out["2024-01-02"].n_events == 0
    assert out["2024-01-02"].ffill_value == 10.0
    assert out["2024-01-02"].days_since_active == 1
    assert out["2024-01-03"].days_since_active == 2
    assert out["2024-01-04"].n_events == 1
    assert out["2024-01-04"].ffill_value == 3.0
    assert out["2024-01-04"].days_since_active == 0


# --- Hashed classifier -------------------------------------------------------


def _py_weight(term: str) -> int:
    bucket = int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % 65536
    h = int(hashlib.md5(f"w{bucket}".encode()).hexdigest()[:8], 16)
    return (h % 2001) - 1000


def test_quality_classifier_matches_reference_weights(spark, tmp_path):
    from go_http_data_pipeline_spark.llm.textstats import (
        quality_classifier_logits,
    )

    d = _docs_dir(spark, tmp_path, ["alpha beta alpha"])
    row = quality_classifier_logits(spark, d).collect()[0]
    expected = 2 * _py_weight("alpha") + _py_weight("beta")
    assert row.logit == expected
    assert row.n_tokens == 3
    assert row.keep == (expected > 0)


# --- Fixture invariants ------------------------------------------------------


def test_zorder_files_partition_the_table(spark, sf_dir):
    from go_http_data_pipeline_spark.catalog import table
    from go_http_data_pipeline_spark.operators.storage import (
        zorder_file_stats,
    )

    stats = zorder_file_stats(spark, sf_dir).collect()
    orders = table(spark, sf_dir, "orders")
    n = orders.count()
    lo, hi = orders.agg(
        F.min("o_custkey"), F.max("o_custkey")
    ).first()
    assert sum(r.n_rows for r in stats) == n
    assert all(r.min_cust <= r.max_cust for r in stats)
    # The point of z-order: every file's box is bounded in BOTH dims.
    # Top-6-bit files span ≤ 32/256 of each dimension's equal-frequency
    # buckets; allow generous slack for bucket-boundary ties.
    assert all(r.max_cust - r.min_cust <= (hi - lo) / 2 for r in stats)


def test_snapshot_diff_classes_match_direct_counts(spark, sf_dir):
    from go_http_data_pipeline_spark.catalog import table
    from go_http_data_pipeline_spark.operators.setops import snapshot_diff

    c = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    by_type = {
        r.change_type: r.n
        for r in snapshot_diff(spark, sf_dir)
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by_type["insert"] == c.filter(k % 25 == 0).count()
    assert by_type["delete"] == c.filter(k % 17 == 3).count()
    assert by_type["update"] == c.filter(
        (k % 10 == 0) & (k % 17 != 3)
    ).count()


def test_rolling_wau_matches_direct_count_for_a_day(spark, sf_dir):
    from go_http_data_pipeline_spark.catalog import table
    from go_http_data_pipeline_spark.operators.time_windows import (
        rolling_7day_active_users,
    )

    out = {r.day: r.wau for r in rolling_7day_active_users(spark, sf_dir).collect()}
    day = sorted(out)[len(out) // 2]
    ev = table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    direct = (
        ev.filter(
            (F.col("day") >= F.date_sub(F.lit(day), 6))
            & (F.col("day") <= F.lit(day))
        )
        .select("user_id")
        .distinct()
        .count()
    )
    assert out[day] == direct


def test_edit_distance_bounds_and_candidate_parity(spark, sf_dir):
    from go_http_data_pipeline_spark.llm.dedup import (
        lsh_candidate_pairs,
        neardup_edit_distance,
    )

    out = neardup_edit_distance(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == lsh_candidate_pairs(spark, sf_dir).count()
    assert all(0.0 <= r.edit_similarity <= 1.0 for r in rows)
    assert all(r.edit_distance >= 0 for r in rows)


def test_incremental_merge_equals_recompute(spark, sf_dir):
    from go_http_data_pipeline_spark.catalog import table
    from go_http_data_pipeline_spark.determinism import dsum
    from go_http_data_pipeline_spark.operators.storage import (
        incremental_daily_counts,
    )

    inc = incremental_daily_counts(spark, sf_dir)
    full = (
        table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 4).alias("total_value"),
        )
    )
    assert inc.exceptAll(full).count() == 0
    assert full.exceptAll(inc).count() == 0


# --- Plan pins ---------------------------------------------------------------


def test_edit_distance_no_cartesian(spark, sf_dir):
    from go_http_data_pipeline_spark.llm.dedup import neardup_edit_distance

    strategies = join_strategies(neardup_edit_distance(spark, sf_dir))
    assert "CartesianProduct" not in strategies


def test_rolling_wau_broadcasts_day_grid(spark, sf_dir):
    from go_http_data_pipeline_spark.operators.time_windows import (
        rolling_7day_active_users,
    )

    df = rolling_7day_active_users(spark, sf_dir)
    strategies = join_strategies(df)
    # Non-equi range join against the broadcast day grid: nested-loop
    # with a broadcast side, never a cartesian shuffle product.
    assert "CartesianProduct" not in strategies
    assert any("Broadcast" in s for s in strategies)


def test_keep_best_no_cartesian(spark, sf_dir):
    from go_http_data_pipeline_spark.llm.dedup import dedup_keep_best_quality

    strategies = join_strategies(dedup_keep_best_quality(spark, sf_dir))
    assert "CartesianProduct" not in strategies


def test_tfidf_verify_no_cartesian_broadcast_count(spark, sf_dir):
    from go_http_data_pipeline_spark.llm.similarity import tfidf_cosine_verify

    df = tfidf_cosine_verify(spark, sf_dir)
    strategies = join_strategies(df)
    assert "CartesianProduct" not in strategies
    # The corpus-size scalar rides as a broadcast, not a collected
    # literal — no eager job at query-construction time.
    assert any("Broadcast" in s for s in strategies)


def test_graph_stats_no_cartesian_beyond_scalar_joins(spark, sf_dir):
    from go_http_data_pipeline_spark.llm.dedup import neardup_graph_stats

    df = neardup_graph_stats(spark, sf_dir)
    strategies = join_strategies(df)
    # The only non-equi joins are the 1-row stat crossJoins (broadcast
    # nested loop); the triangle joins themselves are hash/merge.
    assert "CartesianProduct" not in strategies


def test_components_long_chain_converges_and_frees_checkpoints(
    spark, tmp_path
):
    """A path-graph of near-dups (each doc overlaps only its
    neighbors) forces the label propagation through ~diameter rounds
    — exercising multi-round convergence AND the superseded-
    checkpoint cleanup (DataFrame.unpersist cannot free
    localCheckpoint blocks; the loop frees them via the
    persistent-RDD registry)."""
    from go_http_data_pipeline_spark.llm.dedup import dedup_components

    # 8 docs over a sliding 30-token window shifted by 1: banded-LSH
    # edges connect each doc to its ~4 nearest neighbors (verified by
    # probing the deterministic md5 bands), one component of
    # eccentricity 2 — the propagation runs multiple rounds, so at
    # least two checkpoints get superseded and must be freed.
    words = [f"w{i:03d}" for i in range(60)]
    texts = [" ".join(words[i : i + 30]) for i in range(8)]
    d = _docs_dir(spark, tmp_path, texts)

    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    out = dedup_components(spark, d).collect()
    after = jsc.getPersistentRDDs().size()

    comps = {r.doc_id: r.component_id for r in out}
    assert len(comps) == 8
    # One connected chain: everyone labeled with the min doc_id.
    assert set(comps.values()) == {min(comps)}
    assert sum(r.is_keeper for r in out) == 1
    # Block storage bounded: the run leaves at most the final labels
    # checkpoint + the memoized shingle/band caches — not one block
    # set per propagation round (diameter 7 would leak ~7).
    assert after - before <= 4
