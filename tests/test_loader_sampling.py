"""Data-loader sampling operators (llm/sampling.py session-7 pair):
priority sampling (weighted without replacement, Duffield-Lund-Thorup)
and the per-epoch loader shuffle. Values are cross-engine-checked by
the oracle gate; these tests pin the PROPERTIES the oracle can't see
(estimator identity against an independent python recompute, plan
shape, epoch-to-epoch shuffle behavior) plus the inspector's new
row-bounding rule."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_priority_sample_matches_python_recompute(spark, sf_dir):
    """Exact-equality pin against an independent python implementation
    of priority sampling over the same fixture: selected set, ranks,
    and the max(weight, tau) estimator all reproduced bit-for-bit
    (the priority is ONE correctly-rounded IEEE division, so python's
    float division is the same value)."""
    from go_http_data_pipeline_spark.catalog import table
    from go_http_data_pipeline_spark.llm.sampling import (
        K_PRIORITY,
        MOD,
        priority_sample_docs,
    )

    rows = table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    pri = [
        (
            float(r.n_chars * MOD) / (_md5_int(f"pri:{r.doc_id}") % MOD + 1),
            r.doc_id,
            r.n_chars,
        )
        for r in rows
    ]
    assert len(pri) > K_PRIORITY + 1, "fixture too small for the sample"
    pri.sort(key=lambda t: (-t[0], t[1]))
    tau = pri[K_PRIORITY][0]  # (K+1)-th priority
    expect = {
        doc_id: (w, q, rk + 1, max(float(w), tau))
        for rk, (q, doc_id, w) in enumerate(pri[:K_PRIORITY])
    }

    got = priority_sample_docs(spark, sf_dir).collect()
    assert len(got) == K_PRIORITY
    for r in got:
        w, q, rk, est = expect[r.doc_id]
        assert (r.weight, r.priority, r.rk, r.w_est) == (w, q, rk, est)


def test_priority_sample_plan_is_take_ordered(spark, sf_dir):
    """The corpus-sized step must be TakeOrderedAndProject (per-task
    local top-K+1), and the single-partition window over its K+1-row
    output must satisfy the registry-wide scale sweep via the
    inspector's TakeOrderedAndProject bounding rule."""
    from go_http_data_pipeline_spark.llm.sampling import priority_sample_docs
    from go_http_data_pipeline_spark.plans.inspect import (
        plan_str,
        unaggregated_global_sorts,
    )

    df = priority_sample_docs(spark, sf_dir)
    plan = plan_str(df, "simple")
    assert "TakeOrderedAndProject" in plan
    assert unaggregated_global_sorts(df) == []


def test_scan_bounded_by_take_ordered_is_allowed():
    """Inspector unit pin (string-level, like its siblings in
    test_plans.py): a scan whose chain to the single-partition
    exchange crosses TakeOrderedAndProject is row-bounded (<= k rows
    total) and must not be flagged."""
    from go_http_data_pipeline_spark.plans.inspect import (
        _node_depths,
        _scan_lines_without_aggregate_ancestor,
    )

    lines = [
        "+- Exchange SinglePartition, ENSURE_REQUIREMENTS",
        "   +- Window [row_number()]",
        "      +- TakeOrderedAndProject(limit=26, orderBy=[q DESC])",
        "         +- Scan parquet [doc_id,n_chars]",
    ]
    assert (
        _scan_lines_without_aggregate_ancestor(lines, _node_depths(lines), 0)
        == []
    )


def test_epoch_shuffle_contiguous_positions_and_coverage(spark, sf_dir):
    """Every (epoch, shard) cell numbers its documents contiguously
    from 1, and each epoch covers the whole corpus exactly once."""
    from go_http_data_pipeline_spark.catalog import table
    from go_http_data_pipeline_spark.llm.sampling import (
        N_EPOCHS,
        epoch_shuffle_shards,
    )

    n_docs = table(spark, sf_dir, "documents").count()
    df = epoch_shuffle_shards(spark, sf_dir)
    per_epoch = (
        df.groupBy("epoch")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("nd"),
        )
        .collect()
    )
    assert len(per_epoch) == N_EPOCHS
    assert all(r.n == n_docs and r.nd == n_docs for r in per_epoch)
    cells = (
        df.groupBy("epoch", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("pos").alias("lo"),
            F.max("pos").alias("hi"),
            F.countDistinct("pos").alias("npos"),
        )
        .collect()
    )
    for c in cells:
        assert (c.lo, c.hi, c.npos) == (1, c.n, c.n), c


def test_epoch_shuffle_actually_reshuffles_between_epochs(spark, sf_dir):
    """The point of the epoch key: shard composition and order CHANGE
    between epochs. Some document must land in different shards in
    epoch 0 vs epoch 1 (md5 re-keying; a fixture where no doc moved
    would mean the epoch salt is dead)."""
    from go_http_data_pipeline_spark.llm.sampling import epoch_shuffle_shards

    df = epoch_shuffle_shards(spark, sf_dir)
    e0 = df.filter(F.col("epoch") == 0).select(
        "doc_id", F.col("shard_id").alias("s0")
    )
    e1 = df.filter(F.col("epoch") == 1).select(
        "doc_id", F.col("shard_id").alias("s1")
    )
    moved = e0.join(e1, "doc_id").filter(F.col("s0") != F.col("s1")).count()
    assert moved > 0


def test_epoch_shuffle_no_single_partition_exchange(spark, sf_dir):
    """The per-epoch shuffle must never global-sort: the window is
    partitioned by (epoch, shard), so no single-partition exchange
    appears anywhere in the plan."""
    from go_http_data_pipeline_spark.llm.sampling import epoch_shuffle_shards
    from go_http_data_pipeline_spark.plans.inspect import plan_str

    plan = plan_str(epoch_shuffle_shards(spark, sf_dir), "simple")
    assert "Exchange SinglePartition" not in plan
