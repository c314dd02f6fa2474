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


def test_priority_estimate_eval_property(spark, sf_dir):
    """The estimator gate's one row: k == K_PRIORITY, the estimate is
    within the 20% line it claims (recomputed in python, not trusted
    from the boolean), and the boolean agrees with the recompute."""
    from go_http_data_pipeline_spark.llm.sampling import (
        K_PRIORITY,
        priority_sample_estimate_eval,
    )

    r = priority_sample_estimate_eval(spark, sf_dir).collect()
    assert len(r) == 1
    row = r[0]
    assert row.k == K_PRIORITY
    within = abs(row.est_total - row.exact_total) * 5 <= float(
        row.exact_total
    )
    assert row.within_20pct == within and within


def _pri(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, weight long, priority double")


def test_priority_fold_is_order_insensitive_and_evicting(spark, monkeypatch):
    """Folding batches in either order gives the top-(K+1) of the
    union — a higher-priority late arrival evicts an earlier admit."""
    from go_http_data_pipeline_spark.llm import sampling

    monkeypatch.setattr(sampling, "K_PRIORITY", 2)
    b0 = [(1, 10, 5.0), (2, 10, 4.0), (3, 10, 3.0)]
    b1 = [(4, 10, 9.0), (5, 10, 1.0)]

    def fold(batches):
        state = None
        for rows in batches:
            cand = sampling._priority_merge(_pri(spark, rows))
            if state is not None:
                cand = cand.unionByName(state)
            state = sampling._priority_merge(cand)
        return sorted(map(tuple, state.collect()))

    want = sorted(
        map(tuple, sampling._priority_merge(_pri(spark, b0 + b1)).collect())
    )
    assert fold([b0, b1]) == want
    assert fold([b1, b0]) == want
    # K+1 = 3 kept: doc 4 (9.0) evicted doc 3 (3.0); doc 5 never entered.
    assert [t[0] for t in sorted(want, key=lambda t: -t[2])] == [4, 1, 2]


def test_priority_fold_absorbs_replayed_batch(spark, monkeypatch):
    """Replaying a batch already folded into the state leaves the
    state row-identical (priority is a pure function of the doc, so
    the dedup removes the replay exactly)."""
    from go_http_data_pipeline_spark.llm import sampling

    monkeypatch.setattr(sampling, "K_PRIORITY", 2)
    b0 = [(1, 10, 5.0), (2, 10, 4.0), (3, 10, 3.0), (4, 10, 2.0)]
    state = sampling._priority_merge(_pri(spark, b0))
    replay = sampling._priority_merge(
        sampling._priority_merge(_pri(spark, b0)).unionByName(state)
    )
    assert sorted(map(tuple, replay.collect())) == sorted(
        map(tuple, state.collect())
    )


def test_streaming_priority_state_equals_batch_query(spark, sf_dir):
    """End-to-end through the engine: the incremental state finalizes
    to the batch priority-sampling answer row-for-row (shared oracle;
    the docs arrive as >= 2 micro-batches via the sharded source)."""
    from go_http_data_pipeline_spark.llm import sampling

    got = sorted(
        map(
            tuple,
            sampling.streaming_priority_sample_state(spark, sf_dir).collect(),
        )
    )
    want = sorted(
        map(tuple, sampling.priority_sample_docs(spark, sf_dir).collect())
    )
    assert got == want and len(got) == sampling.K_PRIORITY


def test_epoch_shuffle_no_single_partition_exchange(spark, sf_dir):
    """The per-epoch shuffle must never global-sort: the window is
    partitioned by (epoch, shard), so no single-partition exchange
    appears anywhere in the plan."""
    from go_http_data_pipeline_spark.llm.sampling import epoch_shuffle_shards
    from go_http_data_pipeline_spark.plans.inspect import plan_str

    plan = plan_str(epoch_shuffle_shards(spark, sf_dir), "simple")
    assert "Exchange SinglePartition" not in plan


def _tiny_docs_fixture(spark, tmp_path, n_docs):
    """A documents.parquet fixture dir with ``n_docs`` rows, for the
    small-corpus tau semantics (ADVICE r9 item 1). Written as ONE
    parquet file (the real fixtures' layout — DuckDB's view reads the
    path directly, not a Spark output directory)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": [f"text {i}" for i in range(n_docs)],
            "lang": ["en"] * n_docs,
            "source": [f"s{i % 3}" for i in range(n_docs)],
            "n_chars": pa.array(
                [100 + 37 * i for i in range(n_docs)], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _oracle_rows(sf_dir):
    import duckdb

    from go_http_data_pipeline_spark.llm.sampling import (
        PRIORITY_SAMPLE_ORACLE,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    out = con.execute(PRIORITY_SAMPLE_ORACLE).fetchall()
    con.close()
    return sorted(map(tuple, out))


def test_small_corpus_tau_is_zero_both_engines(spark, tmp_path):
    """Corpus <= K docs: the whole corpus is the sample and tau = 0,
    so every w_est equals the document's own weight EXACTLY (the DLT
    definition — min(priority) would inflate every estimate since
    priority >= weight). Pinned cross-engine: Spark and the DuckDB
    oracle agree row-for-row on the corrected arithmetic, so a future
    regression on either side hash-mismatches instead of both engines
    agreeing on the inflated value (ADVICE r9 item 1)."""
    from go_http_data_pipeline_spark.llm.sampling import (
        K_PRIORITY,
        priority_sample_docs,
    )

    sf_dir = _tiny_docs_fixture(spark, tmp_path, K_PRIORITY - 3)
    got = priority_sample_docs(spark, sf_dir)
    rows = got.collect()
    assert len(rows) == K_PRIORITY - 3  # sampled in full
    for r in rows:
        assert r.w_est == float(r.weight), r
    assert sorted(map(tuple, rows)) == _oracle_rows(sf_dir)


def test_k_plus_one_corpus_keeps_real_tau_both_engines(spark, tmp_path):
    """Exactly K+1 docs: the top set is full, tau is the (K+1)-th
    priority as before — the small-corpus guard must not disturb the
    populated-threshold path. Cross-engine row equality again."""
    from go_http_data_pipeline_spark.llm.sampling import (
        K_PRIORITY,
        priority_sample_docs,
    )

    sf_dir = _tiny_docs_fixture(spark, tmp_path, K_PRIORITY + 1)
    rows = priority_sample_docs(spark, sf_dir).collect()
    assert len(rows) == K_PRIORITY
    tau_floor = [r for r in rows if r.w_est > float(r.weight)]
    assert tau_floor, "with a populated threshold, some w_est rise to tau"
    assert sorted(map(tuple, rows)) == _oracle_rows(sf_dir)


def test_priority_merge_updated_weight_is_deterministic(spark):
    """If a doc_id ever arrives with a DIFFERENT weight (replay after
    an upstream update), the fold keeps the max-(priority, weight)
    row — deterministically, in either arrival order — instead of
    whichever duplicate a partitioning ordered first (ADVICE r9
    item 2)."""
    from go_http_data_pipeline_spark.llm.sampling import _priority_merge

    schema = "doc_id long, weight long, priority double"
    v1 = (7, 100, 1000.0)
    v2 = (7, 300, 3000.0)  # updated weight -> higher priority
    other = (8, 50, 500.0)
    for batch in ([v1, v2, other], [v2, other, v1]):
        out = _priority_merge(
            spark.createDataFrame(batch, schema)
        ).collect()
        got = {r.doc_id: (r.weight, r.priority) for r in out}
        assert got == {7: (300, 3000.0), 8: (50, 500.0)}
