"""Per-host document caps (llm/sampling.py): batch/audit consistency
and the streaming state fold's eviction/idempotence/order-insensitivity
semantics on synthetic hosts. End-to-end values are the DuckDB
oracle's job (tools/check.py — both queries hash-checked; round 10
folded the standalone audit query's columns into
``host_document_caps``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_http_data_pipeline_spark.llm import sampling


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "source string, doc_id long, n_chars long"
    )


def _merge_rows(spark, rows):
    return sorted(
        map(
            tuple,
            sampling._hostcap_merge(_docs(spark, rows))
            .select("source", "doc_id", "src_rank")
            .collect(),
        )
    )


def test_cap_keeps_best_by_length_then_doc_id(spark, monkeypatch):
    monkeypatch.setattr(sampling, "HOST_CAP", 2)
    rows = [
        ("h1", 1, 100),
        ("h1", 2, 300),
        ("h1", 3, 300),  # ties with 2 -> smaller doc_id ranks first
        ("h1", 4, 50),
        ("h2", 5, 10),
    ]
    assert _merge_rows(spark, rows) == [
        ("h1", 2, 1),
        ("h1", 3, 2),
        ("h2", 5, 1),
    ]


def test_fold_is_order_insensitive_and_evicting(spark, monkeypatch):
    """Folding batches in EITHER order gives the batch answer over the
    union — which requires that a better document arriving later
    evicts an earlier admit (h1 doc 10 displaces doc 1)."""
    monkeypatch.setattr(sampling, "HOST_CAP", 2)
    b0 = [("h1", 1, 100), ("h1", 2, 200), ("h2", 3, 10)]
    b1 = [("h1", 10, 900), ("h2", 11, 5)]

    def fold(batches):
        state = None
        for rows in batches:
            cand = sampling._hostcap_merge(_docs(spark, rows))
            if state is not None:
                cand = cand.unionByName(state)
            state = sampling._hostcap_merge(cand)
        return sorted(
            map(
                tuple,
                state.select("source", "doc_id", "src_rank").collect(),
            )
        )

    want = _merge_rows(spark, b0 + b1)
    assert fold([b0, b1]) == want
    assert fold([b1, b0]) == want
    assert ("h1", 10, 1) in want and ("h1", 1, 3) not in want


def test_fold_absorbs_replayed_batch(spark, monkeypatch):
    """A replayed batch's rows are already in the state: re-folding
    the same batch leaves the state row-identical (the dedup before
    ranking is what guarantees ranks do not shift)."""
    monkeypatch.setattr(sampling, "HOST_CAP", 2)
    b0 = [("h1", 1, 100), ("h1", 2, 200), ("h1", 3, 150)]
    state = sampling._hostcap_merge(_docs(spark, b0))
    replay = sampling._hostcap_merge(
        sampling._hostcap_merge(_docs(spark, b0)).unionByName(state)
    )
    assert sorted(map(tuple, replay.collect())) == sorted(
        map(tuple, state.collect())
    )


def test_audit_columns_match_cap_output(spark, sf_dir):
    """The folded audit columns are consistent with the kept rows they
    ride on: per host, host_n_kept == the actual number of kept rows,
    and docs = kept + dropped."""
    rows = sampling.host_document_caps(spark, sf_dir).collect()
    assert rows
    by_host: dict = {}
    for r in rows:
        by_host.setdefault(r.source, []).append(r)
    for source, host_rows in by_host.items():
        kept, docs, dropped = (
            host_rows[0].host_n_kept,
            host_rows[0].host_n_docs,
            host_rows[0].host_n_dropped,
        )
        assert len({(r.host_n_docs, r.host_n_kept, r.host_n_dropped)
                    for r in host_rows}) == 1, source
        assert kept == len(host_rows), source
        assert docs == kept + dropped, source
        assert kept <= sampling.HOST_CAP


def test_streaming_state_equals_batch_query(spark, sf_dir):
    """End-to-end through the engine: the final state is row-identical
    to the batch window answer's kept rows (the streaming twin keeps
    the pre-fold 4-column shape; the batch query's audit columns are
    a per-host constant join on top of the same kept set)."""
    got = sorted(
        map(
            tuple,
            sampling.streaming_host_cap_state(spark, sf_dir).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            sampling.host_document_caps(spark, sf_dir)
            .select("source", "doc_id", "n_chars", "src_rank")
            .collect(),
        )
    )
    assert got == want and got
