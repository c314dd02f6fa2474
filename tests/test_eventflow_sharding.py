"""Semantic edge-case tests for the event-flow and dataset-assembly
operators. The DuckDB oracle pins cross-engine value equality; these
tests pin the SEMANTICS on constructed micro-fixtures (the oracle
can't tell whether both engines are wrong the same way about, e.g.,
a click that precedes every view)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _events(spark, rows):
    """(event_id, ts, user_id, event_type, value, props) events table
    written to a temp view-compatible DataFrame."""
    return spark.createDataFrame(
        [
            (
                i,
                datetime.datetime(2024, 1, 1, 0, m),
                uid,
                etype,
                1.0,
                "{}",
            )
            for i, (uid, m, etype) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )


def _funnel_on(spark, rows, monkeypatch):
    from go_http_data_pipeline_spark.operators import eventflow

    df = _events(spark, rows)
    monkeypatch.setattr(
        eventflow, "table", lambda _spark, _sf, _name: df
    )
    return {
        r["user_id"]: r
        for r in eventflow.funnel_view_click_purchase(spark, "ignored").collect()
    }


def test_funnel_requires_strict_order(spark, monkeypatch):
    """A click BEFORE the first view must not advance the funnel, and
    a purchase before the qualifying click must not either."""
    rows = [
        # user 1: click at t0, view at t1, purchase at t2 -> the click
        # precedes the view, so stage stops at 1 (view only)... but a
        # second click after the view would advance it.
        (1, 0, "click"),
        (1, 1, "view"),
        (1, 2, "purchase"),
        # user 2: proper view -> click -> purchase.
        (2, 0, "view"),
        (2, 1, "click"),
        (2, 2, "purchase"),
        # user 3: purchase between view and click: not counted.
        (3, 0, "view"),
        (3, 1, "purchase"),
        (3, 2, "click"),
    ]
    out = _funnel_on(spark, rows, monkeypatch)
    assert out[1]["stage"] == 1  # click was too early
    assert out[2]["stage"] == 3  # full conversion
    assert out[3]["stage"] == 2  # purchase preceded the click
    assert out[3]["purchase_ts"] is None


def test_funnel_same_timestamp_is_not_after(spark, monkeypatch):
    """Strictly-after semantics: a click at the exact same timestamp
    as the view does not count."""
    rows = [(1, 0, "view"), (1, 0, "click")]
    out = _funnel_on(spark, rows, monkeypatch)
    assert out[1]["stage"] == 1


def test_error_burst_resets_on_interleaved_event(spark, monkeypatch):
    """4 errors with a view in the middle are two runs of 2 — below
    the threshold — while 3 consecutive errors are one run."""
    from go_http_data_pipeline_spark.operators import eventflow

    rows = [
        (1, 0, "error"), (1, 1, "error"), (1, 2, "view"),
        (1, 3, "error"), (1, 4, "error"),
        (2, 0, "error"), (2, 1, "error"), (2, 2, "error"),
    ]
    df = _events(spark, rows)
    monkeypatch.setattr(eventflow, "table", lambda *_: df)
    out = eventflow.error_burst_runs(spark, "ignored").collect()
    assert len(out) == 1
    assert out[0]["user_id"] == 2 and out[0]["n_errors"] == 3


def test_split_assignment_is_growth_stable(spark, sf_dir):
    """A document's split depends only on its id: assigning a PREFIX
    of the corpus yields exactly the same splits the full corpus
    does (the property randomSplit lacks)."""
    from go_http_data_pipeline_spark.llm.sharding import (
        dataset_split_assignment,
    )

    full = {
        r["doc_id"]: r["split"]
        for r in dataset_split_assignment(spark, sf_dir).collect()
    }
    # Re-run on a "smaller corpus": the first half of the doc ids.
    cutoff = sorted(full)[len(full) // 2]
    from go_http_data_pipeline_spark.llm import sharding
    from go_http_data_pipeline_spark.catalog import table as real_table

    sub = real_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") <= cutoff
    )
    import unittest.mock as mock

    with mock.patch.object(sharding, "table", lambda *_: sub):
        half = {
            r["doc_id"]: r["split"]
            for r in dataset_split_assignment(spark, "ignored").collect()
        }
    assert half == {k: v for k, v in full.items() if k <= cutoff}


def test_budget_selection_boundary(spark, sf_dir):
    """The selected set is a prefix of the md5-priority order, its
    token sum is within the budget, and adding the first unselected
    doc would exceed it."""
    from go_http_data_pipeline_spark.llm.sharding import (
        token_budget_selection,
    )

    rows = sorted(
        token_budget_selection(spark, sf_dir).collect(),
        key=lambda r: r["cum_tokens"],
    )
    total = rows[-1]["cum_tokens"]
    budget = total // 2
    sel = [r for r in rows if r["selected"]]
    unsel = [r for r in rows if not r["selected"]]
    # prefix property: every selected cum <= every unselected cum
    assert sel and unsel
    assert sel[-1]["cum_tokens"] <= budget
    assert unsel[0]["cum_tokens"] > budget
    # cum_tokens is consistent: the running sum of n_tokens
    run = 0
    for r in rows:
        run += r["n_tokens"]
        assert r["cum_tokens"] == run


def test_semdedup_drop_rule_invariants(spark, sf_dir):
    """The per-pair drop rule's true invariants: drops only happen to
    vectors with near-dups, loners are all kept, and the lowest
    duplicated id always survives. (NOT one-survivor-per-chain: the
    pair relation is not transitive — component dedup is
    dedup_components' job.)"""
    from go_http_data_pipeline_spark.llm.semdedup import (
        semantic_dedup_verdicts,
    )

    out = semantic_dedup_verdicts(spark, sf_dir).collect()
    by_id = {r["vec_id"]: r for r in out}
    kept_dups = [r for r in out if r["n_neardups"] > 0 and r["keep"]]
    dropped = [r for r in out if not r["keep"]]
    # drops only happen to vectors that HAVE near-dups
    assert all(r["n_neardups"] > 0 for r in dropped)
    # loners are kept
    assert all(r["keep"] for r in out if r["n_neardups"] == 0)
    # at least one representative survives among the duplicated
    if dropped:
        assert kept_dups, "every duplicate chain lost all members"
        # and the globally lowest duplicated id is always kept
        lowest_dup = min(r["vec_id"] for r in out if r["n_neardups"] > 0)
        assert by_id[lowest_dup]["keep"]
