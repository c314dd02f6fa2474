"""Regression tests for the catalog table() memo invariants flagged
by the round-15 review (VERDICT item 7, ADVICE items 1/2/4):

* the UTC session-timezone pin must hold on every call, including
  memo HITS — downstream expressions are analyzed under the session
  zone at call time, not under the zone the frame was first read in;
* sibling sessions (newSession) must not share memoized frames — temp
  views and runtime conf are per-session;
* queries that reference one memoized table more than once (shared
  attribute IDs -> Catalyst DeduplicateRelations) must keep both
  sides' data columns under count(): count() and collect() row counts
  agree (the pruning-under-count bug class the value oracle cannot
  see, because it always collects all columns).
"""

from __future__ import annotations


def test_tz_pin_holds_on_memo_hit(spark, sf_dir):
    from go_http_data_pipeline_spark.catalog import table

    table(spark, sf_dir, "nation")  # prime the memo (also pins UTC)
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    table(spark, sf_dir, "nation")  # memo HIT must still re-pin
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_sibling_session_gets_its_own_frame(spark, sf_dir):
    from go_http_data_pipeline_spark.catalog import table

    base = table(spark, sf_dir, "nation")
    sib = spark.newSession()
    try:
        got = table(sib, sf_dir, "nation")
        # The frame handed to the sibling must be bound to IT (temp
        # views registered from the frame land in its session), not a
        # reuse of the base session's cached frame.
        assert got.sparkSession is sib
        assert base.sparkSession is spark
        assert got is not base
    finally:
        # Session-scoped cleanup only; the shared context stays up.
        pass


def test_multi_reference_memo_queries_survive_count_pruning(spark, sf_dir):
    """count() must agree with len(collect()) for queries that read
    the same memoized table twice (self-join / self-cogroup shapes):
    shared attribute IDs let Catalyst's relation dedup strip a side's
    data columns under count(), silently changing the row count
    (round 15 caught exactly this on embedding_neardup_pairs)."""
    import __spark_entry__ as e

    qs = e.queries()
    for name in (
        "embedding_neardup_pairs",  # self-cogroup (fresh=True guard)
        "market_share_evolution",   # two nation scans
        "nation_pairs_same_region", # nation self-join
    ):
        fn = qs.get(name)
        if fn is None:
            continue
        df = fn(spark, sf_dir)
        assert df.count() == len(df.collect()), name
