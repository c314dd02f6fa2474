"""Model-based property test of the shared generational-index
machinery (streaming/genindex.py) that all three incremental indexes
(LSH bands, IVF cells, IVFPQ codes) sit on.

The unit tests in test_streaming/test_annindex/test_pqindex pin each
family's named scenarios (logical==physical, LWW re-add, replayed
delete, GC). This file pins the GENERAL law those scenarios are
instances of: for ANY interleaving of appends, deletes, and
compactions with increasing batch ids, the live rows equal a
five-line reference model — a row (key, src_batch) is live iff no
tombstone for its key is newer — regardless of where compactions
fall (replay idempotence has its own ids-go-backwards unit pins).
"""

from __future__ import annotations

import shutil
import tempfile

from go_http_data_pipeline_spark.streaming.genindex import GenIndex


def _live_rows(spark, idx):
    out = []
    for side in idx.live_sides(spark):
        out.extend((r.key, r.src_batch) for r in side.collect())
    return sorted(out)


def test_live_rows_match_model_under_replay(spark):
    """The replay extension of the law below: batch ids may REPEAT
    (a crash-replayed batch recreates its b/d-dir by overwrite) and a
    replayed id at or below the compaction high-water mark recreates
    a dir the read view must keep ignoring. The model mirrors the
    documented disk semantics directly — an executable spec:

    * visible rows = the newest complete generation's fold plus every
      per-batch dir with id > that generation's id;
    * tombstones = max t_batch per key over ALL live d-dirs;
    * a compaction folds the visible rows minus dead ones into c{id}
      and deletes every dir at or below id;
    * a row is live iff no tombstone for its key is newer than its
      src_batch stamp.
    """
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    op = st.tuples(
        st.sampled_from(["append", "delete", "compact"]),
        st.integers(0, 5),  # batch id: repeats/regressions = replays
        st.sets(st.integers(0, 4), min_size=1, max_size=3),
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(ops=st.lists(op, min_size=2, max_size=6))
    def check(ops):
        work = tempfile.mkdtemp(prefix="genprop_rp_")
        idx = GenIndex(
            work,
            bucket_cols=("key",),
            n_buckets=2,
            prefix="genpropr",
            tombstone_cols=("key",),
        )
        # Disk-state model: dir-id -> contents, mirroring the docs.
        b_dirs: dict[int, list[tuple[int, int]]] = {}
        d_dirs: dict[int, set[int]] = {}
        c_dirs: dict[int, list[tuple[int, int]]] = {}

        def model_live():
            hw = max(c_dirs, default=-1)
            vis = list(c_dirs.get(hw, []))
            for n, rows in b_dirs.items():
                if n > hw:
                    vis.extend(rows)
            tombs: dict[int, int] = {}
            for n, keys in d_dirs.items():
                for k in keys:
                    tombs[k] = max(tombs.get(k, -1), n)
            return sorted(
                (k, b) for k, b in vis if tombs.get(k, -1) <= b
            )

        try:
            for kind, bid, keys in ops:
                if kind == "append":
                    idx.append(
                        spark.createDataFrame(
                            [(k, bid) for k in sorted(keys)],
                            "key int, src_batch long",
                        ),
                        bid,
                    )
                    b_dirs[bid] = [(k, bid) for k in keys]
                elif kind == "delete":
                    idx.append_tombstones(
                        spark.createDataFrame(
                            [(k,) for k in sorted(keys)], "key int"
                        ),
                        bid,
                    )
                    d_dirs[bid] = set(keys)
                elif bid == max(c_dirs, default=-1):
                    # A replayed compaction whose generation is
                    # already COMPLETE never happens: callers replay a
                    # fold only when the crash predates _SUCCESS (the
                    # complete dir would be the read view's own input,
                    # and Spark refuses overwrite-while-read). Mirror
                    # the caller discipline and skip.
                    continue
                else:
                    idx.compact(spark, bid)
                    hw = max(c_dirs, default=-1)
                    vis = list(c_dirs.get(hw, []))
                    for n, rows in b_dirs.items():
                        if n > hw:
                            vis.extend(rows)
                    if vis or c_dirs:
                        tombs: dict[int, int] = {}
                        for n, keys_ in d_dirs.items():
                            for k in keys_:
                                tombs[k] = max(tombs.get(k, -1), n)
                        c_dirs[bid] = [
                            (k, b)
                            for k, b in vis
                            if tombs.get(k, -1) <= b
                        ]
                        for n in [n for n in b_dirs if n <= bid]:
                            del b_dirs[n]
                        for n in [n for n in d_dirs if n <= bid]:
                            del d_dirs[n]
                        for n in [
                            n for n in c_dirs if n <= bid and n != bid
                        ]:
                            del c_dirs[n]
                assert _live_rows(spark, idx) == model_live(), (
                    ops,
                    kind,
                    bid,
                )
        finally:
            idx.drop_generations(spark)
            shutil.rmtree(work, ignore_errors=True)

    check()


def test_live_rows_match_model_for_any_op_interleaving(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    op = st.tuples(
        st.sampled_from(["append", "delete", "compact"]),
        st.sets(st.integers(0, 5), min_size=1, max_size=4),
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(ops=st.lists(op, min_size=1, max_size=6))
    def check(ops):
        work = tempfile.mkdtemp(prefix="genprop_")
        idx = GenIndex(
            work,
            bucket_cols=("key",),
            n_buckets=2,
            prefix="genprop",
            tombstone_cols=("key",),
        )
        rows: list[tuple[int, int]] = []  # model: (key, src_batch)
        tombs: dict[int, int] = {}  # model: key -> newest t_batch
        try:
            for bid, (kind, keys) in enumerate(ops):
                if kind == "append":
                    df = spark.createDataFrame(
                        [(k, bid) for k in sorted(keys)],
                        "key int, src_batch long",
                    )
                    idx.append(df, bid)
                    rows.extend((k, bid) for k in keys)
                elif kind == "delete":
                    df = spark.createDataFrame(
                        [(k,) for k in sorted(keys)], "key int"
                    )
                    idx.append_tombstones(df, bid)
                    for k in keys:
                        tombs[k] = bid
                else:
                    idx.compact(spark, bid)
                want = sorted(
                    (k, b) for k, b in rows if tombs.get(k, -1) <= b
                )
                assert _live_rows(spark, idx) == want, (ops, bid)
        finally:
            idx.drop_generations(spark)
            shutil.rmtree(work, ignore_errors=True)

    check()
