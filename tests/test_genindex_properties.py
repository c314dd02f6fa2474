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
