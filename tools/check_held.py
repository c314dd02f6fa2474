"""Certification harness for the HELD (unregistered) queries — the
capabilities staged for future registration whose oracles are written
but which the driver cannot check while the registry is frozen
(docs/STATUS.md rotation plan). Mirrors tools/check.py's comparison
(row count + column names + type drift + exact order-insensitive
values) so the pre-registration evidence is the same strictness the
driver gate will apply, and adds the robustness axes the registered
queries get from tools/robustness.py (3-replay byte determinism, and
partition + AQE invariance across session shapes).

The held roster lives HERE, in one place: registering a query in
registry.py means deleting its row below (the driver covers it from
then on).

Usage:
    python tools/check_held.py [sf_dir ...]          # oracle compare
    python tools/check_held.py --axes [sf_dir ...]   # robustness axes
    python tools/check_held.py -h | --help           # this text, no Spark
Default sf_dir is /root/testdata/sf0.01; pass several to certify at
multiple scales (the house evidence bar for registration is
sf0.001 + sf0.01 + sf0.1 + a fuzz fixture); both modes run every
directory passed.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def held_queries():
    """name -> (query_fn, staged_oracle_sql). Import inside so a bare
    --help never pays the Spark import.

    Round-15 roster: the incremental host-cap index twins (staged
    r14; planned registration r16 per the pre-committed window: add
    streaming/capindex.py to registry._MODULES) plus the
    manifest-store twins (staged r15 — the object-store seam driven
    through the same family: store-agnostic takedown exactness and
    the snapshot/time-travel read; planned registration ~r17, add
    streaming/manifestindex.py to registry._MODULES then). Earlier
    graduations per this tool's contract: the SemDeDup twins
    registered r14, ``streaming_ivfpq_index_with_deletes`` r13, and
    the ``ann_family_recall_eval_with_misses`` staging became the
    registered gate itself via the r13 _REFRESH swap."""
    from go_http_data_pipeline_spark.streaming import capindex as ci
    from go_http_data_pipeline_spark.streaming import manifestindex as mi

    return {
        "streaming_host_cap_index": (
            ci.streaming_host_cap_index,
            ci._CAP_STREAM_ORACLE,
        ),
        "streaming_host_cap_index_with_deletes": (
            ci.streaming_host_cap_index_with_deletes,
            ci._CAP_DELETE_ORACLE,
        ),
        "streaming_manifest_cap_takedown": (
            mi.streaming_manifest_cap_takedown,
            mi._MANIFEST_TAKEDOWN_ORACLE,
        ),
        "streaming_manifest_cap_timetravel": (
            mi.streaming_manifest_cap_timetravel,
            mi._MANIFEST_TIMETRAVEL_ORACLE,
        ),
    }


def _compare(spark, con, name, fn, osql, sf_dir) -> bool:
    from check import canon, type_drift

    t0 = time.time()
    sdf = fn(spark, sf_dir)
    scols, srows = sdf.columns, sdf.collect()
    otbl = con.execute(osql).arrow()
    ocols = otbl.schema.names
    orows = (
        list(zip(*[c.to_pylist() for c in otbl.columns])) if ocols else []
    )
    problems = []
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if sorted(scols) != sorted(ocols):
        problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
    else:
        drift = type_drift(sdf, otbl.schema)
        if drift:
            problems.append("type drift: " + "; ".join(drift))
    if not problems and canon(srows, scols) != canon(orows, ocols):
        problems.append("values differ")
    tag = "PASS" if not problems else "FAIL " + "; ".join(problems)
    print(
        f"{os.path.basename(sf_dir)} {name}: {tag} "
        f"({len(srows)} rows) [{time.time() - t0:.1f}s]",
        flush=True,
    )
    return not problems


def run_oracles(sf_dirs: list[str]) -> int:
    import duckdb

    from check import TABLES
    from go_http_data_pipeline_spark.session import get_spark

    if not held_queries():
        # Empty roster: nothing is held, so there is nothing to
        # certify — succeed loudly WITHOUT paying a Spark session.
        print("held roster is empty: nothing to check (rc=0)")
        return 0
    spark = get_spark("check_held")
    fails = 0
    for sf_dir in sf_dirs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        for name, (fn, osql) in held_queries().items():
            fails += not _compare(spark, con, name, fn, osql, sf_dir)
        con.close()
    return 1 if fails else 0


def run_axes(sf_dir: str) -> int:
    """The registered-query robustness axes for the held roster:
    3-replay byte determinism in one session, then invariance across
    (local[3], shuffle=5, AQE on) vs (local[8], shuffle=32, AQE off)
    — partition count and adaptive planning must never reach
    VALUES."""
    from robustness import _canon, _session

    if not held_queries():
        print("held roster is empty: nothing to check (rc=0)")
        return 0
    rc_code = 0
    spark = _session("local[8]", "8")
    qs = held_queries()
    flaky = []
    for name, (fn, _) in qs.items():
        outs = [_canon(fn(spark, sf_dir).collect()) for _ in range(3)]
        if not (outs[0] == outs[1] == outs[2]):
            flaky.append(name)
    print(f"held replay determinism: {len(qs)} queries, flaky={flaky}")
    rc_code |= bool(flaky)
    spark.stop()

    results = {}
    for tag, master, sp, aqe in (
        ("A", "local[3]", "5", True),
        ("C", "local[8]", "32", False),
    ):
        spark = _session(master, sp, aqe)
        results[tag] = {
            name: _canon(fn(spark, sf_dir).collect())
            for name, (fn, _) in held_queries().items()
        }
        spark.stop()
    bad = [n for n in results["A"] if results["A"][n] != results["C"][n]]
    print(
        f"held partition+AQE invariance: {len(results['A'])} queries,"
        f" mismatches={bad}"
    )
    rc_code |= bool(bad)
    return rc_code


def main() -> int:
    if any(a in ("-h", "--help") for a in sys.argv[1:]):
        # Honor the held_queries docstring's promise: a bare --help
        # never pays the Spark import (or a bogus oracle run against
        # a path named "--help").
        print(__doc__)
        return 0
    args = [a for a in sys.argv[1:] if a != "--axes"]
    unknown = [a for a in args if a.startswith("-")]
    if unknown:
        print(f"unknown option(s): {unknown}; see --help", file=sys.stderr)
        return 2
    if "--axes" in sys.argv[1:]:
        # Mirror the oracle mode: every passed sf_dir runs, so a
        # multi-scale axes invocation is never silently truncated.
        rc_code = 0
        for sf_dir in args or ["/root/testdata/sf0.01"]:
            rc_code |= run_axes(sf_dir)
        return rc_code
    return run_oracles(args or ["/root/testdata/sf0.01"])


if __name__ == "__main__":
    sys.exit(main())
