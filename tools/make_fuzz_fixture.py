"""Build a perturbed fixture directory for differential fuzzing.

Subsamples every table from a source fixture (deterministic md5 row
selection), injects extra duplicate documents and null-bearing rows,
and writes the result as a new sf-dir. Running ``tools/check.py`` on
the output proves the Spark/DuckDB equivalences hold on data the
operators were never tuned against — the fixture-generalization check.

Usage: python tools/make_fuzz_fixture.py [src_sf_dir] [out_dir] [salt]

``salt`` (default ``fz``) varies the deterministic row selection, so
different salts produce DIFFERENT perturbed fixtures from the same
source — each one an independent generalization check (the same salt
always reproduces the same fixture, so recorded runs stay replayable).

Expected result on the output: every query green EXCEPT
``bcrypt_login_roundtrip`` — its oracle is a literal golden-VALUES
table pinned to the real fixture's derived users (the point of a
golden oracle), so it cannot follow perturbed data.
"""

from __future__ import annotations

import re
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Tables subsampled (dimension tables stay whole so joins stay sane).
SAMPLED = {"customer": 0.7, "orders": 0.6, "lineitem": 0.6, "events": 0.55,
           "documents": 0.7, "embeddings": 0.7}


def keep_expr(key: str, frac: float, salt: str = "fz") -> str:
    # The salt is interpolated into a SQL string literal: restrict it
    # to identifier-safe characters so a quote can't break (or inject
    # into) the generated DuckDB SQL.
    if not re.fullmatch(r"[A-Za-z0-9_]+", salt):
        raise ValueError(
            f"salt must match [A-Za-z0-9_]+, got {salt!r}"
        )
    thresh = int(frac * 4294967296)
    return (
        f"CAST(('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 8))"
        f" AS BIGINT) < {thresh}"
    )


KEYS = {
    "customer": "c_custkey", "orders": "o_orderkey", "lineitem":
    "l_orderkey * 16 + l_linenumber", "events": "event_id",
    "documents": "doc_id", "embeddings": "vec_id",
}


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fuzz_sf"
    salt = sys.argv[3] if len(sys.argv) > 3 else "fz"
    import os

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src_rel = f"'{src}/{t}.parquet'"
        if t in SAMPLED:
            pred = keep_expr(KEYS[t], SAMPLED[t], salt)
            sql = f"SELECT * FROM {src_rel} WHERE {pred}"
        else:
            sql = f"SELECT * FROM {src_rel}"
        if t == "documents":
            # Inject extra exact duplicates (new ids, copied text) so
            # the dedup family sees duplication the source lacked.
            sql = f"""
            WITH base AS ({sql})
            SELECT * FROM base
            UNION ALL
            SELECT doc_id + 1000000, text, lang, source, n_chars
            FROM base WHERE doc_id % 7 = 0
            """
        con.execute(
            f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
