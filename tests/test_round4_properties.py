"""Differential property tests: the round-4 operators vs independent
pure-Python reference implementations over randomized inputs.

The DuckDB oracles prove Spark and DuckDB agree — but both sides run
the SAME SQL algorithm, so an algorithmic bug shared by the two SQL
formulations would pass the hash gate. A third, imperative Python
reference breaks that symmetry (the same reasoning as language_id's
cross-paradigm check).
"""

from __future__ import annotations

import random

from pyspark.sql import Row


# --- pure-Python references --------------------------------------------------


def ref_bpe_merge(term: str, x: str, y: str) -> list[str]:
    """Greedy left-to-right non-overlapping BPE merge of (x, y)."""
    out, i = [], 0
    while i < len(term):
        if i + 1 < len(term) and term[i] == x and term[i + 1] == y:
            out.append(x + y)
            i += 2
        else:
            out.append(term[i])
            i += 1
    return out


def ref_bpe_round2(texts: list[str], top_k: int):
    """Full reference of bpe_apply_merge: vocab, top iteration-1
    pair, merge application, pair recount, deterministic top-k."""
    vocab: dict[str, int] = {}
    for t in texts:
        for term in t.split(" "):
            if term:
                vocab[term] = vocab.get(term, 0) + 1
    pairs1: dict[str, int] = {}
    for term, cnt in vocab.items():
        for i in range(len(term) - 1):
            p = term[i : i + 2]
            pairs1[p] = pairs1.get(p, 0) + cnt
    if not pairs1:
        return None, []
    top = sorted(pairs1.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    x, y = top[0], top[1]
    pairs2: dict[str, int] = {}
    for term, cnt in vocab.items():
        syms = ref_bpe_merge(term, x, y)
        for a, b in zip(syms, syms[1:]):
            p = f"{a}+{b}"
            pairs2[p] = pairs2.get(p, 0) + cnt
    ranked = sorted(pairs2.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    return x + y, [
        (pair, w, rk + 1) for rk, (pair, w) in enumerate(ranked)
    ]


def ref_ema8(values: list[float]) -> list[float]:
    out = []
    for i in range(len(values)):
        acc = values[i]
        for k in range(1, 8):
            acc += (values[i - k] if i - k >= 0 else 0.0) / (2.0**k)
        out.append(acc)
    return out


# --- differential tests ------------------------------------------------------


def _write_docs(spark, tmp_path, texts):
    rows = [(i + 1, t, "en", "unit", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_bpe_apply_merge_matches_python_reference(spark, tmp_path):
    from go_http_data_pipeline_spark.llm.textstats import (
        TOP_BPE_PAIRS,
        bpe_apply_merge,
    )

    rng = random.Random(20260814)
    for trial in range(4):
        # Small alphabet maximizes merge collisions (the x == y runs
        # and adjacent-overlap cases that make greedy merging subtle).
        texts = [
            " ".join(
                "".join(rng.choice("aab") for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(3, 10))
            )
            for _ in range(rng.randint(2, 5))
        ]
        d = _write_docs(spark, tmp_path / f"t{trial}", texts)
        merged_symbol, expected = ref_bpe_round2(texts, TOP_BPE_PAIRS)
        got = sorted(
            (r.pair, r.weight, r.rk) for r in bpe_apply_merge(spark, d).collect()
        )
        assert got == sorted(expected), f"trial {trial}: texts={texts}"
        if got:
            syms = {r.merged_symbol for r in bpe_apply_merge(spark, d).collect()}
            assert syms == {merged_symbol}


def test_ema_matches_python_reference(spark, tmp_path):
    import datetime

    from go_http_data_pipeline_spark.operators.time_windows import (
        ema_event_value,
    )

    rng = random.Random(7)
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    vals_by_user: dict[int, list[float]] = {}
    eid = 0
    for user in (1, 2):
        for i in range(12):
            eid += 1
            v = round(rng.uniform(-50, 50), 4)
            vals_by_user.setdefault(user, []).append(v)
            rows.append(
                Row(
                    event_id=eid,
                    ts=t0 + datetime.timedelta(minutes=eid),
                    user_id=user,
                    event_type="view",
                    value=v,
                    props="{}",
                )
            )
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = ema_event_value(spark, str(tmp_path)).collect()
    by_user: dict[int, list] = {}
    for r in sorted(out, key=lambda r: r.event_id):
        by_user.setdefault(r.user_id, []).append(r.ema8)
    for user, vals in vals_by_user.items():
        assert by_user[user] == ref_ema8(vals)


def test_zorder_interleave_is_a_bijection():
    """The generated bit-interleave must be invertible on the bucket
    domain — a collision would silently merge unrelated (x, y) cells
    into one curve position."""
    from go_http_data_pipeline_spark.operators.storage import Z_BITS

    def interleave(x: int, y: int) -> int:
        z = 0
        for b in range(Z_BITS):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    seen = set()
    rng = random.Random(3)
    pts = [(rng.randrange(2**Z_BITS), rng.randrange(2**Z_BITS)) for _ in range(4000)]
    for x, y in set(pts):
        z = interleave(x, y)
        assert z not in seen
        seen.add(z)
        assert 0 <= z < 4**Z_BITS
