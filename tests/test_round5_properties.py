"""Round-5 differential property tests (pure Python, no Spark).

The session-TTL kernel is hash-checked against a gap-sessionization
oracle, but the gate replays the fixture through ONE deterministic
batch sequence — it never varies the micro-batch boundaries. These
properties pin the kernel's streaming contract directly: the closed
sessions must be IDENTICAL no matter where the stream is cut into
batches (threading state across the cuts), must equal an independent
imperative reference, and any out-of-order cut must raise instead of
silently mis-sessionizing.
"""

from __future__ import annotations

import random

import pytest

from go_http_data_pipeline_spark.streaming.stateful import (
    _TTL_US,
    _fold_sessions,
    _quantize_1e4,
)


def ref_gap_sessions(events: list, ttl_us: int):
    """Imperative reference: split a sorted (ts_us, eid, value) stream
    at gaps > ttl_us; return (closed_sessions, open_tail) as the
    kernel's 5-field state tuples."""
    sessions: list = []
    cur = None
    for t, e, v in events:
        q = _quantize_1e4(v)
        if cur is None:
            cur = (t, t, e, 1, q)
        elif t - cur[1] > ttl_us:
            sessions.append(cur)
            cur = (t, t, e, 1, q)
        else:
            cur = (cur[0], t, e, cur[3] + 1, cur[4] + q)
    return sessions, cur


def _random_stream(rng: random.Random, n: int) -> list:
    """In-order stream with gaps straddling the TTL boundary (ties on
    ts get distinct eids so the (ts, eid) order stays total)."""
    events, t = [], 1_000_000_000_000_000
    for eid in range(n):
        gap = rng.choice(
            [0, 1, _TTL_US - 1, _TTL_US, _TTL_US + 1, 3 * _TTL_US]
        )
        t += gap
        events.append((t, eid, rng.uniform(-5, 5)))
    return events


def _fold_through_splits(events: list, cuts: list):
    """Run the kernel batch-by-batch across the given cut points,
    threading state like the streaming engine does."""
    closed, st = [], None
    for lo, hi in zip([0] + cuts, cuts + [len(events)]):
        c, st = _fold_sessions(7, events[lo:hi], st)
        closed.extend(c)
    return closed, st


def test_fold_sessions_batch_split_invariance():
    rng = random.Random(0xC0FFEE)
    for trial in range(200):
        events = _random_stream(rng, rng.randint(0, 40))
        want_closed, want_tail = ref_gap_sessions(events, _TTL_US)
        n_cuts = rng.randint(0, 6)
        cuts = sorted(rng.randint(0, len(events)) for _ in range(n_cuts))
        got_closed, got_tail = _fold_through_splits(events, cuts)
        assert got_closed == want_closed, (trial, cuts)
        assert got_tail == want_tail, (trial, cuts)


def test_fold_sessions_empty_batches_are_noops():
    events = [(10**15, 0, 1.0), (10**15 + 2 * _TTL_US, 1, 2.0)]
    closed, st = _fold_through_splits(events, [0, 1, 1, 2, 2])
    want_closed, want_tail = ref_gap_sessions(events, _TTL_US)
    assert closed == want_closed and st == want_tail


def test_fold_sessions_out_of_order_cut_raises():
    rng = random.Random(7)
    events = _random_stream(rng, 12)
    # Deliver a batch whose first event predates the state's last.
    _, st = _fold_sessions(7, events[:8], None)
    with pytest.raises(ValueError, match="out-of-order"):
        _fold_sessions(7, events[5:8], st)


def test_fold_sessions_ttl_boundary_is_strict():
    # gap == TTL continues the session; TTL + 1 closes it.
    t0 = 10**15
    closed, st = _fold_sessions(7, [(t0, 0, 1.0), (t0 + _TTL_US, 1, 1.0)], None)
    assert closed == [] and st[3] == 2
    closed, st = _fold_sessions(
        7, [(t0, 0, 1.0), (t0 + _TTL_US + 1, 1, 1.0)], None
    )
    assert len(closed) == 1 and st[3] == 1


# --- stateful EMA: batch-split invariance ------------------------------------


class _FakeState:
    """Minimal GroupState double for driving _ema_update off-engine."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _ema_ref(events: list) -> list:
    """Independent fold over the FULL stream (no state round-trip):
    same left-to-right IEEE add order as the batch lag-chain."""
    from go_http_data_pipeline_spark.streaming.stateful import _EMA_TAPS

    out, hist = [], []
    for t, e, v in events:
        acc = v
        for k in range(1, _EMA_TAPS):
            acc = acc + (hist[-k][2] if len(hist) >= k else 0.0) / float(2**k)
        out.append((e, acc))
        hist.append((t, e, v))
    return out


def _ema_through_splits(events: list, cuts: list) -> list:
    import pandas as pd

    from go_http_data_pipeline_spark.streaming.stateful import _ema_update

    state, out = _FakeState(), []
    for lo, hi in zip([0] + cuts, cuts + [len(events)]):
        batch = events[lo:hi]
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime([b[0] for b in batch], unit="us"),
                "event_id": [b[1] for b in batch],
                "value": [b[2] for b in batch],
            }
        )
        for res in _ema_update((7,), iter([pdf]), state):
            out.extend(zip(res["event_id"], res["ema8"]))
    return [(int(e), float(a)) for e, a in out]


def test_ema_update_batch_split_invariance():
    """The EMA must be BIT-identical no matter where the replay is
    cut: the state round-trip (parallel arrays, TAPS-1 trim) must
    reproduce exactly what a single uncut fold computes."""
    rng = random.Random(0xEA5E)
    for trial in range(100):
        n = rng.randint(0, 30)
        t = 10**15
        events = []
        for eid in range(n):
            t += rng.randint(1, 10**7)
            events.append((t, eid, rng.uniform(-100, 100)))
        want = _ema_ref(events)
        n_cuts = rng.randint(0, 5)
        cuts = sorted(rng.randint(0, n) for _ in range(n_cuts))
        got = _ema_through_splits(events, cuts)
        assert got == want, (trial, cuts)  # == on floats: bit-exact


# --- equidepth grid-histogram bucketing: semantic properties -----------------
# The Spark plan and the DuckDB oracle run the SAME integer rule, so
# the hash gate can't catch the rule itself being wrong. This Python
# mirror pins what "equal-frequency bucketing without a global sort"
# must mean: ids in range, monotone in value, and no bucket more than
# one cell's worth above its fair share.


def _equidepth_ref(values: list, grid: int, nb: int) -> dict:
    """Mirror of operators/storage._equidepth_bucketed for one
    dimension: equal-width cells, cell histogram, cumulative-count
    bucket ids. Returns {value: bucket}."""
    vmin, vmax = min(values), max(values)
    width = vmax - vmin + 1
    cells: dict = {}
    for v in values:
        cx = ((v - vmin) * grid) // width
        cells[cx] = cells.get(cx, 0) + 1
    total, cum, bx = len(values), 0, {}
    for cx in sorted(cells):
        bx[cx] = (cum * nb) // total
        cum += cells[cx]
    return {v: bx[((v - vmin) * grid) // width] for v in set(values)}


def test_equidepth_bucketing_properties():
    from go_http_data_pipeline_spark.operators.storage import Z_BITS, _Z_GRID

    nb = 2**Z_BITS
    rng = random.Random(0xB0C4)
    datasets = [
        [5] * 1000,                                  # single value
        list(range(-500, 500)),                      # distinct, negative
        [rng.randint(0, 50) for _ in range(2000)],   # few hot values
        [rng.randint(-(10**9), 10**9) for _ in range(3000)],  # sparse
        [0] * 1500 + list(range(1, 300)),            # one dominant cell
    ]
    for di, values in enumerate(datasets):
        buckets = _equidepth_ref(values, _Z_GRID, nb)
        assert all(0 <= b < nb for b in buckets.values()), di
        ordered = sorted(buckets)
        assert all(
            buckets[a] <= buckets[b] for a, b in zip(ordered, ordered[1:])
        ), di
        # Equal-frequency bound: a bucket holds at most its fair share
        # plus one straddling cell (the resolution limit of a 4096-cell
        # histogram — exactly what sampled range boundaries give too).
        from collections import Counter

        per_bucket = Counter(buckets[v] for v in values)
        vmin, vmax = min(values), max(values)
        width = vmax - vmin + 1
        cell_counts = Counter(((v - vmin) * _Z_GRID) // width for v in values)
        max_cell = max(cell_counts.values())
        fair = len(values) / nb
        assert all(
            c <= fair + max_cell for c in per_bucket.values()
        ), (di, per_bucket.most_common(3), fair, max_cell)
