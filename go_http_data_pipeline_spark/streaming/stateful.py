"""Custom stateful streaming: ``applyInPandasWithState`` (SURVEY.md
§2.9 T5 — the in-stream form of the keyed write-back, and the escape
hatch for operators Spark's built-in stateful aggs can't express).

Demo operator: per-user running profile — cumulative event count,
cumulative value sum, and the timestamp of the latest event — updated
per micro-batch with explicit state. This is the streaming version of
"UPDATE profile SET ... WHERE user_id = ?" executed as grouped state,
no external store.

State is a tuple per user_id; at scale Spark partitions state by the
grouping key across executors and checkpoints it — the operator code
is identical on one core or a thousand.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n long, total_scaled long, last_ts_us long"


def _quantize_1e4(v: float) -> int:
    """value -> integer 1e-4 units with HALF_UP ties — the same
    rounding Spark's DECIMAL(18,4) cast and DuckDB's DECIMAL cast
    apply, so the stateful sum lands on the identical integers as
    the ``dsum`` oracle path."""
    import decimal

    return int(
        decimal.Decimal(repr(v)).scaleb(4).to_integral_value(
            rounding=decimal.ROUND_HALF_UP
        )
    )


def _update_profile(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total_scaled, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # Exact integer accumulation (1e-4 units): order-independent
        # across batches, partitions, and replays — which is what
        # makes this custom stateful operator ORACLE-checkable, not
        # just rows-only.
        total_scaled += sum(_quantize_1e4(v) for v in pdf["value"])
        # Normalize the pandas datetime unit explicitly: Arrow may hand
        # the column over as datetime64[us] or [ns] depending on the
        # transfer path, and a bare astype(int64) would silently yield
        # whichever unit arrived. Forcing [us] first makes the state's
        # last_ts_us truly microseconds in both cases.
        batch_max = int(pdf["ts"].astype("datetime64[us]").astype("int64").max())
        last_us = max(last_us, batch_max)
    state.update((n, total_scaled, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total_scaled / 1e4],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """events stream -> per-user running profile (update mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


from ..registry import query as _query


from ..determinism import dsum_sql as _dsum_sql


@_query(
    "stateful_user_profiles",
    oracle=f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           {_dsum_sql('value', 4)} AS total_value,
           MAX(ts) AS last_ts
    FROM events
    GROUP BY user_id
    """,
)
def run_user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the stateful operator over the bounded events replay and
    return the final per-user profiles (latest update per user).
    Exact integer state (1e-4 units, HALF_UP — the DECIMAL(18,4)
    rounding both engines share) makes even this applyInPandasWithState
    path hash-match the relational oracle."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .core import events_stream, run_to_memory

    ev = events_stream(spark, sf_dir)
    out = run_to_memory(
        spark, user_profile_stream(ev), "user_profiles", output_mode="update"
    )
    # One update row per (user, micro-batch): keep the final one.
    # last_ts leaves as NTZ: the state schema keeps the instant, but
    # results are pure UTC wall times like every fixture timestamp
    # (session tz pinned UTC), so output can't drift with host tz.
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .withColumn("last_ts", F.col("last_ts").cast("timestamp_ntz"))
    )


# --- Stateful trailing-8 EMA -------------------------------------------------

_EMA_OUT_SCHEMA = (
    "event_id long, user_id long, ts timestamp, value double, ema8 double"
)
# Last up-to-(EMA_TAPS-1) events per user, kept as parallel arrays
# (fixed struct schema; Spark state stores cannot hold ragged tuples
# of rows).
_EMA_STATE_SCHEMA = "ts_us array<long>, eid array<long>, vals array<double>"

# Single-sourced with the batch twin: tap count AND oracle both come
# from operators/time_windows, so the parity pair cannot drift.
from ..operators.time_windows import EMA_TAPS as _EMA_TAPS  # noqa: E402


def _ema_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    hts, heid, hvals = state.get if state.exists else ([], [], [])
    hist = list(zip(hts, heid, hvals))
    rows = []
    for pdf in pdfs:
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
        for t, e, v in zip(ts_us, pdf["event_id"], pdf["value"]):
            rows.append((int(t), int(e), float(v)))
    # Event-time order within the batch; across batches the replay is
    # time-ordered (file-source batches preserve fixture order), which
    # is the standard in-order assumption for emit-on-arrival signals.
    rows.sort()
    # That assumption is CHECKED, not trusted: hist's tail is the last
    # emitted (ts, event_id), so a batch starting before it means the
    # source split the replay out of event-time order — fail loudly
    # here instead of silently diverging from the batch oracle at the
    # hash-compare (a multi-file fixture or a repartitioned source
    # would otherwise corrupt the EMA undetectably).
    if rows and hist and (rows[0][0], rows[0][1]) < (hist[-1][0], hist[-1][1]):
        raise ValueError(
            f"out-of-order replay for user {user_id}: batch starts at "
            f"(ts_us={rows[0][0]}, event_id={rows[0][1]}) but state last "
            f"emitted (ts_us={hist[-1][0]}, event_id={hist[-1][1]})"
        )
    out = []
    for t, e, v in rows:
        # EXACT mirror of the batch lag-chain: left-to-right adds,
        # missing taps contribute +0.0/2^k — same association, same
        # IEEE roundings, bit-identical result.
        acc = v
        for k in range(1, _EMA_TAPS):
            prev = hist[-k][2] if len(hist) >= k else 0.0
            acc = acc + prev / float(2**k)
        out.append((e, t, v, acc))
        hist.append((t, e, v))
    hist = hist[-(_EMA_TAPS - 1):]
    state.update(
        (
            [h[0] for h in hist],
            [h[1] for h in hist],
            [h[2] for h in hist],
        )
    )
    yield pd.DataFrame(
        {
            "event_id": [o[0] for o in out],
            "user_id": [user_id] * len(out),
            "ts": pd.to_datetime([o[1] for o in out], unit="us"),
            "value": [o[2] for o in out],
            "ema8": [o[3] for o in out],
        }
    )


def ema_stream(events: DataFrame) -> DataFrame:
    return events.groupBy("user_id").applyInPandasWithState(
        _ema_update,
        outputStructType=_EMA_OUT_SCHEMA,
        stateStructType=_EMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _ema_oracle() -> str:
    from ..operators.time_windows import EMA8_ORACLE

    return EMA8_ORACLE


@_query("streaming_ema_stateful", oracle=_ema_oracle())
def run_streaming_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trailing-8 EMA as a STREAMING stateful operator: per-user
    state holds the last 7 (ts, event_id, value) triples; every
    arriving event emits its smoothed value immediately — the
    per-key signal a streaming rate limiter actually consumes, where
    the batch twin (`ema_event_value`) is the backfill path.

    Streaming/batch parity is hash-checked: this query shares the
    batch twin's ORACLE STRING verbatim, and the Python state update
    mirrors the batch lag-chain's exact add order (see `_ema_update`)
    — so `applyInPandasWithState` must reproduce the window-function
    result bit-for-bit over the bounded replay.

    Scale: state is 7 triples per user, partitioned by the grouping
    key and checkpointed by the engine; emission is append-mode
    (no retraction), resting on in-order arrival per key — the
    fixture replay is time-ordered, and a production deployment
    bounds disorder with a watermark-driven reorder buffer
    upstream."""
    from pyspark.sql import functions as F

    from .core import events_stream, run_to_memory

    ev = events_stream(spark, sf_dir).select(
        "event_id", "user_id", "ts", "value"
    )
    out = run_to_memory(spark, ema_stream(ev), "streaming_ema", "append")
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "value",
        "ema8",
    )


# --- TTL-evicting sessions (transformWithState, Spark 4.x) ------------------

_SESS_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp,"
    " n_events long, total_value double"
)
_SESS_STATE_SCHEMA = (
    "start_us long, last_us long, last_eid long, n long, total_scaled long"
)
# Event-time TTL: a key's session state is evicted (and its profile
# emitted) once event time moves > TTL past the key's last update —
# the same 30-minute bound the session operators share.
SESSION_TTL_MIN = 30
_TTL_US = SESSION_TTL_MIN * 60 * 1_000_000


def _fold_sessions(user_id, events, st):
    """The session-TTL kernel, shared verbatim by BOTH stateful API
    paths (transformWithState and the applyInPandasWithState
    fallback): fold a sorted (ts_us, event_id, value) batch into the
    open-session state tuple, returning (closed_sessions, new_state).
    An event arriving > TTL after the key's last update closes the
    open session; ties and order are checked against the state's
    (last_us, last_eid) so an out-of-order replay fails loudly
    instead of silently mis-sessionizing (same contract as the
    stateful EMA)."""
    if events and st is not None and (
        (events[0][0], events[0][1]) < (st[1], st[2])
    ):
        raise ValueError(
            f"out-of-order replay for user {user_id}: batch starts "
            f"(ts_us={events[0][0]}, eid={events[0][1]}) before state "
            f"last (ts_us={st[1]}, eid={st[2]})"
        )
    closed = []
    for t, e, v in events:
        q = _quantize_1e4(v)
        if st is None:
            st = (t, t, e, 1, q)
        elif t - st[1] > _TTL_US:
            closed.append(st)
            st = (t, t, e, 1, q)
        else:
            st = (st[0], t, e, st[3] + 1, st[4] + q)
    return closed, st


def _closed_sessions_pdf(user_id, closed) -> pd.DataFrame:
    # Explicit dtypes: a key with zero closed sessions must not emit
    # object-dtype empty columns (Arrow/pandas concat would have to
    # guess, and warns).
    return pd.DataFrame(
        {
            "user_id": pd.Series([user_id] * len(closed), dtype="int64"),
            "session_start": pd.to_datetime(
                [c[0] for c in closed], unit="us"
            ),
            "session_end": pd.to_datetime([c[1] for c in closed], unit="us"),
            "n_events": pd.Series([c[3] for c in closed], dtype="int64"),
            "total_value": pd.Series(
                [c[4] / 1e4 for c in closed], dtype="float64"
            ),
        }
    )


def _collect_sorted_events(pdfs) -> list:
    events = []
    for pdf in pdfs:
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
        for t, e, v in zip(ts_us, pdf["event_id"], pdf["value"]):
            events.append((int(t), int(e), float(v)))
    events.sort()
    return events


# Which stateful API actually executed the last run_stateful_session_ttl
# call: "transformWithState" (4.x primary) or "applyInPandasWithState"
# (fallback), plus the primary path's failure repr when it fell back.
# VERDICT r5 item 4: the fallback engages on ANY primary failure, which
# is robust but means a silently-permanent fallback would never be
# noticed — this record makes the executed path observable and lets a
# test fail when the primary silently stops working in an environment
# that supports it.
LAST_SESSION_TTL_PATH: str | None = None
LAST_SESSION_TTL_FALLBACK_CAUSE: str | None = None


def _session_ttl_processor():
    """Build the StatefulProcessor lazily so importing this module
    never depends on the Spark 4.x transformWithState surface."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SessionTTL(StatefulProcessor):
        """Per-user session profile with EVENT-TIME TTL eviction via
        the Spark 4.x ``ValueState`` API. The built-in
        ``ttlDurationMs`` knob is deliberately NOT used: it expires
        on wall-clock processing time, so outputs would depend on
        when the replay runs — useless for exactly-once replays and
        impossible to oracle-check. Here event time itself drives
        eviction: a key's next event arriving > TTL after its last
        update closes (emits) the stale session and re-seeds the
        state, which is deterministic under replay."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._sess = handle.getValueState("sess", _SESS_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            closed, st = _fold_sessions(
                user_id, _collect_sorted_events(rows), self._sess.get()
            )
            if st is not None:
                self._sess.update(st)
            yield _closed_sessions_pdf(user_id, closed)

        def close(self) -> None:
            pass

    return SessionTTL()


def _session_ttl_group_state(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fallback path: the IDENTICAL kernel on the GroupState API (for
    environments without the protobuf dependency transformWithState's
    Python worker needs — see run_stateful_session_ttl)."""
    (user_id,) = key
    closed, st = _fold_sessions(
        user_id,
        _collect_sorted_events(pdfs),
        tuple(state.get) if state.exists else None,
    )
    if st is not None:
        state.update(st)
    yield _closed_sessions_pdf(user_id, closed)


# Shared with streaming_session_ttl_twin (streaming/core.py): two
# INDEPENDENT sessionization implementations — this module's custom
# stateful kernel and the engine-native session_window — are pinned to
# the one oracle, so they cross-check each other row-for-row.
SESSION_TTL_ORACLE = f"""
    WITH gaps AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         > INTERVAL {SESSION_TTL_MIN} MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    ids AS (
        SELECT user_id, ts, value,
               CAST(SUM(new_session) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM gaps
    ),
    sess AS (
        SELECT user_id, session_id,
               CAST(MIN(ts) AS TIMESTAMP) AS session_start,
               CAST(MAX(ts) AS TIMESTAMP) AS session_end,
               COUNT(*) AS n_events,
               {_dsum_sql('value', 4)} AS total_value
        FROM ids GROUP BY 1, 2
    ),
    marked AS (
        SELECT *, MAX(session_id) OVER (PARTITION BY user_id) AS max_sid
        FROM sess
    )
    SELECT user_id, session_start, session_end, n_events, total_value
    FROM marked WHERE session_id < max_sid
    """


@_query("stateful_session_ttl", oracle=SESSION_TTL_ORACLE)
def run_stateful_session_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL-evicted session profiles through Spark 4.x's
    ``transformWithStateInPandas`` (the successor stateful API to
    ``applyInPandasWithState``): per-user ``ValueState`` holds the
    open session (start, last ts/eid, count, exact 1e-4 value sum);
    an event arriving > 30 event-time minutes after the key's last
    update EVICTS the stale state as an emitted session row and
    re-seeds it — the streaming form of expiring-profile stores,
    completing §2.9 T5 on the 4.x API surface.

    Only sessions CLOSED by a successor event are emitted (open
    tails stay in state at end-of-replay), so the batch oracle is
    gap-sessionization minus each user's final session — fully
    SQL-expressible and hash-checked, including the exact-integer
    value sums (same quantization contract as the profile
    operator).

    API gate: transformWithState's Python worker needs protobuf
    (``pyspark.sql.streaming.proto``) and the RocksDB state store;
    where protobuf is absent (this container pins its package set)
    the query runs the SAME kernel (`_fold_sessions`) through
    ``applyInPandasWithState`` — byte-identical output, and the 4.x
    processor stays the primary path wherever its worker can start.

    Scale: state is one 5-field tuple per ACTIVE key (evicted keys
    cost nothing — the point of TTL), partitioned by user and
    checkpointed by the engine; emission is append-mode."""
    from pyspark.sql import functions as F

    from .core import events_stream, run_to_memory

    global LAST_SESSION_TTL_PATH, LAST_SESSION_TTL_FALLBACK_CAUSE
    ev = events_stream(spark, sf_dir).select(
        "event_id", "user_id", "ts", "value"
    )
    out = None
    LAST_SESSION_TTL_PATH = None
    LAST_SESSION_TTL_FALLBACK_CAUSE = None
    try:
        import google.protobuf  # noqa: F401  (transformWithState worker dep)

        # The RocksDB provider is a session conf: scope it to THIS
        # query's run and restore the prior value after, so later
        # streaming queries in the session (which may assume the
        # default HDFS-backed provider) are not order-dependently
        # switched under them.
        _PROV = "spark.sql.streaming.stateStore.providerClass"
        prior = spark.conf.get(_PROV, None)
        spark.conf.set(
            _PROV,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        try:
            sdf = ev.groupBy("user_id").transformWithStateInPandas(
                statefulProcessor=_session_ttl_processor(),
                outputStructType=_SESS_OUT_SCHEMA,
                outputMode="append",
                timeMode="none",
            )
            out = run_to_memory(spark, sdf, "session_ttl", "append")
            LAST_SESSION_TTL_PATH = "transformWithState"
        finally:
            if prior is None:
                spark.conf.unset(_PROV)
            else:
                spark.conf.set(_PROV, prior)
    except Exception as exc:
        # Fallback engages on ANY primary-path failure, not just a
        # missing driver-side protobuf: the worker can also die on a
        # proto version mismatch or a RocksDB init failure, and the
        # GroupState path runs the byte-identical kernel either way.
        out = None
        LAST_SESSION_TTL_FALLBACK_CAUSE = repr(exc)
    if out is None:
        LAST_SESSION_TTL_PATH = "applyInPandasWithState"
        sdf = ev.groupBy("user_id").applyInPandasWithState(
            _session_ttl_group_state,
            outputStructType=_SESS_OUT_SCHEMA,
            stateStructType=_SESS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        out = run_to_memory(spark, sdf, "session_ttl", "append")
    return out.select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
        "total_value",
    )
