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
