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
STATE_SCHEMA = "n long, total double, last_ts_us long"


def _update_profile(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # Per-batch pandas sum; cross-batch order is fixed by state
        # accumulation, so results are deterministic for a given
        # micro-batch sequence.
        total += float(pdf["value"].sum())
        batch_max = int(pdf["ts"].astype("int64").max()) // 1000
        last_us = max(last_us, batch_max)
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
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


@_query("stateful_user_profiles")  # rows-only: custom stateful op, float state
def run_user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the stateful operator over the bounded events replay and
    return the final per-user profiles (latest update per user)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .core import events_stream, run_to_memory

    ev = events_stream(spark, sf_dir)
    out = run_to_memory(
        spark, user_profile_stream(ev), "user_profiles", output_mode="update"
    )
    # One update row per (user, micro-batch): keep the final one.
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
