"""UDF / UDAF / UDTF extension surface (SURVEY.md §2.10).

The reference's extension mechanism is "write more Go" — its one
pluggable function is the out-of-process salary service
(``Server/main.go:301``), already re-expressed as Arrow-batched
``mapInPandas`` in ``pipelines/parity.py``. This module completes the
engine's extension API with the remaining two shapes:

* **UDAF** — ``applyInPandas`` over grouped data: arbitrary per-group
  pandas logic with a declared output schema. Demo: per-user event
  statistics. Grouped Arrow batches; at 100 TB this is one shuffle by
  the grouping key, the same cost as a built-in agg.
* **UDTF** — Python UDTF (``@udtf``): one row in, many rows out, with
  a declared schema. Demo: parsing Apache access-log lines back into
  columns — the inverse of ``access_log_lines`` (F8), making the
  pair a round-trip.

Both demos are deterministic and DuckDB-oracle-checked — the UDF path
itself is inside the correctness gate, not just unit-tested.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from .record_functions import _SQL_CTX

# ------------------------------------------------------------------ UDAF

_STATS_SCHEMA = (
    "user_id long, n_events long, value_range double, first_event string"
)


def _user_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group pandas logic. Deliberately not a single built-in:
    range = max-min (exact double subtraction) and the event_type of
    the earliest row (ties by event_id) — order-dependent logic that
    would need several windows in SQL, one pandas pass here."""
    pdf = pdf.sort_values(["ts", "event_id"])
    return pd.DataFrame(
        {
            "user_id": [pdf["user_id"].iloc[0]],
            "n_events": [len(pdf)],
            "value_range": [float(pdf["value"].max() - pdf["value"].min())],
            "first_event": [pdf["event_type"].iloc[0]],
        }
    )


@query(
    "udaf_user_stats",
    oracle="""
    WITH firsts AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    )
    SELECT e.user_id,
           COUNT(*) AS n_events,
           MAX(e.value) - MIN(e.value) AS value_range,
           MAX(f.event_type) AS first_event
    FROM events e
    JOIN firsts f ON f.user_id = e.user_id AND f.rn = 1
    GROUP BY e.user_id
    """,
)
def udaf_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF via ``applyInPandas``: per-user event count, exact value
    range, and first event type."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").applyInPandas(_user_stats, schema=_STATS_SCHEMA)


# ------------------------------------------------------------------ UDTF

_LOG_RE = re.compile(
    r'^(?P<ip>\S+) - - \[(?P<ts>[^\]]+)\] "(?P<method>\S+) (?P<path>\S+) (?P<proto>[^"]+)" (?P<status>\d+)$'
)


def parse_log_line(line: str):
    """One Apache common-log line -> (ip, ts, method, path, status) or
    nothing when malformed (UDTF zero-row semantics)."""
    m = _LOG_RE.match(line or "")
    if m:
        yield (
            m.group("ip"),
            m.group("ts"),
            m.group("method"),
            m.group("path"),
            int(m.group("status")),
        )


@query(
    "udtf_parse_access_logs",
    # The request-context derivation is _SQL_CTX, the SAME fragment
    # access_log_lines' oracle interpolates — re-implementing it here
    # would let the two silently drift when the derivation changes.
    oracle=f"""
    WITH ctx AS (
        SELECT event_id,
               strftime(ts, '%d/%b/%Y %H:%M:%S') AS ts_str,
               {_SQL_CTX}
        FROM events
    )
    SELECT ip, ts_str AS ts, method, path, status FROM ctx
    """,
)
def udtf_parse_access_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF: re-parse the engine's own formatted log lines (F8 round
    trip). The lateral-join explode shape is the table-function
    surface; malformed lines emit zero rows."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="ip string, ts string, method string, path string, status int")
    class ParseAccessLog:
        def eval(self, line: str):
            yield from parse_log_line(line)

    from .record_functions import access_log_lines

    spark.udtf.register("parse_access_log", ParseAccessLog)
    lines = access_log_lines(spark, sf_dir)
    lines.createOrReplaceTempView("raw_log_lines")
    return spark.sql(
        "SELECT p.* FROM raw_log_lines, LATERAL parse_access_log(log_line) p"
    )
