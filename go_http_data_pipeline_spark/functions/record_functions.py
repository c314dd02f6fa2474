"""Row-level record functions from the reference's HTTP pipeline,
re-expressed as JVM-side column expressions (SURVEY.md §2.8).

Parity map (all deterministic, oracle-checked):
* access-log line  — ``Server/main.go:171-176`` (S9/F7/F8)
* client-IP parse  — ``getClientIP``, ``Server/main.go:158-168`` (F6)
* Bearer strip     — ``Server/main.go:187-193`` (F5)
* JSON codec       — ``Server/main.go:103,211,256,311`` (F12/F13)
* seeded generator — ``Random/main.go:73-123`` (S8/F9-F11)

The reference's request-context columns (ip, method, path, status)
don't exist in the fixtures, so each query derives them
deterministically from ``events`` via arithmetic — same formulas on
both engines, so results hash-match.

The bcrypt/JWT scalar chain (F1-F4) is inherently non-deterministic
(salts) / needs out-of-container libs — it lives in
``pipelines/auth.py`` as import-gated Python UDFs with unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

# Deterministic request-context derivation shared by log queries:
# ip octets / method / status from event columns, pure arithmetic.
# Built lazily — constructing Columns needs an active SparkContext,
# and this module must be importable before any session exists.
def _spark_ctx() -> dict:
    return {
        "ip": F.format_string(
            "10.%d.%d.%d",
            (F.col("user_id") % 200).cast("int"),
            (F.col("event_id") % 251).cast("int"),
            # integer `div`, not double `/`: the oracle's `//` is
            # exact at any magnitude, double division drifts past
            # 2^53 (same hazard class catalog.py guards for ts).
            (F.expr("event_id div 251") % 251).cast("int"),
        ),
        "method": F.when(F.col("event_type").isin("click", "view"), "GET").otherwise(
            "POST"
        ),
        "path": F.concat(F.lit("/"), F.col("event_type")),
        "status": F.when(F.col("event_type") == "error", 500).otherwise(200),
    }

_SQL_CTX = """
    printf('10.%d.%d.%d', user_id % 200, event_id % 251, (event_id // 251) % 251) AS ip,
    CASE WHEN event_type IN ('click','view') THEN 'GET' ELSE 'POST' END AS method,
    '/' || event_type AS path,
    CASE WHEN event_type = 'error' THEN 500 ELSE 200 END AS status
"""


@query(
    "access_log_lines",
    oracle=f"""
    WITH ctx AS (SELECT event_id, ts, {_SQL_CTX} FROM events)
    SELECT event_id,
           printf('%s - - [%s] "%s %s HTTP/1.1" %d',
                  ip, strftime(ts, '%d/%b/%Y %H:%M:%S'), method, path, status) AS log_line
    FROM ctx
    """,
)
def access_log_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9/F7/F8: Apache common-log-format lines
    (``<ip> - - [dd/MMM/yyyy HH:mm:ss] "METHOD path proto" status``)."""
    ev = table(spark, sf_dir, "events")
    ctx = ev.select("event_id", "ts", *[c.alias(k) for k, c in _spark_ctx().items()])
    return ctx.select(
        "event_id",
        F.format_string(
            '%s - - [%s] "%s %s HTTP/1.1" %d',
            F.col("ip"),
            F.date_format("ts", "dd/MMM/yyyy HH:mm:ss"),
            F.col("method"),
            F.col("path"),
            F.col("status"),
        ).alias("log_line"),
    )


@query(
    "client_ip_extraction",
    oracle="""
    WITH req AS (
        SELECT event_id,
               printf('10.%d.%d.%d', user_id % 200, event_id % 251, (event_id // 251) % 251)
                   || ' , 172.16.0.1, 10.0.0.1' AS x_forwarded_for,
               printf('192.168.1.%d:%d', user_id % 250, 30000 + event_id % 30000) AS remote_addr
        FROM events
    )
    SELECT event_id,
           trim(string_split(x_forwarded_for, ',')[1]) AS client_ip,
           regexp_extract(remote_addr, '^(.*):[0-9]+$', 1) AS fallback_ip
    FROM req
    """,
)
def client_ip_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: first X-Forwarded-For hop (trimmed), plus host:port strip
    fallback — ``getClientIP`` (``Server/main.go:158-168``)."""
    ev = table(spark, sf_dir, "events")
    req = ev.select(
        "event_id",
        F.concat(_spark_ctx()["ip"], F.lit(" , 172.16.0.1, 10.0.0.1")).alias(
            "x_forwarded_for"
        ),
        F.format_string(
            "192.168.1.%d:%d",
            (F.col("user_id") % 250).cast("int"),
            (30000 + F.col("event_id") % 30000).cast("int"),
        ).alias("remote_addr"),
    )
    return req.select(
        "event_id",
        F.trim(F.element_at(F.split("x_forwarded_for", ","), 1)).alias("client_ip"),
        F.regexp_extract("remote_addr", r"^(.*):[0-9]+$", 1).alias("fallback_ip"),
    )


@query(
    "bearer_token_strip",
    oracle="""
    WITH req AS (
        SELECT event_id, 'Bearer tok_' || md5(CAST(event_id AS VARCHAR)) AS auth_header
        FROM events
    )
    SELECT event_id,
           CASE WHEN len(auth_header) >= 8 THEN substr(auth_header, 8) END AS token,
           len(auth_header) >= 8 AS valid_header
    FROM req
    """,
)
def bearer_token_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 + P6: length-guarded ``Bearer `` prefix strip
    (``tokenString[7:]``, ``Server/main.go:187-193``)."""
    ev = table(spark, sf_dir, "events")
    req = ev.select(
        "event_id",
        F.concat(F.lit("Bearer tok_"), F.md5(F.col("event_id").cast("string"))).alias(
            "auth_header"
        ),
    )
    return req.select(
        "event_id",
        F.when(
            F.length("auth_header") >= 8, F.expr("substring(auth_header, 8)")
        ).alias("token"),
        (F.length("auth_header") >= 8).alias("valid_header"),
    )


@query(
    "json_roundtrip",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k,
           '{"k":' || CAST(json_extract(props, '$.k') AS INT) || '}' AS reencoded
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INT) IS NOT NULL
    """,
)
def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12/F13: JSON decode (PERMISSIVE, like Go's silent coercion)
    then re-encode — ``from_json`` + ``to_json``."""
    ev = table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id", F.from_json("props", "k INT").getField("k").alias("k")
    ).filter(F.col("k").isNotNull())
    return parsed.select(
        "event_id", "k", F.to_json(F.struct("k")).alias("reencoded")
    )


@query(
    "generated_users",
    oracle="""
    WITH gen AS (
        SELECT n, (1103515245 * (n + 42) + 12345) % 2147483648 AS x
        FROM range(0, 10) t(n)
    )
    SELECT n AS seq,
           'User' || CAST(x % 10000 AS VARCHAR) AS name,
           ['intern', 'developer', 'manager', 'analyst'][CAST(x % 4 AS INT) + 1] AS role,
           CAST(18 + x % 40 AS INT) AS age
    FROM gen
    """,
)
def generated_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/F9-F11: the Random client's record generator
    (``Random/main.go:73-123``) made oracle-checkable by replacing
    ``rand.Intn`` with a seeded LCG — 10 records, ``User<n>`` names,
    4-way role pick, age in [18, 58)."""
    gen = spark.range(0, 10).select(
        F.col("id").alias("seq"),
        ((F.lit(1103515245) * (F.col("id") + 42) + 12345) % 2147483648).alias("x"),
    )
    roles = F.array(*[F.lit(r) for r in ("intern", "developer", "manager", "analyst")])
    return gen.select(
        "seq",
        F.concat(F.lit("User"), (F.col("x") % 10000).cast("string")).alias("name"),
        F.element_at(roles, (F.col("x") % 4).cast("int") + 1).alias("role"),
        (18 + F.col("x") % 40).cast("int").alias("age"),
    )
