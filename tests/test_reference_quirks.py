"""Reference-quirk edge cases (SURVEY.md §7.4): empty-result branch,
malformed-JSON silent coercion, login auto-registration, log-line
format against an independent Python formatter."""

from __future__ import annotations

from datetime import datetime

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def test_empty_table_404_branch(spark):
    # P5: len(users) == 0 → 404 (Server/main.go:249-253).
    empty = spark.createDataFrame([], "id long, name string")
    assert empty.isEmpty()
    assert empty.count() == 0


def test_malformed_json_silent_null(spark):
    # F13: Go's json.Decode silently zero-values bad input
    # (Server/main.go:211); from_json PERMISSIVE → null row.
    df = spark.createDataFrame(
        [('{"k": 1}',), ("not json",), ('{"k": "x"}',), (None,)], "props string"
    )
    parsed = df.select(F.from_json("props", "k INT").getField("k").alias("k"))
    assert [r.k for r in parsed.collect()] == [1, None, None, None]


def test_unknown_fields_silently_dropped(spark):
    # Go decode semantics: unknown wire fields dropped, missing fields
    # zero-valued (nulled here — engine upgrade, documented).
    df = spark.createDataFrame([('{"k": 5, "extra": true}',), ("{}",)], "p string")
    parsed = df.select(F.from_json("p", "k INT, m STRING").alias("r")).select(
        "r.k", "r.m"
    )
    assert [tuple(r) for r in parsed.collect()] == [(5, None), (None, None)]


def test_login_auto_register_quirk(spark, sf_dir):
    # §3.2: any unknown username + any password creates an account and
    # authenticates. The parity query surfaces this as registered=True
    # AND auth_ok=True for all newuser_* attempts.
    from go_http_data_pipeline_spark.pipelines.parity import (
        login_register_if_absent,
    )

    out = login_register_if_absent(spark, sf_dir)
    news = out.filter(F.col("username").startswith("newuser_")).collect()
    assert len(news) == 5
    assert all(r.registered and r.auth_ok for r in news)
    # Known-user wrong-password attempts must NOT authenticate.
    bad = out.filter(~F.col("registered") & ~F.col("auth_ok"))
    assert bad.count() > 0


@settings(deadline=None, max_examples=20)
@given(
    ip=st.from_regex(r"10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", fullmatch=True),
    method=st.sampled_from(["GET", "POST"]),
    path=st.sampled_from(["/login", "/getemployees", "/addemployee"]),
    status=st.sampled_from([200, 401, 404, 500]),
)
def test_log_line_format_property(spark, ip, method, path, status):
    # F7/F8 vs an independent strftime-based formatter.
    ts = datetime(2024, 3, 5, 14, 30, 9)
    df = spark.createDataFrame(
        [(ip, ts, method, path, status)],
        "ip string, ts timestamp, method string, path string, status int",
    )
    line = df.select(
        F.format_string(
            '%s - - [%s] "%s %s HTTP/1.1" %d',
            "ip",
            F.date_format("ts", "dd/MMM/yyyy HH:mm:ss"),
            "method",
            "path",
            "status",
        ).alias("l")
    ).first()[0]
    expect = f'{ip} - - [{ts.strftime("%d/%b/%Y %H:%M:%S")}] "{method} {path} HTTP/1.1" {status}'
    assert line == expect
