"""Unit tests for the auth scalar chain (F1-F4) — deterministic JWT
pinning, tamper/expiry rejection, and property-based round-trips.
bcrypt tests skip cleanly when the lib is absent (container has none).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from go_http_data_pipeline_spark.pipelines.auth import (
    jwt_sign,
    jwt_sign_py,
    jwt_verify,
    jwt_verify_py,
)

SECRET = "test-secret"
IAT = 1_700_000_000  # fixed clock → deterministic tokens


def test_jwt_pinned_token():
    tok = jwt_sign_py("alice", IAT, 3600, SECRET)
    # Stable header+payload prefix: base64url of canonical JSON.
    assert tok.startswith(
        "eyJhbGciOiJIUzI1NiIsInR5cCI6IkpXVCJ9."
        "eyJ1c2VybmFtZSI6ImFsaWNlIiwiZXhwIjoxNzAwMDAzNjAwfQ."
    )
    assert tok.count(".") == 2


def test_jwt_roundtrip_and_expiry():
    tok = jwt_sign_py("bob", IAT, 3600, SECRET)
    assert jwt_verify_py(tok, IAT + 10, SECRET) == ("bob", True)
    # Expired (reference: 1-hour TTL, Server/main.go:134).
    assert jwt_verify_py(tok, IAT + 3601, SECRET) == (None, False)


def test_jwt_tamper_rejected():
    tok = jwt_sign_py("carol", IAT, 3600, SECRET)
    h, p, s = tok.split(".")
    assert jwt_verify_py(f"{h}.{p}x.{s}", IAT, SECRET) == (None, False)
    assert jwt_verify_py(f"{h}.{p}.{s[:-2]}aa", IAT, SECRET) == (None, False)
    assert jwt_verify_py(tok, IAT, "other-secret") == (None, False)
    assert jwt_verify_py("not-a-token", IAT, SECRET) == (None, False)


@settings(deadline=None, max_examples=50)
@given(st.text(min_size=1, max_size=40), st.integers(0, 2**31))
def test_jwt_roundtrip_property(username, iat):
    tok = jwt_sign_py(username, iat, 3600, SECRET)
    assert jwt_verify_py(tok, iat, SECRET) == (username, True)


def test_jwt_columns_on_spark(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("alice",), ("bob",)], "username string"
    ).withColumn("iat", F.lit(IAT).cast("long"))
    signed = df.withColumn("token", jwt_sign(F.col("username"), F.col("iat"), 3600, SECRET))
    out = signed.withColumn(
        "v", jwt_verify(F.col("token"), F.col("iat"), SECRET)
    ).select("username", "v.username", "v.valid")
    rows = {r[0]: (r[1], r[2]) for r in out.collect()}
    assert rows == {"alice": ("alice", True), "bob": ("bob", True)}


def test_bcrypt_gate_is_loud_or_real(spark):
    """Never a silent skip: with the lib present this is a real
    bcrypt round-trip through the pandas UDFs; without it, the gate
    must raise the documented BcryptUnavailable at PLAN time (so a
    pipeline can't run believing it hashed passwords)."""
    from pyspark.sql import functions as F

    from go_http_data_pipeline_spark.pipelines.auth import (
        BcryptUnavailable,
        bcrypt_hash,
        bcrypt_verify,
    )

    try:
        import bcrypt  # noqa: F401
        have_bcrypt = True
    except ImportError:
        have_bcrypt = False

    df = spark.createDataFrame([("s3cret",)], "pw string")
    if not have_bcrypt:
        with pytest.raises(BcryptUnavailable, match="pip install bcrypt"):
            bcrypt_hash(F.col("pw"))
        with pytest.raises(BcryptUnavailable, match="pip install bcrypt"):
            bcrypt_verify(F.col("pw"), F.col("pw"))
        return
    hashed = df.withColumn("h", bcrypt_hash(F.col("pw")))
    ok = hashed.withColumn("ok", bcrypt_verify(F.col("pw"), F.col("h")))
    assert ok.select("ok").first()[0] is True
