"""Unit tests for the auth scalar chain (F1-F4) — deterministic JWT
pinning, tamper/expiry rejection, property-based round-trips, and
real bcrypt execution everywhere (C package or the pure-Python
fallback, pinned by the OpenBSD regression vectors).
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


def test_bcrypt_roundtrip_real_everywhere(spark):
    """F1/F2 execute for real in every environment: the C package
    when installed, else the OpenBSD-vector-verified pure-Python
    implementation — never a skip, never a stand-in."""
    from pyspark.sql import functions as F

    from go_http_data_pipeline_spark.pipelines.auth import (
        bcrypt_hash,
        bcrypt_verify,
    )

    df = spark.createDataFrame([("s3cret",)], "pw string")
    hashed = df.withColumn("h", bcrypt_hash(F.col("pw"), cost=4))
    ok = hashed.withColumn("ok", bcrypt_verify(F.col("pw"), F.col("h")))
    row = ok.select("h", "ok").first()
    assert row["h"].startswith("$2") and len(row["h"]) == 60
    assert row["ok"] is True


BCRYPT_VECTORS = [
    # OpenBSD regression vectors (public, reproduced in many suites).
    (b"", b"$2a$06$DCq7YPn5Rq63x1Lad4cll.TV4S6ytwfsfvkgY8jIucDrjc8deX1s."),
    (b"a", b"$2a$06$m0CrhHm10qJ3lXRY.5zDGO3rS2KdeeWLuGmsfGlMfOxih58VYVfxe"),
    (b"abc", b"$2a$06$If6bvum7DFjUnE9p2uDeDu0YHzrHM6tf.iqN8.yx.jNN1ILEf7h0i"),
    (
        b"abcdefghijklmnopqrstuvwxyz",
        b"$2a$06$.rCVZVOThsIa97pEDOxvGuRRgzG64bvtJ0938xuqzv18d3ZpQhstC",
    ),
    (b"U*U", b"$2a$05$CCCCCCCCCCCCCCCCCCCCC.E5YPO9kmyuRGyh0XouQYb4YMJKvyOeW"),
]


def test_bcrypt_pure_matches_openbsd_vectors():
    from go_http_data_pipeline_spark.pipelines import bcrypt_pure as bp

    for pw, expect in BCRYPT_VECTORS:
        assert bp.hashpw(pw, expect) == expect
        assert bp.checkpw(pw, expect)
        assert not bp.checkpw(pw + b"x", expect)
    # Blowfish's initial state is pi: the generated words must start
    # with the canonical published constants.
    assert [hex(w) for w in bp._PI_WORDS[:2]] == ["0x243f6a88", "0x85a308d3"]


def test_bcrypt_login_roundtrip_self_checks(spark, sf_dir):
    from go_http_data_pipeline_spark.pipelines.parity import (
        bcrypt_login_roundtrip,
    )

    rows = bcrypt_login_roundtrip(spark, sf_dir).collect()
    assert len(rows) == 8
    for r in rows:
        assert r["verified_ok"] is True
        assert r["rejected_bad"] is True
        assert r["hashed"].startswith("$2b$04$")
        assert len(r["hashed"]) == 60


def test_jwt_auth_chain_self_checks(spark, sf_dir):
    from go_http_data_pipeline_spark.pipelines.parity import jwt_auth_chain

    rows = jwt_auth_chain(spark, sf_dir).collect()
    assert len(rows) == 50
    for r in rows:
        assert r["signing_input"].startswith("eyJhbGciOiJIUzI1NiIsInR5cCI6IkpXVCJ9.")
        assert r["valid_now"] is True
        assert r["valid_before_expiry"] is True
        assert r["valid_after_expiry"] is False
        assert r["valid_tampered"] is False


def test_bcrypt_pure_edge_cases():
    from go_http_data_pipeline_spark.pipelines import bcrypt_pure as bp

    # 72-byte truncation: bcrypt ignores everything past byte 72.
    base = b"x" * 72
    s = bp.gensalt(4, _salt16=bytes(range(16)))
    h = bp.hashpw(base, s)
    assert bp.checkpw(base + b"ignored-tail", h)
    assert not bp.checkpw(base[:-1], h)
    # cost bounds enforced like the C package
    with pytest.raises(ValueError):
        bp.gensalt(3)
    with pytest.raises(ValueError):
        bp.gensalt(32)
    # bytes-only API, mirroring the C package
    with pytest.raises(TypeError):
        bp.hashpw("str", s)
    # deterministic salt -> deterministic hash; fresh salt -> different
    assert bp.hashpw(b"pw", s) == bp.hashpw(b"pw", s)
    assert bp.hashpw(b"pw", bp.gensalt(4)) != bp.hashpw(b"pw", bp.gensalt(4))
