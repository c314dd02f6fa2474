"""Auth scalar chain: bcrypt hash/verify + HS256 JWT sign/verify
(SURVEY.md F1-F4; ``Server/main.go:114, 127, 134-147, 194-203``).

JWT is implemented with stdlib hmac/hashlib/base64 — HS256 is public
RFC 7519 machinery and needs no external package. Given an explicit
``iat`` the token is fully deterministic, so pytest pins exact
strings; there is no DuckDB oracle (HMAC isn't SQL-expressible).

bcrypt is inherently salted/non-deterministic. When the C ``bcrypt``
package is absent, ``bcrypt_hash``/``bcrypt_verify`` fall back to the
pure-Python implementation in ``bcrypt_pure.py`` (OpenBSD-vector
verified) — F1/F2 execute for real in every environment. The
deterministic stand-in used by the oracle-checked login pipeline is
``sha2`` (see ``pipelines/parity.py``).

All UDFs are Arrow-batched pandas UDFs: the auth chain runs on record
*batches*, never the reference's per-row round-trips.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode("ascii")


def _b64url_decode(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def jwt_sign_py(username: str, iat: int, ttl_s: int, secret: str) -> str:
    """HS256 JWT with the reference's claims: {username, exp}
    (``Server/main.go:26-29, 134``; exp = iat + 1h in the reference)."""
    header = _b64url(json.dumps({"alg": "HS256", "typ": "JWT"},
                                separators=(",", ":")).encode())
    payload = _b64url(
        json.dumps(
            {"username": username, "exp": iat + ttl_s}, separators=(",", ":")
        ).encode()
    )
    signing_input = f"{header}.{payload}".encode("ascii")
    sig = hmac.new(secret.encode(), signing_input, hashlib.sha256).digest()
    return f"{header}.{payload}.{_b64url(sig)}"


def jwt_verify_py(token: str, now: int, secret: str) -> tuple[str | None, bool]:
    """Parse + verify (``jwt.ParseWithClaims``, ``Server/main.go:194-203``):
    returns (username, valid). Invalid signature/expiry/shape → (None,
    False) — mirroring the reference's 401 branch."""
    try:
        header, payload, sig = token.split(".")
        signing_input = f"{header}.{payload}".encode("ascii")
        expect = hmac.new(secret.encode(), signing_input, hashlib.sha256).digest()
        if not hmac.compare_digest(expect, _b64url_decode(sig)):
            return None, False
        claims = json.loads(_b64url_decode(payload))
        # RFC 7519 §4.1.4: the current time MUST be BEFORE exp, so a
        # token is already expired AT its exp instant (now >= exp
        # rejects). `exp < now` would grant a 1-second acceptance
        # window the reference's jwt.ParseWithClaims does not have.
        if int(claims.get("exp", 0)) <= now:
            return None, False
        return claims.get("username"), True
    except Exception:
        return None, False


def jwt_sign(username: Column, iat: Column, ttl_s: int, secret: str) -> Column:
    """Column form of :func:`jwt_sign_py` (Arrow-batched)."""

    @F.pandas_udf("string")
    def _sign(users: pd.Series, iats: pd.Series) -> pd.Series:
        return pd.Series(
            [jwt_sign_py(u, int(t), ttl_s, secret) for u, t in zip(users, iats)]
        )

    return _sign(username, iat)


def jwt_verify(token: Column, now: Column, secret: str) -> Column:
    """Column form of :func:`jwt_verify_py` →
    ``struct<username string, valid boolean>``."""

    @F.pandas_udf("username string, valid boolean")
    def _verify(tokens: pd.Series, nows: pd.Series) -> pd.DataFrame:
        out = [jwt_verify_py(t, int(n), secret) for t, n in zip(tokens, nows)]
        return pd.DataFrame(out, columns=["username", "valid"])

    return _verify(token, now)


def _require_bcrypt():
    """The C ``bcrypt`` package when installed, else the pure-Python
    implementation in :mod:`.bcrypt_pure` (same hashpw/gensalt/checkpw
    surface, verified against the OpenBSD regression vectors). The
    fallback makes F1/F2 real everywhere — at ~1000x the C package's
    per-hash cost, which is why ``bcrypt_pure.gensalt`` defaults to
    cost 6; bulk production hashing should install the C package."""
    try:
        import bcrypt  # the C implementation, when present

        return bcrypt
    except ImportError:
        from . import bcrypt_pure

        return bcrypt_pure


def bcrypt_hash(password: Column, cost: int = 12) -> Column:
    """F1: salted bcrypt hash (non-deterministic by design).

    ``cost`` is explicit at the API surface — the C package defaults
    to 12 but the pure-Python fallback's ``gensalt`` defaults to 6
    (it is ~1000x slower per hash), so leaving it to the resolved
    implementation would make the work factor an import side effect.
    12 matches Go's ``bcrypt.DefaultCost`` (``Server/main.go:114``)."""
    bcrypt = _require_bcrypt()

    @F.pandas_udf("string")
    def _hash(pws: pd.Series) -> pd.Series:
        return pd.Series(
            [
                bcrypt.hashpw(p.encode(), bcrypt.gensalt(cost)).decode()
                for p in pws
            ]
        )

    return _hash(password)


def bcrypt_verify(password: Column, hashed: Column) -> Column:
    """F2: constant-time bcrypt check."""
    bcrypt = _require_bcrypt()

    @F.pandas_udf("boolean")
    def _verify(pws: pd.Series, hs: pd.Series) -> pd.Series:
        return pd.Series(
            [bcrypt.checkpw(p.encode(), h.encode()) for p, h in zip(pws, hs)]
        )

    return _verify(password, hashed)
