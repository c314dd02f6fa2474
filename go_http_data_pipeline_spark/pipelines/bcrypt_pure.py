"""Pure-Python bcrypt (Provos & Mazières, USENIX '99) — the fallback
implementation behind SURVEY §2.8 F1/F2 (``Server/main.go:114,127``)
when the C ``bcrypt`` package is absent.

Everything here is the public algorithm:

* Blowfish's initial P-array and S-boxes are the fractional
  hexadecimal digits of pi — generated at import from an integer
  Chudnovsky series instead of embedding 4 KB of constants.
* EksBlowfishSetup: salted ExpandKey, then 2^cost alternating
  key/salt ExpandKey rounds (the "expensive" in eksblowfish).
* bcrypt encrypts "OrpheanBeholderScryDoubt" 64 times in ECB and
  radix-64-encodes salt and the first 23 ciphertext bytes with the
  ``./A-Za-z0-9`` alphabet.

Correctness is pinned by the OpenBSD regression vectors in
``tests/test_auth.py``. Performance: pure Python pays ~milliseconds
per 2^cost round — fine for tests and small batches at low cost;
production installs the C package (same API, ~1000x faster at
cost 12). The module intentionally mirrors the ``bcrypt`` package's
surface (gensalt/hashpw/checkpw) so ``auth.py`` can use either.
"""

from __future__ import annotations

import hmac
from math import isqrt

_ALPHABET = "./ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
_A_INDEX = {c: i for i, c in enumerate(_ALPHABET)}

_N_WORDS = 18 + 4 * 256  # P-array + four S-boxes
_MAGIC = b"OrpheanBeholderScryDoubt"  # 24 bytes, 3 Blowfish blocks


# ------------------------------------------------------------------ pi words
def _bs(a: int, b: int) -> tuple[int, int, int]:
    """Chudnovsky binary splitting: returns (P, Q, T) over [a, b)."""
    if b - a == 1:
        if a == 0:
            pab = qab = 1
        else:
            pab = (6 * a - 5) * (2 * a - 1) * (6 * a - 1)
            qab = a * a * a * 10939058860032000
        tab = pab * (13591409 + 545140134 * a)
        if a & 1:
            tab = -tab
        return pab, qab, tab
    m = (a + b) // 2
    pam, qam, tam = _bs(a, m)
    pmb, qmb, tmb = _bs(m, b)
    # T(a,b) = Q(m,b)·T(a,m) + P(a,m)·T(m,b) — the left-segment P
    # scales the right tail.
    return pam * pmb, qam * qmb, tam * qmb + pam * tmb


def _pi_words(n_words: int = _N_WORDS) -> list[int]:
    """First ``n_words`` 32-bit words of pi's fractional part —
    Blowfish's published initial state, computed not transcribed."""
    bits = 32 * n_words
    guard = 64
    # ~14.18 decimal digits (≈47.1 bits) of pi per series term.
    terms = bits // 47 + 3
    _, q, t = _bs(0, terms)
    sq = isqrt(10005 << (2 * (bits + guard)))
    pi_scaled = (q * 426880 * sq) // t >> guard  # floor(pi * 2^bits)
    frac = pi_scaled - (3 << bits)
    return [
        (frac >> (bits - 32 * (i + 1))) & 0xFFFFFFFF for i in range(n_words)
    ]


_PI_WORDS = _pi_words()


# ------------------------------------------------------------------ blowfish
class _Blowfish:
    __slots__ = ("p", "s")

    def __init__(self) -> None:
        self.p = _PI_WORDS[:18]
        self.s = [_PI_WORDS[18 + 256 * i : 18 + 256 * (i + 1)] for i in range(4)]

    def encrypt(self, xl: int, xr: int) -> tuple[int, int]:
        p, s0, s1, s2, s3 = self.p, *self.s
        for i in range(16):
            xl ^= p[i]
            xr ^= (
                ((s0[xl >> 24] + s1[(xl >> 16) & 0xFF]) & 0xFFFFFFFF)
                ^ s2[(xl >> 8) & 0xFF]
            ) + s3[xl & 0xFF] & 0xFFFFFFFF
            xl, xr = xr, xl
        xl, xr = xr, xl
        return xl ^ p[17], xr ^ p[16]

    def _expand(self, key: bytes, salt_words: list[int] | None) -> None:
        """ExpandKey(state, salt, key); ``salt_words=None`` is the
        zero-salt variant used inside the 2^cost loop."""
        p = self.p
        j = 0
        klen = len(key)
        for i in range(18):
            w = 0
            for _ in range(4):
                w = (w << 8) | key[j]
                j = (j + 1) % klen
            p[i] ^= w
        sl, sr = 0, 0
        si = 0
        boxes = [p] + self.s
        for box in boxes:
            for k in range(0, len(box), 2):
                if salt_words is not None:
                    sl ^= salt_words[si]
                    sr ^= salt_words[(si + 1) & 3]
                    si = (si + 2) & 3
                sl, sr = self.encrypt(sl, sr)
                box[k] = sl
                box[k + 1] = sr


def _eks_setup(cost: int, salt16: bytes, key: bytes) -> _Blowfish:
    salt_words = [int.from_bytes(salt16[i : i + 4], "big") for i in range(0, 16, 4)]
    bf = _Blowfish()
    bf._expand(key, salt_words)
    for _ in range(1 << cost):
        bf._expand(key, None)
        bf._expand(salt16, None)
    return bf


# ------------------------------------------------------------------ radix 64
def _b64_encode(data: bytes, n_chars: int) -> str:
    out = []
    acc = bits = 0
    for byte in data:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= 6:
            bits -= 6
            out.append(_ALPHABET[(acc >> bits) & 0x3F])
    if bits:
        out.append(_ALPHABET[(acc << (6 - bits)) & 0x3F])
    return "".join(out[:n_chars])


def _b64_decode(s: str, n_bytes: int) -> bytes:
    acc = bits = 0
    out = bytearray()
    for ch in s:
        acc = (acc << 6) | _A_INDEX[ch]
        bits += 6
        if bits >= 8:
            bits -= 8
            out.append((acc >> bits) & 0xFF)
    return bytes(out[:n_bytes])


# ------------------------------------------------------------------ api
def gensalt(rounds: int = 6, *, _salt16: bytes | None = None) -> bytes:
    """``$2b$`` salt string. ``rounds`` defaults LOW (6) because this
    is the pure-Python path — the C package defaults to 12. Pass
    ``_salt16`` for deterministic tests; otherwise ``os.urandom``."""
    if not 4 <= rounds <= 31:
        raise ValueError("bcrypt rounds must be in [4, 31]")
    if _salt16 is None:
        import os

        _salt16 = os.urandom(16)
    return f"$2b${rounds:02d}${_b64_encode(_salt16, 22)}".encode("ascii")


def hashpw(password: bytes, salt: bytes) -> bytes:
    """bcrypt(password, salt) -> full hash string (60 bytes)."""
    if isinstance(password, str) or isinstance(salt, str):
        raise TypeError("bytes expected (matching the bcrypt package API)")
    parts = salt.decode("ascii").split("$")
    if len(parts) < 4 or parts[1] not in ("2a", "2b", "2y"):
        raise ValueError(f"unsupported salt prefix in {salt!r}")
    prefix, cost_s, rest = parts[1], parts[2], parts[3]
    cost = int(cost_s)
    salt16 = _b64_decode(rest[:22], 16)
    key = (password[:72] + b"\x00")  # null-terminated, 72-byte cap
    bf = _eks_setup(cost, salt16, key)
    words = [
        int.from_bytes(_MAGIC[i : i + 4], "big") for i in range(0, 24, 4)
    ]
    for _ in range(64):
        for b in range(0, 6, 2):
            words[b], words[b + 1] = bf.encrypt(words[b], words[b + 1])
    ct = b"".join(w.to_bytes(4, "big") for w in words)
    return (
        f"${prefix}${cost:02d}${rest[:22]}{_b64_encode(ct[:23], 31)}"
    ).encode("ascii")


def checkpw(password: bytes, hashed: bytes) -> bool:
    """Constant-time verify (``bcrypt.CompareHashAndPassword``,
    ``Server/main.go:127``)."""
    return hmac.compare_digest(hashpw(password, hashed), hashed)
