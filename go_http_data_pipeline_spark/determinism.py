"""Cross-engine deterministic expression helpers.

The driver compares every query's Spark result against a DuckDB oracle
by order-insensitive value hash, so floating-point aggregation order
must not leak into results. Strategy:

* **Exact sums**: cast the addend to ``DECIMAL(18, s)`` first, sum
  exactly (no fp reassociation), then cast the total back to DOUBLE.
  Both engines produce bit-identical doubles.
* **Averages**: exact decimal sum -> double, divided by COUNT — the
  single double division is IEEE-deterministic in both engines.
* **Hash-derived pseudo-randomness**: ``md5`` (identical in both
  engines) -> parse a hex prefix to int -> modular arithmetic. Used by
  MinHash/SimHash/LSH and the seeded record generator so that
  "random" operators are oracle-checkable.

At scale none of this costs anything material: decimal sums are
JVM-side codegen'd, and md5 is a per-row scalar op.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31 - 1: modulus for all hash-mixing arithmetic.
# Operands stay < 2^31 so products stay < 2^62 — no int64 overflow in
# either engine (Spark wraps silently; DuckDB raises).
MERSENNE31 = 2_147_483_647


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Exact, order-insensitive sum of a double column, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 4) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)"


def dsum_wide(col: Column | str, scale: int = 4) -> Column:
    """:func:`dsum` at DECIMAL(38, scale): for sums whose TOTAL can
    exceed decimal(18,4)'s ~1e14 headroom (e.g. corpus-wide character
    counts at the 100 TB design point — ADVICE r9 item 3). 38-digit
    decimals cost two words instead of one, so the narrow form stays
    the default where magnitudes are bounded."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")


def dsum_wide_sql(expr: str, scale: int = 4) -> str:
    """DuckDB oracle twin of :func:`dsum_wide`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,{scale}))) AS DOUBLE)"


def davg(col: Column | str, scale: int = 4) -> Column:
    """Deterministic mean: exact decimal sum -> double, / count.

    The denominator counts NON-NULL values of the column (matching
    SQL ``AVG`` semantics): SUM skips nulls, so dividing by a
    count-every-row denominator would yield a value that is neither
    the mean of the non-null values nor of all rows — e.g. [10.0,
    NULL] would report 5.0 where AVG says 10.0."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def davg_sql(expr: str, scale: int = 4) -> str:
    return f"({dsum_sql(expr, scale)} / COUNT({expr}))"


def md5_int(col: Column | str, hex_chars: int = 8) -> Column:
    """First ``hex_chars`` of md5 parsed as a non-negative int64.

    8 hex chars -> value < 2^32; identical in Spark (``conv``) and
    DuckDB (``('0x' || substr(md5(x),1,8))::BIGINT``).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, hex_chars), 16, 10).cast("long")


def md5_int_sql(expr: str, hex_chars: int = 8) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, {hex_chars})) AS BIGINT)"


def ngram_starts_sql(arr: str, k: int) -> str:
    """Spark SQL snippet: 1-based start positions of ``k``-grams over
    array column ``arr`` — EMPTY when the doc has fewer than k tokens.

    A bare ``sequence(1, size - (k-1))`` is wrong for short docs:
    when ``size - (k-1) < 1`` Spark infers a NEGATIVE step and yields
    a DESCENDING array (``[1, 0]``, ``[1, 0, -1]`` ...), fabricating
    n-grams with null/empty members, while DuckDB's
    ``generate_series(1, stop)`` is empty for ``stop < 1``. The guard
    makes both engines agree on degenerate documents (and keeps the
    downstream ``x / size(grams)`` ratios NULL instead of an ANSI
    divide-by-zero).
    """
    stop = f"size({arr}) - {k - 1}"
    return f"if({stop} >= 1, sequence(1, {stop}), cast(array() as array<int>))"
