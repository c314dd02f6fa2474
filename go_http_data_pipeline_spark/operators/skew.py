"""Skew mitigation: salted joins.

At 100 TB a handful of hot keys (one viral user_id, one mega-order)
can pin an entire stage on one task. AQE's skew-join splitting
handles sort-merge joins automatically (enabled in ``session.py``);
this module provides the *explicit* salting pattern for the cases AQE
can't touch — aggregation skew and broadcast-infeasible dimension
joins:

* fact side: append ``salt = pmod(hash(key, row-disambiguator), N)``
* dim side: explode each row into N copies, one per salt value
* join on (key, salt) — the hot key's rows now spread over N tasks.

Results are provably identical to the unsalted join (each fact row
matches exactly the one dim copy carrying its salt), which is exactly
what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim ON key`` with the hot-key rows of
    ``fact`` spread across ``n_salts`` shuffle partitions. ``dim`` is
    replicated xN (fine for dimension-sized tables).

    Only ``inner`` and ``left`` are equivalent to the unsalted join:
    each fact row carries exactly one salt, so it matches exactly the
    one dim copy with that salt (inner), and an unmatched fact row
    still emits exactly one null-extended row (left). For ``right``/
    ``full`` the N dim copies of an unmatched (key, salt) each emit
    their own null-extended row — up to N-1 spurious rows per dim row
    — so those modes are rejected rather than silently inflated."""
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'/'left', got {how!r}: "
            "replicated dim copies would null-extend individually"
        )
    # Content-hash salt (all fact columns), not
    # monotonically_increasing_id(): the id changes across task
    # retries and re-partitionings, so a retried task could re-salt
    # rows differently than the shuffle files already written — the
    # content hash is a pure row function, stable under any replay.
    # Exact-duplicate rows share a salt; their spread comes from the
    # key hash itself, and dedup-before-join is the fix if a single
    # duplicated row is genuinely hot.
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    salted_dim = dim.select("*", salts).withColumn("_salt", F.col("_salt").cast("bigint"))
    out = salted_fact.join(salted_dim, on=[key, "_salt"], how=how)
    return out.drop("_salt")


@query(
    "skew_salted_user_revenue",
    oracle="""
    WITH dim AS (
        SELECT DISTINCT user_id, 'tier_' || CAST(user_id % 3 AS VARCHAR) AS tier
        FROM events
    )
    SELECT d.tier, COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events e JOIN dim d ON d.user_id = e.user_id
    GROUP BY d.tier
    """,
)
def skew_salted_user_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted-join pattern end-to-end, oracle-checked against the
    semantically identical unsalted join: events (the skewable fact)
    ⋈ a per-user tier dimension on user_id, then aggregate by tier."""
    ev = table(spark, sf_dir, "events")
    dim = ev.select("user_id").distinct().select(
        "user_id",
        F.concat(F.lit("tier_"), (F.col("user_id") % 3).cast("string")).alias("tier"),
    )
    joined = salted_join(ev, dim, key="user_id", n_salts=8)
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
    )
