"""Data-quality operators: dbt-style constraint checks and column
profiling — the validation layer every production table pipeline runs
after ingest and before publish (absent in the reference, whose only
"validation" is per-request JSON decode errors; SURVEY.md §2.2 P6).

Scale notes: every check is a single aggregate or anti-join over the
checked table — one pass each, map-side combined; the profile is ONE
pass computing all per-column aggregates simultaneously (Spark's
multi-countDistinct expand), then a zero-shuffle unpivot to rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "data_quality_checks",
    oracle=f"""
    SELECT 'orders_custkey_not_null' AS check_name,
           CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
               AS n_violations
    FROM orders
    UNION ALL
    SELECT 'customer_custkey_unique',
           CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'orders_custkey_in_customer',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'event_type_accepted_values',
           CAST(COUNT(*) FILTER (
               WHERE event_type NOT IN
                   ({", ".join(repr(t) for t in _EVENT_TYPES)})) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'lineitem_discount_in_range',
           CAST(COUNT(*) FILTER (
               WHERE l_discount < 0 OR l_discount > 1) AS BIGINT)
    FROM lineitem
    """,
)
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt-style table tests as one DataFrame: not-null, uniqueness,
    referential integrity (anti-join), accepted values, and range —
    each emitting its violation count, so the publish gate is
    ``max(n_violations) == 0``. Plan shape: five independent
    single-row aggregates unioned — one scan per check, each pruned
    to the checked column(s). orders is scanned twice (not-null and
    referential); at 100 TB a production runner would fuse same-table
    checks into FILTER aggregates of one pass (and fold the null
    count into the anti-join input) — kept separate here because each
    check row mirrors one oracle UNION ALL arm one-to-one."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    events = table(spark, sf_dir, "events")
    lineitem = table(spark, sf_dir, "lineitem")

    def row(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("bigint").alias("n_violations"),
        )

    checks = [
        row(
            "orders_custkey_not_null",
            orders.agg(
                F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("n")
            ),
        ),
        row(
            "customer_custkey_unique",
            customer.agg(
                (F.count(F.lit(1)) - F.countDistinct("c_custkey")).alias("n")
            ),
        ),
        row(
            "orders_custkey_in_customer",
            orders.join(
                customer,
                orders.o_custkey == customer.c_custkey,
                "left_anti",
            ).agg(F.count(F.lit(1)).alias("n")),
        ),
        row(
            "event_type_accepted_values",
            events.agg(
                F.count(
                    F.when(~F.col("event_type").isin(*_EVENT_TYPES), 1)
                ).alias("n")
            ),
        ),
        row(
            "lineitem_discount_in_range",
            lineitem.agg(
                F.count(
                    F.when(
                        (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
                        1,
                    )
                ).alias("n")
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


# Columns profiled: integer and string columns only — min/max are
# emitted as VARCHAR for a uniform row schema, and float-to-string
# formatting is NOT canonical across engines (1.5 vs 1.50), so
# doubles stay out of the stringly-typed profile.
_PROFILE_COLS = (
    "c_custkey",
    "c_nationkey",
    "c_name",
    "c_mktsegment",
)


@query(
    "column_profile",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE {c} IS NULL) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_str,
           CAST(MAX({c}) AS VARCHAR) AS max_str
    FROM customer
    """
        for c in _PROFILE_COLS
    ),
)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level profiling of the customer table (row/null/distinct
    counts, min/max) — the stats a catalog publishes and a cost
    optimizer consumes. ONE pass over the table computes every
    column's aggregates simultaneously (multi-countDistinct compiles
    to Spark's Expand strategy), then an unpivot emits one row per
    column — contrast with the oracle's literal per-column UNION,
    which would be |columns| scans of a 100 TB table."""
    customer = table(spark, sf_dir, "customer")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}"),
            F.countDistinct(c).alias(f"dist_{c}"),
            F.min(c).cast("string").alias(f"min_{c}"),
            F.max(c).cast("string").alias(f"max_{c}"),
        ]
    wide = customer.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nulls_{c}, dist_{c}, min_{c}, max_{c}" for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args})"
            " AS (column_name, n_nulls, n_distinct, min_str, max_str)"
        ),
        F.col("n_rows").cast("bigint").alias("n_rows"),
    ).select(
        "column_name",
        "n_rows",
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_str",
        "max_str",
    )
