"""Set operations: UNION ALL / UNION / INTERSECT / EXCEPT.

Absent in the reference (SURVEY.md §2.7 — its closest analog is the
two-server `SERVER_ID` deployment, a union-view Spark partitioning
subsumes natively). Engine surface here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "union_all_parties",
    oracle="""
    SELECT c_custkey AS party_key, c_name AS party_name, 'customer' AS kind
    FROM customer WHERE c_acctbal > 5000
    UNION ALL
    SELECT s_suppkey AS party_key, s_name AS party_name, 'supplier' AS kind
    FROM supplier WHERE s_acctbal > 5000
    """,
)
def union_all_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two conformed projections."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(
            F.col("c_custkey").alias("party_key"),
            F.col("c_name").alias("party_name"),
            F.lit("customer").alias("kind"),
        )
    )
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(
            F.col("s_suppkey").alias("party_key"),
            F.col("s_name").alias("party_name"),
            F.lit("supplier").alias("kind"),
        )
    )
    return c.unionByName(s)


@query(
    "union_distinct_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def union_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): union all + dedup aggregate."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations having both customers and suppliers."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT n_nationkey AS nationkey
    FROM nation JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    """,
)
def except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): nations having customers, minus the ASIA
    region. (The original formulation — customer nations minus
    supplier nations — is EMPTY at every TPC-H scale because all 25
    nations carry both, so its oracle row was vacuous: a broken
    subtract would still 'pass' on 0 = 0 rows. Non-ASIA nations keep
    the result structurally nonempty at any SF.)"""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select(F.col("n_nationkey").alias("nationkey"))
    return c.subtract(asia)


@query(
    "unpivot_part_measures",
    oracle="""
    SELECT p_partkey AS partkey, measure, val
    FROM (
        SELECT p_partkey,
               CAST(p_size AS DOUBLE) AS size,
               p_retailprice AS retailprice
        FROM part
    )
    UNPIVOT (val FOR measure IN (size, retailprice))
    """,
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide part measures into (key, measure, value)
    rows — the inverse of the pivot query. Narrow map-side transform:
    2x row expansion, no shuffle at any scale."""
    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    return p.unpivot(
        "p_partkey", ["size", "retailprice"], "measure", "val"
    ).select(F.col("p_partkey").alias("partkey"), "measure", "val")


@query(
    "embedding_value_histogram",
    oracle="""
    SELECT dim_bucket, COUNT(*) AS n, 
           CAST(SUM(CASE WHEN v >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonneg
    FROM (
        SELECT (i.i - 1) // 8 AS dim_bucket, e.embedding[i.i] AS v
        FROM embeddings e,
             (SELECT unnest(generate_series(1, 64)) AS i) i
        WHERE e.vec_id < 100
    )
    GROUP BY dim_bucket
    """,
)
def embedding_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (lateral array expansion): unroll embedding vectors
    into (position, value) rows and profile them per 8-dim bucket —
    the table-function shape feature-store audits use. The explode is
    a narrow transform; only the tiny bucket agg shuffles."""
    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return (
        emb.select(F.posexplode("embedding").alias("pos", "v"))
        .groupBy(F.expr("pos div 8").alias("dim_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("v") >= 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_nonneg"),
        )
    )


@query(
    "except_all_priorities",
    oracle="""
    SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'O'
    """,
)
def except_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset): per-priority surplus of finished over
    open orders, keeping duplicate counts — bag semantics where the
    distinct EXCEPT would collapse to at most five rows. Compiles to
    a count-compare aggregation, not a row-at-a-time subtract."""
    o = table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("priority")
    )
    op = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("priority")
    )
    return f.exceptAll(op)


@query(
    "intersect_all_priorities",
    oracle="""
    SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'O'
    """,
)
def intersect_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset): per-priority min(count_F, count_O)
    occurrences — the bag-intersection twin of except_all."""
    o = table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("priority")
    )
    op = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("priority")
    )
    return f.intersectAll(op)


# Deterministic "next snapshot" of the customer table for the diff
# operator: keys ≡3 (mod 17) deleted, keys ≡0 (mod 10) get acctbal
# +100, keys ≡0 (mod 25) cloned as inserts under key + MAX(key).
# The offset is the table's own max key (not a fixed constant): a
# fixed 1_000_000 collides with real customer keys once SF exceeds
# ~6.7 (custkey max = 150k x SF), silently reclassifying inserts as
# updates and duplicating v2 keys — both engines would agree, so the
# gate would stay green on corrupted CDC semantics.
_DIFF_DEL, _DIFF_UPD, _DIFF_INS = 17, 10, 25


@query(
    "snapshot_diff",
    oracle=f"""
    WITH v2 AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % {_DIFF_UPD} = 0
                    THEN c_acctbal + 100 ELSE c_acctbal END AS c_acctbal,
               c_name
        FROM customer WHERE c_custkey % {_DIFF_DEL} != 3
        UNION ALL
        SELECT c_custkey + (SELECT MAX(c_custkey) + 1 FROM customer),
               c_acctbal, c_name
        FROM customer WHERE c_custkey % {_DIFF_INS} = 0
    )
    SELECT COALESCE(a.c_custkey, b.c_custkey) AS custkey,
           CASE WHEN a.c_custkey IS NULL THEN 'insert'
                WHEN b.c_custkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           a.c_acctbal AS old_acctbal,
           b.c_acctbal AS new_acctbal
    FROM customer a
    FULL JOIN v2 b ON a.c_custkey = b.c_custkey
    WHERE a.c_custkey IS NULL OR b.c_custkey IS NULL
       OR a.c_acctbal != b.c_acctbal OR a.c_name != b.c_name
    """,
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot diff: given two versions of a keyed table,
    emit (key, insert|delete|update, old, new) — the table-diff
    operator behind data validation, replication audit, and
    change-feed backfill. The "new" snapshot is derived
    deterministically from the fixture (see module constants) so the
    diff is oracle-checkable; in production the two sides are two
    table versions.

    Scale: one full outer join on the table key — co-partitioned if
    both snapshots share layout (bucketed by key: zero exchange),
    else one shuffle each; the change classification is pure codegen
    on the joined row. Columns are compared NATIVELY (never via
    stringified hashes of floats — cross-engine float formatting is
    not canonical); at 100-column width you'd hash the non-key
    columns per side with a binary-safe encoding instead."""
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_name"
    )
    k = F.col("c_custkey")
    v2 = (
        c.filter(k % _DIFF_DEL != 3)
        .withColumn(
            "c_acctbal",
            F.when(k % _DIFF_UPD == 0, F.col("c_acctbal") + 100).otherwise(
                F.col("c_acctbal")
            ),
        )
        .unionByName(
            # Key offset = MAX(c_custkey) + 1, carried in-plan as a
            # 1-row broadcast so clone keys are collision-free at
            # every SF (+1 because custkeys start at 0: the k=0 clone
            # would otherwise land exactly on the max key).
            c.filter(k % _DIFF_INS == 0)
            .crossJoin(F.broadcast(c.agg(F.max("c_custkey").alias("_mx"))))
            .withColumn("c_custkey", k + F.col("_mx") + 1)
            .drop("_mx")
        )
    )
    a, b = c.alias("a"), v2.alias("b")
    joined = a.join(
        b, F.col("a.c_custkey") == F.col("b.c_custkey"), "full_outer"
    )
    return joined.filter(
        F.col("a.c_custkey").isNull()
        | F.col("b.c_custkey").isNull()
        | (F.col("a.c_acctbal") != F.col("b.c_acctbal"))
        | (F.col("a.c_name") != F.col("b.c_name"))
    ).select(
        F.coalesce(F.col("a.c_custkey"), F.col("b.c_custkey")).alias(
            "custkey"
        ),
        F.when(F.col("a.c_custkey").isNull(), "insert")
        .when(F.col("b.c_custkey").isNull(), "delete")
        .otherwise("update")
        .alias("change_type"),
        F.col("a.c_acctbal").alias("old_acctbal"),
        F.col("b.c_acctbal").alias("new_acctbal"),
    )
