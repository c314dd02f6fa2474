"""The SQL front door: ANSI queries executed verbatim by BOTH engines.

Everything else in the repo pairs a DataFrame program with a DuckDB
oracle; these queries go further — one portable SQL string IS both
the Spark program (``spark.sql`` over the registered fixture views)
and the oracle. That exercises the engine surface a SQL-first user
touches (view catalog, parser, ANSI function dialect) and proves the
dialect subset used is genuinely portable.

Scale: identical to the DataFrame twins — ``spark.sql`` compiles to
the same Catalyst plans (broadcast dim joins, partial+final aggs);
the API is syntax, not a different engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from ..registry import query

# Portable ANSI subset: CAST, DECIMAL-exact sums, EXTRACT, CASE, JOIN,
# GROUP BY ordinal-free, no engine-specific functions.
_PORTABLE_REVENUE = """
    SELECT l_returnflag AS returnflag,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS ship_year,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_quantity < 50
    GROUP BY l_returnflag, CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT)
"""

_PORTABLE_SEGMENT_NATIONS = """
    SELECT n.n_name AS nation, c.c_mktsegment AS segment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_balance
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name <> 'REGION_0'
    GROUP BY n.n_name, c.c_mktsegment
"""


@query("sql_api_revenue_by_year", oracle=_PORTABLE_REVENUE)
def sql_api_revenue_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The revenue rollup as ONE portable SQL string — Spark runs it
    through ``spark.sql`` on the fixture views; DuckDB runs the
    byte-identical text as the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_PORTABLE_REVENUE)


@query("sql_api_segment_nations", oracle=_PORTABLE_SEGMENT_NATIONS)
def sql_api_segment_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-join rollup via the same one-string portable-SQL
    contract; Catalyst still broadcasts the nation/region dims
    exactly as the DataFrame twins do."""
    register_views(spark, sf_dir)
    return spark.sql(_PORTABLE_SEGMENT_NATIONS)


# Depth bound for the recursive closure: Spark's WITH RECURSIVE
# supports only UNION ALL (no in-recursion dedup), so on a cyclic
# symmetric edge set the walk must be depth-bounded to terminate —
# and the intermediate reach relation grows ~O(k·(k-1)^(depth-1)) per
# k-clique IN BOTH ENGINES, so the bound is also the memory guard.
# Correctness needs only depth >= cluster diameter: clusters are
# template families (diameter ~2, verified by `neardup_graph_stats`),
# so 4 is a 2x margin while keeping the per-clique blowup at (k-1)^3
# instead of the (k-1)^7 a depth of 8 allowed. Both engines run the
# IDENTICAL bounded recursion, so parity holds at any depth; raise
# this only alongside a fixture whose dup graphs are actual chains.
_RECURSION_DEPTH = 4

# The recursion tail over an `edges(doc_a, doc_b)` relation — shared
# verbatim by the Spark program and the DuckDB oracle.
_CLOSURE_TAIL = f"""
    sym AS (
        SELECT doc_a AS src, doc_b AS dst FROM edges
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM edges
    ),
    reach(src, dst, depth) AS (
        SELECT src, dst, 1 FROM sym
        UNION ALL
        SELECT r.src, s.dst, r.depth + 1
        FROM reach r JOIN sym s ON s.src = r.dst
        WHERE r.depth < {_RECURSION_DEPTH}
    )
    SELECT src AS doc_id,
           LEAST(src, MIN(dst)) AS component_id,
           CASE WHEN LEAST(src, MIN(dst)) = src THEN 1 ELSE 0 END AS is_keeper
    FROM reach
    GROUP BY src
"""


def _components_recursive_oracle() -> str:
    from ..llm.dedup import _MINHASH_PAIRS_BODY

    return f"""
    WITH RECURSIVE {_MINHASH_PAIRS_BODY},
    edges AS (SELECT doc_a, doc_b FROM verified),
    {_CLOSURE_TAIL}
    """


@query("sql_api_components_recursive", oracle=_components_recursive_oracle())
def sql_api_components_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components via Spark 4's ``WITH RECURSIVE`` — the
    THIRD paradigm for the same answer (`dedup_components` iterates
    DataFrames, its oracle recurses in DuckDB, this recurses in
    SPARK SQL), exercising the recursive-CTE surface of the engine
    itself. Spark restricts recursion to UNION ALL, so the walk is
    depth-bounded (see `_RECURSION_DEPTH`) with dedup at the final
    rollup; the oracle runs the IDENTICAL bounded recursion, and the
    result equals the fixpoint whenever depth >= cluster diameter.

    Scale: UNION-ALL path enumeration is exponential in depth on
    dense clusters — this is the declarative convenience form for
    shallow graphs; the production-scale form remains the
    checkpointed label-propagation loop in `dedup_components`."""
    from ..llm.dedup import minhash_lsh_pairs

    minhash_lsh_pairs(spark, sf_dir).createOrReplaceTempView("neardup_edges")
    return spark.sql(
        f"""
        WITH RECURSIVE
        edges AS (SELECT doc_a, doc_b FROM neardup_edges),
        {_CLOSURE_TAIL}
        """
    )
