"""Physical-plan inspection utilities.

The engine's scale story rests on plan properties, not code paths:
filters reach the parquet scan, projections prune columns, dimension
joins broadcast, hot expressions stay inside whole-stage codegen.
These helpers turn those properties into assertable strings so tests
pin them — a plan regression (a broadcast silently becoming a
sort-merge join, a filter losing pushdown) fails CI instead of
surfacing as a 100x slowdown at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    """The plan text of ``df.explain(mode)``, as a string."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Every ``PushedFilters`` list in the plan, flattened."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_str(df)):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """Every ``ReadSchema`` struct string (one per file scan)."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan_str(df))


def join_strategies(df: DataFrame) -> list[str]:
    """Physical join node names, in plan order."""
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"
        r"|BroadcastNestedLoopJoin|CartesianProduct)",
        plan_str(df),
    )


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges and
    AQE shuffle reads). Parsed from simple mode, where the node and
    its partitioning share a line."""
    plan = plan_str(df, "simple")
    return len(
        re.findall(r"\bExchange (?:hash|range)partitioning", plan)
    )


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen span count. Under AQE the markers only
    exist in the FINAL plan, so this executes the DataFrame (use on
    test-scale data) and counts the distinct ``*(N)`` spans."""
    df.collect()  # finalize the adaptive plan
    return len(set(re.findall(r"\*\((\d+)\)", plan_str(df, "simple"))))


def _node_depths(lines: list[str]) -> list[int]:
    """Tree depth of each simple-plan line = column where the node
    name starts (after the ``+-``/``:-``/indent prefix)."""
    out = []
    for line in lines:
        m = re.search(r"[^\s:+\-]", line)
        out.append(m.start() if m else len(line))
    return out


def unaggregated_global_sorts(df: DataFrame) -> list[str]:
    """Fact-scale data funneled through ONE task: every
    ``Exchange SinglePartition`` whose subtree reaches a parquet scan
    with NO aggregate on the path between them. A single-partition
    exchange is fine when it consumes a HashAggregate (control-plane
    tables: histograms, bucket sums, file stats — bounded rows); it
    is the textbook 100 TB straggler when raw scan rows flow into it
    (an unpartitioned Window/ntile over a fact table). Returns the
    offending scan lines; the scale contract is ``== []``."""
    lines = plan_str(df, "simple").splitlines()
    depths = _node_depths(lines)
    offenders: list[str] = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        # Subtree = following lines strictly deeper than the exchange.
        j = i + 1
        while j < len(lines) and depths[j] > depths[i]:
            if "Scan parquet" in lines[j]:
                # Walk the ancestor chain scan -> exchange; an
                # Aggregate anywhere on it bounds the row count.
                cur, aggregated = depths[j], False
                for k in range(j - 1, i, -1):
                    if depths[k] < cur:
                        cur = depths[k]
                        if "Aggregate" in lines[k]:
                            aggregated = True
                            break
                if not aggregated:
                    offenders.append(lines[j].strip())
            j += 1
    return offenders
