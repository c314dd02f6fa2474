"""Dataset assembly: training shards, reproducible splits, and
token-budget selection.

The last mile of a training-data pipeline: after cleaning, dedup, and
sampling, the corpus must be (a) split train/val/test reproducibly,
(b) cut down to a token budget, and (c) sharded for data loaders.
All three are hash-driven (``determinism.md5_int``) so reruns — and
the DuckDB oracle — agree bit-for-bit with no RNG state anywhere.

Scale design notes per operator in the docstrings; the common theme
is that every global decision (split thresholds, budget cutoff) is
either pure per-row arithmetic or a two-phase computation whose
first phase collapses the corpus to a bounded-size table (256
buckets / 16 shards / 3 splits) before any ordered scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..determinism import md5_int, md5_int_sql
from ..registry import query

N_SHARDS = 16

# Split thresholds over the md5_int range [0, 2^32): 98% / 1% / 1%.
# Integer arithmetic only — both engines compute the same cut points.
_SPAN = 1 << 32
_TRAIN_MAX = _SPAN * 98 // 100
_VAL_MAX = _SPAN * 99 // 100

# Budget-selection phase-1 granularity: high byte of the 32-bit hash
# -> 256 buckets, each ~1/256 of the corpus. The bucket index is the
# hash's high bits, so (bucket, hash) ordering == hash ordering.
_BUCKET_DIV = 1 << 24


@query(
    "training_shard_manifest",
    oracle=f"""
    WITH assigned AS (
        SELECT doc_id,
               {md5_int_sql("CAST(doc_id AS STRING)")} % {N_SHARDS} AS shard_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents
    )
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(n_bytes) AS BIGINT) AS n_bytes,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM assigned
    GROUP BY shard_id
    """,
)
def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard manifest for training data loaders: every document hashes
    to one of {N_SHARDS} shards (md5 of doc_id — stable across runs
    and engines), and the manifest reports per-shard document, token,
    and byte totals a loader needs for balanced epoch planning.

    Physical plan: one scan, per-row hash + token count in codegen,
    then a {N_SHARDS}-group aggregate — map-side combine reduces the
    shuffle to {N_SHARDS} rows per task regardless of corpus size.
    The same shard_id expression is what a writer would pass to
    ``df.repartition(N_SHARDS, shard_id).write`` — the manifest and
    the physical layout come from one definition."""
    docs = table(spark, sf_dir, "documents")
    assigned = docs.select(
        "doc_id",
        (md5_int(F.col("doc_id").cast("string")) % N_SHARDS).alias("shard_id"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.octet_length("text").cast("bigint").alias("n_bytes"),
    )
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_bytes").alias("n_bytes"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


@query(
    "dataset_split_assignment",
    oracle=f"""
    SELECT doc_id,
           {md5_int_sql("CAST(doc_id AS STRING)")} AS h,
           CASE WHEN {md5_int_sql("CAST(doc_id AS STRING)")} < {_TRAIN_MAX}
                     THEN 'train'
                WHEN {md5_int_sql("CAST(doc_id AS STRING)")} < {_VAL_MAX}
                     THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def dataset_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 98/1/1 train/val/test assignment: the md5 hash of
    the document id lands in [0, 2^32) and integer thresholds cut the
    range — no RNG, no shuffle, no ordering dependence. A document's
    split NEVER changes as the corpus grows (the property
    ``randomSplit`` lacks: its assignment depends on partitioning),
    which is what keeps eval sets uncontaminated across dataset
    versions.

    Pure per-row codegen — zero shuffle, embarrassingly parallel."""
    h = md5_int(F.col("doc_id").cast("string"))
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        h.alias("h"),
        F.when(h < _TRAIN_MAX, "train")
        .when(h < _VAL_MAX, "val")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "token_budget_selection",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id,
               {md5_int_sql("CAST(doc_id AS STRING)")} AS h,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    budget AS (
        SELECT CAST(SUM(n_tokens) // 2 AS BIGINT) AS budget FROM scored
    )
    SELECT doc_id, n_tokens,
           CAST(SUM(n_tokens) OVER (ORDER BY h, doc_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_tokens,
           SUM(n_tokens) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING)
               <= (SELECT budget FROM budget) AS selected
    FROM scored
    """,
)
def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut the corpus to a token budget (here: half the corpus's
    tokens) by taking documents in md5-priority order until the
    running token sum crosses the budget — uniform random selection
    that is exactly reproducible and oracle-checkable.

    The oracle states the semantics as one global ordered window; the
    Spark plan is the TWO-PHASE form that scales: (1) bucket each doc
    by the hash's high byte (256 buckets — monotone in h, so bucket
    order + within-bucket order == global order), aggregate
    per-bucket token sums, and prefix-sum THOSE on the bounded
    256-row table; (2) broadcast the bucket prefixes back and compute
    the within-bucket running sum with a window PARTITIONED by bucket
    — parallel across buckets, never a single-partition global sort
    of the corpus. cum_tokens = bucket prefix + within-bucket running
    sum, identical to the oracle's global window."""
    docs = table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        md5_int(F.col("doc_id").cast("string")).alias("h"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    ).withColumn("bucket", F.expr(f"h div {_BUCKET_DIV}"))
    bucket_sums = scored.groupBy("bucket").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    # 256-row table: the single-partition prefix window is control-
    # plane-sized by construction, not corpus-sized.
    # One pass over the 256-row table yields BOTH the per-bucket
    # prefix and the corpus total (unbounded-following frame on the
    # same ordering — one sort, one single-partition exchange, both
    # control-plane-sized); budget = total div 2 rides along through
    # the one broadcast join, so no extra scan or scalar cross join.
    w_prefix = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefixes = bucket_sums.select(
        "bucket",
        (F.sum("bucket_tokens").over(w_prefix) - F.col("bucket_tokens")).alias(
            "tokens_before"
        ),
        F.expr("sum(bucket_tokens) over (rows between unbounded preceding"
               " and unbounded following) div 2").alias("budget"),
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.join(F.broadcast(prefixes), "bucket")
        .withColumn(
            "cum_tokens",
            F.col("tokens_before") + F.sum("n_tokens").over(w_in),
        )
        .select(
            "doc_id",
            "n_tokens",
            "cum_tokens",
            (F.col("cum_tokens") <= F.col("budget")).alias("selected"),
        )
    )


def assign_contiguous_ids(
    spark: SparkSession, df: DataFrame, key: str
) -> DataFrame:
    """Two-phase contiguous-id assignment over ``df`` ordered by the
    unique ``key``: range-partition and sort within partitions (ONE
    distributed shuffle — every task sorts its own key range), stamp
    each row with ``monotonically_increasing_id()`` (range id in the
    upper bits, in-partition position in the lower 33 — assigned in
    the sorted iteration order, so it encodes (which range, position
    within range) with zero further data movement), take per-range
    row counts (one tiny job: P rows to the driver), prefix-sum them
    into range offsets, and emit ``offset + position`` as a broadcast
    join + bit arithmetic — map-side codegen, no second shuffle.
    (Two rejected forms, measured in SCALING_MEASURED.md §H's
    history: an Arrow/``mapInPandas`` pass paid an O(N) Python
    round-trip, and a window over the range id paid a second full
    shuffle; both erased the parallelism win locally.) The stamped
    data is persisted between the two jobs because range boundaries
    come from sampling — re-planning could move rows between ranges
    and desynchronize counts from assignment; at cluster scale the
    persist is a checkpoint and the collect is P longs, independent
    of corpus size. Returns ``(out, cached_src)``: ``out`` is the
    UN-materialized frame (its plan is inspectable — tests pin the
    absence of Exchange SinglePartition); callers materialize while
    ``cached_src`` is alive, then unpersist it."""
    src = (
        df.select(key)
        .repartitionByRange(spark.sparkContext.defaultParallelism, key)
        .sortWithinPartitions(key)
        .withColumn("mid", F.monotonically_increasing_id())
        .persist()
    )
    pid = F.shiftright("mid", 33)
    pos = F.col("mid").bitwiseAND((1 << 33) - 1)
    counts = {
        r.pid: r.n
        for r in src.groupBy(pid.alias("pid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets, acc = [], 0
    for p in sorted(counts):
        offsets.append((p, acc))
        acc += counts[p]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "pid long, off long")
    out = src.join(F.broadcast(off_df), pid == F.col("pid")).select(
        key,
        (F.col("off") + pos).alias("gid"),
    )
    return out, src


@query(
    "contiguous_global_ids",
    oracle="""
    SELECT o_orderkey,
           ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS gid
    FROM orders
    """,
)
def contiguous_global_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous 0..N-1 sample ids in global key order — what a data
    loader needs to address a corpus by position — WITHOUT the
    single-partition sort the obvious ``row_number() OVER (ORDER BY
    key)`` costs (one task sorting 100 TB: the canonical scale
    anti-pattern, pinned absent by tests/test_plans.py). See
    ``assign_contiguous_ids`` for the two-phase mechanism."""
    out, src = assign_contiguous_ids(
        spark, table(spark, sf_dir, "orders"), "o_orderkey"
    )
    # Materialize while the persisted partitioning is alive, then
    # release the cache (localCheckpoint keeps the result stable).
    result = out.localCheckpoint()
    src.unpersist()
    return result
