"""Document chunking and positional fingerprinting.

Training-data pipelines cut documents into fixed-size token windows
before tokenization/packing (context-length budgeting), and fingerprint
them positionally for overlap/plagiarism detection. Two operators:

* ``doc_chunks`` — overlapping fixed-size token windows (CHUNK=32,
  STRIDE=24), the standard chunk-for-training shape. Pure per-row
  array arithmetic: ``sequence`` generates the starts, ``slice`` cuts
  the window — no shuffle at all, so at 100 TB this is an
  embarrassingly parallel map over the corpus scan.
* ``winnowing_fingerprints`` — MOSS-style winnowing (Schleimer,
  Wilkerson, Aiken, SIGMOD'03): hash every token k-gram, slide a
  window of ``W`` consecutive hashes, select the minimum per window
  (rightmost on ties), emit the distinct selected (position, hash)
  pairs. Guarantees every match of length >= W+K-1 shares a
  fingerprint, with ~2/(W+1) sampling density — the order-sensitive
  complement to the set-based MinHash in ``dedup.py``.

Determinism: hashes are md5-derived integers (``determinism.md5_int``)
and the rightmost-min tie-break is encoded into one integer key
(``h * 128 + (127 - pos)``, exact in both engines), so both operators
are fully DuckDB-oracle hash-checkable.

Reference scope note: the reference (Server/main.go:209-227) ingests
whole records and never windows text — these extend the engine per the
north star (BASELINE.json), not reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..determinism import MERSENNE31 as P
from ..determinism import md5_int_sql, ngram_starts_sql
from ..registry import query

CHUNK = 32  # tokens per chunk
STRIDE = 24  # tokens between chunk starts (overlap = CHUNK - STRIDE = 8)

_K = 4  # tokens per winnowing k-gram
_W = 5  # winnowing window: consecutive k-gram hashes per window
# key = h * RADIX + (RADIX-1 - pos) makes MIN(key) select (min hash,
# rightmost position) in one integer comparison. The radix bounds the
# representable gram position: past it, keys from different (h, pos)
# pairs collide and decode to WRONG fingerprints with no error — so
# it is sized for ~1M-token documents (2^20), not for the fixture's
# 99 (the old 128 silently corrupted any real-corpus doc >= 131
# tokens). Keys stay < P * 2^20 < 2^51, exact in BIGINT/double alike.
_POS_RADIX = 1 << 20


@query(
    "doc_chunks",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t, len(string_split(text, ' ')) AS n
        FROM documents
    )
    SELECT doc_id,
           s.s // {STRIDE} AS chunk_idx,
           s.s AS start_tok,
           LEAST({CHUNK}, n - s.s) AS chunk_tokens,
           array_to_string(t[s.s + 1 : s.s + {CHUNK}], ' ') AS chunk_text
    FROM toks,
         LATERAL (SELECT unnest(generate_series(0, n - 1, {STRIDE})) AS s) s
    WHERE s.s = 0 OR n - s.s > {CHUNK - STRIDE}
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-token-window chunks: starts at 0, STRIDE,
    2*STRIDE, ...; each chunk takes up to CHUNK tokens. Tail chunks
    that would contain only tokens already covered by the previous
    chunk (fewer than CHUNK - STRIDE fresh tokens... i.e. none) are
    dropped, so every emitted chunk contributes new content.

    Physical shape: ``sequence``/``slice`` inside codegen — a pure
    narrow map with no shuffle; chunking a 100 TB corpus is exactly
    one pass over the scan, and the output stays partitioned like
    the input for the downstream tokenize/pack stages."""
    docs = table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.split("text", " ").alias("t"),
        F.size(F.split("text", " ")).alias("n"),
    )
    return (
        base.select(
            "doc_id",
            "n",
            "t",
            F.explode(F.expr(f"sequence(0, n - 1, {STRIDE})")).alias("s"),
        )
        .filter((F.col("s") == 0) | (F.col("n") - F.col("s") > CHUNK - STRIDE))
        .select(
            "doc_id",
            F.expr(f"s div {STRIDE}").alias("chunk_idx"),
            # bigint: the oracle's generate_series yields BIGINT and
            # the driver hash is type-sensitive.
            F.col("s").cast("bigint").alias("start_tok"),
            F.least(F.lit(CHUNK), F.col("n") - F.col("s"))
            .cast("bigint")
            .alias("chunk_tokens"),
            F.concat_ws(" ", F.expr(f"slice(t, s + 1, {CHUNK})")).alias("chunk_text"),
        )
    )


@query(
    "winnowing_fingerprints",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t,
               len(string_split(text, ' ')) - {_K - 1} AS n_grams
        FROM documents
    ),
    keyed AS (
        SELECT doc_id, n_grams, i.i AS pos,
               ({md5_int_sql(f"array_to_string(t[i.i : i.i + {_K - 1}], ' ')")}
                % {P}) * {_POS_RADIX} + ({_POS_RADIX - 1} - i.i) AS key
        FROM toks,
             LATERAL (SELECT unnest(generate_series(1, n_grams)) AS i) i
    ),
    wins AS (
        SELECT doc_id, w.w AS w_id, MIN(key) AS sel
        FROM keyed,
             LATERAL (SELECT unnest(generate_series(
                 GREATEST(pos, {_W}), LEAST(pos + {_W - 1}, n_grams))) AS w) w
        GROUP BY doc_id, w.w
    )
    SELECT DISTINCT doc_id,
           {_POS_RADIX - 1} - (sel % {_POS_RADIX}) AS pos,
           sel // {_POS_RADIX} AS fingerprint
    FROM wins
    """,
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints: md5-hash every token 4-gram,
    then in every window of W=5 consecutive gram hashes select the
    minimum (rightmost position on hash ties), and emit the distinct
    selected (pos, fingerprint) pairs per document.

    The rightmost-min tie-break is branchless: ``key = h * RADIX +
    (RADIX-1 - pos)`` so ``array_min`` picks minimal hash, then
    maximal position, in one integer comparison (see ``_POS_RADIX``
    for the position bound this encodes).

    Physical shape: winnowing is a pure per-document function, so the
    whole pipeline — gram hashing, per-window minima, within-doc
    dedup — runs as array lambdas inside codegen: ZERO shuffles (the
    oracle's groupBy-per-window formulation is the semantic spec, not
    the plan). At 100 TB this is a narrow map over the corpus scan,
    same as ``doc_chunks``; the O(n_grams * W) window scan per row is
    trivial next to md5."""
    # Single-file fixture scan -> one input split; spread the
    # gram-hash map across cores (same rationale as dedup.shingles).
    # On a many-file cluster table this is a no-op-sized rebalance.
    docs = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    gram = "concat_ws(' ', " + ", ".join(f"t[i + {j} - 1]" for j in range(_K)) + ")"
    keys = (
        f"transform({ngram_starts_sql('t', _K)}, i -> "
        f"(CAST(conv(substring(md5({gram}), 1, 8), 16, 10) AS BIGINT) % {P})"
        f" * {_POS_RADIX} + ({_POS_RADIX - 1} - i))"
    )
    sels = (
        f"array_distinct(transform("
        f"if(size(keys) >= {_W}, sequence({_W}, size(keys)),"
        f" cast(array() as array<int>)), w -> "
        f"array_min(slice(keys, w - {_W - 1}, {_W}))))"
    )
    return (
        docs.select("doc_id", F.split("text", " ").alias("t"))
        .select("doc_id", F.expr(keys).alias("keys"))
        .select("doc_id", F.explode(F.expr(sels)).alias("sel"))
        .select(
            "doc_id",
            (F.lit(_POS_RADIX - 1) - F.col("sel") % _POS_RADIX).alias("pos"),
            F.expr(f"sel div {_POS_RADIX}").alias("fingerprint"),
        )
    )


SEQ_BUDGET = 512  # tokens per packed training sequence


@query(
    "sequence_packing",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    runs AS (
        SELECT doc_id, source, n_tokens,
               -- CAST: DuckDB widens windowed SUM to DECIMAL(38,0)
               CAST(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS tok_offset
        FROM toks
    )
    SELECT doc_id, source, n_tokens, tok_offset,
           tok_offset // {SEQ_BUDGET} AS first_seq,
           (tok_offset + n_tokens - 1) // {SEQ_BUDGET} AS last_seq,
           ((tok_offset + n_tokens - 1) // {SEQ_BUDGET})
               - (tok_offset // {SEQ_BUDGET}) + 1 AS n_seqs
    FROM runs
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are concatenated
    per source shard in doc_id order and split into SEQ_BUDGET-token
    training sequences (the GPT-style packing layout); each document
    reports its token offset in the shard stream and the first/last
    sequence it lands in. One running-sum window per source shard —
    the shard is the packing unit precisely so the prefix sum never
    needs a global order: shards pack independently and in parallel
    at any corpus size."""
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    runs = toks.withColumn(
        "tok_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return runs.select(
        "doc_id",
        "source",
        "n_tokens",
        "tok_offset",
        F.expr(f"tok_offset div {SEQ_BUDGET}").alias("first_seq"),
        F.expr(f"(tok_offset + n_tokens - 1) div {SEQ_BUDGET}").alias("last_seq"),
        (
            F.expr(f"(tok_offset + n_tokens - 1) div {SEQ_BUDGET}")
            - F.expr(f"tok_offset div {SEQ_BUDGET}")
            + 1
        ).alias("n_seqs"),
    )
