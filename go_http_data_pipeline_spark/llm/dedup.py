"""Deduplication operators for LLM training-data pipelines.

Beyond the reference's surface (BASELINE.json north star): exact
dedup, MinHash+LSH near-dup, SimHash fingerprints, n-gram Jaccard.
All are hash-deterministic (md5-derived integer arithmetic, exact
decimal/integer aggregation) so every operator is DuckDB-oracle
checkable — unusual for "random" sketches, and exactly why the
hash functions are seeded constants, not ``rand()``.

Scale design:
* exact dedup = hash-groupBy on md5(text) — one shuffle of (hash,
  doc_id), never the document bodies;
* MinHash: explode shingles -> per-(doc, hash_j) min-agg (map-side
  partial min keeps the shuffle tiny) -> band signatures -> self-join
  on (band, signature): the join runs on *signatures*, so at 100 TB
  the candidate set, not the corpus square, bounds the cost;
* SimHash: one explode + two groupBys, all integer arithmetic.

Shingling is word 3-grams; documents are space-tokenized
(FIXTURES.md: word-soup text, min 10 tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..determinism import MERSENNE31 as P
from ..determinism import md5_int
from ..registry import query

N_HASHES = 16
BAND_ROWS = 4  # 4 bands x 4 rows

# Affine hash family h_j(x) = (a_j * x + b_j) mod P with small seeded
# coefficients (products stay < 2^47 — overflow-safe in both engines).
_A_MUL, _A_ADD = 40503, 10007
_B_MUL, _B_ADD = 7919, 13

_SHINGLES_SQL = """
    shingles AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             LATERAL (SELECT unnest(generate_series(1, len(toks) - 2)) AS i) t
    )
"""


def shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct word-3-gram shingles per document."""
    docs = table(spark, sf_dir, "documents")
    sh = F.expr(
        "transform(sequence(1, size(split(text, ' ')) - 2),"
        " i -> array_join(slice(split(text, ' '), i, 3), ' '))"
    )
    return docs.select(
        "doc_id", F.explode(F.array_distinct(sh)).alias("shingle")
    )


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content hash; keep the smallest
    doc_id per group (deterministic representative)."""
    return (
        table(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, j, mh): 16 minhash values per document."""
    sh = shingles(spark, sf_dir).select(
        "doc_id", (md5_int("shingle") % P).alias("h")
    )
    expanded = sh.select(
        "doc_id",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(N_HASHES - 1))).alias("j"),
    )
    hv = (
        (F.col("j") * _A_MUL + _A_ADD) * F.col("h") + (F.col("j") * _B_MUL + _B_ADD)
    ) % P
    return (
        expanded.select("doc_id", "j", hv.alias("hv"))
        .groupBy("doc_id", "j")
        .agg(F.min("hv").alias("mh"))
    )


_MINHASH_SQL = f"""
    hashed AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) % {P} AS h
        FROM shingles
    ),
    minhash AS (
        SELECT doc_id, j,
               MIN(((j * {_A_MUL} + {_A_ADD}) * h + (j * {_B_MUL} + {_B_ADD})) % {P}) AS mh
        FROM hashed, (SELECT unnest(generate_series(0, {N_HASHES - 1})) AS j) js
        GROUP BY doc_id, j
    ),
    bands AS (
        SELECT doc_id, j // {BAND_ROWS} AS band,
               string_agg(CAST(mh AS VARCHAR), '-' ORDER BY j) AS sig
        FROM minhash
        GROUP BY doc_id, j // {BAND_ROWS}
    ),
    candidates AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    )
"""


def lsh_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band, sig): banded minhash signatures."""
    mh = minhash_signatures(spark, sf_dir)
    return (
        mh.withColumn("band", F.expr(f"j div {BAND_ROWS}"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "mh"))),
                    lambda x: x["mh"].cast("string"),
                ),
                "-",
            ).alias("sig")
        )
    )


@query(
    "minhash_lsh_pairs",
    oracle=f"""
    WITH {_SHINGLES_SQL}, {_MINHASH_SQL},
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    common AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
        FROM candidates c
        JOIN shingles sa ON sa.doc_id = c.doc_a
        JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT cm.doc_a, cm.doc_b, cm.n_common,
           (CAST(cm.n_common AS DOUBLE) / (ca.n + cb.n - cm.n_common)) AS jaccard
    FROM common cm
    JOIN cnt ca ON ca.doc_id = cm.doc_a
    JOIN cnt cb ON cb.doc_id = cm.doc_b
    WHERE (CAST(cm.n_common AS DOUBLE) / (ca.n + cb.n - cm.n_common)) >= 0.3
    """,
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate pairs: shingle -> 16 minhashes ->
    4 bands x 4 rows -> band-collision candidates -> exact Jaccard
    verification >= 0.3.

    The LSH step means only band-colliding pairs pay the exact
    verification join — the property that makes near-dedup feasible
    on a 100 TB corpus (candidates ~ O(dups), not O(n^2))."""
    sh = shingles(spark, sf_dir)
    bands = lsh_bands(spark, sf_dir)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa, sb = sh.alias("sa"), sh.alias("sb")
    common = (
        cand.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(
            sb,
            (F.col("sb.doc_id") == F.col("doc_b"))
            & (F.col("sb.shingle") == F.col("sa.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca, cb = cnt.alias("ca"), cnt.alias("cb")
    jac = F.col("n_common").cast("double") / (
        F.col("ca.n") + F.col("cb.n") - F.col("n_common")
    )
    return (
        common.join(ca, F.col("ca.doc_id") == F.col("doc_a"))
        .join(cb, F.col("cb.doc_id") == F.col("doc_b"))
        .select("doc_a", "doc_b", "n_common", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.3)
    )


@query(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM shingles a
        JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT cm.doc_a, cm.doc_b, cm.n_common,
           (CAST(cm.n_common AS DOUBLE) / (ca.n + cb.n - cm.n_common)) AS jaccard
    FROM common cm
    JOIN cnt ca ON ca.doc_id = cm.doc_a
    JOIN cnt cb ON cb.doc_id = cm.doc_b
    WHERE (CAST(cm.n_common AS DOUBLE) / (ca.n + cb.n - cm.n_common)) >= 0.3
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity (no LSH): inverted-index join
    on shared shingles — the ground truth ``minhash_lsh_pairs``
    approximates. Quadratic in the worst case; here the shingle join
    only pairs documents that actually share a 3-gram."""
    sh = shingles(spark, sf_dir)
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca, cb = cnt.alias("ca"), cnt.alias("cb")
    jac = F.col("n_common").cast("double") / (
        F.col("ca.n") + F.col("cb.n") - F.col("n_common")
    )
    return (
        common.join(ca, F.col("ca.doc_id") == F.col("doc_a"))
        .join(cb, F.col("cb.doc_id") == F.col("doc_b"))
        .select("doc_a", "doc_b", "n_common", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.3)
    )


@query(
    "simhash_fingerprints",
    oracle=f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, tok
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
    ),
    hashed AS (
        SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h
        FROM toks
    ),
    bit_votes AS (
        SELECT doc_id, b.b, b.pw,
               SUM(CASE WHEN (h // b.pw) % 2 = 1 THEN 1 ELSE -1 END) AS vote
        FROM hashed,
             (SELECT b, CAST(pow(2, b) AS BIGINT) AS pw
              FROM (SELECT unnest(generate_series(0, 15)) AS b)) b
        GROUP BY doc_id, b.b, b.pw
    )
    SELECT doc_id,
           SUM(CASE WHEN vote > 0 THEN pw ELSE 0 END) AS simhash
    FROM bit_votes
    GROUP BY doc_id
    """,
)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document: each bit is the sign of the vote
    sum (+1/-1 per distinct token by that bit of the token hash).
    Near-dup docs differ in few bits (Hamming distance)."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    hashed = toks.select("doc_id", md5_int("tok").alias("h"))
    bits = spark.createDataFrame(
        [(b, 1 << b) for b in range(16)], "b INT, pw BIGINT"
    )
    votes = (
        hashed.crossJoin(F.broadcast(bits))
        .select(
            "doc_id",
            "b",
            "pw",
            F.when(F.expr("(h div pw) % 2 = 1"), 1).otherwise(-1).alias("v"),
        )
        .groupBy("doc_id", "b", "pw")
        .agg(F.sum("v").alias("vote"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(F.when(F.col("vote") > 0, F.col("pw")).otherwise(0)).alias("simhash")
    )
