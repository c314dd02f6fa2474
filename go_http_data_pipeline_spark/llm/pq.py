"""Product quantization (PQ) over the ``embeddings`` table — the
memory-bounded ANN path that complements hyperplane-LSH buckets and
IVF cells (``llm/similarity.py``).

PQ splits each 64-d vector into ``M = 4`` subvectors of 16 dims and
quantizes each subvector independently against a per-subspace codebook
of ``K = 16`` codewords, so a vector becomes 4 small codes — the
compression that turns a 100 TB raw-embedding corpus into a
codes table a few hundred GB wide, scanned WITHOUT touching the raw
floats. Queries score the compressed corpus by asymmetric distance
computation (ADC): precompute, per query, the partial dot of the RAW
query subvector against every codeword (a (queries x M x K) lookup
table, broadcast), then a corpus vector's approximate dot is four
table lookups summed.

Determinism: the same ``floor(x * 1e7)`` integer quantization as the
rest of the similarity suite — codeword assignment distances, LUT
partial dots, and reconstructed norms are exact BIGINT sums, and the
final ``adot / sqrt(rn2) / q_nrm`` uses the same IEEE-754 op sequence
in Spark and DuckDB, so codes, scores, and rankings hash-match. The
codebook is the same deterministic stand-in as the IVF coarse
quantizer (every ``_CENT_STEP``-th vector, sliced per subspace):
real pipelines train it offline with k-means; the query-time dataflow
is identical.

Scale design:
* the codebook (64 codewords total) and the per-query LUT broadcast;
  code assignment is a per-row 16x expansion within a subspace — no
  corpus shuffle beyond the per-(vec_id, sub) argmin window;
* ADC probes read ONLY the codes table (4 ints/vector); the one
  shuffle is the (qid, vec_id) partial-dot fold, map-side combined
  4 -> 1. Production stores codes wide (one row, M columns) and folds
  per-row without any shuffle — the long form here mirrors the SQL
  oracle; the wide variant is a pivot away;
* ``pq_recall_eval`` measures the quality cost of the compression
  against the exact brute-force top-5, the eval every PQ deployment
  runs before trusting the codes.

Reference parity: the reference (Server/main.go, Client/main.go) has
no vector ops at all — this module is part of the beyond-reference
training-data surface (SURVEY.md "ANN / embeddings" extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from .similarity import (
    _CENT_MAX,
    _CENT_STEP,
    _COSINE_TOPK_ORACLE,
    _NORMS_SQL,
    N_QUERIES,
    _spread,
    cosine_topk,
    vector_norms,
)

M_SUBSPACES = 4
D_SUB = 16  # 64 dims / 4 subspaces

# Exact quantized-integer squared L2 distance between two D_SUB-dim
# float slices (Spark SQL expr): diffs of FLOOR(x*1e7) BIGINTs,
# squared and summed — max 16 * (1.1e7)^2 ~ 1.9e15 < 2^53, exact.
_D2 = (
    "aggregate(zip_with({a}, {b}, (x, y) ->"
    " (FLOOR(CAST(x AS DOUBLE) * 1e7) - FLOOR(CAST(y AS DOUBLE) * 1e7))"
    " * (FLOOR(CAST(x AS DOUBLE) * 1e7) - FLOOR(CAST(y AS DOUBLE) * 1e7))),"
    " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)

# Exact quantized-integer dot of two D_SUB-dim float slices.
_PDOT = (
    "CAST(aggregate(zip_with({a}, {b}, (x, y) ->"
    " FLOOR(CAST(x AS DOUBLE) * 1e7) * FLOOR(CAST(y AS DOUBLE) * 1e7)),"
    " CAST(0 AS BIGINT), (acc, v) -> acc + v) AS DOUBLE)"
)

# DuckDB twins — {a}/{b} are indexed element expressions (the i.i /
# s.s unnest join supplies the indexes), aggregated with GROUP BY.
_D2_SQL = (
    "CAST(SUM((CAST(FLOOR(CAST({a} AS DOUBLE) * 1e7) AS BIGINT)"
    " - CAST(FLOOR(CAST({b} AS DOUBLE) * 1e7) AS BIGINT))"
    " * (CAST(FLOOR(CAST({a} AS DOUBLE) * 1e7) AS BIGINT)"
    " - CAST(FLOOR(CAST({b} AS DOUBLE) * 1e7) AS BIGINT))) AS BIGINT)"
)
_PDOT_SQL = (
    "CAST(CAST(SUM(CAST(FLOOR(CAST({a} AS DOUBLE) * 1e7) AS BIGINT)"
    " * CAST(FLOOR(CAST({b} AS DOUBLE) * 1e7) AS BIGINT)) AS BIGINT) AS DOUBLE)"
)

_SUBS_SQL = f"(SELECT unnest(generate_series(0, {M_SUBSPACES - 1})) AS s) s"
_DIMS_SQL = f"(SELECT unnest(generate_series(1, {D_SUB})) AS i) i"
_EIDX = f"e.embedding[s.s * {D_SUB} + i.i]"
_CIDX = f"c.embedding[s.s * {D_SUB} + i.i]"
_QIDX = f"q.embedding[s.s * {D_SUB} + i.i]"

# Per-subspace codebook + code assignment, as composable CTEs. The
# codebook reuses the IVF deterministic-centroid convention (the
# codeword id IS the source centroid's vec_id).
_PQ_CODES_SQL = f"""
    pq_cents AS (
        SELECT vec_id AS code, embedding
        FROM embeddings
        WHERE vec_id % {_CENT_STEP} = 0 AND vec_id < {_CENT_MAX}
    ),
    pq_d2 AS (
        SELECT e.vec_id, s.s AS sub, c.code,
               {_D2_SQL.format(a=_EIDX, b=_CIDX)} AS d2
        FROM embeddings e
        JOIN pq_cents c ON TRUE, {_SUBS_SQL}, {_DIMS_SQL}
        GROUP BY e.vec_id, s.s, c.code
    ),
    pq_codes AS (
        SELECT vec_id, sub, code, d2 FROM (
            SELECT vec_id, sub, code, d2,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id, sub ORDER BY d2, code
                   ) AS rn
            FROM pq_d2
        ) WHERE rn = 1
    )
"""


_CODES_CACHE: dict = {}


def _codes_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus's (vec_id, sub, code) assignment, persisted per
    (session, fixture) — the PQ index table a real pipeline would
    checkpoint once and probe many times. pq_ann_top1 and
    pq_recall_eval (which embeds it) reuse it instead of re-running
    the 16x-per-subspace assignment expansion on every probe."""
    key = (spark.sparkContext.applicationId, sf_dir)
    codes = _CODES_CACHE.get(key)
    if codes is None:
        emb = _spread(spark, table(spark, sf_dir, "embeddings"))
        codes = (
            pq_assign(emb, _codebook(spark, sf_dir))
            .select("vec_id", "sub", "code")
            .persist()
        )
        _CODES_CACHE[key] = codes
    return codes


def _codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(sub, code, c_sub): the per-subspace codebook — 16 deterministic
    codewords x 4 subspaces = 64 rows, always broadcast."""
    subs = F.array(*[F.lit(s) for s in range(M_SUBSPACES)])
    return (
        table(spark, sf_dir, "embeddings")
        .filter(
            (F.col("vec_id") % _CENT_STEP == 0) & (F.col("vec_id") < _CENT_MAX)
        )
        .select(
            F.col("vec_id").alias("code"),
            "embedding",
            F.explode(subs).alias("sub"),
        )
        .select(
            "sub",
            "code",
            F.expr(f"slice(embedding, sub * {D_SUB} + 1, {D_SUB})").alias(
                "c_sub"
            ),
        )
    )


def pq_assign(corpus: DataFrame, codebook: DataFrame) -> DataFrame:
    """(vec_id, sub, code, d2): nearest codeword per (vector,
    subspace) — a broadcast of the 64-row codebook, a 16x row
    expansion per subspace, exact BIGINT distance folds in codegen,
    and a per-(vec_id, sub) argmin window. Only the corpus's own
    (vec_id, sub) rows shuffle for the window; the raw floats never
    leave their scan."""
    subs = F.array(*[F.lit(s) for s in range(M_SUBSPACES)])
    e_sub = (
        corpus.select("vec_id", "embedding", F.explode(subs).alias("sub"))
        .select(
            "vec_id",
            "sub",
            F.expr(f"slice(embedding, sub * {D_SUB} + 1, {D_SUB})").alias(
                "e_sub"
            ),
        )
    )
    d2 = F.expr(_D2.format(a="e_sub", b="c_sub"))
    w = Window.partitionBy("vec_id", "sub").orderBy("d2", "code")
    return (
        e_sub.join(F.broadcast(codebook), "sub")
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "sub", "code", "d2")
    )


@query(
    "embedding_pq_codes",
    oracle=f"""
    WITH {_PQ_CODES_SQL}
    SELECT vec_id, sub, code, CAST(d2 AS DOUBLE) AS sq_dist
    FROM pq_codes
    """,
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ code assignment: each vector's 4 subvectors quantized to
    their nearest per-subspace codeword (exact integer L2, ties to the
    smaller code id), with the squared distortion kept per code — the
    compressed representation ADC probes read instead of raw floats,
    and the distortion column is the calibration signal (rising
    ``sq_dist`` means the codebook no longer fits the corpus)."""
    emb = _spread(spark, table(spark, sf_dir, "embeddings"))
    return pq_assign(emb, _codebook(spark, sf_dir)).select(
        "vec_id",
        F.col("sub").cast("bigint").alias("sub"),
        "code",
        F.col("d2").cast("double").alias("sq_dist"),
    )


_PQ_TOP1_ORACLE = f"""
    WITH {_NORMS_SQL}, {_PQ_CODES_SQL},
    lut AS (
        SELECT q.vec_id AS qid, s.s AS sub, c.code,
               {_PDOT_SQL.format(a=_QIDX, b=_CIDX)} AS pdot
        FROM embeddings q
        JOIN pq_cents c ON TRUE, {_SUBS_SQL}, {_DIMS_SQL}
        WHERE q.vec_id < {N_QUERIES}
        GROUP BY q.vec_id, s.s, c.code
    ),
    cn2 AS (
        SELECT s.s AS sub, c.code,
               {_PDOT_SQL.format(a=_CIDX, b=_CIDX)} AS pn2
        FROM pq_cents c, {_SUBS_SQL}, {_DIMS_SQL}
        GROUP BY s.s, c.code
    ),
    adc AS (
        SELECT l.qid, p.vec_id, SUM(l.pdot) AS adot, SUM(n.pn2) AS rn2
        FROM pq_codes p
        JOIN lut l ON l.sub = p.sub AND l.code = p.code
        JOIN cn2 n ON n.sub = p.sub AND n.code = p.code
        WHERE p.vec_id <> l.qid
        GROUP BY l.qid, p.vec_id
    )
    SELECT a.qid, a.vec_id AS neighbor_id,
           a.adot / sqrt(a.rn2) / qn.nrm AS approx_cosine
    FROM (
        SELECT qid, vec_id, adot, rn2,
               ROW_NUMBER() OVER (
                   PARTITION BY qid
                   ORDER BY adot / sqrt(rn2) DESC, vec_id
               ) AS rn
        FROM adc
    ) a
    JOIN norms qn ON qn.vec_id = a.qid
    WHERE a.rn = 1
    """


@query("pq_ann_top1", oracle=_PQ_TOP1_ORACLE)
def pq_ann_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN by asymmetric distance computation: each query's RAW
    subvectors are dotted against every codeword once (a 4x16-entry
    LUT per query, broadcast), then a corpus vector's approximate
    cosine is four LUT lookups summed over its codes, normalized by
    the query norm and the RECONSTRUCTED corpus norm — the corpus's
    raw floats are never read at probe time, which is the whole point
    at 100 TB. Top-1 per query, ties to the smaller vec_id; the
    ranking divides by sqrt(rn2) only (the per-qid query norm is a
    positive constant, so it cannot reorder)."""
    cb = _codebook(spark, sf_dir)
    codes = _codes_cached(spark, sf_dir)

    queries = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("qid"), "embedding")
    )
    subs = F.array(*[F.lit(s) for s in range(M_SUBSPACES)])
    q_sub = queries.select(
        "qid", "embedding", F.explode(subs).alias("sub")
    ).select(
        "qid",
        "sub",
        F.expr(f"slice(embedding, sub * {D_SUB} + 1, {D_SUB})").alias("q_sub"),
    )
    lut = q_sub.join(F.broadcast(cb), "sub").select(
        "qid",
        "sub",
        "code",
        F.expr(_PDOT.format(a="q_sub", b="c_sub")).alias("pdot"),
    )
    cn2 = cb.select(
        "sub", "code", F.expr(_PDOT.format(a="c_sub", b="c_sub")).alias("pn2")
    )
    q_norms = vector_norms(spark, sf_dir).filter(
        F.col("vec_id") < N_QUERIES
    ).select(F.col("vec_id").alias("qid"), F.col("nrm").alias("q_nrm"))

    adc = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .join(F.broadcast(cn2), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(F.sum("pdot").alias("adot"), F.sum("pn2").alias("rn2"))
    )
    w = Window.partitionBy("qid").orderBy(
        (F.col("adot") / F.sqrt("rn2")).desc(), F.col("vec_id")
    )
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(F.broadcast(q_norms), "qid")
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            (F.col("adot") / F.sqrt("rn2") / F.col("q_nrm")).alias(
                "approx_cosine"
            ),
        )
    )


@query(
    "pq_recall_eval",
    oracle=f"""
    WITH brute AS ({_COSINE_TOPK_ORACLE}),
    pq AS ({_PQ_TOP1_ORACLE})
    SELECT p.qid, p.neighbor_id AS pq_neighbor, p.approx_cosine,
           b.rank AS brute_rank,
           CASE WHEN b.rank IS NOT NULL THEN 1 ELSE 0 END AS in_top5
    FROM pq p
    LEFT JOIN brute b ON b.qid = p.qid AND b.neighbor_id = p.neighbor_id
    """,
)
def pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ quality harness: is the ADC top-1 neighbor inside the exact
    brute-force top-5? The compression's recall cost made one left
    join + one avg away — read next to ``ann_recall_eval`` (LSH) and
    ``semdedup_recall_eval`` (IVF) to compare the three index
    families' recall at the same corpus."""
    pq = pq_ann_top1(spark, sf_dir).select(
        "qid",
        F.col("neighbor_id").alias("pq_neighbor"),
        "approx_cosine",
    )
    brute = cosine_topk(spark, sf_dir).select(
        "qid", F.col("neighbor_id").alias("pq_neighbor"), "rank"
    )
    return pq.join(F.broadcast(brute), ["qid", "pq_neighbor"], "left").select(
        "qid",
        "pq_neighbor",
        "approx_cosine",
        F.col("rank").alias("brute_rank"),
        F.when(F.col("rank").isNotNull(), 1).otherwise(0).alias("in_top5"),
    )
