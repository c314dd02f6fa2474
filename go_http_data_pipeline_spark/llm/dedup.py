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
* MinHash: one groupBy(doc_id) computing all 16 minhashes as agg
  *columns* (map-side partial min; no 16x row explosion) -> band
  signatures by column concat (no extra shuffle) -> self-join on
  (band, signature): the join runs on *signatures*, so at 100 TB the
  candidate set, not the corpus square, bounds the cost. The shingle
  table is persisted — it feeds signature build + both sides of the
  verification join, and at scale it would be a materialized
  intermediate table, not recomputed lineage;
* SimHash: one explode + one groupBy with 32 vote columns, all
  integer arithmetic; near-dup pairs via pigeonhole half-collision.

Shingling is word 3-grams; documents are space-tokenized
(FIXTURES.md: word-soup text, min 10 tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..determinism import MERSENNE31 as P
from ..determinism import md5_int, ngram_starts_sql
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
    """Distinct word-3-gram shingles per document. The tokens array is
    materialized once so codegen doesn't re-split per shingle.

    The scan is repartitioned first: the fixture is one parquet file
    (one input split), and the tokenize→explode→md5 chain is the
    expensive part — without the rebalance it would run on a single
    core. The shuffle moved is just the raw documents, far smaller
    than the shingle stream it parallelizes."""
    docs = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return shingles_of(docs)


def shingles_of(docs: DataFrame) -> DataFrame:
    """The shingle kernel over an arbitrary (doc_id, text, ...) frame
    — shared by the batch corpus path above and the per-micro-batch
    incremental LSH indexer (streaming/core.py), so the streaming
    index can never drift from the batch definition."""
    return (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform({ngram_starts_sql('toks', 3)},"
                        " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"
                    )
                )
            ).alias("shingle"),
        )
        # Hash the string away immediately: downstream only ever needs
        # equality (verify joins) and the minhash input, so the cached
        # table carries two bigints instead of a ~25-byte string —
        # smaller cache, cheaper shuffles, integer join compares.
        # sh_h is 48-bit (collision expectation n^2/2^49: ~1e-7 at the
        # sf0.01 gate); h is the 8-hex minhash domain used by the
        # oracle's formula verbatim.
        .select("doc_id", F.md5("shingle").alias("m"))
        .select(
            "doc_id",
            F.conv(F.substring("m", 1, 12), 16, 10).cast("long").alias("sh_h"),
            (F.conv(F.substring("m", 1, 8), 16, 10).cast("long") % P).alias("h"),
        )
    )


# Per-(session, sf_dir) memo of the persisted shingle table: it feeds
# MinHash signature build, shingle counts, and both sides of the
# Jaccard verification join across two registered queries — at
# cluster scale it would be a checkpointed intermediate table, and
# locally the memo keeps bench iterations from re-tokenizing the
# corpus once per call.
_SHINGLE_CACHE: dict = {}


def shingles_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Persisted hash-partitioned BY SHINGLE: the expensive consumers
    # (the ngram/minhash verification self-joins) join on the shingle
    # key, and a persisted DataFrame keeps its outputPartitioning —
    # both join sides arrive co-partitioned and the joins run with no
    # exchange at all. The doc_id-keyed consumers (signatures, counts)
    # re-shuffle either way, so keying the cache to the join-heavy
    # side is strictly better; on a cluster this is "bucket the
    # materialized shingle table by its join key".
    key = (spark.sparkContext.applicationId, sf_dir)
    sh = _SHINGLE_CACHE.get(key)
    if sh is None:
        sh = shingles(spark, sf_dir).repartition("sh_h").persist()
        _SHINGLE_CACHE[key] = sh
    return sh


def lsh_bands_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted banded-signature index, memoized per (session, sf) —
    the LSH index table a production near-dup pipeline checkpoints
    and reuses across probe jobs. Built with the array-kernel band
    builder (``lsh_bands_of_docs``): a narrow map over the document
    scan with NO shuffle at all, where the explode-form build paid the
    groupBy(doc_id) exchange over the exploded shingle stream
    (interleaved A/B: 1.13 -> 0.63 s median at sf0.1; outputs pinned
    row-identical to the explode kernel by
    tests/test_llm_ops.py::test_array_kernel_bands_equal_explode_kernel)."""
    key = ("bands", spark.sparkContext.applicationId, sf_dir)
    bands = _SHINGLE_CACHE.get(key)
    if bands is None:
        docs = table(spark, sf_dir, "documents").repartition(
            spark.sparkContext.defaultParallelism
        )
        bands = lsh_bands_of_docs(docs).persist()
        _SHINGLE_CACHE[key] = bands
    return bands


def lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_a < doc_b) band-collision candidate pairs from
    the persisted LSH index — the shared front half of every
    verification strategy (exact Jaccard, edit distance). The join
    runs on (band, sig) over the signature table, so candidates —
    not the corpus square — bound the cost."""
    bands = lsh_bands_cached(spark, sf_dir)
    a, b = bands.alias("a"), bands.alias("b")
    return (
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


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, mh0..mh15): all 16 minhash values per document in ONE
    groupBy — each h_j is an agg column, so there is no 16x row
    explosion and map-side partial mins shrink the shuffle to one row
    per (doc, partition). Coefficient products stay < 2^51 (a_15 * P
    ~= 1.3e15), overflow-safe in both engines.

    ``sh`` is the (doc_id, sh_h, h) DataFrame from :func:`shingles`;
    ``h`` is the pre-hashed minhash input domain.
    """
    mins = [
        F.min(
            ((F.lit(j) * _A_MUL + _A_ADD) * F.col("h") + (F.lit(j) * _B_MUL + _B_ADD))
            % P
        ).alias(f"mh{j}")
        for j in range(N_HASHES)
    ]
    return sh.select("doc_id", "h").groupBy("doc_id").agg(*mins)


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


def lsh_bands(sh: DataFrame) -> DataFrame:
    """(doc_id, band, sig): banded minhash signatures, built by column
    concatenation from the wide signature row — no shuffle beyond the
    one inside :func:`minhash_signatures` (the 4-rows-per-doc explode
    is a narrow map)."""
    mh = minhash_signatures(sh)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "-",
                *[
                    F.col(f"mh{j}").cast("string")
                    for j in range(b * BAND_ROWS, (b + 1) * BAND_ROWS)
                ],
            ).alias("sig"),
        )
        for b in range(N_HASHES // BAND_ROWS)
    ]
    return mh.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bs")
    ).select("doc_id", "bs.band", "bs.sig")


def lsh_bands_of_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, band, sig) straight from a (doc_id, text, ...) frame:
    the whole signature — shingles, hash domain, all 16 affine mins —
    folds per document as ONE array aggregate in codegen, so band
    building is a narrow map over the document scan with ZERO
    shuffles (the explode-form path pays a groupBy(doc_id) exchange
    over the shingle stream to reassemble per-doc minima that were
    never apart). min over the shingle MULTISET equals min over the
    distinct set, so no array_distinct is needed; documents too short
    to have any 3-gram are filtered out, exactly like the explode
    form's empty explode. Definitionally pinned row-identical to
    ``lsh_bands(shingles_of(docs))`` (the batch/streaming shared
    explode kernel) by tests/test_llm_ops.py — both production
    consumers (the batch band cache, the incremental streaming LSH
    indexer) run THIS kernel, so they cannot drift from each other,
    and the parity test keeps both tied to the oracle's definition."""
    sh_arr = (
        f"transform({ngram_starts_sql('toks', 3)},"
        " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"
    )
    hs = (
        f"transform({sh_arr}, s ->"
        f" CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT) % {P})"
    )
    mh = (
        f"aggregate({hs}, array_repeat(CAST({P} AS BIGINT), {N_HASHES}),"
        f" (acc, h) -> zip_with(acc, sequence(0, {N_HASHES - 1}),"
        f" (m, j) -> least(m, ((j * {_A_MUL} + {_A_ADD}) * h"
        f" + (j * {_B_MUL} + {_B_ADD})) % {P})))"
    )
    mhd = (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.expr(f"size({ngram_starts_sql('toks', 3)}) > 0"))
        .select("doc_id", F.expr(mh).alias("mh"))
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "-",
                *[
                    F.expr(f"CAST(element_at(mh, {j + 1}) AS STRING)")
                    for j in range(b * BAND_ROWS, (b + 1) * BAND_ROWS)
                ],
            ).alias("sig"),
        )
        for b in range(N_HASHES // BAND_ROWS)
    ]
    return mhd.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bs")
    ).select("doc_id", "bs.band", "bs.sig")


_MINHASH_PAIRS_BODY = f"""
    {_SHINGLES_SQL}, {_MINHASH_SQL},
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    common AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
        FROM candidates c
        JOIN shingles sa ON sa.doc_id = c.doc_a
        JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
        GROUP BY c.doc_a, c.doc_b
    ),
    verified AS (
        SELECT cm.doc_a, cm.doc_b, cm.n_common,
               (CAST(cm.n_common AS DOUBLE) / (ca.n + cb.n - cm.n_common)) AS jaccard
        FROM common cm
        JOIN cnt ca ON ca.doc_id = cm.doc_a
        JOIN cnt cb ON cb.doc_id = cm.doc_b
        WHERE (CAST(cm.n_common AS DOUBLE) / (ca.n + cb.n - cm.n_common)) >= 0.3
    )
"""


@query(
    "minhash_lsh_pairs",
    oracle=f"""
    WITH {_MINHASH_PAIRS_BODY}
    SELECT doc_a, doc_b, n_common, jaccard FROM verified
    """,
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate pairs: shingle -> 16 minhashes ->
    4 bands x 4 rows -> band-collision candidates -> exact Jaccard
    verification >= 0.3.

    The LSH step means only band-colliding pairs pay the exact
    verification join — the property that makes near-dedup feasible
    on a 100 TB corpus (candidates ~ O(dups), not O(n^2)).

    The shingle table feeds signatures, counts, and both verify-join
    sides; the session-scoped persisted memo marks it a materialized
    intermediate (at cluster scale: a checkpointed table) instead of
    4x-recomputed lineage."""
    sh = shingles_cached(spark, sf_dir)
    cand = lsh_candidate_pairs(spark, sf_dir)
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa, sb = sh.alias("sa"), sh.alias("sb")
    common = (
        cand.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(
            sb,
            (F.col("sb.doc_id") == F.col("doc_b"))
            & (F.col("sb.sh_h") == F.col("sa.sh_h")),
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


# Hot-shingle document-frequency cap for the exact-Jaccard inverted
# index: a shingle present in more than DF_CAP documents (corpus-wide
# boilerplate — headers, license blurbs) is dropped BEFORE the
# self-join, and Jaccard is defined over the capped shingle universe
# on both sides of the comparison (counts and intersections). Without
# it one hot shingle makes the join quadratic in the corpus; with it
# the per-shingle fan-out is bounded by DF_CAP² pairs. Fixture max df
# is single-digit, so the cap is invisible at test scales — it exists
# for the 100 TB shape of the data.
DF_CAP = 64


@query(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    keep AS (
        SELECT shingle FROM shingles
        GROUP BY shingle HAVING COUNT(*) <= {DF_CAP}
    ),
    capped AS (
        SELECT s.doc_id, s.shingle FROM shingles s JOIN keep USING (shingle)
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM capped GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM capped a
        JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
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
    approximates. Jaccard is computed over the DF-capped shingle
    universe (see ``DF_CAP``): dropping corpus-wide boilerplate
    shingles bounds the self-join fan-out at DF_CAP² pairs per
    shingle, which is what keeps the exact path alive at 100 TB.

    The df filter is one extra groupBy on the shingle key the cache
    is already partitioned by — exchange-free, as is the semi-join
    back onto the shingle table."""
    sh = shingles_cached(spark, sf_dir)
    keep = (
        sh.groupBy("sh_h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= DF_CAP)
        .select("sh_h")
    )
    sh = sh.join(keep, "sh_h", "left_semi")
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # SHUFFLE_HASH on the self-join: both sides are the one persisted
    # table already hash-partitioned by sh_h, so the shuffled-hash
    # join runs with ZERO exchange (co-partitioned build + probe per
    # partition). Unhinted, the planner broadcast the whole DF-capped
    # shingle table at test scale — a per-call corpus-sized broadcast
    # build that cannot exist at 100 TB; the hinted plan is the same
    # shape locally and at scale. (Locally measured equal: 1.45 vs
    # 1.47 s median over 8 interleaved reps; probe-section exchange
    # count 1 -> 0.)
    a, b = sh.alias("a"), sh.hint("shuffle_hash").alias("b")
    common = (
        a.join(
            b,
            (F.col("a.sh_h") == F.col("b.sh_h"))
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


_SIMHASH_SQL = """
    toks AS (
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
              FROM (SELECT unnest(generate_series(0, 31)) AS b)) b
        GROUP BY doc_id, b.b, b.pw
    ),
    simhashes AS (
        -- CAST: DuckDB widens SUM(BIGINT) to DECIMAL(38,0); Spark
        -- keeps BIGINT, and the driver hash is type-sensitive.
        SELECT doc_id,
               CAST(SUM(CASE WHEN vote > 0 THEN pw ELSE 0 END) AS BIGINT) AS simhash
        FROM bit_votes
        GROUP BY doc_id
    )
"""


@query(
    "simhash_fingerprints",
    oracle=f"WITH {_SIMHASH_SQL} SELECT doc_id, simhash FROM simhashes",
)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document: each bit is the sign of the vote
    sum (+1/-1 per distinct token by that bit of the token hash).
    Near-dup docs differ in few bits (Hamming distance).

    The fingerprint is a pure function of one document's token set,
    so the whole build — distinct tokens, md5 ints, 32 vote sums,
    bit assembly — runs as ONE array aggregate inside codegen: ZERO
    shuffles, no explode/groupBy row blow-up, and a single pass over
    the token-hash array carrying all 32 vote counters as array
    state (the earlier formulation ran 32 separate ``aggregate()``
    folds — 32 traversals and a 32x larger expression tree for the
    same arithmetic; interleaved A/B: 0.56 -> 0.38 s median at
    sf0.1). ``shiftright(h, b) % 2`` on the non-negative 32-bit hash
    equals the old ``(h div 2^b) % 2`` bit test. At 100 TB this is a
    narrow map over the corpus scan. The single-file fixture scan is
    spread across cores first, as in :func:`shingles`."""
    docs = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    hs = (
        "transform(array_distinct(split(text, ' ')), tk -> "
        "CAST(conv(substring(md5(tk), 1, 8), 16, 10) AS BIGINT))"
    )
    sh = (
        f"aggregate({hs}, array_repeat(CAST(0 AS BIGINT), 32),"
        " (acc, h) -> zip_with(acc, sequence(0, 31),"
        " (v, b) -> v + (CASE WHEN shiftright(h, b) % 2 = 1"
        " THEN 1 ELSE -1 END)),"
        " acc -> aggregate(zip_with(acc, sequence(0, 31),"
        " (v, b) -> CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), b)"
        " ELSE CAST(0 AS BIGINT) END),"
        " CAST(0 AS BIGINT), (s, x) -> s + x))"
    )
    return docs.select("doc_id", F.expr(sh).alias("simhash"))


def simhash_fingerprints_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fingerprint table persisted per (session, sf) — the same
    ingest-artifact pattern as the shingle/band caches: both pair
    queries self-join it, so an uncached frame re-ran the full
    tokenize + 32-vote fold on BOTH join sides of every call (the
    d<=1 and d<=3 probes each paid the corpus pass twice)."""
    key = ("simhash_fp", spark.sparkContext.applicationId, sf_dir)
    fp = _SHINGLE_CACHE.get(key)
    if fp is None:
        fp = simhash_fingerprints(spark, sf_dir).persist()
        _SHINGLE_CACHE[key] = fp
    return fp


@query(
    "simhash_neardup_pairs",
    oracle=f"""
    WITH {_SIMHASH_SQL},
    halves AS (
        SELECT doc_id, simhash, 0 AS half, simhash % 65536 AS hv FROM simhashes
        UNION ALL
        SELECT doc_id, simhash, 1 AS half, simhash // 65536 AS hv FROM simhashes
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.simhash AS sh_a, b.simhash AS sh_b
        FROM halves a
        JOIN halves b ON a.half = b.half AND a.hv = b.hv
                     AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(sh_a, sh_b)) <= 1
    """,
)
def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs — EXACT at Hamming distance 1.

    The 32-bit fingerprint splits into two 16-bit halves; any pair
    within Hamming distance 1 leaves one half untouched, so it MUST
    collide on that half (pigeonhole). The self-join therefore runs
    on the tiny (half, value) keys — never all-pairs — yet has
    complete recall for the d<=1 contract; bit_count(xor) then keeps
    exactly the true pairs. (Wider radii generalize by splitting into
    d+1 bands; d=1 keeps the demo corpus's output meaningful — the
    fixture's shared word-soup vocabulary makes Hamming<=3 match
    ~20% of all pairs.)

    At 100 TB the candidate join is bounded by bucket occupancy (65536
    values per half), the same LSH economics as minhash_lsh_pairs but
    with an 8-byte fingerprint instead of a shingle table."""
    fp = simhash_fingerprints_cached(spark, sf_dir)
    halves = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("half"), (F.col("simhash") % 65536).alias("hv")
                ),
                F.struct(
                    F.lit(1).alias("half"),
                    F.expr("simhash div 65536").alias("hv"),
                ),
            )
        ).alias("hb"),
    ).select("doc_id", "simhash", "hb.half", "hb.hv")
    a, b = halves.alias("a"), halves.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.half") == F.col("b.half"))
            & (F.col("a.hv") == F.col("b.hv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        # Verify BEFORE the dedup shuffle: hamming is a pure function
        # of the pair, so filter-then-distinct equals the oracle's
        # distinct-then-filter set — but only true pairs (not every
        # half-collision candidate) reach the exchange.
        .filter(F.col("hamming") <= 1)
        .distinct()
    )
    return cand.select("doc_a", "doc_b", "hamming")


@query(
    "simhash_neardup_pairs_d3",
    oracle=f"""
    WITH {_SIMHASH_SQL},
    bands AS (
        SELECT doc_id, simhash, b.b AS band,
               (simhash // CAST(pow(256, b.b) AS BIGINT)) % 256 AS bv
        FROM simhashes,
             (SELECT unnest(generate_series(0, 3)) AS b) b
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.simhash AS sh_a, b.simhash AS sh_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bv = b.bv
                    AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(sh_a, sh_b)) <= 3
    """,
)
def simhash_neardup_pairs_d3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs — EXACT at Hamming distance 3 — the
    radius knob over :func:`simhash_neardup_pairs`'s d=1. Pigeonhole
    with d+1 = 4 bands of 8 bits: any pair within distance 3 leaves
    at least one band untouched, so the 4-way band join has complete
    recall at d<=3 and bit_count verification keeps exactly the true
    pairs. The tradeoff is physical, not semantic: 8-bit bands mean
    256 buckets per band (vs 65536 for d=1's halves), so candidate
    volume — and the verify bill — grows as the radius widens."""
    fp = simhash_fingerprints_cached(spark, sf_dir)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.expr(f"(simhash div {256 ** b}) % 256").alias("bv"),
        )
        for b in range(4)
    ]
    bands = fp.select(
        "doc_id", "simhash", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", "simhash", "bb.band", "bb.bv")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        # Verify before the dedup shuffle (see simhash_neardup_pairs)
        # — with 256 buckets per band the candidate volume here is the
        # radius trade's whole cost, so shrinking the distinct matters
        # more than at d<=1.
        .filter(F.col("hamming") <= 3)
        .distinct()
    )
    return cand.select("doc_a", "doc_b", "hamming")


# Connected-components closure over the verified near-dup edges, as a
# reusable recursive-CTE tail (callers prepend WITH RECURSIVE and the
# minhash pair body that defines `verified`).
_COMPONENTS_TAIL_SQL = """
    sym AS (
        SELECT doc_a AS src, doc_b AS dst FROM verified
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM verified
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM reach r JOIN sym s ON s.src = r.dst
    ),
    comps AS (
        SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component_id
        FROM reach GROUP BY src
    )
"""


@query(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE {_MINHASH_PAIRS_BODY}, {_COMPONENTS_TAIL_SQL}
    SELECT doc_id, component_id,
           CASE WHEN component_id = doc_id THEN 1 ELSE 0 END AS is_keeper
    FROM comps
    """,
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-duplicate graph — the
    clustering step a production dedup pipeline runs after pair
    generation, so each duplicate CLUSTER keeps exactly one document
    (the min doc_id), not just each pair.

    Distributed iterative min-label propagation: every node starts
    labeled with itself; each round takes the min of its own and its
    neighbors' labels (one join + one grouped min, both partitioned
    on the node key); converged when no label changes. Rounds needed
    = graph diameter — near-dup clusters are shallow, so a handful.
    The driver loop only checks the convergence count, GraphX-pregel
    style; all data work is distributed. Each round's labels are
    ``localCheckpoint``-ed to truncate lineage — without it an
    N-round propagation builds an N-deep plan whose analysis cost and
    stack depth grow with the graph diameter (GraphX checkpoints its
    Pregel iterations for the same reason). The oracle replays the
    same closure as a recursive CTE (iterative algorithms ARE
    SQL-expressible when the engine has WITH RECURSIVE)."""
    labels = component_labels_cached(spark, sf_dir)
    return labels.select(
        "doc_id",
        "component_id",
        F.when(F.col("component_id") == F.col("doc_id"), 1)
        .otherwise(0)
        .alias("is_keeper"),
    )


def verified_pair_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The verified near-dup pair set (doc_a < doc_b), memoized per
    (session, sf) as an eager ``localCheckpoint``: the derivation
    (band self-join + two Jaccard verify joins) runs ONCE and every
    consumer's plan starts from a two-line LogicalRDD leaf. Shared by
    the component propagation (which previously executed the
    un-persisted subtree twice inside its symmetric union) and the
    triangle counter (which references the edge table SIX times — a
    persist deduplicated the execution but left the full verify
    lineage in the logical plan, and Catalyst re-analyzed it per
    reference on every call). O(dup pairs) rows — the same scale
    class as the propagation's per-round checkpoints."""
    ekey = ("nd_edges", spark.sparkContext.applicationId, sf_dir)
    edges = _SHINGLE_CACHE.get(ekey)
    if edges is None:
        edges = (
            minhash_lsh_pairs(spark, sf_dir)
            .select("doc_a", "doc_b")
            .localCheckpoint()
        )
        _SHINGLE_CACHE[ekey] = edges
    return edges


def component_labels_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Converged (doc_id, component_id) labels, memoized per
    (session, sf) like the shingle/band caches: the propagation's
    result is a materialized intermediate table two queries consume
    (`dedup_components`, `dedup_keep_best_quality`) — recomputing the
    whole iteration per consumer would re-run every round's jobs."""
    key = ("components", spark.sparkContext.applicationId, sf_dir)
    cached = _SHINGLE_CACHE.get(key)
    if cached is not None:
        return cached
    edges = verified_pair_edges(spark, sf_dir)
    # No .distinct() on the symmetric closure: verified pairs are
    # unique with doc_a < doc_b, so the swapped copies cannot collide
    # with the originals — the union IS the distinct symmetric edge
    # set, and the dedup shuffle it replaced was a no-op by
    # construction. The star carries a self-loop per node so one
    # grouped min below covers min(own, neighbors) in a single join.
    sym = edges.union(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    star = sym.union(
        sym.select("doc_a", F.col("doc_a").alias("doc_b"))
    ).persist()
    labels = (
        sym.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("component_id"))
        .persist()
    )
    # DataFrame.unpersist only releases cacheManager-registered
    # persist() entries; localCheckpoint blocks live in the RDD
    # registry and must be freed THERE, else an N-round propagation
    # holds N superseded label copies until the ContextCleaner's GC
    # gets around to them (the memory-pressure case checkpointing was
    # added for). Superseded rounds are freed via the persistent-RDD
    # map, identified by diffing registry ids around each checkpoint.
    jsc = spark.sparkContext._jsc

    def _persist_ids() -> set:
        return set(jsc.getPersistentRDDs().keySet().toArray())

    # NOTE private-API dependency: _persist_ids() reads the JVM-side
    # persistent-RDD registry via _jsc (no public PySpark surface
    # lists checkpoint blocks). The set-diff can catch MORE than one
    # new id if a checkpoint registers several RDDs or something else
    # persists concurrently — so every id in the diff is tracked and
    # ALL of them are unpersisted once superseded (tracking just one
    # would silently leak the rest until ContextCleaner GC).
    prev_ckpt_ids: set = set()
    # Convergence via the label-sum invariant instead of a per-round
    # old-vs-new join: labels only ever DECREASE under min-propagation,
    # so the (exact, bigint) label sum strictly decreases iff any label
    # changed — one partial-aggregated scan of the fresh checkpoint
    # replaces the join + filter + count job per round.
    prev_sum = None
    while True:
        # One join + one grouped min per round: the star's self-loops
        # make min-over-neighbors include the node's own label, so the
        # previous nbr_min + left-join-back pair collapses into a
        # single aggregation keyed on the node.
        before_ids = _persist_ids()
        # localCheckpoint (eager) truncates the lineage so the plan
        # stays one-round deep no matter how many rounds run; it also
        # materializes new_labels, subsuming the old persist().
        new_labels = (
            star.join(labels, star.doc_b == labels.doc_id)
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("component_id").alias("component_id"))
            .localCheckpoint()
        )
        new_ckpt_ids = _persist_ids() - before_ids
        label_sum = new_labels.agg(F.sum("component_id")).collect()[0][0]
        labels.unpersist()  # round-1 persist(); no-op afterwards
        for ckpt_id in prev_ckpt_ids:
            rdd = jsc.getPersistentRDDs().get(ckpt_id)
            if rdd is not None:
                rdd.unpersist(False)
        prev_ckpt_ids = new_ckpt_ids
        labels = new_labels
        if label_sum == prev_sum:
            break
        prev_sum = label_sum
    star.unpersist()
    _SHINGLE_CACHE[key] = labels
    return labels


@query(
    "dup_span_coverage",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    df AS (
        SELECT shingle, COUNT(*) AS df FROM shingles GROUP BY shingle
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_shingles,
           (CAST(SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*)) AS dup_coverage
    FROM shingles s JOIN df d USING (shingle)
    GROUP BY s.doc_id
    """,
)
def dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-span coverage per document: the fraction of a doc's
    distinct word-3-gram shingles that also occur in at least one
    OTHER place in the corpus — the span-level dup metric behind
    substring-dedup decisions (a doc that is 90% duplicated spans is
    boilerplate even if no single whole-doc near-dup exists).

    Physical plan: the persisted shingle cache (already hash-
    partitioned by ``sh_h``) feeds both the document-frequency agg
    and the probe side, so the df groupBy and the df join are both
    exchange-free on the shingle key; the only new shuffle is the
    final per-doc rollup, carrying one row per (doc, shingle) —
    never the text. At 100 TB this is two passes over a bucketed
    shingle table, the same shape substring-dedup pipelines
    (suffix-array approximations) reduce to.

    Collision sensitivity: df is grouped on the 48-bit ``sh_h``
    while the oracle groups on shingle TEXT, so a hash collision
    merges two distinct shingles' df buckets and can flip a unique
    shingle to "duplicated" (df>=2) — a STRICTER exposure than the
    equality joins elsewhere, where a collision must also survive
    the verify step. Expected collisions ~n²/2^49 (≈1e-7 on the
    fixture's ~60k distinct shingles); at corpus scale widen sh_h
    before trusting per-doc coverage to the last percent."""
    sh = shingles_cached(spark, sf_dir)
    dfc = sh.groupBy("sh_h").agg(F.count(F.lit(1)).alias("df"))
    n_dup = F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
    return (
        sh.join(dfc, "sh_h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            n_dup.alias("n_dup_shingles"),
            (n_dup.cast("double") / F.count(F.lit(1))).alias("dup_coverage"),
        )
    )


# Prefix bound for candidate-pair edit-distance verification:
# levenshtein is O(|a|·|b|) PER PAIR, so unbounded document bodies
# would make verification cost depend on the corpus's longest outlier.
# Truncating both sides to a fixed prefix caps per-pair work at
# EDIT_PREFIX² cells regardless of document length — the standard
# budget trick for edit-based near-dup verification at corpus scale.
EDIT_PREFIX = 500


@query(
    "neardup_edit_distance",
    oracle=f"""
    WITH {_SHINGLES_SQL}, {_MINHASH_SQL},
    cand_txt AS (
        SELECT c.doc_a, c.doc_b,
               substr(da.text, 1, {EDIT_PREFIX}) AS ta,
               substr(db.text, 1, {EDIT_PREFIX}) AS tb
        FROM candidates c
        JOIN documents da ON da.doc_id = c.doc_a
        JOIN documents db ON db.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b,
           CAST(levenshtein(ta, tb) AS BIGINT) AS edit_distance,
           (1.0 - CAST(levenshtein(ta, tb) AS DOUBLE)
                / GREATEST(len(ta), len(tb), 1)) AS edit_similarity
    FROM cand_txt
    """,
)
def neardup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification of the MinHash-LSH candidate pairs:
    character-level Levenshtein over a fixed document prefix, plus a
    normalized similarity in [0, 1] — the second, orthogonal verifier
    next to exact Jaccard (``minhash_lsh_pairs``): Jaccard sees
    bag-of-shingles overlap, edit distance sees ORDER, so the two
    disagree exactly on reshuffled-content pairs.

    Scale: cost is O(candidates × EDIT_PREFIX²) — the LSH band join
    bounds candidates ~O(near-dups), and the prefix bound caps the
    per-pair quadratic. ``levenshtein`` is a JVM codegen scalar in
    Spark and a native scalar in DuckDB with identical semantics
    (pinned by tests/test_llm edge cases). The candidate pairs carry
    only ids; document prefixes join in afterwards so the band join
    never shuffles text."""
    cand = lsh_candidate_pairs(spark, sf_dir)
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, EDIT_PREFIX).alias("t")
    )
    da, db = docs.alias("da"), docs.alias("db")
    d = F.levenshtein(F.col("da.t"), F.col("db.t"))
    denom = F.greatest(
        F.length(F.col("da.t")), F.length(F.col("db.t")), F.lit(1)
    )
    return (
        cand.join(da, F.col("da.doc_id") == F.col("doc_a"))
        .join(db, F.col("db.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            d.cast("bigint").alias("edit_distance"),
            (F.lit(1.0) - d.cast("double") / denom).alias("edit_similarity"),
        )
    )


def _quality_logit_sql() -> str:
    """Per-doc hashed-classifier logit as a CTE body (`q_logits`) —
    the same md5-derived integer arithmetic as
    ``textstats.quality_classifier_logits``, shared via its module
    constants so the two oracles cannot drift."""
    from ..determinism import md5_int_sql
    from .textstats import N_BUCKETS, _W_MOD

    bucket = f"CAST({md5_int_sql('term')} % {N_BUCKETS} AS VARCHAR)"
    hashed_w = md5_int_sql("'w' || " + bucket)
    w = f"({hashed_w} % {_W_MOD}) - {(_W_MOD - 1) // 2}"
    return f"""
    q_toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    q_logits AS (
        SELECT doc_id, CAST(SUM({w}) AS BIGINT) AS logit
        FROM q_toks GROUP BY doc_id
    )
"""


@query(
    "dedup_keep_best_quality",
    oracle=f"""
    WITH RECURSIVE {_MINHASH_PAIRS_BODY}, {_COMPONENTS_TAIL_SQL},
    {_quality_logit_sql()}
    SELECT c.doc_id, c.component_id, q.logit,
           first_value(c.doc_id)
               OVER (PARTITION BY c.component_id
                     ORDER BY q.logit DESC, c.doc_id) AS canonical_doc_id,
           CASE WHEN first_value(c.doc_id)
                     OVER (PARTITION BY c.component_id
                           ORDER BY q.logit DESC, c.doc_id) = c.doc_id
                THEN 1 ELSE 0 END AS is_kept
    FROM comps c JOIN q_logits q USING (doc_id)
    """,
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: within each near-duplicate
    CLUSTER (connected components over verified MinHash pairs), keep
    the member with the highest quality-classifier logit instead of
    the arbitrary min-id — how production dedup actually decides
    which copy survives (near-dups differ: one copy may be truncated
    or boilerplate-padded). Ties break on doc_id so the choice is
    total.

    Scale: components come from the distributed label propagation
    (`dedup_components`), logits from the codegen classifier — the
    selection itself is one window over (component, logit), with
    cluster sizes bounded by the near-dup graph, never the corpus."""
    comps = component_labels_cached(spark, sf_dir).select(
        "doc_id", "component_id"
    )
    from .textstats import quality_classifier_logits

    logits = quality_classifier_logits(spark, sf_dir).select(
        "doc_id", "logit"
    )
    joined = comps.join(logits, "doc_id")
    from pyspark.sql import Window

    w = Window.partitionBy("component_id").orderBy(
        F.desc("logit"), F.asc("doc_id")
    )
    canonical = F.first("doc_id").over(w)
    return joined.select(
        "doc_id",
        "component_id",
        "logit",
        canonical.alias("canonical_doc_id"),
        F.when(canonical == F.col("doc_id"), 1).otherwise(0).alias("is_kept"),
    )


@query(
    "neardup_graph_stats",
    oracle=f"""
    WITH {_MINHASH_PAIRS_BODY},
    nodes AS (
        SELECT doc_a AS v FROM verified
        UNION SELECT doc_b AS v FROM verified
    ),
    deg AS (
        SELECT v, COUNT(*) AS d FROM (
            SELECT doc_a AS v FROM verified
            UNION ALL SELECT doc_b AS v FROM verified
        ) GROUP BY v
    ),
    tri AS (
        SELECT COUNT(*) AS n_triangles
        FROM verified e1
        JOIN verified e2 ON e1.doc_b = e2.doc_a
        JOIN verified e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
    )
    SELECT CAST((SELECT COUNT(*) FROM nodes) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM verified) AS BIGINT) AS n_edges,
           CAST((SELECT SUM(d * (d - 1) // 2) FROM deg) AS BIGINT) AS n_wedges,
           CAST((SELECT n_triangles FROM tri) AS BIGINT) AS n_triangles,
           (CAST(3 * (SELECT n_triangles FROM tri) AS DOUBLE)
               / (SELECT SUM(d * (d - 1) // 2) FROM deg))
               AS clustering_coefficient
    """,
)
def neardup_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle counting over the near-duplicate graph —
    the graph-analytics primitive (global clustering coefficient)
    that diagnoses WHAT KIND of duplication a corpus has: high
    clustering = dense template families (cliques), low = chain-like
    drift. Triangles via the ordered edge-join (every edge already
    stores doc_a < doc_b, so each triangle a<b<c is counted exactly
    once — the standard dedup trick that keeps the join linear in
    wedge count); wedges in closed form from the degree distribution.

    Scale: two self-joins on the (small) verified-pair table, both on
    node keys; at web scale this is the classic degree-ordered
    triangle join whose cost is bounded by wedge count, not |V|²."""
    # Memoized + lineage-truncated shared intermediate (see
    # verified_pair_edges): this plan reads the edge table six times
    # (triangle join sides, degree union, edge count), so the leaf
    # must be a checkpointed LogicalRDD, not a persist that re-embeds
    # the verify lineage per reference.
    edges = verified_pair_edges(spark, sf_dir)
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.doc_b") == F.col("e2.doc_a"))
        .join(
            e3,
            (F.col("e3.doc_a") == F.col("e1.doc_a"))
            & (F.col("e3.doc_b") == F.col("e2.doc_b")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    sym = edges.select(F.col("doc_a").alias("v")).unionAll(
        edges.select(F.col("doc_b").alias("v"))
    )
    deg_stats = (
        sym.groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            # Integer `div`, not `/`: double division rounds once
            # sum(d*(d-1)) exceeds 2^53 (dense dup graphs at scale);
            # the oracle's // is exact, so this side must be too.
            F.expr("sum(d * (d - 1)) div 2").alias("n_wedges"),
        )
    )
    edge_count = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    # Three 1-row aggregates crossJoined — everything stays in the
    # plan (no driver-side collect), same shape as the scalar
    # broadcast thresholds elsewhere in the repo.
    return (
        deg_stats.crossJoin(edge_count)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            (
                3.0
                * F.col("n_triangles").cast("double")
                / F.col("n_wedges")
            ).alias("clustering_coefficient"),
        )
    )
