"""Text analysis operators: quality scoring, token counting, document
fingerprinting, language identification, vocabulary building.

All are oracle-checked — including language ID, whose vectorized
pandas UDF is hash-verified against a pure-SQL re-expression of the
same marker-word argmax (cross-paradigm differential testing).

Scale notes: the per-document operators are per-row maps —
embarrassingly parallel, no shuffle; vocabulary building shuffles
one row per distinct term per task (partial+final count agg), never
the token stream. The pandas UDF processes Arrow batches, not rows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import table
from ..determinism import MERSENNE31 as P
from ..determinism import md5_int, md5_int_sql, ngram_starts_sql
from ..registry import query

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


@query(
    "text_quality_scores",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, n_chars, string_split(text, ' ') AS t,
               len(replace(text, ' ', '')) AS n_nonspace
        FROM documents
    )
    SELECT doc_id,
           len(t) AS n_tokens,
           n_chars,
           (CAST(n_nonspace AS DOUBLE) / len(t)) AS avg_token_len,
           (CAST(len(list_filter(t, x -> x IN ({_STOP_SQL}))) AS DOUBLE)
                / len(t)) AS stopword_ratio,
           (CAST(len(list_filter(t, x -> len(x) <= 2)) AS DOUBLE)
                / len(t)) AS short_token_ratio
    FROM toks
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token count, average token
    length, stopword ratio, short-token ratio — the standard cheap
    filters in LLM corpus curation."""
    docs = table(spark, sf_dir, "documents")
    stop_arr = _STOP_SQL  # single-sourced quoted list (oracle twin)
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        "n_chars",
        (
            F.length(F.regexp_replace("text", " ", "")).cast("double")
            / F.size(F.split("text", " "))
        ).alias("avg_token_len"),
        (
            F.expr(
                f"size(filter(split(text, ' '), x -> x IN ({stop_arr})))"
            ).cast("double")
            / F.size(F.split("text", " "))
        ).alias("stopword_ratio"),
        (
            F.expr("size(filter(split(text, ' '), x -> length(x) <= 2))").cast(
                "double"
            )
            / F.size(F.split("text", " "))
        ).alias("short_token_ratio"),
    )


@query(
    "token_counts",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'),
                           x -> len(x) > 0)) AS n_word_tokens,
           len(string_split(text, ' ')) AS n_ws_tokens,
           CAST(ceil(len(text) / 4.0) AS BIGINT) AS approx_bpe_tokens
    FROM documents
    """,
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: regex word tokens, whitespace
    tokens, and the chars/4 BPE heuristic."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(
            "size(filter(split(text, '[^a-zA-Z0-9]+'), x -> length(x) > 0))"
        ).cast("bigint").alias("n_word_tokens"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_ws_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("approx_bpe_tokens"),
    )


@query(
    "doc_fingerprints",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(text, ' '),
                       w -> CAST(('0x' || substr(md5(w), 1, 4)) AS BIGINT))),
               (acc, h) -> (acc * 131 + h) % {P}) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling polynomial hash over the token stream
    (Rabin-Karp style): fp = fold((acc * 131 + h(w)) mod P).

    Unlike the bag-of-shingles MinHash, this distinguishes documents
    with the same words in different order."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(
            f"""
            aggregate(split(text, ' '), CAST(0 AS BIGINT),
                (acc, w) -> (acc * 131
                             + CAST(conv(substr(md5(w), 1, 4), 16, 10) AS BIGINT))
                            % {P})
            """
        ).alias("fingerprint"),
    )


# --- language ID (pandas UDF — not SQL-expressible, rows-only check) ----

# Tiny per-language marker-word profiles (public-knowledge function
# words). Real pipelines plug fastText/CLD3 here; the Spark plumbing
# (Arrow-batched scalar UDF) is identical.
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "with"},
    "es": {"el", "la", "de", "que", "y", "los", "las", "una"},
    "fr": {"le", "la", "les", "des", "et", "est", "une", "dans"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein"},
    "zh": {"的", "是", "了", "在", "我", "有", "和", "不"},
}


def _score_lang(text: str) -> str:
    # Split on single spaces, exactly like the oracle's
    # string_split(text, ' '): bare .split() breaks on ANY whitespace,
    # so a tab-joined pair like "le\tla" would count as two marker
    # hits here but one unmatched token in SQL — a silent
    # tokenization divergence the fixture (space-only) never shows.
    toks = set(text.lower().split(" "))
    best_lang, best = "und", 0
    for lang in sorted(_LANG_MARKERS):
        s = len(toks & _LANG_MARKERS[lang])
        if s > best:
            best_lang, best = lang, s
    return best_lang


def predict_lang():
    """Marker-word language ID over an Arrow batch. Deterministic
    tie-break: highest score wins, then lexicographic language code;
    'und' when nothing matches. Built lazily — the ``pandas_udf``
    decorator parses its DDL type against the active session, so
    module import must not construct it."""

    @pandas_udf("string")
    def _udf(texts: pd.Series) -> pd.Series:
        return texts.map(_score_lang)

    return _udf


def _lang_score_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in sorted(_LANG_MARKERS[lang]))
    return f"len(list_filter(t, x -> x IN ({words})))"


_LANG_ORDER = sorted(_LANG_MARKERS)  # tie-break: lexicographic


@query(
    "language_id",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang,
               list_distinct(string_split(lower(text), ' ')) AS t
        FROM documents
    ),
    scores AS (
        SELECT doc_id, lang,
               {", ".join(f"{_lang_score_sql(lg)} AS s_{lg}" for lg in _LANG_ORDER)},
               greatest({", ".join(f"{_lang_score_sql(lg)}" for lg in _LANG_ORDER)}) AS mx
        FROM toks
    )
    SELECT doc_id, lang,
           CASE WHEN mx = 0 THEN 'und'
                {" ".join(f"WHEN s_{lg} = mx THEN '{lg}'" for lg in _LANG_ORDER)}
           END AS predicted_lang
    FROM scores
    """,
)
def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language identification via vectorized pandas UDF.

    The UDF's argmax (highest marker-word overlap, lexicographic
    tie-break, 'und' on zero) is re-expressed as pure SQL in the
    oracle, so the Arrow-batched Python path is hash-verified against
    a declarative twin — cross-paradigm differential testing of the
    UDF plumbing itself."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", predict_lang()(F.col("text")).alias("predicted_lang")
    )


@query(
    "vocab_term_frequencies",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ),
    counts AS (
        SELECT term, COUNT(*) AS tf FROM toks GROUP BY term
    )
    SELECT term, tf FROM (
        SELECT term, tf,
               ROW_NUMBER() OVER (ORDER BY tf DESC, term) AS rn
        FROM counts
    ) WHERE rn <= 100
    """,
)
def vocab_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary building: term frequencies with a top-100
    cut — the first pass of tokenizer training (BPE seed vocab) and
    of stopword discovery. explode -> partial+final count agg ->
    TakeOrdered; the shuffle carries one row per distinct term per
    task, never the token stream."""
    docs = table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return counts.orderBy(F.col("tf").desc(), "term").limit(100)


# BM25 with RATIONAL idf: idf_ratio = (N - df + 0.5)/(df + 0.5) instead
# of its logarithm. Monotone in the same direction, and — unlike ln() —
# bit-identical across engines (libm vs JVM log differ by ulps). The
# choice trades absolute-score comparability with textbook BM25 for
# exact cross-engine verifiability; rankings per term are unchanged.
_BM25_TERMS = ("join", "hash", "scan")
_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25_term_sql(t: str) -> str:
    return f"""(
        ((n_docs - df_{t} + 0.5) / (df_{t} + 0.5))
        * (tf_{t} * ({_BM25_K1} + 1.0))
        / (tf_{t} + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl / avgdl))
    )"""


@query(
    "bm25_relevance",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    stats AS (
        SELECT doc_id,
               CAST(len(t) AS DOUBLE) AS dl,
               {", ".join(f"CAST(len(list_filter(t, x -> x = '{t}')) AS DOUBLE) AS tf_{t}" for t in _BM25_TERMS)}
        FROM toks
    ),
    corpus AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
               (CAST(SUM(CAST(dl AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)) AS avgdl,
               {", ".join(f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{t}" for t in _BM25_TERMS)}
        FROM stats
    )
    SELECT doc_id,
           {" + ".join(_bm25_term_sql(t) for t in _BM25_TERMS)} AS score
    FROM stats, corpus
    WHERE {" + ".join(f"tf_{t}" for t in _BM25_TERMS)} > 0
    """,
)
def bm25_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document to the fixed query
    '{join hash scan}' (rational-idf variant — see module constant
    comment). One pass computes per-doc term frequencies and length;
    one single-row corpus aggregate (N, avgdl, per-term df)
    broadcasts back; scoring is pure arithmetic in codegen with a
    fixed left-to-right add order so both engines produce identical
    doubles. The full-text-search scoring shape, minus the inverted
    index Spark doesn't need for scan-scoring."""
    docs = table(spark, sf_dir, "documents")
    t_arr = F.split("text", " ")
    stats = docs.select(
        "doc_id",
        F.size(t_arr).cast("double").alias("dl"),
        *[
            F.expr(f"CAST(size(filter(split(text, ' '), x -> x = '{t}')) AS DOUBLE)").alias(f"tf_{t}")
            for t in _BM25_TERMS
        ],
    )
    from ..determinism import dsum

    corpus = stats.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (dsum("dl") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0))
            .cast("double")
            .alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )

    def term_score(t: str) -> F.Column:
        idf = (F.col("n_docs") - F.col(f"df_{t}") + 0.5) / (F.col(f"df_{t}") + 0.5)
        tf = F.col(f"tf_{t}")
        denom = tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        return idf * (tf * (_BM25_K1 + 1.0)) / denom

    score = term_score(_BM25_TERMS[0])
    for t in _BM25_TERMS[1:]:
        score = score + term_score(t)
    any_tf = sum((F.col(f"tf_{t}") for t in _BM25_TERMS), start=F.lit(0.0))
    return (
        stats.crossJoin(F.broadcast(corpus))
        .filter(any_tf > 0)
        .select("doc_id", score.alias("score"))
    )


TOP_BIGRAMS = 10  # per language
TOP_KEYWORDS = 3  # per document


@query(
    "bigram_lang_stats",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
    ),
    bigrams AS (
        SELECT lang,
               unnest(list_transform(
                   generate_series(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i + 1]
               )) AS bigram
        FROM toks
    ),
    counts AS (
        SELECT lang, bigram, COUNT(*) AS n_occurrences
        FROM bigrams GROUP BY lang, bigram
    ),
    r AS (
        SELECT lang, bigram, n_occurrences,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY n_occurrences DESC, bigram) AS rk
        FROM counts
    )
    SELECT lang, bigram, n_occurrences, rk FROM r WHERE rk <= {TOP_BIGRAMS}
    """,
)
def bigram_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top bigrams per language — the first pass of n-gram language-
    model statistics over a corpus. Count agg has map-side combine
    (shuffle carries (lang, bigram, partial) rows, never the token
    stream); the top-k window then runs over distinct bigrams only.
    Ties rank lexicographically so the cut is deterministic."""
    toks = table(spark, sf_dir, "documents").select(
        "lang", F.split("text", " ").alias("t")
    )
    bigrams = toks.select(
        "lang",
        F.explode(
            F.expr(
                f"transform({ngram_starts_sql('t', 2)},"
                " i -> concat_ws(' ', t[i-1], t[i]))"
            )
        ).alias("bigram"),
    )
    counts = bigrams.groupBy("lang", "bigram").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n_occurrences"), "bigram")
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= TOP_BIGRAMS)
        .select("lang", "bigram", "n_occurrences", "rk")
    )


@query(
    "doc_keywords_tfidf",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               CAST(tf.tf AS DOUBLE)
                   * ((CAST(n.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
                      / (CAST(df.df AS DOUBLE) + 0.5)) AS score
        FROM tf JOIN df USING (term), n
    ),
    r AS (
        SELECT doc_id, term, tf, df, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, term) AS rk
        FROM scored
    )
    SELECT doc_id, term, tf, df, score, rk FROM r WHERE rk <= {TOP_KEYWORDS}
    """,
)
def doc_keywords_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_KEYWORDS} keywords per document by tf-idf with the
    rational idf ratio (N - df + 0.5)/(df + 0.5) — same
    transcendental-free exactness trick as ``bm25_relevance`` (ln()
    is not bit-reproducible across engines; a rational ratio is, and
    preserves the ranking). High-df stopwords get a near-zero ratio,
    so they fall out of the top-k naturally. Two count aggs (tf, df)
    with map-side combine, a broadcast-sized single-row N, and a
    per-doc top-k window over distinct (doc, term) pairs."""
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # N rides in-plan as a broadcast 1-row aggregate (the
    # bm25/token_rarity pattern): an eager .count() here would run a
    # full documents scan at CONSTRUCTION time — an extra job before
    # any action, and a stale literal if the table changes.
    n = table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).cast("double").alias("_n_docs")
    )
    score = F.col("tf").cast("double") * (
        (F.col("_n_docs") - F.col("df").cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term", "tf", "df", score.alias("score"))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= TOP_KEYWORDS)
        .select("doc_id", "term", "tf", "df", "score", "rk")
    )


# Rarity scale: integer score floor(1e12 / corpus_count) per token —
# monotone in 1/frequency, exact BIGINT division in both engines
# (no logs: ln() is not bit-reproducible cross-engine).
_RARITY_SCALE = 1_000_000_000_000


@query(
    "token_rarity_scores",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    vocab AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY term),
    tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_terms
        FROM vocab
    ),
    v2 AS (
        -- rare threshold: cnt < total/(2*n_terms) exactly, via
        -- cnt <= (total-1) // (2*n_terms) — integer-only and
        -- overflow-free (no cnt*n_terms product, which exceeds
        -- BIGINT for web-scale vocabularies).
        SELECT term, cnt,
               CASE WHEN cnt <= ((SELECT total FROM tot) - 1)
                               // (2 * (SELECT n_terms FROM tot))
                    THEN 1 ELSE 0 END AS rare,
               {_RARITY_SCALE} // cnt AS rarity
        FROM vocab
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(v.rare) AS BIGINT) AS n_rare,
           CAST(SUM(v.rare) AS DOUBLE) / COUNT(*) AS rare_ratio,
           CAST(SUM(v.rarity) AS BIGINT) AS rarity_score,
           CAST(SUM(v.rarity) AS DOUBLE) / COUNT(*) AS mean_rarity
    FROM toks t JOIN v2 v ON v.term = t.term
    GROUP BY t.doc_id
    """,
)
def token_rarity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency-based quality signals per document: how many
    of a doc's tokens are RARE in the whole corpus (count below half
    the mean term frequency — a data-adaptive threshold, exact via
    the overflow-free integer form ``cnt <= (total-1) div
    (2·n_terms)``) plus an
    integer rarity score (Σ floor(1e12 / corpus_count) — monotone in
    inverse document frequency without a single transcendental).
    Complements ``repetition_scores``: that one is per-doc-local,
    this one needs the corpus-wide vocabulary, i.e. a genuinely
    different dataflow (train-then-score, like a unigram LM).

    Scale design: the vocabulary agg shuffles one row per distinct
    term per task (map-side combine); the token→vocab enrichment is a
    plain shuffle join on term — the vocabulary of a web-scale corpus
    is NOT broadcast-sized (heavy-tail token sets run to billions of
    terms), exactly the benchmark_contamination lesson. The corpus
    totals row IS one row — that join is a broadcast."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    tot = vocab.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_terms")
    )
    # rare: cnt < total/(2*n_terms) exactly, as cnt <= (total-1) div
    # (2*n_terms) — no cnt*n_terms product, so the comparison cannot
    # overflow BIGINT however large the vocabulary gets (the product
    # form would: n_terms ~1e9 x a hot token's cnt ~5e9 > 2^63).
    v2 = (
        vocab.crossJoin(F.broadcast(tot))
        .select(
            "term",
            F.when(
                F.col("cnt")
                <= F.expr("(total - 1) div (2 * n_terms)"), 1
            ).otherwise(0).alias("rare"),
            F.expr(f"{_RARITY_SCALE}L div cnt").alias("rarity"),
        )
    )
    return (
        toks.join(v2, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("rare").alias("n_rare"),
            (F.sum("rare").cast("double") / F.count(F.lit(1))).alias("rare_ratio"),
            F.sum("rarity").alias("rarity_score"),
            (F.sum("rarity").cast("double") / F.count(F.lit(1))).alias(
                "mean_rarity"
            ),
        )
    )


TOP_BPE_PAIRS = 10

# Iteration-1 vocabulary + pair counting, shared VERBATIM by
# bpe_pair_counts' oracle and bpe_apply_merge's top-1 pick — one
# definition so the iteration-1 winner and the iteration-2 recount
# cannot drift. (Empty terms are filtered; they carry no pairs either
# way, and the filter keeps the char-explosion CTE safe.)
_BPE_VOCAB_SQL = """
    bpe_toks AS (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ),
    bpe_vocab AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM bpe_toks WHERE len(term) >= 1 GROUP BY term
    ),
    bpe_pairs1 AS (
        SELECT p.pair, CAST(SUM(v.cnt) AS BIGINT) AS weight
        FROM bpe_vocab v, LATERAL (
            SELECT unnest(list_transform(
                       generate_series(1, len(v.term) - 1),
                       i -> substr(v.term, CAST(i AS INT), 2))) AS pair
        ) p
        GROUP BY p.pair
    ),
    bpe_top1 AS (
        SELECT substr(pair, 1, 1) AS x, substr(pair, 2, 1) AS y
        FROM bpe_pairs1 ORDER BY weight DESC, pair LIMIT 1
    )
"""

# Shared Spark halves of the same definitions.
_BPE_STARTS = (
    "if(length(term) - 1 >= 1, sequence(1, length(term) - 1),"
    " cast(array() as array<int>))"
)


def _bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("term")
    )
    return (
        toks.filter(F.length("term") >= 1)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _bpe_pairs1(vocab: DataFrame) -> DataFrame:
    return (
        vocab.select(
            "cnt",
            F.explode(
                F.expr(f"transform({_BPE_STARTS}, i -> substring(term, i, 2))")
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("cnt").alias("weight"))
    )


@query(
    "bpe_pair_counts",
    oracle=f"""
    WITH {_BPE_VOCAB_SQL}
    SELECT pair, weight,
           CAST(ROW_NUMBER() OVER (ORDER BY weight DESC, pair) AS BIGINT) AS rk
    FROM bpe_pairs1
    QUALIFY rk <= {TOP_BPE_PAIRS}
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE-trainer iteration: corpus-weighted frequencies of
    adjacent character pairs, computed over the VOCABULARY (term,
    count) rather than the token stream — the standard sharding trick
    in tokenizer training (pair work is O(distinct terms x term
    length), corpus frequency enters as a weight, so a trillion-token
    corpus costs the same pair pass as its vocabulary). Top pair = the
    merge a BPE trainer would apply next; rank ties break
    lexicographically so the winner is deterministic.

    Physical plan: token->vocab count agg (one shuffle, map-side
    combine), per-term pair explosion in codegen (guarded sequence —
    1-char terms produce no pairs in either engine), a second
    pair-sum agg, and a WindowGroupLimit top-k. The global top-k
    window runs over distinct pairs (bounded by charset², tiny);
    at a real charset the same two-agg shape holds."""
    pairs = _bpe_pairs1(_bpe_vocab(spark, sf_dir))
    w = Window.orderBy(F.desc("weight"), "pair")
    return (
        pairs.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= TOP_BPE_PAIRS)
        .select("pair", "weight", "rk")
    )


# Hashed-feature linear quality classifier: 2^16 hash buckets, integer
# weights derived from md5 of the bucket id. Stands in for a trained
# fastText-style quality filter: at production scale the weight vector
# is a broadcast lookup table; a hash-derived weight FUNCTION has the
# same physical plan minus even that broadcast — every token's feature
# hash and weight computes inside codegen, so scoring a 100 TB corpus
# is one narrow map + one per-doc sum, no Python anywhere.
N_BUCKETS = 65536
_W_MOD = 2001  # weights span [-1000, 1000]


@query(
    "quality_classifier_logits",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    feat AS (
        SELECT doc_id,
               ({md5_int_sql(f"'w' || CAST({md5_int_sql('term')} % {N_BUCKETS} AS VARCHAR)")}
                % {_W_MOD}) - {(_W_MOD - 1) // 2} AS w
        FROM toks
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(w) AS BIGINT) AS logit,
           (CAST(SUM(w) AS DOUBLE) / COUNT(*)) AS mean_weight,
           (SUM(w) > 0) AS keep
    FROM feat
    GROUP BY doc_id
    """,
)
def quality_classifier_logits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier scoring over hashed bag-of-words
    features (the fastText-filter shape used for corpus quality
    gating): token -> 16-bit feature hash -> integer weight ->
    per-document logit, keep iff logit > 0.

    All arithmetic is md5-derived integers (``determinism.md5_int``),
    so the scores are bit-exact across engines — the point being that
    CLASSIFIER APPLICATION at corpus scale is a pure codegen map +
    one per-doc aggregation: no UDF, no model server, no shuffle
    beyond the doc rollup. Swapping the hash-derived weight for a
    real trained vector changes this plan only by one broadcast
    join on the bucket id."""
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    bucket = (md5_int("term") % N_BUCKETS).cast("string")
    w = (md5_int(F.concat(F.lit("w"), bucket)) % _W_MOD) - (_W_MOD - 1) // 2
    return (
        toks.select("doc_id", w.alias("w"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w").alias("logit"),
            (F.sum("w").cast("double") / F.count(F.lit(1))).alias(
                "mean_weight"
            ),
            (F.sum("w") > 0).alias("keep"),
        )
    )


@query(
    "bpe_apply_merge",
    oracle=f"""
    WITH {_BPE_VOCAB_SQL},
    chars AS (
        SELECT v.term, v.cnt, t.i, substr(v.term, CAST(t.i AS INT), 1) AS c
        FROM bpe_vocab v, LATERAL (
            SELECT unnest(generate_series(1, len(v.term))) AS i
        ) t
    ),
    marked AS (
        SELECT c.term, c.cnt, c.i, c.c, b.x, b.y,
               CASE WHEN c.c = b.x
                     AND lead(c.c) OVER (PARTITION BY c.term ORDER BY c.i) = b.y
                    THEN 1 ELSE 0 END AS m
        FROM chars c, bpe_top1 b
    ),
    run AS (
        SELECT *, SUM(m) OVER (PARTITION BY term ORDER BY i) AS running
        FROM marked
    ),
    isl AS (
        SELECT *, CASE WHEN m = 1 THEN i - running END AS island FROM run
    ),
    offs AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY term, island ORDER BY i)
                      AS off
        FROM isl
    ),
    ms AS (
        SELECT *, (m = 1 AND off % 2 = 1) AS merge_start FROM offs
    ),
    sy AS (
        SELECT term, cnt, i, x, y,
               CASE WHEN merge_start THEN x || y
                    WHEN lag(merge_start, 1, false)
                             OVER (PARTITION BY term ORDER BY i) THEN NULL
                    ELSE c END AS sym
        FROM ms
    ),
    seq AS (SELECT * FROM sy WHERE sym IS NOT NULL),
    pairs2 AS (
        SELECT sym || '+' || lead(sym) OVER (PARTITION BY term ORDER BY i)
                   AS pair,
               cnt
        FROM seq
    ),
    agg AS (
        SELECT pair, CAST(SUM(cnt) AS BIGINT) AS weight
        FROM pairs2 WHERE pair IS NOT NULL GROUP BY pair
    )
    SELECT b.x || b.y AS merged_symbol, a.pair, a.weight,
           CAST(ROW_NUMBER() OVER (ORDER BY a.weight DESC, a.pair) AS BIGINT)
               AS rk
    FROM agg a, bpe_top1 b
    QUALIFY rk <= {TOP_BPE_PAIRS}
    """,
)
def bpe_apply_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SECOND BPE-trainer iteration: apply the iteration-1 winning
    merge to every vocabulary term (greedy, left-to-right,
    non-overlapping — the exact semantics of a BPE tokenizer) and
    recount adjacent-symbol pairs under the new segmentation.

    Greedy non-overlap is the subtle part when x == y ("aaa" merges
    to ["aa","a"], not twice): merge starts are the ODD offsets
    within each maximal run of consecutive pair-matches, computed
    with a gaps-and-islands window (running match count -> island id
    -> in-island row_number) — no UDF, no per-term Python loop, so
    the merge applies to a trillion-token corpus as a handful of
    window passes over the VOCABULARY (O(distinct terms × length),
    corpus frequency enters as a weight).

    The winning merge itself is data-derived (same deterministic
    tie-break as ``bpe_pair_counts``) and broadcast as a 1-row
    scalar; post-merge pairs are keyed ``sym_a+sym_b`` so multi-char
    symbols stay unambiguous."""
    vocab = _bpe_vocab(spark, sf_dir)
    pairs1 = _bpe_pairs1(vocab)
    top1 = (
        pairs1.orderBy(F.desc("weight"), "pair")
        .limit(1)
        .select(
            F.substring("pair", 1, 1).alias("x"),
            F.substring("pair", 2, 1).alias("y"),
        )
    )
    chars = vocab.select(
        "term",
        "cnt",
        F.explode(F.expr("sequence(1, length(term))")).alias("i"),
    ).select("term", "cnt", "i", F.expr("substring(term, i, 1)").alias("c"))
    wt = Window.partitionBy("term").orderBy("i")
    df = (
        chars.crossJoin(F.broadcast(top1))
        .withColumn("nxt", F.lead("c").over(wt))
        .withColumn(
            "m",
            F.when(
                (F.col("c") == F.col("x")) & (F.col("nxt") == F.col("y")), 1
            ).otherwise(0),
        )
        .withColumn("running", F.sum("m").over(wt))
        .withColumn(
            "island", F.when(F.col("m") == 1, F.col("i") - F.col("running"))
        )
    )
    wisl = Window.partitionBy("term", "island").orderBy("i")
    df = (
        df.withColumn("off", F.row_number().over(wisl))
        .withColumn(
            "ms", (F.col("m") == 1) & (F.col("off") % 2 == 1)
        )
        .withColumn("skip", F.lag("ms", 1, False).over(wt))
        .withColumn(
            "sym",
            F.when(F.col("ms"), F.concat("x", "y"))
            .when(F.col("skip"), F.lit(None))
            .otherwise(F.col("c")),
        )
    )
    seq = df.filter(F.col("sym").isNotNull()).select(
        "term", "cnt", "i", "x", "y", "sym"
    )
    pairs2 = (
        seq.withColumn("nxt2", F.lead("sym").over(wt))
        .filter(F.col("nxt2").isNotNull())
        .select(
            F.concat("x", "y").alias("merged_symbol"),
            F.concat_ws("+", "sym", "nxt2").alias("pair"),
            "cnt",
        )
        .groupBy("merged_symbol", "pair")
        .agg(F.sum("cnt").alias("weight"))
    )
    w = Window.orderBy(F.desc("weight"), "pair")
    return (
        pairs2.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= TOP_BPE_PAIRS)
        .select("merged_symbol", "pair", "weight", "rk")
    )
