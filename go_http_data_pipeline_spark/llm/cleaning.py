"""Text cleaning operators for training-data preparation: PII
redaction and stopword stripping.

The reference has no text surface at all (its closest analog is the
per-record validate-then-store handler chain, ``Server/main.go:209-227``);
these are engine-surface additions a corpus pipeline needs before
tokenization.

The fixture corpus is synthetic word-salad with no embedded PII, so
``pii_redaction`` first derives a deterministic "raw crawl" variant of
every document (an email, URL, and numeric id built from ``doc_id`` /
``source``) and then redacts it — the regexes fire on 100% of rows and
the whole round trip is oracle-checkable. Patterns are restricted to
syntax with identical semantics in Java regex (Spark) and RE2 (DuckDB):
character classes, ``+``/``{n,}`` quantifiers, ``\\b`` — no lookaround.

Scale notes: both operators are narrow per-row maps over the corpus
scan — zero shuffle at any scale; regex evaluation is JVM-side codegen
(no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from .textstats import _STOP_SQL, STOPWORDS

EMAIL_RE = r"[a-z0-9]+@[a-z0-9.]+\.[a-z]+"
URL_RE = r"https?://[a-z0-9./-]+"
LONGNUM_RE = r"\b[0-9]{6,}\b"

# deterministic "raw crawl" text: prepend synthetic contact/link/id PII
_RAW_SQL = (
    "concat('contact user', CAST(doc_id AS STRING), '@', source, "
    "'.example.net or https://', source, '.example.com/doc/', "
    "CAST(doc_id AS STRING), ' ref ', CAST(900000 + doc_id AS STRING), "
    "' ', text)"
)


@query(
    "pii_redaction",
    oracle=f"""
    WITH raw AS (
        SELECT doc_id, {_RAW_SQL} AS raw_text FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(raw_text, '{EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(raw_text, '{URL_RE}')) AS n_urls,
           regexp_replace(
               regexp_replace(
                   regexp_replace(raw_text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{URL_RE}', '<URL>', 'g'),
               '{LONGNUM_RE}', '<NUM>', 'g') AS clean_text
    FROM raw
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails, URLs, and long numeric ids from raw text, and
    count what was removed. Spark's ``regexp_replace`` is global by
    default; the DuckDB twin passes the ``'g'`` flag explicitly."""
    raw = table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_RAW_SQL).alias("raw_text")
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("raw_text"), EMAIL_RE, "<EMAIL>"),
            URL_RE,
            "<URL>",
        ),
        LONGNUM_RE,
        "<NUM>",
    )
    return raw.select(
        "doc_id",
        F.size(F.regexp_extract_all("raw_text", F.lit(EMAIL_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("raw_text", F.lit(URL_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_urls"),
        clean.alias("clean_text"),
    )


@query(
    "stopword_stripped_docs",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    )
    SELECT doc_id,
           len(t) AS n_tokens,
           len(list_filter(t, x -> x NOT IN ({_STOP_SQL}))) AS n_kept,
           -- COALESCE: an all-stopword document filters to an EMPTY
           -- list, which DuckDB's array_to_string renders as NULL
           -- while Spark's array_join yields '' (same guard the
           -- curation oracle in decontam.py documents).
           COALESCE(
               array_to_string(list_filter(t, x -> x NOT IN ({_STOP_SQL})), ' '),
               '') AS clean_text
    FROM toks
    """,
)
def stopword_stripped_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strip stopwords (shared ``STOPWORDS`` list from textstats) and
    report token counts before/after — array lambdas, no explode."""
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    toks = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.split("text", " ").alias("t"),
    )
    kept = F.filter("t", lambda x: ~F.array_contains(stop_arr, x))
    return toks.select(
        "doc_id",
        F.size("t").cast("bigint").alias("n_tokens"),
        F.size(kept).cast("bigint").alias("n_kept"),
        F.array_join(kept, " ").alias("clean_text"),
    )
