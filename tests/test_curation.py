"""Invariant tests for the corpus-curation operators (cleaning,
stratified sampling, sequence packing) — semantics beyond the
cross-engine hash equality the oracle gate proves."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_http_data_pipeline_spark.llm.cleaning import (
    pii_redaction,
    stopword_stripped_docs,
)
from go_http_data_pipeline_spark.llm.sampling import (
    QUOTA,
    stratified_sample_per_lang,
)
from go_http_data_pipeline_spark.llm.chunking import SEQ_BUDGET, sequence_packing
from go_http_data_pipeline_spark.llm.textstats import STOPWORDS


def test_pii_redaction_scrubs_everything(spark, sf_dir):
    out = pii_redaction(spark, sf_dir)
    # every synthesized email/URL/id is found and none survives
    assert out.filter((F.col("n_emails") != 1) | (F.col("n_urls") != 1)).count() == 0
    leaked = out.filter(
        F.col("clean_text").contains("@")
        | F.col("clean_text").contains("https://")
        | F.col("clean_text").rlike(r"\b[0-9]{6,}\b")
    )
    assert leaked.count() == 0
    assert out.filter(~F.col("clean_text").contains("<EMAIL>")).count() == 0


def test_stopword_strip_removes_only_stopwords(spark, sf_dir):
    out = stopword_stripped_docs(spark, sf_dir)
    assert out.filter(F.col("n_kept") > F.col("n_tokens")).count() == 0
    stop_arr = ", ".join(f"'{w}'" for w in STOPWORDS)
    survivors = out.filter(
        F.expr(
            f"size(filter(split(clean_text, ' '), x -> x IN ({stop_arr}))) > 0"
        )
    )
    assert survivors.count() == 0


def test_stratified_sample_quota_and_determinism(spark, sf_dir):
    out = stratified_sample_per_lang(spark, sf_dir)
    per_lang = {r["lang"]: r["n"] for r in
                out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    strata = {r["lang"]: r["n"] for r in
              spark.read.parquet(f"{sf_dir}/documents.parquet")
              .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in per_lang.items():
        assert n == min(QUOTA, strata[lang])
    # deterministic: same doc set on a second run
    ids1 = {r["doc_id"] for r in out.collect()}
    ids2 = {r["doc_id"] for r in stratified_sample_per_lang(spark, sf_dir).collect()}
    assert ids1 == ids2


def test_sequence_packing_offsets_are_contiguous(spark, sf_dir):
    out = sequence_packing(spark, sf_dir).orderBy("source", "doc_id").collect()
    pos = {}
    for r in out:
        expected = pos.get(r["source"], 0)
        assert r["tok_offset"] == expected
        pos[r["source"]] = expected + r["n_tokens"]
        assert r["first_seq"] == r["tok_offset"] // SEQ_BUDGET
        assert r["last_seq"] >= r["first_seq"]
        assert r["n_seqs"] == r["last_seq"] - r["first_seq"] + 1
