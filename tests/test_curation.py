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


def test_contamination_pairs_are_real_overlaps(spark, sf_dir):
    from go_http_data_pipeline_spark.llm.decontam import (
        BENCH_MOD,
        MIN_SHARED,
        benchmark_contamination,
    )

    out = benchmark_contamination(spark, sf_dir)
    rows = out.collect()
    assert rows, "fixture corpus should contain benchmark collisions"
    for r in rows:
        # corpus docs never appear on the bench side and vice versa
        assert r["doc_id"] % BENCH_MOD != 0
        assert r["bench_id"] % BENCH_MOD == 0
        assert r["n_shared"] >= MIN_SHARED
        assert 0.0 < r["contamination_ratio"] <= 1.0


def test_repetition_scores_bounds_and_duplicate_detection(spark, sf_dir):
    from go_http_data_pipeline_spark.llm.decontam import repetition_scores

    out = repetition_scores(spark, sf_dir)
    bad = out.filter(
        (F.col("dup_token_ratio") < 0)
        | (F.col("dup_token_ratio") >= 1)
        | (F.col("top_token_share") <= 0)
        | (F.col("top_token_share") > 1)
        | (F.col("n_distinct_tokens") > F.col("n_tokens"))
    )
    assert bad.count() == 0
    # hand-built degenerate doc scores as fully repetitive
    deg = spark.createDataFrame(
        [(1, "spam spam spam spam")], "doc_id long, text string"
    )
    import go_http_data_pipeline_spark.llm.decontam as dc
    import go_http_data_pipeline_spark.catalog as cat

    orig = cat.table
    try:
        cat.table = lambda s, d, n: deg if n == "documents" else orig(s, d, n)
        dc_table = dc.table
        dc.table = cat.table
        r = repetition_scores(spark, sf_dir).collect()[0]
    finally:
        cat.table = orig
        dc.table = orig
    assert r["dup_token_ratio"] == 0.75
    assert r["top_token_share"] == 1.0
    assert r["dup_bigram_ratio"] == 2.0 / 3.0


def test_cross_source_overlap_symmetric_bounds(spark, sf_dir):
    from go_http_data_pipeline_spark.llm.decontam import cross_source_overlap

    out = cross_source_overlap(spark, sf_dir).collect()
    assert out
    seen = set()
    for r in out:
        assert r["source_a"] < r["source_b"]  # one row per unordered pair
        assert (r["source_a"], r["source_b"]) not in seen
        seen.add((r["source_a"], r["source_b"]))
        assert r["n_shared_shingles"] > 0


def test_curation_verdicts_consistency(spark, sf_dir):
    from go_http_data_pipeline_spark.llm.decontam import curation_verdicts

    rows = curation_verdicts(spark, sf_dir).collect()
    assert len(rows) > 0
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows)  # thresholds genuinely split the corpus
    valid = {"dominated", "dup-exact", "dup-near", "repetitive", "short"}
    for r in rows:
        reasons = r["drop_reasons"].split(",") if r["drop_reasons"] else []
        assert r["keep"] == (not reasons)
        assert set(reasons) <= valid
        assert reasons == sorted(reasons)  # fixed, deterministic order
