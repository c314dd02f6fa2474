"""The ANN index families (and their composition), one corpus, one
table: measured recall
vs probe cost vs candidate volume at sf0.1.

The engine ships four approximate-nearest-neighbor scale paths over
the same `embeddings` corpus — hyperplane-LSH buckets, IVF cells, and
product quantization with asymmetric-distance probes, and the
IVF x PQ composition — each already
oracle-checked for exact values. What the per-query correctness gate
canNOT show is the ENGINEERING trade each family makes: how much of
the corpus a probe touches, what that costs in wall-clock, and how
much recall the pruning gives up. This script measures them all on
the same fixture and writes docs/ANN_COMPARISON.md.

Columns:
* probe (s)      — min-of-REPEATS wall for the top-1 query over the
                   10-query demo set (sf0.1 corpus, warm caches: the
                   persisted feature/code tables a real deployment
                   would checkpoint are built untimed first, the same
                   split bench.py uses for the dedup caches);
* cand/query     — corpus vectors SCORED per query (bucket/cell
                   sizes from the index's own assignment; the brute
                   and PQ rows score the whole corpus — PQ's point is
                   that each score is 16 table lookups, not a 64-dim
                   dot);
* answered       — queries the family found ANY candidate for, out of
                   the queries asked (single-bucket LSH can land a
                   query in a singleton bucket and answer nothing);
* top1∈top5      — fraction of queries ASKED whose approximate top-1
                   lands in the EXACT brute-force top-5 (the recall
                   the registry's `ann_family_recall_eval` gates); an
                   unanswered query counts as a MISS, not a skipped
                   trial — dividing by answered queries only would
                   overstate the pruning-hardest family exactly where
                   it fails (VERDICT r10 item 4);
* top1=top1      — stricter: fraction matching the exact top-1,
                   same miss-counting denominator.

Usage: python tools/ann_comparison.py [out_md] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))


def _timed(fn, *args) -> float:
    samples = []
    for _ in range(max(1, REPEATS)):
        t0 = time.perf_counter()
        fn(*args).count()
        samples.append(time.perf_counter() - t0)
    return round(min(samples), 3)


def main() -> int:
    out_md = sys.argv[1] if len(sys.argv) > 1 else "docs/ANN_COMPARISON.md"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from go_http_data_pipeline_spark.llm import pq as pqm
    from go_http_data_pipeline_spark.llm import similarity as sim
    from go_http_data_pipeline_spark.session import get_spark

    spark = get_spark("ann-comparison")
    spark.sparkContext.setLogLevel("ERROR")

    n_corpus = sim.table(spark, sf, "embeddings").count()

    # Exact baseline: top-5 per query (ground truth for recall) —
    # built first, untimed, so every family sees warm caches the way
    # a deployment sees its checkpointed index tables.
    brute5 = {
        (r.qid, r.neighbor_id): r.rank
        for r in sim.cosine_topk(spark, sf).collect()
    }
    top5 = {}
    top1 = {}
    for (qid, nid), rank in brute5.items():
        top5.setdefault(qid, set()).add(nid)
        if rank == 1:
            top1[qid] = nid
    n_q = len(top5)

    # Candidate volume per family, from each index's own assignment.
    feats = sim._ann_features(spark, sf)  # (vec_id, bucket), persisted
    bucket_sizes = {
        r.bucket: r.n
        for r in feats.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    q_buckets = {
        r.vec_id: r.bucket
        for r in feats.filter(F.col("vec_id") < sim.N_QUERIES).collect()
    }
    lsh_cand = sum(bucket_sizes[b] - 1 for b in q_buckets.values()) / n_q
    multi_cand = (
        sum(
            sum(
                bucket_sizes.get(b ^ m, 0)
                for m in [0] + [1 << p for p in range(sim.N_PLANES)]
            )
            - 1
            for b in q_buckets.values()
        )
        / n_q
    )

    assign = sim.ivf_assignments(spark, sf)
    cell_sizes = {
        r.cid: r.n
        for r in assign.groupBy("cid").agg(F.count("*").alias("n")).collect()
    }
    q_cells = {
        r.vec_id: r.cid
        for r in assign.filter(F.col("vec_id") < sim.N_QUERIES).collect()
    }
    ivf_cand = sum(cell_sizes[c] - 1 for c in q_cells.values()) / n_q
    # nprobe=2: the query's two best cells, computed the same way
    # ivf_ann_nprobe2's query-side assignment does (top-2 centroid
    # cosine, ties to smaller cid).
    from pyspark.sql import Window

    emb = sim.table(spark, sf, "embeddings")
    cents = emb.filter(
        (F.col("vec_id") % sim._CENT_STEP == 0)
        & (F.col("vec_id") < sim._CENT_MAX)
    ).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("c_emb"),
        F.sqrt(F.expr(sim._DOT.format(a="embedding", b="embedding"))).alias(
            "c_nrm"
        ),
    )
    q_base = emb.filter(F.col("vec_id") < sim.N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    cdot = F.expr(sim._DOT.format(a="q_emb", b="c_emb"))
    wq = Window.partitionBy("qid").orderBy(
        (cdot / F.col("c_nrm")).desc(), F.col("cid")
    )
    q2 = (
        q_base.crossJoin(F.broadcast(cents))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 2)
        .select("qid", "cid")
        .collect()
    )
    cells2: dict[int, list[int]] = {}
    for r in q2:
        cells2.setdefault(r.qid, []).append(r.cid)
    ivf2_cand = (
        sum(sum(cell_sizes.get(c, 0) for c in cs) - 1 for cs in cells2.values())
        / n_q
    )

    variants = [
        ("exact", "brute-force cosine", sim.cosine_topk, n_corpus - 1),
        ("LSH", "ann_lsh_top1 (1 bucket)", sim.ann_lsh_top1, lsh_cand),
        (
            "LSH",
            "ann_lsh_multiprobe_top1 (9 buckets)",
            sim.ann_lsh_multiprobe_top1,
            multi_cand,
        ),
        ("IVF", "ivf_ann_top1 (1 cell)", sim.ivf_ann_top1, ivf_cand),
        ("IVF", "ivf_ann_nprobe2 (2 cells)", sim.ivf_ann_nprobe2, ivf2_cand),
        ("PQ", "pq_ann_top1 (ADC, 16 lookups/score)", pqm.pq_ann_top1, n_corpus - 1),
        (
            "PQ",
            "pq_ann_top1_wide (per-row ADC, no probe shuffle)",
            pqm.pq_ann_top1_wide,
            n_corpus - 1,
        ),
        (
            "IVFPQ",
            "ivf_pq_ann_top1 (1 cell, ADC)",
            pqm.ivf_pq_ann_top1,
            ivf_cand,
        ),
    ]

    rows = []
    for fam, label, fn, cand in variants:
        t = _timed(fn, spark, sf)
        got = fn(spark, sf).collect()
        # normalize column names across variants
        pick = {}
        for r in got:
            d = r.asDict()
            qid = d.get("qid")
            # membership test, not `or`: vec_id 0 is a legitimate
            # neighbor (and an IVF centroid) — `0 or ...` would turn
            # it into None and count the query as a recall miss.
            nid = (
                d["neighbor_id"]
                if "neighbor_id" in d
                else d.get("ann_neighbor")
            )
            if d.get("rank", 1) == 1:
                pick[qid] = nid
        # Denominator is n_q, the queries ASKED — a query the family
        # finds no candidate for counts as a recall MISS, not a
        # skipped trial. The first cut divided by len(pick) (queries
        # answered), which silently overstated single-bucket LSH
        # (VERDICT r10 item 4's silent-miss hole, fixed in the doc
        # first; the registered gate gained explicit miss rows in the
        # round-13 refresh — llm/recall.py — so doc and gate now agree).
        in5 = sum(1 for q, n in pick.items() if n in top5.get(q, ())) / n_q
        is1 = sum(1 for q, n in pick.items() if n == top1.get(q)) / n_q
        rows.append(
            (
                fam,
                label,
                t,
                "all" if cand >= n_corpus - 1 else round(cand, 1),
                f"{len(pick)}/{n_q}",
                round(in5, 2),
                round(is1, 2),
            )
        )
        print(
            f"# {label}: {t}s cand={rows[-1][3]}"
            f" answered={len(pick)}/{n_q} in5={in5} top1={is1}"
        )

    lines = [
        "# ANN — the index families measured on one corpus",
        "",
        f"{n_corpus} vectors (sf0.1), {n_q} demo queries; probe time is",
        f"min-of-{REPEATS} on local[32] with warm feature/code caches",
        "(the persisted tables a deployment would checkpoint). cand/query",
        "= corpus vectors scored per probe, from the index's own",
        "assignment; recall is against the exact brute-force top-5/top-1.",
        "",
        "| family | variant | probe (s) | cand/query | answered | top1 in top5 | top1 = top1 |",
        "|---|---|---|---|---|---|---|",
    ]
    for fam, label, t, cand, ans, in5, is1 in rows:
        lines.append(
            f"| {fam} | {label} | {t} | {cand} | {ans} | {in5} | {is1} |"
        )
    lines += [
        "",
        "Reading the trade:",
        "",
        "- **LSH** prunes hardest (1/256 of the corpus per probe at 8",
        "  hyperplanes) and pays for it in recall; multiprobe buys ~1 bit",
        "  back for 9x the candidates — the knob is explicit.",
        "- **IVF** prunes by data geometry (1/16 cells), so candidate",
        "  volume tracks cluster sizes; nprobe=2 doubles the probe for",
        "  the boundary-straddler queries.",
        "- **PQ** does not prune at all — it compresses: every corpus",
        "  vector is scored, but a score is 16 integer table lookups",
        "  against a broadcast LUT instead of a 64-dim dot against raw",
        "  floats the probe never reads. At 100 TB this is the family",
        "  whose probe cost scales with the CODES table (16 bytes/vector),",
        "  not the embedding table — and it composes with IVF (score",
        "  only the cell, with codes) in a real deployment.",
        "- **PQ wide** is the same answer over the storage layout a",
        "  deployment keeps: one row per vector, its 16 codes as one",
        "  array, scored per-row against the broadcast LUT in codegen.",
        "  No join and no corpus-sized shuffle at probe time — the lone",
        "  exchange carries <= |queries| pre-combined rows per",
        "  partition, so probe cost scales with the query batch, not",
        "  the corpus (plan-pinned in tests/test_pq.py; at THIS",
        "  2000-vector fixture its fixed LUT-assembly stage makes it",
        "  trail the long form — SCALING_MEASURED.md §K races the",
        "  layouts at x64 codes, where long grows to ~6 s and wide",
        "  stays ~flat at 1.4 s).",
        "- **IVFPQ** is that composition, shipped: prune to the query's",
        "  cell, score the survivors from codes. Candidates match the",
        "  IVF row; bytes-touched match PQ's 16/vector on just that",
        "  cell — pruning x compression, the FAISS-style deployment",
        "  default. Its recall is bounded above by BOTH parents: it",
        "  can only find what the cell contains, scored only as well",
        "  as the codes allow.",
        "- The exact row is the baseline every family's recall is gated",
        "  against in the registry (`ann_family_recall_eval`,",
        "  llm/recall.py — round 10 folded the per-family eval rows",
        "  into that one parameterized gate, one hash-checked row per",
        "  (family, query) for all six probe configurations).",
        "",
        "Generated by tools/ann_comparison.py.",
        "",
    ]
    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print(f"# wrote {out_md}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
