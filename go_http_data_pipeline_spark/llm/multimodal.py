"""Multimodal columns: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the decode kernels are
STUBS (deterministic fakes clearly marked below); everything
Spark-side — binary columns, metadata schema, Arrow batch shape,
``mapInPandas`` plumbing, partitioning — is real and tested.

Fixtures have no binary column, so payloads are derived: the UTF-8
bytes of ``documents.text`` stand in for an encoded media blob.

Scale notes: media decode is the canonical ``mapInPandas`` workload —
per-row Python cost dominates, so the job is pure map-side (no
shuffle), Arrow moves bytes zero-copy, and partition count controls
parallelism. ``spark.sql.files.maxPartitionBytes`` sizes batches so
decoded frames fit executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

MEDIA_SCHEMA = (
    "doc_id BIGINT, media_type STRING, content BINARY, "
    "n_bytes INT, checksum STRING, width INT, height INT"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column + typed metadata, derived deterministically
    from ``documents`` (text bytes as the payload; fake dims from the
    content hash)."""
    from ..determinism import md5_int

    docs = table(spark, sf_dir, "documents")
    # ONE shared hash column (_h): width and height must derive from
    # the SAME md5 prefix — a second hand-inlined conv() copy could
    # drift independently and break the metadata/resize oracles.
    base = docs.select("doc_id", "text", md5_int("text").alias("_h"))
    return base.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
        F.md5("text").alias("checksum"),
        (64 + F.col("_h") % 1856).cast("int").alias("width"),
        (64 + F.expr("_h div 2048") % 1016).cast("int").alias("height"),
    )


@query(
    "media_metadata",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           md5(text) AS checksum,
           CAST(64 + CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 1856 AS INT)
               AS width,
           CAST(64 + (CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) // 2048) % 1016
               AS INT) AS height
    FROM documents
    """,
)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the binary media column (the binary payload
    itself is exercised by ``media_features`` and pytest; metadata is
    oracle-checked)."""
    return media_table(spark, sf_dir).drop("content")


def _fake_decode(content: bytes, media_type: str) -> np.ndarray:
    """STUB decode kernel. A real pipeline calls PIL/ffmpeg here; this
    container has neither, so we 'decode' the payload into its raw
    byte array — deterministic and shape-compatible with the real
    thing. Raises for unknown types like a real decoder would."""
    if media_type not in ("image/png", "audio/wav", "video/mp4"):
        raise NotImplementedError(f"no decoder for {media_type!r}")
    return np.frombuffer(content, dtype=np.uint8)


def decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: decode → per-item feature extraction.
    Arrow-batched: each pdf is thousands of rows, one Python call."""
    for pdf in batches:
        feats = []
        for content, mt in zip(pdf["content"], pdf["media_type"]):
            arr = _fake_decode(bytes(content), mt)
            if arr.size == 0:
                # Zero-length payload: stats are NULL, exactly like
                # the oracle's empty list (list_min([]) -> NULL,
                # sum/0 -> NULL). Without the guard np.min raises and
                # the whole Arrow batch — the whole JOB — dies on one
                # empty blob.
                feats.append((0, None, None, None))
                continue
            feats.append(
                (
                    int(arr.size),
                    float(arr.mean()),
                    int(arr.min()),
                    int(arr.max()),
                )
            )
        out = pd.DataFrame(
            feats, columns=["n_samples", "mean_byte", "min_byte", "max_byte"]
        )
        out.insert(0, "doc_id", pdf["doc_id"].values)
        out.insert(1, "media_type", pdf["media_type"].values)
        yield out


@query(
    "media_features",
    oracle="""
    WITH b AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                    WHEN doc_id % 3 = 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END AS media_type,
               list_transform(generate_series(1, octet_length(encode(text))),
                              i -> CAST(('0x' || substr(hex(encode(text)), i*2-1, 2)) AS BIGINT)) AS bs
        FROM documents
    )
    SELECT doc_id, media_type,
           CAST(len(bs) AS BIGINT) AS n_samples,
           CAST(list_sum(bs) AS DOUBLE) / len(bs) AS mean_byte,
           CAST(list_min(bs) AS BIGINT) AS min_byte,
           CAST(list_max(bs) AS BIGINT) AS max_byte
    FROM b
    """,
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary media via ``mapInPandas`` (the
    decode step is a deterministic stub — see ``_fake_decode``).

    Oracle-checked: the stub 'decode' is the identity over the
    payload bytes, so the per-item features are exact byte statistics
    (integer sums < 2^53; one IEEE division for the mean) that DuckDB
    reproduces from hex-split bytes — the Python kernel path itself
    is what's under test, not just its row count."""
    media = media_table(spark, sf_dir)
    return media.mapInPandas(
        decode_features,
        schema=(
            "doc_id BIGINT, media_type STRING, n_samples BIGINT, "
            "mean_byte DOUBLE, min_byte BIGINT, max_byte BIGINT"
        ),
    )


def frame_sample(df: DataFrame, every_n: int = 1000) -> DataFrame:
    """'Frame sampling' stub for video payloads: keep every n-th byte
    of the blob (a real impl samples frames via the container index).
    Spark-side plumbing (binary slicing stays JVM-side) is real."""
    n_frames = F.floor(F.octet_length("content") / every_n).cast("int")
    return df.filter(F.col("media_type") == "video/mp4").select(
        "doc_id",
        n_frames.alias("n_frames"),
        # A payload shorter than the stride has ZERO frames and an
        # EMPTY array — greatest(n-1, 0) would emit one phantom frame
        # that n_frames says does not exist (same guard discipline as
        # determinism.ngram_starts_sql).
        F.expr(
            f"if(int(octet_length(content) div {every_n}) >= 1,"
            f" transform(sequence(0, int(octet_length(content) div {every_n}) - 1),"
            f" i -> substring(content, i * {every_n} + 1, 1)),"
            f" cast(array() as array<binary>))"
        ).alias("frames"),
    )


@query(
    "media_frame_samples",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) // 100 AS INT) AS n_frames,
           -- zero-frame payloads emit '' explicitly: DuckDB's
           -- array_to_string of an EMPTY list is NULL (Spark's
           -- array_join is ''), and greatest(n-1, 0) would fabricate
           -- a phantom frame for sub-stride payloads.
           CASE WHEN octet_length(encode(text)) >= 100
                THEN array_to_string(
                    list_transform(
                        generate_series(0, CAST(octet_length(encode(text)) // 100 AS INT) - 1),
                        i -> substr(hex(encode(text)), i * 200 + 1, 2)),
                    '')
                ELSE '' END AS frames_hex
    FROM documents
    WHERE doc_id % 3 = 2
    """,
)
def media_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video payloads, oracle-checked: every
    100th byte of the blob stands in for a container-index frame
    grab, emitted as a hex fingerprint so the binary slicing is
    hash-comparable across engines. The slicing is pure JVM-side
    expression work (substring on binary inside codegen) — the shape
    a real frame sampler has after swapping the kernel."""
    media = media_table(spark, sf_dir)
    n_frames = F.expr("int(octet_length(content) div 100)")
    return media.filter(F.col("media_type") == "video/mp4").select(
        "doc_id",
        n_frames.alias("n_frames"),
        F.expr(
            "if(int(octet_length(content) div 100) >= 1,"
            " array_join(transform("
            " sequence(0, int(octet_length(content) div 100) - 1),"
            " i -> substring(hex(content), i * 200 + 1, 2)), ''),"
            " '')"
        ).alias("frames_hex"),
    )


@query(
    "media_resize_plan",
    oracle="""
    WITH meta AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                    WHEN doc_id % 3 = 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END AS media_type,
               CAST(64 + CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 1856 AS INT)
                   AS width,
               CAST(64 + (CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) // 2048) % 1016
                   AS INT) AS height
        FROM documents
    )
    SELECT doc_id, media_type, width, height,
           CAST(floor(width * s) AS INT) AS target_w,
           CAST(floor(height * s) AS INT) AS target_h
    FROM (
        SELECT *,
               CASE WHEN width >= height
                    THEN 256.0 / width ELSE 256.0 / height END AS s
        FROM meta
    )
    WHERE media_type IN ('image/png', 'video/mp4')
    """,
)
def media_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning for visual media: aspect-preserving fit into a
    256x256 box (scale = 256 / long edge, floor to pixels) — the pure-
    arithmetic half of a resize operator, oracle-checked. The pixel
    kernel itself is the documented stub boundary (`_fake_decode`):
    a real pipeline swaps in PIL/ffmpeg inside the same mapInPandas
    plumbing ``media_features`` demonstrates, with (target_w,
    target_h) as the kernel's argument columns."""
    meta = media_table(spark, sf_dir)
    s = F.when(
        F.col("width") >= F.col("height"), 256.0 / F.col("width")
    ).otherwise(256.0 / F.col("height"))
    return (
        meta.filter(F.col("media_type").isin("image/png", "video/mp4"))
        .select(
            "doc_id",
            "media_type",
            "width",
            "height",
            F.floor(F.col("width") * s).cast("int").alias("target_w"),
            F.floor(F.col("height") * s).cast("int").alias("target_h"),
        )
    )
