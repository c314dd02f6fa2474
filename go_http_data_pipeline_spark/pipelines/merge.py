"""Keyed upsert (MERGE) semantics without a Delta/Iceberg dependency.

The reference's only write-back primitive is the per-row
``UPDATE employee SET salary=? WHERE id=?`` (``Server/main.go:279-282``)
— N point updates. On plain DataFrames/parquet there is no in-place
update, so MERGE is expressed relationally:

    merged = base LEFT-ANTI updates ON key  UNION  updates

which Catalyst executes as one shuffle-free-if-co-partitioned pass.
At 100 TB this runs inside ``foreachBatch`` against a partitioned
table, rewriting only the partitions that contain matched keys
(partition pruning on the anti-join side); with a table format that
supports MERGE INTO the same plan maps 1:1 onto it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_into(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Upsert ``updates`` into ``base`` by ``key``.

    Matched keys take the update row (reference semantics: the UPDATE
    wins, ``Server/main.go:280``); unmatched update rows are inserted
    (the login auto-register path, ``Server/main.go:112-120``).
    Schemas must match by name; ``unionByName`` keeps this positional-
    order-proof.
    """
    kept = base.join(updates.select(key), on=key, how="left_anti")
    return kept.unionByName(updates)


def apply_cdc(
    base: DataFrame, cdc: DataFrame, key: str, op_col: str = "op"
) -> DataFrame:
    """Apply one CDC batch to ``base``: rows with ``op_col`` = ``'D'``
    delete their key, every other op upserts the row (MERGE WHEN
    MATCHED THEN UPDATE/DELETE, WHEN NOT MATCHED THEN INSERT), **with
    schema evolution**: columns the CDC feed carries that ``base``
    lacks are added to the target, NULL for rows the batch didn't
    touch — the ``mergeSchema``/auto-evolution behavior of a real
    table format, expressed relationally.

    The relational form is the same single pass as :func:`merge_into`
    (left-anti on touched keys, then union), so it inherits the same
    scale shape: co-partitioned by ``key`` it is shuffle-free, and
    under ``foreachBatch`` against a partitioned table only the
    partitions holding touched keys rewrite. Delete-by-anti-join means
    a delete costs the same as an update — no tombstone scan.

    The CDC feed must hold at most one row per key (standard MERGE
    precondition; a multi-row feed is compacted upstream to its latest
    image per key before the merge).
    """
    kept = base.join(cdc.select(key), on=key, how="left_anti")
    upserts = cdc.filter(cdc[op_col] != "D").drop(op_col)
    return kept.unionByName(upserts, allowMissingColumns=True)
