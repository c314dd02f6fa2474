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
