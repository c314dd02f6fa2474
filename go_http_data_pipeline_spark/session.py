"""SparkSession factory tuned for the engine.

Scale design (100 TB / 1000-executor target):

* AQE on — runtime coalescing of shuffle partitions, skew-join
  splitting, and dynamic broadcast decisions survive a 1000x scale-up
  where any static plan would not.
* ``spark.sql.shuffle.partitions`` is env-tunable; on a real cluster
  this is set to ~2-3x total cores and AQE coalesces down.
* Arrow enabled — every Python-side exchange (pandas UDFs,
  ``applyInPandas``) is columnar-batched, never row-at-a-time.
* Session timezone pinned to UTC so timestamp semantics are identical
  across engines (fixtures are naive/UTC parquet timestamps).

Locally we run ``local[$SPARK_GRAFT_CPUS]`` (default 32) — the same
declarative plans move to a cluster unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "go-http-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
