"""SparkSession factory.

One place to pin the configs that matter for this engine:

- AQE on (runtime shuffle coalescing, skew-join splitting, broadcast
  conversion) — the 100 TB posture depends on it.
- ``spark.sql.session.timeZone=UTC`` so timestamps hash-compare cleanly
  against the DuckDB oracle (DuckDB timestamps are UTC-naive).
- Arrow on for the Pandas-UDF slow path (multimodal / custom operators).
- Shuffle partitions sized to local cores by default; on a real cluster
  this is overridden to ~2-3x total executor cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "map_reduce_indexing_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Local mode is a single JVM, so ``spark.driver.memory`` is the only
    memory knob. On a real cluster, master/memory come from spark-submit
    and this factory only contributes the SQL configs.
    """
    cpus = default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # The events fixture stores TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long and normalize in sources/tables.py.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Write TIMESTAMP as INT64 micros, not the legacy INT96 default:
        # INT96 carries no parquet min/max statistics, which silently
        # disables footer-level data skipping on every timestamp-sorted
        # layout (and is deprecated in the format).
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
