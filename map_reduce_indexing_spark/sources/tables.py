"""Parquet fixture-table sources (SURVEY.md §2.1 S7).

Columnar scans with Catalyst predicate pushdown and column pruning — the
engine's default source. The reference's text-file scan (worker.c:188-195)
maps to `corpus.py`; everything tabular comes through here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_session_confs(spark: SparkSession) -> None:
    """Queries may run inside a session the engine didn't build (the
    driver's verify harness passes its own). Pin the runtime-settable
    confs correctness depends on: UTC so timestamps compare cleanly
    against the UTC-naive DuckDB oracle, and nanos-as-long so the
    events table's TIMESTAMP(NANOS) parquet column is readable."""
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        # INT64-micros timestamps on write: INT96 (the legacy default)
        # has no parquet min/max stats -> no footer data skipping.
        ("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"),
    ):
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass  # non-settable in this session; reads fall back below


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in FIXTURE_TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {FIXTURE_TABLES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    from pyspark.sql import functions as F

    # Normalize timestamp encodings to TimestampType regardless of how
    # the fixture generator encoded them — the rest of the engine
    # (unix_micros, window range frames, streaming watermarks) assumes
    # TIMESTAMP:
    #   * TIMESTAMP(NANOS) + nanosAsLong -> long of epoch-nanos
    #     (events.ts only): truncate to micros (integer DIV — same floor
    #     semantics DuckDB applies when viewing nanos as TIMESTAMP).
    #   * timestamp[us] with no timezone -> TIMESTAMP_NTZ, ANY column of
    #     ANY table (the round-3 fixture regeneration flipped every date
    #     column this way): cast to TIMESTAMP. The session timezone is
    #     pinned UTC (session.py and _ensure_session_confs above), so
    #     the cast reinterprets the naive value as UTC — value-identical
    #     to the UTC-naive DuckDB oracle reading the same file.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz_cols:
        df = df.withColumns(
            {c: F.col(c).cast("timestamp") for c in ntz_cols}
        )
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = FIXTURE_TABLES) -> None:
    """Register fixture tables as temp views so operators can use spark.sql."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
