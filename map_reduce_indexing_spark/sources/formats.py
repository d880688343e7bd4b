"""Interchange file formats (SURVEY.md §2.1 S5 — Hadoop file formats).

The reference rides on HDFS text files plus Hadoop's SequenceFile
surface (jobs/WordCount uses TextInputFormat/TextOutputFormat); Spark's
equivalent breadth is the DataFrameReader/Writer format registry. This
module pins the engine's conventions for the three interchange formats
a pipeline actually meets — CSV, JSON Lines, ORC — as schema-explicit
round-trip helpers:

- **CSV**: header on, explicit schema on read (never inferSchema — a
  schema inference pass reads the data twice and types drift by
  partition at scale), ISO-8601 timestamps.
- **JSON Lines**: one object per line (splittable, streamable);
  explicit schema so missing keys become typed nulls instead of
  corrupting inference.
- **ORC**: columnar alternative kept for interop with Hive-era lakes;
  same pushdown/pruning contract as parquet.

Scale posture: all three writers shard per partition (one file per
task) so a 100 TB export parallelizes; readers split CSV/JSONL by line
boundaries and ORC by stripe, so ingest parallelism is free. Parquet
stays the engine-native format (tables.py); these are border formats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TIMESTAMP_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"


def write_csv(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("timestampFormat", TIMESTAMP_FMT)
        .csv(path)
    )


def read_csv(
    spark: SparkSession, path: str, schema: StructType, *, multiline: bool = False
) -> DataFrame:
    """`multiline=True` reassembles quoted embedded newlines but makes
    each file non-splittable (one task per file) — acceptable for small
    border imports, never for bulk ingest. Default stays line-split so a
    100 TB CSV ingest parallelizes by block."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("multiLine", multiline)
        .option("timestampFormat", TIMESTAMP_FMT)
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("timestampFormat", TIMESTAMP_FMT).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("timestampFormat", TIMESTAMP_FMT)
        .json(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    # ORC files carry their schema; no explicit schema needed
    return spark.read.orc(path)
