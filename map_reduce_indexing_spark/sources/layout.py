"""Physical data layout for scan-time data skipping (SURVEY.md §2.1
S4/S5 extension — the sink-side half of partition pruning).

The reference's only layout decision is routing postings into
first-letter buckets (worker.c sends each word to the reducer that
owns its letter range); ``operators/indexing.py:write_index`` carries
that forward. This module generalizes it to the layout primitive a
100 TB fact table needs: **cluster by a range key, sort within
files**, so every parquet row group's min/max statistics become a
coarse index and readers (Spark's parquet filter pushdown, or any
min/max-aware engine) skip whole files/row groups for range
predicates.

Why range clustering instead of `partitionBy(day)` directories:
directory partitioning explodes the file count at fine granularity
(a 100 TB table with 10k writers x 365 days = millions of tiny
files), while `repartitionByRange(N, key)` gives exactly N
similar-sized files whose key ranges are near-disjoint — the
file count is a knob, not a consequence of key cardinality. Range
boundaries come from reservoir sampling the key
(spark.sql.execution.rangeExchange.sampleSizePerPartition), so skew
balances automatically.

At 100 TB: write with N = total_bytes / target_file_size (e.g.
512 MB files), one sorted file per task, no shuffle beyond the single
range exchange. Time-range queries then read only the overlapping
files — verified by tests/test_layout.py against the parquet footers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .tables import load_table


def write_range_clustered(
    df: DataFrame, key: str, path: str, n_files: int
) -> None:
    """Range-cluster ``df`` on ``key`` into ``n_files`` sorted parquet
    files (one per range bucket) with overwrite semantics.

    The sort within each file makes row-group min/max stats tight
    (each row group covers a narrow key slice), which is what turns
    footer statistics into an effective coarse index.
    """
    (
        df.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_lineitem_by_shipdate(
    spark: SparkSession, sf_dir: str, path: str, n_files: int = 8
) -> None:
    """Lineitem clustered by ship date — the canonical time-series
    layout: ship-date range predicates touch only overlapping files."""
    write_range_clustered(
        load_table(spark, sf_dir, "lineitem"), "l_shipdate", path, n_files
    )
