"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``map_reduce_indexing_spark.plans.registry``: every
operator module registers its queries (Spark callable + DuckDB oracle
SQL) there; this module just re-exports them in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from map_reduce_indexing_spark.plans import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full reference pipeline — normalize, build the
    inverted index (postings), and rank the global vocabulary (top-k by
    corpus frequency) — on /root/testdata/sf0.001."""
    return registry.get("index_vocabulary_topk").fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return registry.all_oracles()
