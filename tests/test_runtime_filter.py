"""Runtime bloom-filter join pruning (SCALING.md §runtime-filters).

At 100 TB the dominant join cost is scanning + shuffling the fact side
for keys that a selective dimension filter will later discard. Spark's
runtime filtering (InjectRuntimeFilter) builds a bloom filter from the
filtered creation side and pushes a `might_contain` bloom probe into
the application side's scan stage, discarding non-joinable rows BEFORE
the shuffle. This is free to us — it requires only that queries stay
declarative (no opaque UDF between scan and join) — but it's a load-
bearing scale property, so this test proves the engine's query shapes
actually admit the injection rather than assuming it.

Thresholds are lowered because the defaults (10 GB application-side
scan) target real clusters, not a fixture.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_indexing_spark.sources.tables import load_table
from tests.conftest import SF_DIR

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "50MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
    # Force a shuffle join: runtime filters target the pre-shuffle scan.
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def bloom_spark(spark):
    old = {}
    for k, v in _CONFS.items():
        old[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_selective_dim_join_gets_bloom_filter(bloom_spark):
    spark = bloom_spark
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    optimized = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in optimized, optimized[:2000]
    assert "bloom_filter_agg" in optimized, optimized[:2000]
    # And the filtered result is still correct.
    n = joined.collect()
    assert len(n) == 1 and n[0]["n"] > 0


def test_bloom_filter_preserves_join_result(bloom_spark):
    spark = bloom_spark
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    with_filter = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        without = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    assert with_filter == without
