"""Bucketed co-located joins — the 100 TB shuffle-elimination posture.

At scale, fact-fact joins (lineitem x orders on orderkey) dominate
shuffle volume. Writing both sides bucketed by the join key means every
subsequent join is exchange-free: tasks zip corresponding buckets.
This test proves the engine's bucketing layout does exactly that —
the joined plan contains SortMergeJoin but NO Exchange on either side.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from map_reduce_indexing_spark.sources.tables import load_table

from .conftest import SF_DIR

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # Managed tables land in the session's default warehouse dir
    # (spark.sql.warehouse.dir is static, so it cannot be pointed at a
    # tmp dir here); DROP TABLE below removes the files.
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        tbl = f"b_{name}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            load_table(spark, SF_DIR, name)
            .write.bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(tbl)
        )
    yield "b_lineitem", "b_orders"
    for tbl in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_tbl, o_tbl = bucketed_tables
    # At test scale Catalyst would broadcast; disable it so the plan
    # shows the big-big shape bucketing exists for (at 100 TB neither
    # fact side broadcasts).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li, o = spark.table(li_tbl), spark.table(o_tbl)
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count(F.lit(1)).alias("n"))
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # neither join input re-shuffles: the bucket layout satisfies the
    # join's distribution requirement on both sides
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Bucketed: true" in plan


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    li_tbl, o_tbl = bucketed_tables
    bucketed = (
        spark.table(li_tbl)
        .join(spark.table(o_tbl), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plain = (
        load_table(spark, SF_DIR, "lineitem")
        .join(load_table(spark, SF_DIR, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))
