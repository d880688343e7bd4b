"""Bounded storage for query-tier localCheckpoints (r15).

The r14 verdict flagged that eager localCheckpoints inside query
builders pin one materialized RDD per CALL in executor storage for the
session's lifetime. These tests pin the fix: rotation keeps at most
ROTATE_KEEP generations per site, iterative loops release prior
rounds, and — the part that must never regress — the newest frames
stay executable after rotation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_indexing_spark.checkpoints import (
    ROTATE_KEEP,
    release_local_checkpoint,
    rotating_local_checkpoint,
)

SF_DIR = "/root/testdata/sf0.001"


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_rotation_bounds_per_site_storage(spark):
    base = _n_persistent(spark)
    df = spark.range(0, 100).selectExpr("id", "id % 3 AS k")
    frames = [
        rotating_local_checkpoint(df, "test.rotation.site") for _ in range(5)
    ]
    assert _n_persistent(spark) - base <= ROTATE_KEEP
    # the kept generations still execute; values unchanged
    assert frames[-1].count() == 100
    assert frames[-2].count() == 100
    for f in frames[-ROTATE_KEEP:]:
        release_local_checkpoint(f)
    assert _n_persistent(spark) == base


def test_release_frees_blocks_and_lazy_checkpoints(spark):
    base = _n_persistent(spark)
    eager = spark.range(0, 10).localCheckpoint(eager=True)
    lazy = spark.range(0, 10).localCheckpoint(eager=False)
    assert lazy.count() == 10  # materializes the lazy one
    assert _n_persistent(spark) - base == 2
    release_local_checkpoint(eager)
    release_local_checkpoint(lazy)
    assert _n_persistent(spark) == base


def test_iterative_queries_do_not_accumulate_round_checkpoints(spark):
    """dedup_clusters and pagerank release per-round checkpoints: two
    full calls must not leave more blocks pinned than the final
    frames' own checkpoints (bounded per call, not per round)."""
    from map_reduce_indexing_spark.plans import registry

    base = _n_persistent(spark)
    fn = registry.get("dedup_clusters").fn
    n1 = fn(spark, SF_DIR).count()
    after_one = _n_persistent(spark) - base
    n2 = fn(spark, SF_DIR).count()
    after_two = _n_persistent(spark) - base
    assert n1 == n2 > 0
    # each call pins at most its final-round checkpoint (+1 slack for
    # artifact-layer checkpoints created on the first call)
    assert after_two - after_one <= 2, (after_one, after_two)


def test_rotated_query_is_rebuild_safe(spark):
    """The bench/oracle pattern — build, execute, rebuild, execute —
    must stay correct under rotation for a rotated query site."""
    from map_reduce_indexing_spark.plans import registry

    fn = registry.get("dedup_simhash").fn
    a = fn(spark, SF_DIR).count()
    b = fn(spark, SF_DIR).count()
    c = fn(spark, SF_DIR).count()
    assert a == b == c
