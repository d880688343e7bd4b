"""Misra-Gries heavy hitters (operators/heavyhitters.py).

The fixture vocabulary is tiny (31 words), so the registered queries
verify exactness but not pruning. The synthetic Zipf tests here use a
domain much larger than k * partitions, making the sketch genuinely
lossy — the guarantee (every value above n/k survives pass 1) and the
end-to-end exactness are what's asserted.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_indexing_spark.operators.heavyhitters import (
    exact_heavy_hitters,
    misra_gries_candidates,
)
from map_reduce_indexing_spark.plans import registry
from tests.conftest import SF_DIR, assert_df_matches_oracle

HH_QUERIES = ["index_heavy_hitters", "index_heavy_hitters_bigram"]


def zipf_items(spark, n_head: int = 10_000, vocab: int = 5_000, parts: int = 8):
    """Value w<i> occurs floor(n_head / i) times, i in 1..vocab —
    generated JVM-side via array_repeat + explode, then hash-scattered
    across `parts` partitions (the guarantee is partitioning-agnostic).
    """
    return (
        spark.range(1, vocab + 1)
        .select(
            F.explode(
                F.array_repeat(
                    F.concat(F.lit("w"), F.col("id")),
                    F.floor(F.lit(n_head) / F.col("id")).cast("int"),
                )
            ).alias("word")
        )
        .repartition(parts)
    )


def test_mg_pass1_guarantee_and_pruning(spark):
    items = zipf_items(spark)
    k = 100
    cands = {r["word"] for r in misra_gries_candidates(items, "word", k).distinct().collect()}
    exact = {
        r["word"]: r["cnt"]
        for r in items.groupBy("word").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n = sum(exact.values())
    # the summary is genuinely lossy on this domain...
    assert len(cands) < len(exact)
    # ...but everything above n/k is guaranteed present
    must_survive = {w for w, c in exact.items() if c >= n / k}
    assert must_survive and must_survive <= cands


def test_exact_heavy_hitters_matches_full_histogram(spark):
    items = zipf_items(spark)
    got = {
        r["word"]: r["cnt"]
        for r in exact_heavy_hitters(items, "word", 1, 50).collect()
    }
    exact = {
        r["word"]: r["cnt"]
        for r in items.groupBy("word").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n = sum(exact.values())
    thresh = -(-n // 50)  # ceil(n/50)
    want = {w: c for w, c in exact.items() if c >= thresh}
    assert want and got == want  # exact counts, exact membership


def test_heavy_hitters_empty_input(spark):
    empty = spark.createDataFrame([], "word string")
    assert exact_heavy_hitters(empty, "word").count() == 0


@pytest.mark.parametrize("name", HH_QUERIES)
def test_heavy_hitters_matches_oracle(spark, duck, name):
    q = registry.get(name)
    assert_df_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)
