"""Continuous aggregates: a matview refreshed once per microbatch
(round 9). streaming/events.py:run_continuous_aggregate lands each
microbatch as a generation of a raw store and advances the view via
the delta-only refresh.

Pinned here: every post-create refresh consumes exactly one batch's
files and one generation step; after N batches the view — including
the distinct count, whose values repeat across batches — equals the
full batch aggregate; and the exported query hash-matches its
full-table oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_indexing_spark.operators.matview import read_matview
from map_reduce_indexing_spark.sources.generations import generation_head
from map_reduce_indexing_spark.streaming.events import (
    run_continuous_aggregate,
)


def test_per_batch_refresh_lands_on_full_answer(spark, tmp_path):
    src = str(tmp_path / "src")
    store, view = str(tmp_path / "store"), str(tmp_path / "view")
    df = spark.range(300).select(
        F.col("id").alias("rid"),
        (F.col("id") % 3).cast("string").alias("k"),
        (F.col("id") % 40).alias("u"),  # users repeat across batches
        F.col("id").alias("v"),
    )
    df.repartition(3, "rid").write.parquet(src)

    reports = run_continuous_aggregate(
        spark,
        src,
        store,
        view,
        ["k"],
        {
            "n": ("count", "*"),
            "s": ("sum", "v"),
            "du": ("count_distinct", "u"),
        },
        row_keys=["rid"],
        schema=df.schema,
        checkpoint=str(tmp_path / "ckpt"),
    )
    assert len(reports) == 3  # one per microbatch (maxFilesPerTrigger=1)
    assert all(r["refreshed"] for r in reports)
    # each post-create refresh: exactly one generation step, delta files only
    for r in reports[1:]:
        assert r["to"] == r["from"] + 1
        assert 1 <= r["delta_files"] <= 2
    assert generation_head(store) == 3

    got = sorted(
        (r.k, r.n, r.s, r.du) for r in read_matview(spark, view).collect()
    )
    want = sorted(
        (r.k, r.n, r.s, r.du)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.count_distinct("u").alias("du"),
        )
        .collect()
    )
    assert got == want


def test_exported_continuous_agg_matches_oracle(spark, duck):
    from map_reduce_indexing_spark.plans.registry import get
    from map_reduce_indexing_spark.streaming.events import (
        q_stream_continuous_agg,
    )

    from .conftest import SF_DIR, assert_df_matches_oracle

    assert_df_matches_oracle(
        q_stream_continuous_agg(spark, SF_DIR),
        duck,
        get("stream_continuous_agg").oracle,
    )
