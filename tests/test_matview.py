"""Incremental materialized aggregates over generations (round 9).

operators/matview.py maintains a partial-aggregate view pinned to a
base generation; refresh merges the partials of exactly the rows added
since the pin. Pinned here: refresh == full recompute bit-for-bit
after every append; the append-span refresh scans ONLY the delta
files; a no-op refresh is a no-op; a compaction-crossing span falls
back to the exact row-key anti-join (or refuses without row keys);
count/sum/min/max and null-skipping count(col) all merge correctly.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from map_reduce_indexing_spark.operators.matview import (
    create_matview,
    read_matview,
    refresh_matview,
)
from map_reduce_indexing_spark.sources.generations import (
    publish_generation,
    read_generation,
)

AGGS = {
    "n": ("count", "*"),
    "n_tag": ("count", "tag"),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _chunk(spark, lo: int, n: int):
    rows = [
        (lo + i, f"g{(lo + i) % 3}", (lo + i) * 10,
         None if (lo + i) % 4 == 0 else f"t{i}")
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "rid long, grp string, v long, tag string"
    )


def _full(spark, base: str):
    return sorted(
        tuple(r)
        for r in read_generation(spark, base)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("tag").alias("n_tag"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    )


def _view_rows(spark, view: str):
    return sorted(tuple(r) for r in read_matview(spark, view).collect())


def test_refresh_equals_full_recompute_per_append(spark, tmp_path):
    base = str(tmp_path / "base")
    view = str(tmp_path / "view")
    _chunk(spark, 0, 30).coalesce(2).write.parquet(base)
    publish_generation(base)
    create_matview(
        spark, base, view, ["grp"], AGGS, row_keys=["rid"]
    )
    assert _view_rows(spark, view) == _full(spark, base)

    for lo in (30, 60):
        _chunk(spark, lo, 15).coalesce(1).write.mode("append").parquet(base)
        publish_generation(base)
        report = refresh_matview(spark, view)
        assert report["refreshed"] is True
        assert report["delta_files"] == 1  # ONLY the appended file scanned
        assert _view_rows(spark, view) == _full(spark, base)


def test_noop_refresh(spark, tmp_path):
    base, view = str(tmp_path / "b"), str(tmp_path / "v")
    _chunk(spark, 0, 10).coalesce(1).write.parquet(base)
    publish_generation(base)
    create_matview(spark, base, view, ["grp"], AGGS)
    before = _view_rows(spark, view)
    report = refresh_matview(spark, view)
    assert report == {
        "from": 1, "to": 1, "delta_files": 0, "refreshed": False
    }
    assert _view_rows(spark, view) == before


def test_refresh_across_compaction_antijoin_fallback(spark, tmp_path):
    base, view = str(tmp_path / "b"), str(tmp_path / "v")
    _chunk(spark, 0, 20).coalesce(2).write.parquet(base)
    publish_generation(base)
    create_matview(spark, base, view, ["grp"], AGGS, row_keys=["rid"])

    # a compaction-style rewrite: same rows + 10 new, all files renamed
    merged = read_generation(spark, base).unionByName(_chunk(spark, 500, 10))
    staged = str(tmp_path / "staged")
    merged.coalesce(1).write.parquet(staged)
    for f in os.listdir(base):
        if not f.startswith(("_", ".")) and os.path.isfile(
            os.path.join(base, f)
        ):
            os.remove(os.path.join(base, f))
    for f in os.listdir(staged):
        if not f.startswith(("_", ".")):
            os.rename(os.path.join(staged, f), os.path.join(base, f))
    publish_generation(base)

    report = refresh_matview(spark, view)
    assert report["refreshed"] is True
    assert report["delta_files"] == -1  # the anti-join fallback
    assert _view_rows(spark, view) == _full(spark, base)


def test_compaction_span_without_row_keys_refuses(spark, tmp_path):
    base, view = str(tmp_path / "b"), str(tmp_path / "v")
    _chunk(spark, 0, 10).coalesce(1).write.parquet(base)
    publish_generation(base)
    create_matview(spark, base, view, ["grp"], AGGS)  # no row_keys
    data = [
        f for f in os.listdir(base)
        if not f.startswith(("_", ".")) and f.endswith(".parquet")
    ]
    os.rename(
        os.path.join(base, data[0]), os.path.join(base, "part-rewritten.parquet")
    )
    publish_generation(base)
    with pytest.raises(ValueError, match="compaction"):
        refresh_matview(spark, view)


def test_unsupported_agg_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported"):
        create_matview(
            spark,
            str(tmp_path / "b"),
            str(tmp_path / "v"),
            ["grp"],
            {"bad": ("avg", "v")},
        )


def test_exported_matview_query_matches_oracle(spark, duck):
    from map_reduce_indexing_spark.operators.relational_extra import (
        q_rel_matview_refresh,
    )
    from map_reduce_indexing_spark.plans.registry import get

    from .conftest import SF_DIR, assert_df_matches_oracle

    assert_df_matches_oracle(
        q_rel_matview_refresh(spark, SF_DIR),
        duck,
        get("rel_matview_refresh").oracle,
    )
