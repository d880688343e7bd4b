"""Row-level predicate DELETE on generations stores (round 10).

sources/generations.py:delete_rows — the copy-on-write DELETE:
manifest stats prune the live listing to the possibly-affected files,
only those are rewritten (hardlinked survivors keep their stats and
bloom sidecars), the result publishes as a new generation under the
staged swap. Pinned here: exactness vs a filtered recompute, file-level
pruning (untouched files survive BY NAME), the exact deleted_rows
report, pinned readers' snapshot isolation, CDF delete emission, and
matview refresh == rebuild across the delete span.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from map_reduce_indexing_spark.sources.generations import (
    delete_rows,
    generation_changes,
    generation_head,
    publish_generation,
    read_generation,
)


def _rows(spark, lo: int, n: int):
    return spark.createDataFrame(
        [(lo + i, (lo + i) % 4, f"u{(lo + i) % 5}", (lo + i) * 10)
         for i in range(n)],
        "rid long, bucket long, user string, v long",
    )


def _data_files(path: str) -> set[str]:
    out = set()
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if not f.startswith(("_", ".")) and not f.endswith(".crc"):
                out.add(os.path.relpath(os.path.join(root, f), path))
    return out


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_delete_exact_and_reported(spark, tmp_path):
    base = str(tmp_path / "b")
    _rows(spark, 0, 40).coalesce(2).write.parquet(base)
    publish_generation(base)
    before = read_generation(spark, base)
    want = _sorted_rows(before.filter(~(F.col("v") >= 200)))
    n_match = before.filter(F.col("v") >= 200).count()

    report = delete_rows(spark, base, [("v", ">=", 200)])
    assert report["deleted_rows"] == n_match
    assert report["generation"] == generation_head(base)
    assert _sorted_rows(read_generation(spark, base)) == want
    # the live (non-generation) read agrees too
    assert _sorted_rows(spark.read.parquet(base)) == want


def test_delete_prunes_untouched_files(spark, tmp_path):
    """rid is written range-clustered, so a rid-range delete rewrites
    only the overlapping file(s); the others survive BY NAME (hardlink,
    not rewrite) and keep their manifest stats."""
    base = str(tmp_path / "b")
    # 4 files, rid-disjoint: [0..9], [10..19], [20..29], [30..39]
    for lo in (0, 10, 20, 30):
        _rows(spark, lo, 10).coalesce(1).write.mode("append").parquet(base)
    publish_generation(base)
    files_before = _data_files(base)
    assert len(files_before) == 4

    report = delete_rows(spark, base, [("rid", "between", (12, 17))])
    assert report["rewritten_files"] == 1
    assert report["kept_files"] == 3
    assert report["deleted_rows"] == 6
    files_after = _data_files(base)
    assert len(files_before & files_after) == 3  # survivors kept by name
    got = _sorted_rows(read_generation(spark, base))
    want = _sorted_rows(
        _rows(spark, 0, 40).filter(
            ~F.col("rid").between(12, 17)
        )
    )
    assert got == want


def test_delete_null_predicate_rows_are_kept(spark, tmp_path):
    """SQL DELETE semantics: a NULL predicate is not-matched — the row
    stays."""
    base = str(tmp_path / "b")
    spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "rid long, tag string"
    ).coalesce(1).write.parquet(base)
    publish_generation(base)
    report = delete_rows(spark, base, [("tag", "=", "a")])
    assert report["deleted_rows"] == 1
    got = _sorted_rows(read_generation(spark, base).select("rid"))
    assert got == [(2,), (3,)]


def test_delete_noop_when_predicate_provably_empty(spark, tmp_path):
    base = str(tmp_path / "b")
    _rows(spark, 0, 20).coalesce(1).write.parquet(base)
    publish_generation(base)
    g = generation_head(base)
    report = delete_rows(spark, base, [("v", ">=", 10_000)])
    assert report["rewritten_files"] == 0
    assert report["deleted_rows"] == 0
    assert generation_head(base) == g  # no new generation published


def test_pinned_reader_unaffected_by_delete(spark, tmp_path):
    base = str(tmp_path / "b")
    _rows(spark, 0, 30).coalesce(2).write.parquet(base)
    publish_generation(base)
    pre = generation_head(base)
    before = _sorted_rows(read_generation(spark, base, at=pre))
    delete_rows(spark, base, [("bucket", "=", 1)])
    # the pre-delete snapshot still serves every row
    assert _sorted_rows(read_generation(spark, base, at=pre)) == before
    assert len(_sorted_rows(read_generation(spark, base))) < len(before)


def test_delete_emits_cdf_deletes(spark, tmp_path):
    base = str(tmp_path / "b")
    _rows(spark, 0, 30).coalesce(2).write.parquet(base)
    publish_generation(base)
    pre = generation_head(base)
    report = delete_rows(spark, base, [("bucket", "=", 2)])
    ch = generation_changes(
        spark, base, since=pre, until=report["generation"],
        key_cols=("rid",),
    )
    got = sorted(
        (r.rid, r.change_type) for r in ch.collect()
    )
    want = sorted(
        (rid, "delete") for rid in range(30) if rid % 4 == 2
    )
    assert got == want


def test_delete_publishes_pending_appends_first(spark, tmp_path):
    """Unpublished appended files are pinned as their own generation
    before the delete, so the delete span is exactly one generation."""
    base = str(tmp_path / "b")
    _rows(spark, 0, 10).coalesce(1).write.parquet(base)
    publish_generation(base)
    _rows(spark, 10, 10).coalesce(1).write.mode("append").parquet(base)
    # no publish of the append
    report = delete_rows(spark, base, [("rid", ">=", 15)])
    assert report["generation"] == 3  # 1 (base) + 2 (auto-pin) + 3 (delete)
    assert report["deleted_rows"] == 5
    got = _sorted_rows(read_generation(spark, base).select("rid"))
    assert got == [(i,) for i in range(15)]


def test_delete_on_hive_partitioned_store(spark, tmp_path):
    base = str(tmp_path / "b")
    _rows(spark, 0, 40).write.partitionBy("bucket").parquet(base)
    publish_generation(base)
    files_before = _data_files(base)
    delete_rows(spark, base, [("bucket", "=", 1), ("v", ">=", 200)])
    files_after = _data_files(base)
    # partition-dir pruning: every file outside bucket=1 survives BY
    # NAME; only bucket=1 files were rewritten
    untouched = {f for f in files_before if "bucket=1" not in f}
    assert untouched <= files_after
    got = _sorted_rows(read_generation(spark, base).select("rid"))
    want = _sorted_rows(
        _rows(spark, 0, 40)
        .filter(~((F.col("bucket") == 1) & (F.col("v") >= 200)))
        .select("rid")
    )
    assert got == want
    # the partition column survives the rewrite
    cols = set(read_generation(spark, base).columns)
    assert "bucket" in cols


def test_matview_refresh_across_delete_rebuilds_exact(spark, tmp_path):
    from map_reduce_indexing_spark.operators.matview import (
        create_matview,
        read_matview,
        refresh_matview,
    )

    base, view = str(tmp_path / "b"), str(tmp_path / "v")
    _rows(spark, 0, 40).coalesce(2).write.parquet(base)
    publish_generation(base)
    create_matview(
        spark, base, view, ["bucket"],
        {"n": ("count", "*"), "total": ("sum", "v"), "hi": ("max", "v")},
    )
    delete_rows(spark, base, [("v", ">=", 250)])
    report = refresh_matview(spark, view)
    assert report["mode"] == "rebuild"  # min/max not retractable
    got = sorted(tuple(r) for r in read_matview(spark, view).collect())
    want = sorted(
        tuple(r)
        for r in read_generation(spark, base)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.max("v").alias("hi"),
        )
        .collect()
    )
    assert got == want


def test_delete_requires_predicate(spark, tmp_path):
    base = str(tmp_path / "b")
    _rows(spark, 0, 5).coalesce(1).write.parquet(base)
    publish_generation(base)
    with pytest.raises(ValueError, match="predicate"):
        delete_rows(spark, base, [])


@pytest.fixture(autouse=True)
def _both_io_backends(io_backend):
    """Round 11: every test in this module runs under BOTH commit
    backends (see conftest.io_backend) — POSIX and object-store CAS."""
