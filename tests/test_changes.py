"""Row-level change feed between generations (round 9).

`generation_changes` (sources/generations.py) classifies every row as
insert / delete / update between two snapshots via one full-outer
join on row keys — the Delta-CDF shape, answering the reconciliation
question `generation_diff` refuses when a span rewrote rows.

Pinned here: exact four-way classification on a store whose rewrite
inserts, deletes, updates, AND leaves rows untouched (untouched rows
must not appear); updates emit both images; null-safe value compare
(None -> value and value -> None are updates, None -> None is not);
compare_cols narrows detection; missing key_cols refuses.
"""

from __future__ import annotations

import os

import pytest

from map_reduce_indexing_spark.sources.generations import (
    generation_changes,
    publish_generation,
)


def _write_rows(spark, path: str, rows, mode="overwrite"):
    df = spark.createDataFrame(rows, "k long, val string, score long")
    df.coalesce(1).write.mode(mode).parquet(path)


def _rewrite_live(base: str, keep_fn):
    """Remove current data files (manifest/_gen untouched) so the next
    write is a full rewrite — simulates a rewriting maintenance job."""
    for f in os.listdir(base):
        p = os.path.join(base, f)
        if os.path.isfile(p) and not f.startswith(("_", ".")):
            os.remove(p)


def test_change_feed_classifies_exactly(spark, tmp_path):
    base = str(tmp_path / "b")
    gen1 = [
        (1, "a", 10),
        (2, "b", 20),
        (3, "c", 30),  # will be deleted
        (5, "e", 50),  # value update
        (6, None, 60),  # None -> value update
        (7, "g", 70),  # value -> None update
        (8, "h", None),  # None score stays None: NOT a change
    ]
    _write_rows(spark, base, gen1)
    publish_generation(base)
    gen2 = [
        (1, "a", 10),  # untouched
        (2, "b", 20),  # untouched
        (5, "E", 50),
        (6, "f", 60),
        (7, None, 70),
        (8, "h", None),  # untouched (null == null under eqNullSafe)
        (9, "new", 90),  # insert
    ]
    _rewrite_live(base, None)
    _write_rows(spark, base, gen2, mode="append")
    publish_generation(base)

    ch = generation_changes(spark, base, since=1, until=2, key_cols=("k",))
    got = sorted((r.k, r.change_type, r.val) for r in ch.collect())
    assert got == [
        (3, "delete", "c"),
        (5, "update_postimage", "E"),
        (5, "update_preimage", "e"),
        (6, "update_postimage", "f"),
        (6, "update_preimage", None),
        (7, "update_postimage", None),
        (7, "update_preimage", "g"),
        (9, "insert", "new"),
    ]

    # compare_cols narrows: only `score` matters -> no updates at all
    ch2 = generation_changes(
        spark, base, since=1, until=2, key_cols=("k",),
        compare_cols=("score",),
    )
    got2 = sorted((r.k, r.change_type) for r in ch2.collect())
    assert got2 == [(3, "delete"), (9, "insert")]

    with pytest.raises(ValueError, match="key_cols"):
        generation_changes(spark, base, since=1, until=2)


def test_change_feed_empty_on_identical_snapshots(spark, tmp_path):
    base = str(tmp_path / "b")
    _write_rows(spark, base, [(1, "a", 1), (2, "b", 2)])
    publish_generation(base)
    publish_generation(base)  # same files, new generation
    ch = generation_changes(spark, base, since=1, until=2, key_cols=("k",))
    assert ch.count() == 0
