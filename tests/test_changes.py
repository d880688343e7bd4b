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


def test_change_feed_scans_only_differing_files(spark, tmp_path):
    """Round 10: the change feed restricts each side to the files NOT
    shared between the snapshots (immutable files — shared rel+size =
    identical rows), so a 1-of-4-file upsert joins one file's two
    versions, never the store. Pinned: (a) the restricted result
    equals a manual full-outer reconciliation of the FULL snapshots,
    (b) the physical scan reads no shared file."""
    import os as _o

    from map_reduce_indexing_spark.sources.generations import (
        upsert_rows,
    )

    base = str(tmp_path / "b")
    for lo in (0, 10, 20, 30):
        spark.createDataFrame(
            [(lo + i, (lo + i) * 10) for i in range(10)],
            "rid long, v long",
        ).coalesce(1).write.mode("append").parquet(base)
    publish_generation(base)
    upd = spark.createDataFrame(
        [(12, 999), (13, 999), (100, 1)], "rid long, v long"
    )
    rep = upsert_rows(spark, base, upd, ["rid"])
    assert rep["rewritten_files"] == 1  # rid-disjoint layout

    ch = generation_changes(spark, base, since=1, key_cols=("rid",))
    got = sorted((r.rid, r.change_type, r.v) for r in ch.collect())
    assert got == [
        (12, "update_postimage", 999),
        (12, "update_preimage", 120),
        (13, "update_postimage", 999),
        (13, "update_preimage", 130),
        (100, "insert", 1),
    ]
    # physical restriction: the three untouched files appear in NEITHER
    # side's scan
    scanned = {_o.path.basename(f) for f in ch.inputFiles()}
    from map_reduce_indexing_spark.sources.generations import load_manifest

    m = load_manifest(base)
    g1, g2 = m["gens"]["1"], m["gens"]["2"]
    shared = set(g1["files"]) & set(g2["files"])
    assert len(shared) == 3
    assert all(_o.path.basename(r) not in scanned for r in shared)


def test_change_feed_restriction_handles_pure_append_and_pure_rewrite(
    spark, tmp_path
):
    from map_reduce_indexing_spark.sources.generations import delete_rows

    base = str(tmp_path / "b")
    spark.createDataFrame(
        [(i, i * 10) for i in range(10)], "rid long, v long"
    ).coalesce(1).write.parquet(base)
    publish_generation(base)
    # pure append: old side is empty after restriction
    spark.createDataFrame(
        [(100, 1)], "rid long, v long"
    ).coalesce(1).write.mode("append").parquet(base)
    publish_generation(base)
    ch = generation_changes(spark, base, since=1, until=2, key_cols=("rid",))
    assert [(r.rid, r.change_type) for r in ch.collect()] == [
        (100, "insert")
    ]
    # delete spanning the whole store: every file differs
    delete_rows(spark, base, [("rid", ">=", 0)])
    ch2 = generation_changes(spark, base, since=2, key_cols=("rid",))
    assert ch2.filter(ch2.change_type != "delete").count() == 0
    assert ch2.count() == 11


def test_changes_plan_memo_identity_and_invalidation(spark, tmp_path):
    """r14 optimization: generation_changes memoizes the resolved CDF
    plan per (span, keys, manifest identity) — the read_generation
    memo discipline applied to the change feed. A repeated identical
    call is a memo HIT (no manifest re-walk, no reader rebuild); any
    commit invalidates so the next call resolves the new head; a
    pinned span keeps serving the same frame. The memoized object is
    LAZY — no data or results are cached."""
    base = str(tmp_path / "b")
    _write_rows(spark, base, [(1, "a", 1), (2, "b", 2)])
    publish_generation(base)
    _write_rows(spark, base, [(3, "c", 3)], mode="append")
    publish_generation(base)

    a = generation_changes(spark, base, since=1, until=2, key_cols=("k",))
    b = generation_changes(spark, base, since=1, until=2, key_cols=("k",))
    assert b is a  # memo hit on the identical span
    assert sorted((r.k, r.change_type) for r in a.collect()) == [
        (3, "insert")
    ]
    # different args are different plans
    c = generation_changes(
        spark, base, since=1, until=2, key_cols=("k",), compare_cols=("val",)
    )
    assert c is not a

    # a commit invalidates: same call re-resolves against the new manifest
    _write_rows(spark, base, [(4, "d", 4)], mode="append")
    publish_generation(base)
    d = generation_changes(spark, base, since=1, until=2, key_cols=("k",))
    assert d is not a
    e = generation_changes(spark, base, since=1, key_cols=("k",))
    assert sorted((r.k, r.change_type) for r in e.collect()) == [
        (3, "insert"),
        (4, "insert"),
    ]


def test_diff_plan_memo_identity_and_invalidation(spark, tmp_path):
    """r15: generation_diff joins the same resolved-plan memo family —
    hit on the identical span, invalidated by any commit, lazy only."""
    from map_reduce_indexing_spark.sources.generations import (
        generation_diff,
    )

    base = str(tmp_path / "d")
    _write_rows(spark, base, [(1, "a", 1), (2, "b", 2)])
    publish_generation(base)
    _write_rows(spark, base, [(3, "c", 3)], mode="append")
    publish_generation(base)

    a = generation_diff(spark, base, since=1, until=2)
    b = generation_diff(spark, base, since=1, until=2)
    assert b is a  # memo hit
    assert sorted(r.k for r in a.collect()) == [3]
    # a commit invalidates; the open-ended span sees the new delta
    _write_rows(spark, base, [(4, "d", 4)], mode="append")
    publish_generation(base)
    c = generation_diff(spark, base, since=1, until=2)
    assert c is not a
    assert sorted(r.k for r in generation_diff(spark, base, since=1).collect()) == [3, 4]
