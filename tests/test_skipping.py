"""Manifest-level file skipping (round 9 second wave).

Publishing a generation records each immutable file's footer min/max
(plus Hive partition-dir values) in `_generations.json`;
`plan_generation_scan` prunes a predicate's file list from that one
manifest read, and `read_generation(where=...)` is proven EXACTLY
equal to the unpruned read + filter — pruning drops only files whose
bounds prove no row can match.

Pinned here: pruning actually bites on a range-clustered store (kept
file count asserted), never changes results on any column (clustered,
unclustered, partition-dir, all-null), carries stats forward across
appends without re-reading old footers, recomputes them across the
compaction rewrite, and an all-pruned predicate still returns an
empty frame with the store's schema.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from map_reduce_indexing_spark.sources import generations as G
from map_reduce_indexing_spark.sources.generations import (
    plan_generation_scan,
    publish_generation,
    read_generation,
)
from map_reduce_indexing_spark.sources.layout import write_range_clustered

from .conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _clustered_store(spark, tmp_path) -> str:
    path = str(tmp_path / "orders_rc")
    from map_reduce_indexing_spark.sources.tables import load_table

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    write_range_clustered(o, "o_orderdate", path, 8)
    publish_generation(path)
    return path


def test_range_predicate_prunes_and_stays_exact(spark, tmp_path):
    path = _clustered_store(spark, tmp_path)
    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1996, 12, 31)
    where = [("o_orderdate", "between", (lo, hi))]
    _root, kept, total = plan_generation_scan(path, where=where)
    assert total == 8
    assert 0 < len(kept) < total  # skipping bites on the clustered key
    pruned = read_generation(spark, path, where=where)
    full = read_generation(spark, path).filter(
        (F.col("o_orderdate") >= F.lit(lo)) & (F.col("o_orderdate") <= F.lit(hi))
    )
    assert _rows(pruned) == _rows(full)
    assert pruned.count() > 0  # non-vacuous


def test_point_predicates_prune_and_stay_exact(spark, tmp_path):
    path = _clustered_store(spark, tmp_path)
    lo = datetime.datetime(1995, 3, 1)
    hi = datetime.datetime(2000, 6, 1)
    for where, pred in [
        ([("o_orderdate", "<", lo)], F.col("o_orderdate") < F.lit(lo)),
        ([("o_orderdate", ">=", hi)], F.col("o_orderdate") >= F.lit(hi)),
        (
            [("o_orderdate", "in", [lo, datetime.datetime(1999, 7, 4)])],
            F.col("o_orderdate").isin([lo, datetime.datetime(1999, 7, 4)]),
        ),
    ]:
        _r, kept, total = plan_generation_scan(path, where=where)
        assert len(kept) < total
        assert _rows(read_generation(spark, path, where=where)) == _rows(
            read_generation(spark, path).filter(pred)
        )


def test_boundary_equality_never_pruned(spark, tmp_path):
    """A predicate equal to a file's exact min/max must keep that file:
    the tz-aware footer string vs naive predicate string mismatch would
    have pruned it (regression pin for the _norm_stat UTC
    normalization)."""
    path = _clustered_store(spark, tmp_path)
    # the store's global min date is a file-boundary value by construction
    lo = read_generation(spark, path).agg(F.min("o_orderdate")).collect()[0][0]
    got = read_generation(spark, path, where=[("o_orderdate", "=", lo)])
    want = read_generation(spark, path).filter(F.col("o_orderdate") == F.lit(lo))
    assert _rows(got) == _rows(want)
    assert got.count() > 0


def test_unclustered_column_never_wrongly_pruned(spark, tmp_path):
    path = _clustered_store(spark, tmp_path)
    where = [("o_orderpriority", "=", "1-URGENT")]
    pruned = read_generation(spark, path, where=where)
    full = read_generation(spark, path).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    assert _rows(pruned) == _rows(full)
    assert pruned.count() > 0


def test_conjunction_prunes_on_both_columns(spark, tmp_path):
    path = _clustered_store(spark, tmp_path)
    lo = datetime.datetime(2000, 1, 1)
    where = [
        ("o_orderdate", ">=", lo),
        ("o_orderkey", ">", 10**12),  # footer bound proves empty
    ]
    _r, kept, _t = plan_generation_scan(path, where=where)
    assert kept == []  # the orderkey bound kills even the date-kept files
    df = read_generation(spark, path, where=where)
    assert df.count() == 0
    assert set(df.columns) == {"o_orderkey", "o_orderpriority", "o_orderdate"}


def test_partition_dir_equality_prunes(spark, tmp_path):
    path = str(tmp_path / "parts")
    df = spark.createDataFrame(
        [(c, i) for i, c in enumerate("aabbccdd")], "letter string, v long"
    )
    df.write.partitionBy("letter").parquet(path)
    publish_generation(path)
    _r, kept, total = plan_generation_scan(path, where=[("letter", "=", "b")])
    assert len(kept) < total
    assert all("letter=b" in f for f in kept)
    got = read_generation(spark, path, where=[("letter", "=", "b")])
    assert sorted(r.v for r in got.collect()) == [2, 3]


def test_stats_carry_forward_skips_old_footers(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "append_store")
    spark.range(0, 100).withColumn("k", F.col("id")).coalesce(3).write.parquet(
        path
    )
    calls: list[str] = []
    real = G.file_column_stats
    monkeypatch.setattr(
        G, "file_column_stats", lambda p: calls.append(p) or real(p)
    )
    publish_generation(path)
    first = len(calls)
    assert first >= 3  # every file footer read once
    spark.range(100, 110).withColumn("k", F.col("id")).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    publish_generation(path)
    assert len(calls) == first + 1  # ONLY the appended file's footer


def test_stats_recomputed_across_compaction(spark, tmp_path):
    from map_reduce_indexing_spark.api import IndexSession

    docs = spark.createDataFrame(
        [(i, "alpha beta") for i in range(6)], "doc_id long, text string"
    )
    s = IndexSession.build(spark, docs, str(tmp_path / "idx"))
    s.append(
        spark.createDataFrame(
            [(100 + i, "gamma delta") for i in range(4)],
            "doc_id long, text string",
        )
    )
    s.compact()
    m = G.load_manifest(s.index_path)
    head = m["gens"][str(m["head"])]
    assert head["stats"], "compacted generation carries fresh stats"
    # letter partition pruning post-compaction, exact vs live filter
    got = read_generation(spark, s.index_path, where=[("letter", "=", "g")])
    live = s.postings().filter(F.col("word") == "gamma")
    assert {(r.word, r.doc_id) for r in got.collect()} >= {
        (r.word, r.doc_id) for r in live.collect()
    }
    _r, kept, total = plan_generation_scan(
        s.index_path, where=[("letter", "=", "g")]
    )
    assert 0 < len(kept) < total


def test_all_null_column_file_is_kept_and_exact(spark, tmp_path):
    path = str(tmp_path / "nullable")
    spark.createDataFrame(
        [(1, None), (2, None)], "id long, tag string"
    ).coalesce(1).write.parquet(path)
    spark.createDataFrame(
        [(3, "x"), (4, "y")], "id long, tag string"
    ).coalesce(1).write.mode("append").parquet(path)
    publish_generation(path)
    got = read_generation(spark, path, where=[("tag", "=", "x")])
    assert [tuple(r) for r in got.collect()] == [(3, "x")]


def test_exported_pruned_scan_matches_oracle_and_prunes(spark, duck):
    from map_reduce_indexing_spark.operators.relational_extra import (
        orders_snapshot_store,
        q_rel_snapshot_pruned_scan,
    )
    from map_reduce_indexing_spark.plans.registry import get

    from .conftest import assert_df_matches_oracle

    assert_df_matches_oracle(
        q_rel_snapshot_pruned_scan(spark, SF_DIR),
        duck,
        get("rel_snapshot_pruned_scan").oracle,
    )
    path = orders_snapshot_store(spark, SF_DIR)
    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 12, 31)
    _r, kept, total = plan_generation_scan(
        path, where=[("o_orderdate", "between", (lo, hi))]
    )
    assert total == 16
    assert 0 < len(kept) <= 4  # ~1 year of a 6.6-year range


def test_no_stats_manifest_still_reads(spark, tmp_path):
    """A manifest written before the stats field existed (or a file
    pyarrow can't stat) must degrade to keep-everything, not fail."""
    path = str(tmp_path / "legacy")
    spark.range(0, 10).coalesce(1).write.parquet(path)
    publish_generation(path)
    m = G.load_manifest(path)
    for g in m["gens"].values():
        g.pop("stats", None)
    G._save_manifest(path, m)
    got = read_generation(spark, path, where=[("id", "<", 5)])
    assert sorted(r.id for r in got.collect()) == [0, 1, 2, 3, 4]


def test_or_predicates_prune_and_stay_exact(spark, tmp_path):
    """CNF: an element that is a LIST of triples is the OR of its
    branches — a file survives if ANY branch might match, rows filter
    by the same disjunction."""
    from pyspark.sql import functions as F

    from map_reduce_indexing_spark.sources.generations import (
        plan_generation_scan,
        publish_generation,
        read_generation,
    )

    base = str(tmp_path / "b")
    spark.range(10_000).select(F.col("id").alias("k")).repartitionByRange(
        10, "k"
    ).write.parquet(base)
    publish_generation(base)

    pred = [[("k", "between", (100, 199)), ("k", "between", (8_500, 8_599))]]
    _r, kept, total = plan_generation_scan(base, where=pred)
    assert total == 10
    assert 2 <= len(kept) <= 4  # both islands' files, nothing else
    got = sorted(r.k for r in read_generation(spark, base, where=pred).collect())
    assert got == list(range(100, 200)) + list(range(8_500, 8_600))

    # OR combined with an AND term narrows further
    pred2 = [
        [("k", "between", (100, 199)), ("k", "between", (8_500, 8_599))],
        ("k", ">=", 8_000),
    ]
    _r, kept2, _ = plan_generation_scan(base, where=pred2)
    assert len(kept2) < len(kept)
    got2 = sorted(r.k for r in read_generation(spark, base, where=pred2).collect())
    assert got2 == list(range(8_500, 8_600))


def test_metadata_only_row_counts(spark, tmp_path):
    """COUNT(*) served from the manifest's recorded footer counts —
    exact at every generation, including one whose manifest predates
    the rows field (falls back to a footer read, still no Spark)."""
    from map_reduce_indexing_spark.sources.generations import (
        generation_row_count,
        load_manifest,
        publish_generation,
        read_generation,
    )
    import map_reduce_indexing_spark.sources.generations as G
    import json, os

    base = str(tmp_path / "b")
    spark.range(1234).coalesce(3).write.parquet(base)
    publish_generation(base)
    spark.range(1234, 1500).coalesce(1).write.mode("append").parquet(base)
    publish_generation(base)

    assert generation_row_count(base, at=1) == 1234
    assert generation_row_count(base) == 1500
    assert generation_row_count(base) == read_generation(spark, base).count()

    # legacy manifest without the rows field: footer fallback
    m = load_manifest(base)
    for g in m["gens"].values():
        for e in (g.get("stats") or {}).values():
            e.pop("rows", None)
    with open(os.path.join(base, G.GEN_FILE), "w") as fh:
        json.dump(m, fh)
    assert generation_row_count(base, at=1) == 1234


def test_schema_evolution_across_generations(spark, tmp_path):
    """A later append adds a column: merge_schema=True serves the
    union schema (old files NULL for the new column) at the head, and
    the earlier generation — pinned — still serves its own narrower
    schema."""
    from pyspark.sql import functions as F

    from map_reduce_indexing_spark.sources.generations import (
        publish_generation,
        read_generation,
    )

    base = str(tmp_path / "b")
    spark.range(5).select(F.col("id").alias("k")).coalesce(1).write.parquet(
        base
    )
    publish_generation(base)
    spark.range(5, 8).select(
        F.col("id").alias("k"), F.lit("en").alias("lang")
    ).coalesce(1).write.mode("append").parquet(base)
    publish_generation(base)

    head = read_generation(spark, base, merge_schema=True)
    assert set(head.columns) == {"k", "lang"}
    rows = {r.k: r.lang for r in head.collect()}
    assert rows[0] is None and rows[7] == "en"
    assert read_generation(spark, base, at=1).columns == ["k"]


def test_type_mismatched_predicate_keeps_file_instead_of_crashing():
    """ADVICE r9 (medium): an int-stats column probed with a string
    value (or vice versa) must conservatively KEEP the file — Spark's
    row filter would coerce where raw Python comparison raises
    TypeError and crashed the whole read."""
    stats = {"k": [10, 99]}
    # str predicate vs int stats: keep (never raise)
    assert G._file_matches("f.parquet", stats, [("k", "=", "50")])
    assert G._file_matches("f.parquet", stats, [("k", ">", "5")])
    assert G._file_matches("f.parquet", stats, [("k", "between", ("a", "b"))])
    # int predicate vs str stats: keep
    assert G._file_matches("f.parquet", {"s": ["aa", "zz"]}, [("s", "=", 5)])
    # provable prunes still prune with matching types
    assert not G._file_matches("f.parquet", stats, [("k", "=", 500)])


def test_date_stats_vs_datetime_predicate_boundary_kept():
    """ADVICE r9 (medium): a DATE column's stats ('1996-01-01') probed
    with a datetime value normalizing to '1996-01-01 00:00:00.000000'
    compared lexicographically as date < datetime — wrongly pruning a
    file whose max equals the predicate's lower bound. The date shape
    now widens to midnight (Spark's own date->timestamp coercion)."""
    stats = {"d": ["1995-06-01", "1996-01-01"]}  # a date column's stats
    dt = datetime.datetime(1996, 1, 1)
    # file max == lower bound: rows CAN match >= / = — must keep
    assert G._file_matches("f.parquet", stats, [("d", ">=", dt)])
    assert G._file_matches("f.parquet", stats, [("d", "=", dt)])
    assert G._file_matches(
        "f.parquet", stats,
        [("d", "between", (dt, datetime.datetime(1996, 12, 31)))],
    )
    # and the reverse shape: datetime stats vs a DATE predicate value
    ts_stats = {"t": [
        "1995-06-01 00:00:00.000000", "1996-01-01 00:00:00.000000"
    ]}
    assert G._file_matches(
        "f.parquet", ts_stats, [("t", ">=", datetime.date(1996, 1, 1))]
    )
    # provably-empty cases still prune across the shape mismatch
    assert not G._file_matches(
        "f.parquet", stats, [("d", ">", datetime.datetime(1996, 1, 1, 0, 0, 1))]
    )
    assert not G._file_matches(
        "f.parquet", ts_stats, [("t", ">", datetime.date(1996, 1, 2))]
    )


def test_plain_strings_never_widen():
    """A string column legitimately holding date-shaped values keeps
    raw lexicographic semantics (Spark's string comparison)."""
    stats = {"s": ["1996-01-01", "1996-01-01"]}
    assert G._file_matches("f.parquet", stats, [("s", "=", "1996-01-01")])
    assert not G._file_matches("f.parquet", stats, [("s", "=", "1996-01-02")])


def test_generation_column_bounds_metadata_only(spark, tmp_path):
    """generation_column_bounds: exact NULL-skipping min/max from the
    manifest's footer stats, with the all-NULL-file and absent-column
    edge cases."""
    from map_reduce_indexing_spark.sources.generations import (
        generation_column_bounds,
        publish_generation,
    )

    store = str(tmp_path / "s")
    spark.createDataFrame(
        [(5, "b"), (9, None)], "v long, t string"
    ).coalesce(1).write.parquet(store)
    spark.createDataFrame(
        [(None, "a"), (None, "z")], "v long, t string"
    ).coalesce(1).write.mode("append").parquet(store)
    publish_generation(store)
    assert generation_column_bounds(store, "v") == (5, 9)
    assert generation_column_bounds(store, "t") == ("a", "z")
    assert generation_column_bounds(store, "missing") == (None, None)


def test_predicate_count_metadata_split(spark, tmp_path):
    """generation_predicate_count: interior files of a clustered store
    count from the manifest, boundary files scan, the total is exact,
    and unknown null counts force the scan path (never a wrong
    count)."""
    from map_reduce_indexing_spark.sources.generations import (
        generation_predicate_count,
        publish_generation,
        read_generation,
    )

    store = str(tmp_path / "s")
    df = spark.createDataFrame(
        [(i, i % 7) for i in range(1000)], "v long, k long"
    )
    df.repartitionByRange(10, "v").write.parquet(store)
    publish_generation(store)
    rep = generation_predicate_count(
        spark, store, [("v", "between", (150, 850))]
    )
    assert rep["count"] == 701
    assert rep["files_metadata"] >= 5  # interior files never opened
    assert rep["files_scanned"] <= 3
    assert rep["files_pruned"] >= 1
    # exactness against a plain filter
    assert (
        read_generation(spark, store).filter("v between 150 and 850").count()
        == rep["count"]
    )
    # a column with NULLs: files holding nulls can still be metadata-
    # counted only when the null count is recorded zero
    store2 = str(tmp_path / "s2")
    spark.createDataFrame(
        [(i, None if i % 3 == 0 else i) for i in range(90)],
        "rid long, v long",
    ).coalesce(2).write.parquet(store2)
    publish_generation(store2)
    rep2 = generation_predicate_count(spark, store2, [("v", ">=", 0)])
    assert rep2["count"] == 60  # NULLs fail the predicate
    assert rep2["files_metadata"] == 0  # null-bearing files must scan
