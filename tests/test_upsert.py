"""MERGE (upsert) as a store operation (round 10).

sources/generations.py:upsert_rows — copy-on-write MERGE bounded by
the manifest: key bounds (+ bloom-probed key lists for small
single-column sets) prune the rewrite to the possibly-matching files;
matched rows are replaced wholesale, unmatched update rows insert;
the result publishes as a new generation. Pinned here: exactness vs a
SQL MERGE recompute, file pruning, the exact updated/inserted report,
snapshot isolation, CDF update/insert emission, and matview rebuild
across the span.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from map_reduce_indexing_spark.sources.generations import (
    generation_changes,
    publish_generation,
    read_generation,
    upsert_rows,
)


def _rows(spark, lo: int, n: int, price: int = 10):
    return spark.createDataFrame(
        [(lo + i, (lo + i) % 3, (lo + i) * price) for i in range(n)],
        "rid long, grp long, price long",
    )


def _data_files(path: str) -> set[str]:
    out = set()
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if not f.startswith(("_", ".")) and not f.endswith(".crc"):
                out.add(os.path.relpath(os.path.join(root, f), path))
    return out


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_upsert_replaces_and_inserts_exactly(spark, tmp_path):
    base = str(tmp_path / "b")
    _rows(spark, 0, 30).coalesce(2).write.parquet(base)
    publish_generation(base)
    # 10 replacements (rid 0..9, new price) + 5 inserts (rid 100..104)
    upd = _rows(spark, 0, 10, price=999).unionByName(
        _rows(spark, 100, 5, price=7)
    )
    report = upsert_rows(spark, base, upd, ["rid"])
    assert report["updated_rows"] == 10
    assert report["inserted_rows"] == 5
    got = _sorted(read_generation(spark, base))
    want = _sorted(
        _rows(spark, 10, 20).unionByName(upd)  # untouched + postimages
    )
    assert got == want


def test_upsert_prunes_to_key_overlapping_files(spark, tmp_path):
    """rid-disjoint files: an upsert touching one file's key range
    rewrites only that file; survivors keep their names."""
    base = str(tmp_path / "b")
    for lo in (0, 10, 20, 30):
        _rows(spark, lo, 10).coalesce(1).write.mode("append").parquet(base)
    publish_generation(base)
    before = _data_files(base)
    report = upsert_rows(
        spark, base, _rows(spark, 12, 3, price=500), ["rid"]
    )
    assert report["rewritten_files"] == 1
    assert report["kept_files"] == 3
    assert report["updated_rows"] == 3 and report["inserted_rows"] == 0
    assert len(before & _data_files(base)) == 3
    got = {r.rid: r.price for r in read_generation(spark, base).collect()}
    assert got[12] == 6000 and got[11] == 110  # 12*500 / 11*10


def test_upsert_bloom_prunes_unclustered_keys(spark, tmp_path):
    """On an unclustered key every file's range covers every key —
    only the bloom-probed key list can prune. Files provably free of
    the update keys survive by name."""
    base = str(tmp_path / "b")
    # files hash-partitioned: ranges overlap, blooms discriminate
    df = spark.range(4000).select(
        F.col("id").alias("rid"),
        (F.col("id") % 3).alias("grp"),
        (F.col("id") * 10).alias("price"),
    )
    df.repartition(8, "rid").write.parquet(base)
    publish_generation(base, bloom_cols=["rid"])
    upd = spark.createDataFrame([(77, 77 % 3, 12345)], "rid long, grp long, price long")
    report = upsert_rows(spark, base, upd, ["rid"])
    # one key → at most 1 + false positives files rewritten
    assert report["rewritten_files"] <= 2
    assert report["updated_rows"] == 1 and report["inserted_rows"] == 0
    got = {r.rid: r.price for r in read_generation(spark, base)
           .filter(F.col("rid").isin(77, 78)).collect()}
    assert got == {77: 12345, 78: 780}


def test_upsert_pinned_reader_and_cdf(spark, tmp_path):
    base = str(tmp_path / "b")
    _rows(spark, 0, 20).coalesce(2).write.parquet(base)
    publish_generation(base)
    pre = 1
    before = _sorted(read_generation(spark, base, at=pre))
    upd = _rows(spark, 5, 2, price=111).unionByName(_rows(spark, 50, 1))
    report = upsert_rows(spark, base, upd, ["rid"])
    assert _sorted(read_generation(spark, base, at=pre)) == before
    ch = generation_changes(
        spark, base, since=pre, until=report["generation"],
        key_cols=("rid",),
    )
    got = sorted((r.rid, r.change_type) for r in ch.collect())
    assert got == [
        (5, "update_postimage"), (5, "update_preimage"),
        (6, "update_postimage"), (6, "update_preimage"),
        (50, "insert"),
    ]


def test_upsert_empty_updates_noop(spark, tmp_path):
    base = str(tmp_path / "b")
    _rows(spark, 0, 10).coalesce(1).write.parquet(base)
    publish_generation(base)
    report = upsert_rows(
        spark, base, _rows(spark, 0, 10).limit(0), ["rid"]
    )
    assert report["updated_rows"] == 0 and report["inserted_rows"] == 0
    assert report["rewritten_files"] == 0


def test_upsert_requires_full_schema_and_keys(spark, tmp_path):
    base = str(tmp_path / "b")
    _rows(spark, 0, 10).coalesce(1).write.parquet(base)
    publish_generation(base)
    with pytest.raises(ValueError, match="key_cols"):
        upsert_rows(spark, base, _rows(spark, 0, 1), [])
    with pytest.raises(ValueError, match="lack store columns"):
        upsert_rows(
            spark, base, _rows(spark, 0, 1).drop("price"), ["rid"]
        )


def test_matview_across_upsert_rebuilds_exact(spark, tmp_path):
    from map_reduce_indexing_spark.operators.matview import (
        create_matview,
        read_matview,
        refresh_matview,
    )

    base, view = str(tmp_path / "b"), str(tmp_path / "v")
    _rows(spark, 0, 30).coalesce(2).write.parquet(base)
    publish_generation(base)
    create_matview(
        spark, base, view, ["grp"],
        {"n": ("count", "*"), "total": ("sum", "price")},
    )
    upsert_rows(
        spark, base,
        _rows(spark, 0, 6, price=1000).unionByName(_rows(spark, 90, 3)),
        ["rid"],
    )
    report = refresh_matview(spark, view)
    assert report["mode"] == "rebuild"
    got = sorted(tuple(r) for r in read_matview(spark, view).collect())
    want = sorted(
        tuple(r)
        for r in read_generation(spark, base)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("price").alias("total"))
        .collect()
    )
    assert got == want


def test_upsert_refuses_type_drift(spark, tmp_path):
    """Mixed physical parquet types within one generation fail at read
    time — widened arithmetic (decimal(18,2) * 2 -> decimal(19,2) or
    a long turned double) must be refused loudly at merge time."""
    from decimal import Decimal

    base = str(tmp_path / "b")
    spark.createDataFrame(
        [(1, Decimal("10.00"))], "rid long, price decimal(18,2)"
    ).coalesce(1).write.parquet(base)
    publish_generation(base)
    widened = spark.createDataFrame(
        [(1, Decimal("20.00"))], "rid long, price decimal(19,2)"
    )
    with pytest.raises(ValueError, match="drift"):
        upsert_rows(spark, base, widened, ["rid"])


def test_upsert_multi_column_keys_prune_and_stay_exact(spark, tmp_path):
    """Composite keys: per-column value lists prune conservatively
    (cross-product superset) and the merge stays exact."""
    base = str(tmp_path / "b")
    # 4 files disjoint in tenant: tenant 0..3
    for t in range(4):
        spark.createDataFrame(
            [(t, i, t * 1000 + i) for i in range(10)],
            "tenant long, seq long, val long",
        ).coalesce(1).write.mode("append").parquet(base)
    publish_generation(base)
    upd = spark.createDataFrame(
        [(1, 3, 99999), (1, 50, 42)],  # one replace, one insert
        "tenant long, seq long, val long",
    )
    report = upsert_rows(spark, base, upd, ["tenant", "seq"])
    # tenant=1's file is the only candidate (per-column in-list on
    # tenant prunes the other three by their footer bounds)
    assert report["rewritten_files"] == 1
    assert report["updated_rows"] == 1 and report["inserted_rows"] == 1
    got = {(r.tenant, r.seq): r.val
           for r in read_generation(spark, base).collect()}
    assert got[(1, 3)] == 99999 and got[(1, 50)] == 42
    assert got[(2, 3)] == 2003  # untouched
    assert len(got) == 41


@pytest.fixture(autouse=True)
def _both_io_backends(io_backend):
    """Round 11: every test in this module runs under BOTH commit
    backends (see conftest.io_backend) — POSIX and object-store CAS."""
