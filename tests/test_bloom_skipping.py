"""Per-file bloom sidecars: point-lookup file skipping (round 9).

Min/max bounds cannot prune an equality probe on a high-cardinality
UNCLUSTERED column — every file's range covers every key. The bloom
sidecars (`publish_generation(bloom_cols=[...])`,
sources/generations.py) are the Iceberg-puffin answer: built once per
immutable file at publish, referenced by name from the manifest,
probed at plan time.

Pinned here: pruning is LOSSLESS (pruned read == full filter for
present and absent keys; a false positive keeps a file, never the
reverse); point lookups keep a small fraction of files and absent
keys keep ~none; carried files never rebuild their blooms on later
publishes (sticky bloom_cols, counted via monkeypatch); the
compaction carry rebuilds blooms for the rewritten head and hardlinks
carried generations' sidecars; float columns refuse a bloom and stay
conservative; expiry garbage-collects unreferenced sidecars.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

import map_reduce_indexing_spark.sources.generations as G
from map_reduce_indexing_spark.sources.generations import (
    BLOOM_DIR,
    carry_generations,
    load_manifest,
    plan_generation_scan,
    publish_generation,
    read_generation,
)


def _store(spark, path: str, n: int = 20_000, files: int = 8) -> None:
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("name"),
        (F.col("id") % 100).cast("double").alias("score"),
    )
    df.repartition(files, "k").write.parquet(path)


def test_point_lookup_prunes_and_stays_lossless(spark, tmp_path):
    base = str(tmp_path / "b")
    _store(spark, base)
    publish_generation(base, bloom_cols=["k", "name"])

    for probe in [("k", "=", 12345), ("name", "=", "u777"),
                  ("k", "in", (1, 2, 10**12)), ("k", "=", 10**12)]:
        _root, kept, total = plan_generation_scan(base, where=[probe])
        assert total == 8
        got = sorted(
            r.k for r in read_generation(spark, base, where=[probe]).collect()
        )
        col, _op, val = probe
        vals = val if isinstance(val, tuple) else (val,)
        want = sorted(
            r.k
            for r in read_generation(spark, base)
            .filter(F.col(col).isin(list(vals)))
            .collect()
        )
        assert got == want  # lossless: exact same rows as the full filter
        # an unclustered key lives in ONE file; blooms keep few (FPs
        # allowed, misses are not)
        assert len(kept) <= 3
    _root, kept, _ = plan_generation_scan(base, where=[("k", "=", 10**12)])
    assert len(kept) <= 1  # absent key: essentially everything pruned


def test_typed_keys_do_not_collide(spark, tmp_path):
    base = str(tmp_path / "b")
    spark.createDataFrame([(1, "x")], "k long, name string").coalesce(
        1
    ).write.parquet(base)
    publish_generation(base, bloom_cols=["k", "name"])
    # int 1 is present; the STRING "1" must not borrow its bloom bits
    # via a shared encoding (type-prefixed keys)
    _r, kept_int, _ = plan_generation_scan(base, where=[("k", "=", 1)])
    _r, kept_str, _ = plan_generation_scan(base, where=[("name", "=", "1")])
    assert len(kept_int) == 1 and len(kept_str) == 0


def test_carried_files_never_rebuild_blooms(spark, tmp_path, monkeypatch):
    base = str(tmp_path / "b")
    _store(spark, base, n=2_000, files=4)
    publish_generation(base, bloom_cols=["k"])

    calls = []
    real = G._build_file_blooms

    def counting(abs_path, cols, root, fname):
        calls.append(abs_path)
        return real(abs_path, cols, root, fname)

    monkeypatch.setattr(G, "_build_file_blooms", counting)
    spark.range(2000, 2100).select(
        F.col("id").alias("k"),
        F.lit("n").alias("name"),
        F.lit(0.0).alias("score"),
    ).coalesce(1).write.mode("append").parquet(base)
    publish_generation(base)  # bloom_cols are sticky in the manifest
    assert len(calls) == 1  # ONLY the appended file paid the build
    m = load_manifest(base)
    withb = [e for e in m["gens"]["2"]["stats"].values() if e.get("bloom")]
    assert len(withb) == len(m["gens"]["2"]["files"])  # old + new covered


def test_float_columns_refuse_blooms_and_stay_conservative(spark, tmp_path):
    base = str(tmp_path / "b")
    _store(spark, base, n=1_000, files=2)
    publish_generation(base, bloom_cols=["score"])
    m = load_manifest(base)
    assert all(
        "score" not in (e.get("bloom") or {})
        for e in m["gens"]["1"]["stats"].values()
    )
    # equality on the float column falls back to min/max only — both
    # files span [0,99], so nothing is pruned and the read is exact
    _r, kept, total = plan_generation_scan(base, where=[("score", "=", 55.0)])
    assert len(kept) == total == 2
    n = read_generation(spark, base, where=[("score", "=", 55.0)]).count()
    assert n == 10


def test_compaction_carry_rebuilds_head_and_links_history(spark, tmp_path):
    base, staging = str(tmp_path / "b"), str(tmp_path / "staging")
    _store(spark, base, n=4_000, files=4)
    publish_generation(base, bloom_cols=["k"])
    spark.range(4000, 4200).select(
        F.col("id").alias("k"),
        F.lit("n").alias("name"),
        F.lit(0.0).alias("score"),
    ).coalesce(1).write.mode("append").parquet(base)
    publish_generation(base)

    read_generation(spark, base).coalesce(1).write.parquet(staging)
    carry_generations(base, staging)
    sm = load_manifest(staging)
    assert sm.get("bloom_cols") == ["k"]  # stickiness survives the swap
    head = str(sm["head"])
    head_entries = sm["gens"][head]["stats"].values()
    assert all("k" in (e.get("bloom") or {}) for e in head_entries)
    # carried generations' sidecars travel with staging
    carried = {
        f
        for g, e in sm["gens"].items()
        if g != head
        for f in _bloom_names(e)
    }
    for f in carried:
        assert os.path.isfile(os.path.join(staging, BLOOM_DIR, f))

    # simulate the swap and probe both eras
    import shutil

    shutil.rmtree(base)
    os.replace(staging, base)
    _r, kept_old, _ = plan_generation_scan(base, at=1, where=[("k", "=", 7)])
    assert 1 <= len(kept_old) <= 2
    assert (
        read_generation(spark, base, at=1, where=[("k", "=", 7)]).count() == 1
    )
    assert (
        read_generation(spark, base, where=[("k", "=", 4100)]).count() == 1
    )


def _bloom_names(gen_entry: dict) -> set[str]:
    return {
        f
        for e in (gen_entry.get("stats") or {}).values()
        for f in (e.get("bloom") or {}).values()
    }


def test_expiry_garbage_collects_unreferenced_sidecars(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setattr(G, "GEN_TTL_SECONDS", 0.0)
    monkeypatch.setattr(G, "GEN_RETAIN", 1)
    base = str(tmp_path / "b")
    _store(spark, base, n=500, files=1)
    publish_generation(base, bloom_cols=["k"])
    first = set(os.listdir(os.path.join(base, BLOOM_DIR)))
    assert first
    # rewrite-style churn: replace the data file so each publish
    # records a NEW bloom and expires the previous generation
    for i in range(2):
        for f in os.listdir(base):
            p = os.path.join(base, f)
            if os.path.isfile(p) and not f.startswith(("_", ".")):
                os.remove(p)
        spark.range(i * 1000, i * 1000 + 500).select(
            F.col("id").alias("k"),
            F.lit("n").alias("name"),
            F.lit(0.0).alias("score"),
        ).coalesce(1).write.mode("append").parquet(base)
        publish_generation(base)
    m = load_manifest(base)
    live = {
        f for g in m["gens"].values() for f in _bloom_names(g)
    }
    on_disk = set(os.listdir(os.path.join(base, BLOOM_DIR)))
    assert on_disk == live  # nothing orphaned, nothing referenced missing
    assert not (first & on_disk)  # the era-1 sidecar is gone


def test_v2_cross_type_probe_keeps_file(spark, tmp_path):
    """A probe whose Python type differs from the column's stored salt
    must KEEP the file: Spark's row filter coerces cross-type equality
    (string col '1' matches int 1), so pruning on a type-mismatched
    bloom would be lossy. (v2 stores the salt in the blob precisely to
    detect this.)"""
    base = str(tmp_path / "b")
    spark.createDataFrame([("1",)], "name string").coalesce(1).write.parquet(
        base
    )
    publish_generation(base, bloom_cols=["name"])
    _r, kept, _ = plan_generation_scan(base, where=[("name", "=", 1)])
    assert len(kept) == 1  # int probe on string column: kept, not pruned


def test_v1_legacy_sidecars_still_probe(spark, tmp_path):
    """Sidecars written in the round-9 (blake2b, per-value) format are
    still honored by the prober — losslessly for present keys, pruning
    absent ones."""
    import hashlib

    base = str(tmp_path / "b")
    _store(spark, base, n=5_000, files=2)
    publish_generation(base, bloom_cols=["k"])
    # overwrite every sidecar with the v1 format built from the same
    # values (simulating a store published before the upgrade)
    m = G.load_manifest(base)
    g = m["gens"][str(m["head"])]
    import pyarrow.parquet as pq

    def v1_build(keys):
        mm = min(
            G.BLOOM_MAX_BITS, max(1024, G.BLOOM_BITS_PER_VALUE * len(keys))
        )
        bits = bytearray((mm + 7) // 8)
        for key in keys:
            h1, h2 = G._bloom_hashes(key)
            for i in range(G.BLOOM_K):
                idx = (h1 + i * h2) % mm
                bits[idx >> 3] |= 1 << (idx & 7)
        return (
            mm.to_bytes(8, "little")
            + G.BLOOM_K.to_bytes(8, "little")
            + bytes(bits)
        )

    for rel, entry in g["stats"].items():
        for col, fname in (entry.get("bloom") or {}).items():
            vals = (
                pq.ParquetFile(os.path.join(base, rel))
                .read(columns=[col])
                .column(col)
                .drop_null()
                .to_pylist()
            )
            keys = [G._bloom_key(v) for v in vals]
            with open(os.path.join(base, G.BLOOM_DIR, fname), "wb") as fh:
                fh.write(v1_build(keys))
    _r, kept_p, total = plan_generation_scan(base, where=[("k", "=", 123)])
    _r, kept_a, _ = plan_generation_scan(base, where=[("k", "=", 10**12)])
    assert total == 2 and len(kept_p) >= 1 and len(kept_a) == 0
    got = sorted(
        r.k
        for r in read_generation(spark, base, where=[("k", "=", 123)])
        .collect()
    )
    assert got == [123]


def test_bulk_publish_spark_job_equals_serial(spark, tmp_path, monkeypatch):
    """The distributed stats/bloom build (one Spark job over the
    new-file list) records byte-identical manifest entries and
    equally-lossless sidecars as the serial path."""
    import json

    base_a = str(tmp_path / "a")
    base_b = str(tmp_path / "bb")
    df = spark.range(20_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    df.repartition(8, "k").write.parquet(base_a)
    # identical listing: hardlink the files under the second store
    os.makedirs(base_b)
    for f in sorted(os.listdir(base_a)):
        if not f.startswith(("_", ".")):
            os.link(os.path.join(base_a, f), os.path.join(base_b, f))
    monkeypatch.setattr(G, "STATS_SPARK_MIN_FILES", 4)
    publish_generation(base_a, bloom_cols=["k"])              # thread pool
    publish_generation(base_b, bloom_cols=["k"], spark=spark)  # Spark job
    ma = G.load_manifest(base_a)["gens"]["1"]["stats"]
    mb = G.load_manifest(base_b)["gens"]["1"]["stats"]
    assert json.dumps(ma, sort_keys=True) == json.dumps(mb, sort_keys=True)
    # sidecar bytes identical too (same values, same vectorized build)
    for rel, entry in ma.items():
        for col, fname in (entry.get("bloom") or {}).items():
            pa = open(os.path.join(base_a, G.BLOOM_DIR, fname), "rb").read()
            pb = open(os.path.join(base_b, G.BLOOM_DIR, fname), "rb").read()
            assert pa == pb
    _r, kept, _ = plan_generation_scan(base_b, where=[("k", "=", 444)])
    assert len(kept) == 1
