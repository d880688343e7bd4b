"""Publish-time auto-compaction (round 11, VERDICT task 4).

generations.set_compaction_policy records a small-file policy in the
store manifest; maybe_autocompact fires it after publishes. The
streaming gated ingest (one generation per microbatch — the unbounded
file-count shape) wires it in per batch; the pipeline runner per run.
Pinned here: the file count stays bounded across >=50 microbatches;
the policy survives the compaction swaps it triggers; a TAGGED pinned
generation stays readable through every rewrite; and a matview whose
refresh spans the rewrites still lands exactly."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from map_reduce_indexing_spark.sources.generations import (
    generation_head,
    load_manifest,
    maybe_autocompact,
    publish_generation,
    read_generation,
    set_compaction_policy,
    tag_generation,
)


def _head_file_count(path: str) -> int:
    m = load_manifest(path)
    return len(m["gens"][str(m["head"])]["files"])


def test_policy_triggers_and_survives_swaps(spark, tmp_path):
    path = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, i % 5) for i in range(100)], "id long, k long"
    )
    df.repartition(10).write.parquet(path)
    publish_generation(path)
    set_compaction_policy(path, max_files=6, n_files=2)
    # trigger holds (10 > 6): one optimize folds to 2 files
    new_head = maybe_autocompact(spark, path)
    assert new_head == generation_head(path)
    assert _head_file_count(path) == 2
    # policy survived the compaction's manifest carry
    assert load_manifest(path)["compact_policy"]["max_files"] == 6
    # within bounds now: a second call is a no-op
    assert maybe_autocompact(spark, path) is None
    assert read_generation(spark, path).count() == 100


def test_streaming_ingest_file_count_bounded(spark, tmp_path):
    """>=50 microbatches through the gated ingest with a policy: the
    head file count stays bounded the whole way, every admitted row is
    present exactly once, a tagged pin survives every rewrite, and a
    matview refresh spanning the rewrites lands exactly."""
    from map_reduce_indexing_spark.operators.matview import (
        create_matview,
        read_matview,
        refresh_matview,
    )
    from map_reduce_indexing_spark.streaming.events import run_gated_ingest

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    view = str(tmp_path / "view")

    # seed the store, tag the seed generation as a pinned reader would
    seed = spark.createDataFrame(
        [(-(i + 1), f"seed", 0) for i in range(10)],
        "id long, src string, v long",
    )
    seed.coalesce(1).write.parquet(store)
    publish_generation(store)
    tag_generation(store, "pin0")
    pinned_before = sorted(
        r.id for r in read_generation(spark, store, at="pin0").collect()
    )
    create_matview(
        spark, store, view, ["src"], {"n": ("count", "id"), "sv": ("sum", "v")}
    )

    # 55 single-file microbatches (maxFilesPerTrigger=1)
    rows = [(i, f"b{i % 3}", i % 7) for i in range(55)]
    df = spark.createDataFrame(rows, "id long, src string, v long")
    df.repartitionByRange(55, "id").write.parquet(src)  # 55 non-empty files
    reports = run_gated_ingest(
        spark,
        src,
        store,
        {"v_ok": [("v", "<=", 6)]},  # everything passes: pure ingest
        checkpoint=str(tmp_path / "ckpt"),
        schema=df.schema,
        compact_policy={"max_files": 8, "n_files": 3},
    )
    assert len(reports) >= 50
    compactions = [r for r in reports if "compacted_to" in r]
    assert len(compactions) >= 4  # the policy kept firing
    assert _head_file_count(store) <= 9  # bounded, never runaway
    # exactly-once content through all the rewrites
    got = sorted(r.id for r in read_generation(spark, store).collect())
    assert got == sorted([-(i + 1) for i in range(10)] + list(range(55)))
    # the tagged pin still serves its exact snapshot
    assert (
        sorted(
            r.id for r in read_generation(spark, store, at="pin0").collect()
        )
        == pinned_before
    )
    # a matview refresh across the rewrite spans lands exactly
    refresh_matview(spark, view)
    v = {
        r.src: (r.n, r.sv)
        for r in read_matview(spark, view).collect()
    }
    assert v["seed"] == (10, 0)
    for s in ("b0", "b1", "b2"):
        ids = [i for i in range(55) if f"b{i % 3}" == s]
        assert v[s] == (len(ids), sum(i % 7 for i in ids))


def test_policy_preserves_hive_partition_layout(spark, tmp_path):
    """A policy-fired optimize on a Hive-partitioned store must fold
    small files WITHIN each partition directory, never flatten the
    layout pruned reads depend on."""
    import os

    path = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, i % 4, f"v{i}") for i in range(200)],
        "id long, bucket long, payload string",
    )
    # many small files per bucket dir
    df.repartition(6).write.partitionBy("bucket").parquet(path)
    publish_generation(path)
    before = read_generation(spark, path)
    set_compaction_policy(path, max_files=8, n_files=4)
    assert maybe_autocompact(spark, path) is not None
    # layout preserved: bucket=N dirs still exist, fewer files
    dirs = sorted(
        d for d in os.listdir(path) if d.startswith("bucket=")
    )
    assert dirs == [f"bucket={b}" for b in range(4)]
    assert _head_file_count(path) <= 8
    after = read_generation(spark, path)
    assert sorted(map(tuple, after.collect())) == sorted(
        map(tuple, before.collect())
    )
    # partition pruning still works on the folded layout
    assert after.filter("bucket = 2").count() == 50


def test_api_maintain_runs_policy_and_vacuum(spark, tmp_path):
    """IndexSession.maintain(): one scheduler call fires the recorded
    policy and vacuums unreachable residue."""
    import os
    import time

    from map_reduce_indexing_spark.api import IndexSession

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i}") for i in range(40)], "doc_id long, text string"
    )
    s = IndexSession.build(spark, docs, str(tmp_path / "idx"))
    for lo in (100, 200, 300):
        s.append(
            spark.createDataFrame(
                [(lo + i, f"gamma w{lo + i}") for i in range(10)],
                "doc_id long, text string",
            )
        )
    s.set_compaction_policy(max_files=3, n_files=2)
    orphan = os.path.join(s.index_path, "letter=z", "orphan.bin")
    os.makedirs(os.path.dirname(orphan), exist_ok=True)
    with open(orphan, "wb") as fh:
        fh.write(b"x")
    os.utime(orphan, (time.time() - 7200, time.time() - 7200))
    rep = s.maintain(vacuum_grace_seconds=3600)
    assert rep["compacted_to"] is not None
    # the POSIX staged swap already drops unpublished residue; under
    # CAS the diff-swap leaves it for the vacuum step — gone either way
    assert not os.path.exists(orphan)
    assert s.lookup("gamma").count() == 30  # index intact after both
    # vacuum-only pass (policy now satisfied): plant fresh aged residue
    orphan2 = os.path.join(s.index_path, "letter=q", "orphan2.bin")
    os.makedirs(os.path.dirname(orphan2), exist_ok=True)
    with open(orphan2, "wb") as fh:
        fh.write(b"x")
    os.utime(orphan2, (time.time() - 7200, time.time() - 7200))
    rep = s.maintain(vacuum_grace_seconds=3600)
    assert rep["compacted_to"] is None
    assert rep["vacuum"]["data_files"] >= 1
    assert not os.path.exists(orphan2)
    assert s.lookup("gamma").count() == 30
