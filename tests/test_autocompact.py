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
