"""Round-12 maintenance-tier fixes (r11 ADVICE + VERDICT task 4).

1. append_rows ADOPTION: a store holding pre-existing parquet files
   but no manifest pins them as the base generation before the first
   optimistic publish — the old rows stay readable and vacuum never
   reclaims them as residue (r11 advice, high).
2. Retention prune is commit-ordered: a publish whose conditional
   manifest save LOSES (CAS CommitConflict) performs no destructive
   deletion — expired snapshot roots are removed only after the save
   lands (r11 advice, medium).
3. The pipeline orphan sweep and the gated-idempotency redo cleanup
   reason from reachable_files (head + any retained generation pinned
   at root "."), not head alone — legacy '.'-rooted generations keep
   their pinned readers (r11 advice, medium).
4. CAS leases HEARTBEAT: a holder outliving lease_ttl keeps its
   exclusion (mtime refreshed every ttl/3); a crashed holder (no
   heartbeat) is still taken over (r11 advice, low / VERDICT task 4).
"""

from __future__ import annotations

import json
import os
import threading
import time

import pytest

from map_reduce_indexing_spark.sources import generations as G
from map_reduce_indexing_spark.sources.commitio import (
    CASStoreIO,
    CommitConflict,
    using_backend,
)
from map_reduce_indexing_spark.sources.generations import (
    append_rows,
    generation_head,
    load_manifest,
    publish_generation,
    reachable_files,
    read_generation,
    tag_generation,
    vacuum_store,
)


def _frame(spark, lo, n, tag="x"):
    return spark.createDataFrame(
        [(lo + i, tag) for i in range(n)], "id long, src string"
    )


def _ids(spark, path, at=None):
    return sorted(
        r.id
        for r in read_generation(spark, path, at=at).select("id").collect()
    )


# --- 1. append_rows adoption -------------------------------------------------


def test_append_rows_adopts_pre_existing_data(spark, tmp_path, io_backend):
    path = str(tmp_path / "store")
    # pre-existing unmanaged parquet data (no manifest yet)
    _frame(spark, 0, 10, "old").write.parquet(path)
    assert load_manifest(path) is None
    head = append_rows(spark, path, _frame(spark, 100, 5, "new"))
    # the pre-existing rows were pinned as the base generation, so the
    # head read covers old + new
    assert _ids(spark, path) == list(range(10)) + list(range(100, 105))
    m = load_manifest(path)
    assert head >= 2  # base adoption + this append
    # base generation alone = exactly the old rows
    assert _ids(spark, path, at=1) == list(range(10))
    # and vacuum reclaims NOTHING (every live file is reachable)
    removed = vacuum_store(path, grace_seconds=0.0)
    assert removed["data_files"] == 0
    assert _ids(spark, path) == list(range(10)) + list(range(100, 105))


# --- 2. prune-after-commit ---------------------------------------------------


def test_losing_cas_publish_deletes_nothing(spark, tmp_path, monkeypatch):
    """A publish that loses the conditional manifest put must not have
    rmtree'd expired snapshot roots: the WINNER's committed manifest
    may still retain them (TTL-boundary divergence between racers)."""
    monkeypatch.setattr(G, "GEN_TTL_SECONDS", 0.0)
    monkeypatch.setattr(G, "GEN_RETAIN", 1)
    with using_backend(CASStoreIO()):
        path = str(tmp_path / "store")
        for i in range(3):
            append_rows(spark, path, _frame(spark, i * 10, 3))
        m = load_manifest(path)
        # craft a LOSER: a manifest whose _cas token is stale (as if
        # another writer published between our load and our save)
        stale = json.loads(json.dumps(m))
        stale["_cas"] = int(m["_cas"]) - 1
        roots_before = {
            d
            for d in os.listdir(os.path.join(path, G.GEN_DIR))
        }
        with pytest.raises(CommitConflict):
            G._publish(path, int(m["head"]) + 1, stale)
        # the losing publish performed NO destructive deletion
        roots_after = {
            d for d in os.listdir(os.path.join(path, G.GEN_DIR))
        }
        assert roots_before <= roots_after
        # and the committed state is untouched / fully readable
        m2 = load_manifest(path)
        assert int(m2["head"]) == int(m["head"])
        for k in m2["gens"]:
            read_generation(spark, path, at=int(k)).count()


def test_winning_publish_still_prunes(spark, tmp_path, monkeypatch, io_backend):
    monkeypatch.setattr(G, "GEN_TTL_SECONDS", 0.0)
    monkeypatch.setattr(G, "GEN_RETAIN", 1)
    path = str(tmp_path / "store")
    for i in range(4):
        append_rows(spark, path, _frame(spark, i * 10, 3))
    m = load_manifest(path)
    # retention held: only GEN_RETAIN entries and their roots remain
    assert len(m["gens"]) == 1
    live_roots = {g["root"] for g in m["gens"].values()}
    on_disk = {
        os.path.join(G.GEN_DIR, d)
        for d in os.listdir(os.path.join(path, G.GEN_DIR))
    }
    assert on_disk == live_roots


# --- 3. reachability: legacy '.'-rooted generations --------------------------


def _pin_legacy_dot_generation(path: str) -> list[str]:
    """Rewrite the store's OLDEST retained generation as a legacy
    '.'-rooted entry (top-level files ARE the snapshot — no _gen copy),
    tag it so retention keeps it, and return its files."""
    m = load_manifest(path)
    oldest = str(min(int(k) for k in m["gens"]))
    files = m["gens"][oldest]["files"]
    m["gens"][oldest]["root"] = "."
    m.setdefault("refs", {})["legacy"] = int(oldest)
    G._save_manifest(path, m)
    return list(files)


def test_pipeline_sweep_keeps_dot_rooted_generation(spark, tmp_path, io_backend):
    from map_reduce_indexing_spark.sources.pipeline import (
        run_incremental_pipeline,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    append_rows(spark, src, _frame(spark, 0, 6))
    run_incremental_pipeline(spark, src, dst, lambda df: df)
    append_rows(spark, dst, _frame(spark, 500, 4, "direct"))
    legacy_files = _pin_legacy_dot_generation(dst)
    # the legacy generation's top-level files must survive the orphan
    # sweep of the next pipeline run
    append_rows(spark, src, _frame(spark, 10, 3))
    run_incremental_pipeline(spark, src, dst, lambda df: df)
    for rel in legacy_files:
        assert os.path.exists(os.path.join(dst, rel)), rel
    # the pinned legacy generation still reads
    read_generation(spark, dst, at="legacy").count()


def test_idempotent_gate_redo_keeps_dot_rooted_generation(
    spark, tmp_path, io_backend
):
    from map_reduce_indexing_spark.sources.expectations import (
        append_with_expectations,
    )

    path = str(tmp_path / "store")
    exp = {"nonneg": [("id", ">=", 0)]}
    append_with_expectations(
        spark, path, _frame(spark, 0, 6), exp, idempotency=("k", 1)
    )
    append_with_expectations(
        spark, path, _frame(spark, 10, 4), exp, idempotency=("k", 2)
    )
    legacy_files = _pin_legacy_dot_generation(path)
    # plant genuine crash residue (a half-written redo predecessor)
    residue = os.path.join(path, "part-junk-crashed.snappy.parquet")
    _frame(spark, 900, 2).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "jk")
    )
    import shutil

    src_file = next(
        f
        for f in os.listdir(str(tmp_path / "jk"))
        if f.endswith(".parquet")
    )
    shutil.copy2(os.path.join(str(tmp_path / "jk"), src_file), residue)
    append_with_expectations(
        spark, path, _frame(spark, 20, 3), exp, idempotency=("k", 3)
    )
    # residue swept, legacy generation files kept
    assert not os.path.exists(residue)
    for rel in legacy_files:
        assert os.path.exists(os.path.join(path, rel)), rel
    read_generation(spark, path, at="legacy").count()


def test_reachable_files_covers_dot_roots():
    m = {
        "head": 3,
        "gens": {
            "2": {"root": ".", "files": ["a.parquet", "b.parquet"]},
            "3": {"root": "_gen/g3", "files": ["b.parquet", "c.parquet"]},
        },
    }
    assert reachable_files(m) == {"a.parquet", "b.parquet", "c.parquet"}
    assert reachable_files(None) == set()


# --- 4. lease heartbeat ------------------------------------------------------


def test_heartbeat_keeps_long_holder_alive(tmp_path):
    """A writer_lock held LONGER than lease_ttl is not stolen: the
    heartbeat refreshes the lease mtime, so a competing appender waits
    (and then proceeds cleanly) instead of taking over mid-verb."""
    io = CASStoreIO()
    io.lease_ttl = 0.3
    io.lease_timeout = 10.0
    path = str(tmp_path / "store")
    os.makedirs(path)
    order: list[str] = []
    release = threading.Event()
    held = threading.Event()

    def holder():
        with io.writer_lock(path):
            held.set()
            release.wait(5.0)
            order.append("holder-exit")

    def contender():
        held.wait(5.0)
        # sleep past the TTL: without a heartbeat the lease would look
        # stale and be stolen here
        time.sleep(3.5 * io.lease_ttl)
        assert io._exclusive_held(path), "live holder's lease was stolen"
        release.set()
        with io.writer_lock(path):
            order.append("contender-enter")

    th, tc = threading.Thread(target=holder), threading.Thread(target=contender)
    th.start(); tc.start(); th.join(10); tc.join(10)
    assert order == ["holder-exit", "contender-enter"]


def test_crashed_holder_still_taken_over(tmp_path):
    io = CASStoreIO()
    io.lease_ttl = 0.3
    io.lease_timeout = 10.0
    path = str(tmp_path / "store")
    os.makedirs(path)
    lease = io._lease_path(path)
    # a crashed holder: lease file exists, nobody heartbeats it
    with open(lease, "w") as fh:
        fh.write(json.dumps({"pid": 0}))
    old = time.time() - 10 * io.lease_ttl
    os.utime(lease, (old, old))
    t0 = time.monotonic()
    with io.writer_lock(path):
        pass
    assert time.monotonic() - t0 < 5.0  # takeover, not timeout


def test_shared_lease_heartbeats_too(tmp_path):
    """An appender outliving lease_ttl is not drained away as crashed
    by a rewriter's shared-lease sweep."""
    io = CASStoreIO()
    io.lease_ttl = 0.3
    io.lease_timeout = 2.0
    path = str(tmp_path / "store")
    os.makedirs(path)
    in_append = threading.Event()
    release = threading.Event()
    results: list[str] = []

    def appender():
        with io.append_lease(path):
            in_append.set()
            release.wait(5.0)
            results.append("appender-exit")

    def rewriter():
        in_append.wait(5.0)
        time.sleep(3.5 * io.lease_ttl)  # appender now older than ttl
        try:
            with io.writer_lock(path):
                results.append("rewriter-enter")
        except TimeoutError:
            results.append("rewriter-timeout")

    ta, tr = threading.Thread(target=appender), threading.Thread(target=rewriter)
    ta.start(); tr.start()
    in_append.wait(5.0)
    time.sleep(3.5 * io.lease_ttl)
    release.set()
    ta.join(10); tr.join(10)
    # the rewriter could not drain the LIVE appender early: it either
    # timed out (appender held past its window) or entered strictly
    # after the appender exited
    assert results[0] == "appender-exit"


# --- 5. conditional determinism pin (VERDICT task 2) --------------------------


def test_pin_once_auto_skips_deterministic_plans(spark):
    from pyspark.sql import functions as F

    from map_reduce_indexing_spark.sources.expectations import (
        _plan_needs_pin,
        pin_once,
    )

    det = spark.range(10).select("id", (F.col("id") * 2).alias("v"))
    assert not _plan_needs_pin(det)
    assert pin_once(det) is det  # auto: no materialization
    # non-deterministic expressions pin
    assert _plan_needs_pin(spark.range(10).withColumn("r", F.rand()))
    # per-execution time expressions pin (Catalyst calls them
    # deterministic, but each ACTION gets its own now())
    assert _plan_needs_pin(
        spark.range(10).withColumn("t", F.current_timestamp())
    )
    assert _plan_needs_pin(
        spark.range(10).withColumn("d", F.current_date())
    )
    # explicit overrides
    assert pin_once(det, True) is not det
    assert pin_once(det, False) is det
    with pytest.raises(ValueError):
        pin_once(det, "always")


def test_gated_append_deterministic_batch_still_exact(spark, tmp_path):
    """The auto-skip path end-to-end: a deterministic gated batch
    splits store/quarantine exactly, audit consistent."""
    from map_reduce_indexing_spark.sources.expectations import (
        append_with_expectations,
        read_quarantine,
    )

    store = str(tmp_path / "store")
    rep = append_with_expectations(
        spark,
        store,
        _frame(spark, -3, 10),
        {"nonneg": [("id", ">=", 0)]},
    )
    assert rep["rows_in"] == 10
    assert rep["rows_appended"] == 7
    assert rep["rows_quarantined"] == 3
    assert _ids(spark, store) == list(range(7))
    assert read_quarantine(spark, store).count() == 3


def test_stale_lease_steal_is_single_winner(tmp_path):
    """Round-12 polish (r11 what's-wrong #3): the stale-lease steal is
    a RENAME claim — many waiters racing one crashed lease produce
    exactly serialized critical sections, never a double-grant."""
    io = CASStoreIO()
    io.lease_ttl = 0.25
    io.lease_timeout = 20.0
    path = str(tmp_path / "store")
    os.makedirs(path)
    lease = io._lease_path(path)
    with open(lease, "w") as fh:
        fh.write(json.dumps({"pid": 0}))
    old = time.time() - 10 * io.lease_ttl
    os.utime(lease, (old, old))  # a crashed holder

    inside = []
    overlap = []
    gate = threading.Lock()

    def worker(i):
        with io.writer_lock(path):
            with gate:
                inside.append(i)
                if len(inside) > 1:
                    overlap.append(tuple(inside))
            time.sleep(0.05)
            with gate:
                inside.remove(i)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(30)
    assert not overlap, overlap


def test_steal_hands_back_a_freshened_lease(tmp_path):
    """A lease that looked stale but was heartbeat-refreshed between
    the waiter's stat and its rename claim is handed straight back."""
    io = CASStoreIO()
    io.lease_ttl = 100.0
    path = str(tmp_path / "store")
    os.makedirs(path)
    lease = io._lease_path(path)
    with open(lease, "w") as fh:
        fh.write(json.dumps({"pid": 0}))
    # fresh mtime, but force the steal branch by lying about the age:
    # monkey-drive _exclusive_held's internals via a tiny ttl window
    io.lease_ttl = 0.2
    time.sleep(0.3)  # now looks stale
    os.utime(lease)  # heartbeat lands "mid-steal" (before the claim)
    io.lease_ttl = 100.0
    assert io._exclusive_held(path) is True
    assert os.path.exists(lease)


def test_steal_restore_never_clobbers_a_new_lease(tmp_path):
    """r12 advice (medium): the fresh-after-all restore must be
    NON-CLOBBERING. If a waiter observed the lease missing during the
    steal window and created a fresh one via O_CREAT|O_EXCL, a plain
    rename restore would silently replace it — two processes then both
    believe they hold the exclusive writer lease. The link-based
    restore fails EEXIST and the claim discards instead."""
    io = CASStoreIO()
    path = str(tmp_path / "store")
    os.makedirs(path)
    lease = io._lease_path(path)
    claimed = lease + ".steal.deadbeef"
    with open(claimed, "w") as fh:
        fh.write(json.dumps({"pid": 0}))  # the displaced holder's file
    with open(lease, "w") as fh:
        fh.write(json.dumps({"pid": 999}))  # another waiter's NEW lease
    assert io._restore_claim(claimed, lease) is False
    with open(lease) as fh:
        assert json.load(fh)["pid"] == 999  # untouched, not clobbered
    assert os.path.exists(claimed)  # caller removes it on False

    # and with NO new lease present, the restore succeeds atomically
    os.remove(lease)
    assert io._restore_claim(claimed, lease) is True
    with open(lease) as fh:
        assert json.load(fh)["pid"] == 0
    assert not os.path.exists(claimed)
