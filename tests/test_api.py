"""IndexSession facade: the reference's client lifecycle end-to-end —
build an index from a text tree, query it, append, compact, re-query."""

from __future__ import annotations

import os

from map_reduce_indexing_spark.api import IndexSession


def _write_corpus(root, docs: dict[str, dict[str, str]]) -> None:
    for collection, files in docs.items():
        d = root / collection
        d.mkdir(parents=True, exist_ok=True)
        for name, text in files.items():
            (d / name).write_text(text)


def test_build_query_append_compact(spark, tmp_path):
    corpus = tmp_path / "data"
    _write_corpus(
        corpus,
        {
            "news": {
                "a.txt": "Spark makes queries fast. spark QUERIES!",
                "b.txt": "slow queries are slow",
            },
            "blog": {"c.txt": "spark streams events"},
        },
    )
    index_path = str(tmp_path / "index")
    idx = IndexSession.build(spark, f"{corpus}/*/*", index_path)

    # lookup: letter-pruned posting list with reference tokenization
    # (lowercase, strip non-letters)
    got = {r.doc_id: r.cnt for r in idx.lookup("spark").collect()}
    assert got == {"a": 2, "c": 1}

    # boolean surface
    assert {r.doc_id for r in idx.search_all(["spark", "queries"]).collect()} == {"a"}
    assert {r.doc_id for r in idx.search_any(["spark", "slow"]).collect()} == {
        "a",
        "b",
        "c",
    }
    assert {r.doc_id for r in idx.exclude("queries", "slow").collect()} == {"a"}

    # ranking
    top = idx.top_docs("queries", k=1).collect()
    assert [(r.doc_id, r.cnt) for r in top] == [("a", 2)]

    # the artifact is the reference's letter-partitioned layout
    assert os.path.isdir(os.path.join(index_path, "letter=s"))

    # append + pre-compaction correctness (re-aggregated reads)
    more = spark.createDataFrame(
        [("d", "spark spark everywhere")], "doc_id string, text string"
    )
    idx.append(more)
    got = {r.doc_id: r.cnt for r in idx.lookup("spark").collect()}
    assert got == {"a": 2, "c": 1, "d": 2}

    # compact folds the appended partials; results unchanged
    idx.compact()
    got = {r.doc_id: r.cnt for r in idx.lookup("spark").collect()}
    assert got == {"a": 2, "c": 1, "d": 2}

    vocab = {r.word: r.total for r in idx.vocabulary(k=3).collect()}
    assert vocab.get("spark") == 5


def test_append_blocks_while_writer_lock_held(spark, tmp_path):
    """VERDICT r5 #2: an append issued while another writer holds the
    index lock must WAIT, not interleave. Holding the lock stands in
    for a compactor mid-swap — the deterministic form of the race."""
    import threading
    import time

    from map_reduce_indexing_spark.operators.indexing import index_writer_lock

    base = spark.createDataFrame(
        [("a", "alpha beta"), ("b", "beta gamma")], "doc_id string, text string"
    )
    idx = IndexSession.build(spark, base, str(tmp_path / "index"))
    more = spark.createDataFrame(
        [("c", "beta beta delta")], "doc_id string, text string"
    )
    idx.append(more)  # warm the append path so the timing check is fair
    idx.compact()

    more2 = spark.createDataFrame([("d", "beta")], "doc_id string, text string")
    done = threading.Event()

    def do_append():
        idx.append(more2)
        done.set()

    with index_writer_lock(idx.index_path):
        t = threading.Thread(target=do_append)
        t.start()
        # A warmed append of 1 tiny doc completes well inside 3 s when
        # unblocked; it must NOT complete while we hold the lock.
        assert not done.wait(timeout=3.0), "append ran under a held writer lock"
    t.join(120)
    assert done.is_set()
    got = {r.doc_id: r.cnt for r in idx.lookup("beta").collect()}
    assert got == {"a": 1, "b": 1, "c": 2, "d": 1}


_CHILD_HOLD_LOCK = """
import fcntl, os, sys
fd = os.open(sys.argv[1], os.O_CREAT | os.O_RDWR, 0o644)
fcntl.flock(fd, fcntl.LOCK_EX)
print("LOCKED", flush=True)
sys.stdin.readline()  # hold until the parent says release
fcntl.flock(fd, fcntl.LOCK_UN)
os.close(fd)
"""

_CHILD_TRY_LOCK = """
import fcntl, os, sys
fd = os.open(sys.argv[1], os.O_CREAT | os.O_RDWR, 0o644)
try:
    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    print("ACQUIRED", flush=True)
except BlockingIOError:
    print("BLOCKED", flush=True)
"""


def test_writer_lock_excludes_across_processes(spark, tmp_path):
    """VERDICT r6 #5: the claimed guarantee is CROSS-PROCESS — a
    streaming sink in one session vs a batch compactor in another.
    The thread tests are valid (each call opens its own fd) but only
    same-process evidence. Here: (a) an append in THIS process blocks
    while a subprocess holds the flock and completes losslessly after
    release; (b) a subprocess cannot acquire while this process holds
    it via index_writer_lock, and can after."""
    import subprocess
    import sys
    import threading

    from map_reduce_indexing_spark.operators.indexing import index_writer_lock

    base = spark.createDataFrame(
        [("a", "alpha beta"), ("b", "beta gamma")], "doc_id string, text string"
    )
    index_path = str(tmp_path / "index")
    idx = IndexSession.build(spark, base, index_path)
    idx.append(  # warm the append path so the timing check is fair
        spark.createDataFrame([("c", "beta beta")], "doc_id string, text string")
    )
    lock_file = index_path.rstrip("/") + ".lock"

    # (a) subprocess holds -> parent append must wait, then land
    holder = subprocess.Popen(
        [sys.executable, "-c", _CHILD_HOLD_LOCK, lock_file],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        text=True,
    )
    try:
        assert holder.stdout.readline().strip() == "LOCKED"
        done = threading.Event()

        def do_append():
            idx.append(
                spark.createDataFrame(
                    [("d", "beta")], "doc_id string, text string"
                )
            )
            done.set()

        t = threading.Thread(target=do_append)
        t.start()
        assert not done.wait(timeout=3.0), (
            "append ran while another PROCESS held the writer lock"
        )
        holder.stdin.write("release\n")
        holder.stdin.flush()
        t.join(120)
        assert done.is_set()
    finally:
        holder.stdin.close()
        holder.wait(10)
    got = {r.doc_id: r.cnt for r in idx.lookup("beta").collect()}
    assert got == {"a": 1, "b": 1, "c": 2, "d": 1}

    # (b) parent holds via the real contextmanager -> subprocess blocked
    def probe() -> str:
        return subprocess.run(
            [sys.executable, "-c", _CHILD_TRY_LOCK, lock_file],
            capture_output=True,
            text=True,
            timeout=30,
        ).stdout.strip()

    with index_writer_lock(index_path):
        assert probe() == "BLOCKED"
    assert probe() == "ACQUIRED"


def test_concurrent_append_and_compact_lose_nothing(spark, tmp_path):
    """VERDICT r5 #2, the end-to-end property: an append racing a
    compaction serializes behind the writer lock, so every posting
    survives regardless of which writer wins the lock first."""
    import threading

    base = spark.createDataFrame(
        [("a", "alpha beta"), ("b", "beta gamma")], "doc_id string, text string"
    )
    idx = IndexSession.build(spark, base, str(tmp_path / "index"))
    # Seed partials so the compactor has real merge work.
    idx.append(
        spark.createDataFrame([("a", "alpha alpha")], "doc_id string, text string")
    )

    errs: list[Exception] = []

    def run(fn):
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — surfaced in the assert below
            errs.append(e)

    threads = [
        threading.Thread(target=run, args=(idx.compact,)),
        threading.Thread(
            target=run,
            args=(
                lambda: idx.append(
                    spark.createDataFrame(
                        [("c", "beta omega")], "doc_id string, text string"
                    )
                ),
            ),
        ),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(180)
    assert not errs, errs
    # Fold whatever interleaving happened; nothing may be lost.
    idx.compact()
    got = {(r.word, r.doc_id): r.cnt for r in idx.postings().collect()}
    assert got == {
        ("alpha", "a"): 3,
        ("beta", "a"): 1,
        ("beta", "b"): 1,
        ("beta", "c"): 1,
        ("gamma", "b"): 1,
        ("omega", "c"): 1,
    }


def test_append_heals_crashed_compaction_first(spark, tmp_path):
    """Code-review r6: an append landing AFTER a compactor crashed
    between its two renames (live path missing, full copy stranded at
    <path>.old) must restore the old copy before writing — otherwise it
    recreates the live path with only the delta and the .old index is
    orphaned forever (recover_index's path-missing guard never fires
    again, and the next compact deletes it)."""
    import os
    import shutil

    base = spark.createDataFrame(
        [("a", "alpha beta"), ("b", "beta gamma")], "doc_id string, text string"
    )
    index_path = str(tmp_path / "index")
    idx = IndexSession.build(spark, base, index_path)
    # Simulate the mid-compaction crash state.
    os.replace(index_path, index_path + ".old")
    assert not os.path.exists(index_path)

    idx.append(
        spark.createDataFrame([("c", "beta")], "doc_id string, text string")
    )
    # The pre-crash postings AND the appended ones are all present.
    got = {(r.word, r.doc_id): r.cnt for r in idx.postings().collect()}
    assert got == {
        ("alpha", "a"): 1,
        ("beta", "a"): 1,
        ("beta", "b"): 1,
        ("beta", "c"): 1,
        ("gamma", "b"): 1,
    }
    assert not os.path.isdir(index_path + ".old")
    shutil.rmtree(index_path)


def test_concurrent_compactors_serialize(spark, tmp_path):
    """Two compactors racing on one index must serialize on the writer
    lock — the second re-merges the already-compact index (idempotent)
    instead of clobbering the first's directory swap."""
    import os
    import threading

    base = spark.createDataFrame(
        [("a", "alpha beta"), ("b", "beta gamma")], "doc_id string, text string"
    )
    idx = IndexSession.build(spark, base, str(tmp_path / "index"))
    idx.append(
        spark.createDataFrame([("a", "alpha")], "doc_id string, text string")
    )

    errs: list[Exception] = []

    def run():
        try:
            idx.compact()
        except Exception as e:  # noqa: BLE001 — surfaced below
            errs.append(e)

    threads = [threading.Thread(target=run) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(180)
    assert not errs, errs
    got = {(r.word, r.doc_id): r.cnt for r in idx.postings().collect()}
    assert got == {
        ("alpha", "a"): 2,
        ("beta", "a"): 1,
        ("beta", "b"): 1,
        ("gamma", "b"): 1,
    }
    # clean swap: no stranded .old copy or staging directory
    parent = tmp_path
    leftovers = [
        e
        for e in os.listdir(parent)
        if e.endswith(".old") or e.startswith("mri_compact_")
    ]
    assert leftovers == [], leftovers


def test_query_terms_are_normalized_like_the_tokenizer(spark, tmp_path):
    """ADVICE r4: idx.lookup("Spark") must match the lowercased stored
    token; punctuation is stripped like the indexer would; terms that
    normalize to empty raise instead of returning empty or crashing."""
    import pytest

    corpus = tmp_path / "data"
    _write_corpus(corpus, {"news": {"a.txt": "Spark makes queries fast"}})
    idx = IndexSession.build(spark, f"{corpus}/*/*", str(tmp_path / "index"))

    assert {r.doc_id for r in idx.lookup("Spark").collect()} == {"a"}
    assert {r.doc_id for r in idx.lookup("quer-ies!").collect()} == {"a"}
    assert {r.doc_id for r in idx.search_all(["SPARK", "Queries"]).collect()} == {"a"}
    assert {r.doc_id for r in idx.search_any(["FAST", "absent"]).collect()} == {"a"}
    assert {r.doc_id for r in idx.exclude("Spark", "Slow!").collect()} == {"a"}
    assert [r.doc_id for r in idx.top_docs("FAST.", k=1).collect()] == ["a"]

    for bad in ("", "42", "!!!"):
        with pytest.raises(ValueError):
            idx.lookup(bad)
        with pytest.raises(ValueError):
            idx.search_all(["spark", bad])

    # Multi-word terms must be rejected, not silently fused into a
    # token ('machine learning' -> 'machinelearning') that can never match.
    with pytest.raises(ValueError, match="multiple words"):
        idx.lookup("machine learning")


def test_adhoc_sql_surface(spark):
    from map_reduce_indexing_spark import api
    from tests.conftest import SF_DIR

    n = api.sql(spark, SF_DIR, "SELECT count(*) AS n FROM orders").collect()[0]["n"]
    assert n == spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    # joins across registered views plan and run
    top = api.sql(
        spark,
        SF_DIR,
        """
        SELECT n_name, count(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n DESC, n_name LIMIT 3
        """,
    ).collect()
    assert len(top) == 3 and all(r["n"] > 0 for r in top)


def test_delete_docs_removes_from_search_keeps_pinned(spark, tmp_path):
    """Round 10: the takedown verb — deleted documents vanish from
    every search surface immediately; a tagged pre-delete snapshot
    still serves them; letter_stats stays exact after its refresh."""
    from map_reduce_indexing_spark.api import IndexSession
    from map_reduce_indexing_spark.sources.generations import (
        tag_generation,
    )

    docs = spark.createDataFrame(
        [("d1", "apple banana"), ("d2", "apple cherry")],
        "doc_id string, text string",
    )
    s = IndexSession.build(spark, docs, str(tmp_path / "ix"))
    s.append(
        spark.createDataFrame(
            [("d3", "banana date")], "doc_id string, text string"
        )
    )  # appends publish generations; build alone does not
    tag_generation(s.index_path, "pre-takedown")
    report = s.delete_docs(["d2"])
    assert report["deleted_rows"] == 2  # apple + cherry postings
    assert {r.doc_id for r in s.lookup("apple").collect()} == {"d1"}
    assert s.lookup("cherry").count() == 0
    # pinned snapshot still serves the deleted doc
    pinned = s.postings_at("pre-takedown")
    assert {r.doc_id for r in pinned.collect()} >= {"d1", "d2", "d3"}
    # the stats view recovers exactly
    stats = {
        r.letter: (r.total_cnt, r.n_docs)
        for r in s.letter_stats().collect()
    }
    assert "c" not in stats  # cherry's letter group vanished entirely
    assert stats["a"] == (1, 1)  # apple only in d1 now


def test_vector_store_delete_ids(spark, tmp_path):
    from map_reduce_indexing_spark.api import VectorStore

    import random

    random.seed(7)
    rows = [(i, [random.uniform(-1, 1) for _ in range(64)])
            for i in range(200)]
    vecs = spark.createDataFrame(rows, "vec_id long, v array<double>")
    vs = VectorStore.build(spark, vecs, str(tmp_path / "vs"))
    report = vs.delete_ids([5, 6, 7])
    # build alone publishes no generation; the delete auto-pins the
    # pre-delete state as its own generation first
    pre = report["generation"] - 1
    assert report["deleted_rows"] == 3
    assert vs.vectors().filter("vec_id in (5,6,7)").count() == 0
    assert vs.vectors().count() == 197
    # pinned pre-delete snapshot intact
    assert vs.vectors_at(pre).count() == 200
    # lookups still work over the post-delete store: querying with a
    # surviving vector's own values guarantees a non-empty bucket
    q = rows[10][1]
    top = vs.topk(q, k=5).collect()  # one pruned-bucket scan: sparse
    assert top and top[0].vec_id == 10  # self-match leads
    assert not {5, 6, 7} & {r.vec_id for r in top}
