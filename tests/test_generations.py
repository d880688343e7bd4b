"""Artifact generations: snapshot isolation for maintained stores.

Round-9 operator class (VERDICT task 7): every flock-managed artifact
appends then compacts, but a reader had no way to PIN a version across
a multi-query session. sources/generations.py adds monotonically
versioned generations (manifest of immutable parquet files per
generation, the export_shards manifest pattern applied inward):
appends publish a new head, compaction relocates pinned generations
under _gen/ via hardlinks staged with the swap, reads resolve
`at=generation` with basePath-anchored partition columns.

Pinned here: a pinned reader's queries return identical rows across
appends AND across the compaction swap; the live read sees new data
immediately; retention ages out old eras; and a concurrent
append+compact writer cannot make a pinned reader observe anything but
its snapshot.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from map_reduce_indexing_spark.api import IndexSession, VectorStore
from map_reduce_indexing_spark.sources.generations import (
    GEN_RETAIN,
    generation_head,
    load_manifest,
    read_generation,
)


def _docs(spark, lo: int, n: int, word: str):
    return spark.createDataFrame(
        [(lo + i, f"{word} common") for i in range(n)],
        "doc_id long, text string",
    )


def _session(spark, tmp_path) -> IndexSession:
    path = str(tmp_path / "index")
    return IndexSession.build(spark, _docs(spark, 0, 10, "alpha"), path)


def test_pinned_reader_survives_append_and_compaction(spark, tmp_path):
    s = _session(spark, tmp_path)
    s.append(_docs(spark, 100, 5, "beta"))
    pin = s.generation()  # head after first append
    base_rows = {
        (r.word, r.doc_id, r.cnt) for r in s.postings_at(pin).collect()
    }
    assert base_rows  # non-vacuous

    s.append(_docs(spark, 200, 7, "gamma"))  # append after the pin
    after_append = {
        (r.word, r.doc_id, r.cnt) for r in s.postings_at(pin).collect()
    }
    assert after_append == base_rows  # query 1: same snapshot
    live = {(r.word, r.doc_id, r.cnt) for r in s.postings().collect()}
    assert live > base_rows  # live read sees the new docs

    s.compact()  # the directory-replacing swap
    after_compact = {
        (r.word, r.doc_id, r.cnt) for r in s.postings_at(pin).collect()
    }
    assert after_compact == base_rows  # query 2: STILL the same snapshot
    # the pinned generation now resolves under the relocated _gen root
    m = load_manifest(s.index_path)
    assert m["gens"][str(pin)]["root"].startswith("_gen/")
    # head advanced past the pin and reads the compacted live files
    assert s.generation() > pin
    assert {
        (r.word, r.doc_id, r.cnt) for r in s.postings_at().collect()
    } == live


def test_generations_monotonic_and_published_per_append(spark, tmp_path):
    s = _session(spark, tmp_path)
    assert s.generation() == 0  # nothing published before first append
    s.append(_docs(spark, 100, 1, "one"))
    g1 = s.generation()
    s.append(_docs(spark, 101, 1, "two"))
    g2 = s.generation()
    assert g2 > g1 >= 1
    # earlier generation excludes the later append
    words_g1 = {r.word for r in s.postings_at(g1).collect()}
    words_g2 = {r.word for r in s.postings_at(g2).collect()}
    assert "two" in words_g2 and "two" not in words_g1


def test_retention_ages_out_old_eras(spark, tmp_path, monkeypatch):
    import map_reduce_indexing_spark.sources.generations as G

    # TTL 0 reduces the policy to pure count-based aging (the default
    # 1-hour TTL exists so pinned readers get a wall-clock guarantee
    # under writer churn — tested in the concurrent test above)
    monkeypatch.setattr(G, "GEN_TTL_SECONDS", 0.0)
    s = _session(spark, tmp_path)
    pins = []
    for i in range(GEN_RETAIN + 2):  # each loop: one append + compact era
        s.append(_docs(spark, 1000 + i, 1, f"w{i}"))
        pins.append(s.generation())
        s.compact()
    m = load_manifest(s.index_path)
    roots = {g["root"] for g in m["gens"].values() if g["root"] != "."}
    assert len(roots) == GEN_RETAIN  # bounded relocated eras
    # the oldest pin is gone with a helpful error; the newest survives
    import pytest

    with pytest.raises(ValueError, match="not available"):
        s.postings_at(pins[0]).collect()
    assert s.postings_at(pins[-1]).count() > 0


def test_vector_store_snapshot_pins_training_input(spark, tmp_path):
    """The motivating scenario: train on snapshot S while ingest
    continues — the pinned frame is stable across an append and a
    compaction."""
    path = str(tmp_path / "store")
    base = spark.createDataFrame(
        [(i, [float(i % 5)] * 64) for i in range(20)],
        "vec_id long, v array<double>",
    )
    vs = VectorStore.build(spark, base, path)
    vs.append(
        spark.createDataFrame(
            [(100, [1.0] * 64)], "vec_id long, v array<double>"
        )
    )
    pin = vs.generation()
    ids = {r.vec_id for r in vs.vectors_at(pin).select("vec_id").collect()}
    vs.append(
        spark.createDataFrame(
            [(200, [2.0] * 64)], "vec_id long, v array<double>"
        )
    )
    vs.compact()
    assert {
        r.vec_id for r in vs.vectors_at(pin).select("vec_id").collect()
    } == ids
    assert 200 in {
        r.vec_id for r in vs.vectors_at().select("vec_id").collect()
    }
    # partition column survives relocation (basePath anchoring)
    assert "bucket" in vs.vectors_at(pin).columns


def test_concurrent_append_compact_reader_stays_pinned(spark, tmp_path):
    """The verdict's done-bar: a reader pinned at generation g keeps
    seeing exactly g's rows while a writer thread appends and compacts
    underneath it."""
    import threading

    s = _session(spark, tmp_path)
    s.append(_docs(spark, 100, 3, "pinme"))
    pin = s.generation()
    want = s.postings_at(pin).count()
    stop = threading.Event()
    errors: list[Exception] = []

    def writer():
        try:
            for i in range(3):
                s.append(_docs(spark, 5000 + 10 * i, 2, f"churn{i}"))
                s.compact()
        except Exception as e:  # pragma: no cover
            errors.append(e)
        finally:
            stop.set()

    t = threading.Thread(target=writer)
    t.start()
    reads = 0
    try:
        while not stop.is_set() or reads == 0:
            assert s.postings_at(pin).count() == want
            reads += 1
            if reads > 200:  # safety valve
                break
    finally:
        t.join()
    assert not errors, errors
    assert reads >= 2  # raced the writer more than once


def test_manifest_is_invisible_to_directory_scans(spark, tmp_path):
    """The _generations.json sidecar and _gen/ relocation dir must
    never leak into a live directory read (underscore rule)."""
    s = _session(spark, tmp_path)
    s.append(_docs(spark, 100, 2, "x"))
    s.compact()
    assert os.path.isfile(os.path.join(s.index_path, "_generations.json"))
    assert os.path.isdir(os.path.join(s.index_path, "_gen"))
    live = s.postings()
    assert live.count() == read_generation(
        spark, s.index_path, at=generation_head(s.index_path)
    ).groupBy("word", "doc_id").count().count()
    # no _gen file paths in the live scan
    assert not [f for f in live.inputFiles() if "/_gen/" in f]


def test_tokens_artifact_delta_publishes_generations(spark, tmp_path):
    """The session-artifact tier (task-7 ask: session_artifact reads
    `at=`): each incremental delta append publishes a generation, so a
    pinned tokenized_docs(at=g) keeps returning the pre-append doc set
    while the live read grows."""
    import shutil

    from map_reduce_indexing_spark.operators.tokens import tokenized_docs
    from tests.conftest import SF_DIR

    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    shutil.copy(
        os.path.join(SF_DIR, "documents.parquet"),
        os.path.join(corpus, "documents.parquet.orig"),
    )
    os.makedirs(os.path.join(corpus, "documents.parquet"))
    shutil.move(
        os.path.join(corpus, "documents.parquet.orig"),
        os.path.join(corpus, "documents.parquet", "part-0.parquet"),
    )
    base = tokenized_docs(spark, corpus)
    base_ids = {r.doc_id for r in base.select("doc_id").collect()}
    path = base.inputFiles()[0]
    art_dir = os.path.dirname(path.removeprefix("file:"))
    extra = spark.createDataFrame(
        [(10**7 + i, f"generation pin doc {i}", "en", "unit")
         for i in range(3)],
        "doc_id long, text string, lang string, source string",
    )
    extra.write.mode("append").parquet(
        os.path.join(corpus, "documents.parquet")
    )
    live = tokenized_docs(spark, corpus)  # delta append + publish
    g = generation_head(art_dir)
    assert g >= 2  # base generation + the delta's head
    pinned_pre = {
        r.doc_id
        for r in tokenized_docs(spark, corpus, at=g - 1)
        .select("doc_id")
        .collect()
    }
    assert pinned_pre == base_ids  # snapshot: no delta docs
    live_ids = {r.doc_id for r in live.select("doc_id").collect()}
    assert live_ids == base_ids | {10**7, 10**7 + 1, 10**7 + 2}
    assert {
        r.doc_id
        for r in tokenized_docs(spark, corpus, at=g)
        .select("doc_id")
        .collect()
    } == live_ids


def test_streaming_ingest_publishes_generation_per_microbatch(
    spark, tmp_path
):
    """A checkpointed streaming ingest publishes one generation per
    microbatch, so a reader can pin the store exactly as some batch
    left it while later batches keep landing."""
    from map_reduce_indexing_spark.streaming.events import (
        incremental_index_append,
    )

    import pandas as pd

    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    for part in range(2):  # single parquet FILES: the source doesn't recurse
        pd.DataFrame(
            {
                "doc_id": [part * 10 + i for i in range(3)],
                "text": [f"stream word{part}"] * 3,
                "lang": ["en"] * 3,
                "source": ["unit"] * 3,
            }
        ).to_parquet(os.path.join(corpus, f"p{part}.parquet"))
    index_path = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    incremental_index_append(
        spark,
        corpus,
        index_path,
        checkpoint=ckpt,
        glob="*.parquet",
        max_files_per_trigger=1,  # -> one microbatch per file
    )
    head = generation_head(index_path)
    assert head >= 2  # one generation per microbatch
    early = read_generation(spark, index_path, at=head - 1).count()
    final = read_generation(spark, index_path, at=head).count()
    assert 0 < early < final  # the pin excludes the later batch


def test_generation_diff_reads_only_the_delta(spark, tmp_path):
    """Incremental consumption: between two append generations the
    diff scans ONLY the new files; across a compaction it falls back
    to an exact anti-join on the given keys (or refuses without
    them)."""
    import pytest

    from map_reduce_indexing_spark.sources.generations import (
        generation_diff,
    )

    s = _session(spark, tmp_path)
    s.append(_docs(spark, 100, 4, "early"))
    g1 = s.generation()
    s.append(_docs(spark, 200, 6, "late"))
    g2 = s.generation()
    delta = generation_diff(spark, s.index_path, since=g1, until=g2)
    ids = {r.doc_id for r in delta.select("doc_id").distinct().collect()}
    assert ids == set(range(200, 206))  # exactly the late batch
    # the fast path scanned only files g1 didn't have
    m = load_manifest(s.index_path)
    old = set(m["gens"][str(g1)]["files"])
    for f in delta.inputFiles():
        assert not any(f.endswith(o) for o in old)
    # empty diff at equal generations
    assert generation_diff(spark, s.index_path, g2, g2).count() == 0

    s.compact()  # rewrites every file: sets incomparable
    g3 = s.generation()
    with pytest.raises(ValueError, match="span a compaction"):
        generation_diff(spark, s.index_path, since=g1, until=g3)
    s.append(_docs(spark, 300, 2, "post"))
    g4 = s.generation()
    anti = generation_diff(
        spark, s.index_path, since=g1, until=g4, key_cols=("word", "doc_id")
    )
    anti_ids = {r.doc_id for r in anti.select("doc_id").distinct().collect()}
    assert anti_ids == set(range(200, 206)) | {300, 301}


def test_optimize_store_reclusters_and_preserves_everything(spark, tmp_path):
    """OPTIMIZE as a store verb (round 10): a hash-scattered store is
    rewritten range-clustered; range predicates then PRUNE files where
    before they kept everything; the pre-optimize pinned generation
    still serves byte-identical rows; row images are preserved so a
    matview across the span stays exact."""
    from pyspark.sql import functions as F

    from map_reduce_indexing_spark.operators.matview import (
        create_matview,
        read_matview,
        refresh_matview,
    )
    from map_reduce_indexing_spark.sources.generations import (
        optimize_store,
        plan_generation_scan,
        publish_generation,
    )

    base = str(tmp_path / "b")
    df = spark.range(40_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp"),
        (F.col("id") * 3).alias("v"),
    )
    df.repartition(8).write.parquet(base)  # round-robin: ranges overlap
    publish_generation(base)
    pre = generation_head(base)
    before = sorted(tuple(r) for r in read_generation(spark, base).collect())
    _r, kept0, total0 = plan_generation_scan(
        base, where=[("k", "between", (100, 199))]
    )
    assert len(kept0) == total0  # scattered layout: nothing prunable

    view = str(tmp_path / "v")
    create_matview(
        spark, base, view, ["grp"],
        {"n": ("count", "*"), "total": ("sum", "v")}, row_keys=["k"],
    )

    head = optimize_store(spark, base, ["k"], n_files=8)
    assert head == pre + 1
    _r, kept1, total1 = plan_generation_scan(
        base, where=[("k", "between", (100, 199))]
    )
    assert len(kept1) < total1  # clustered: the range prunes
    assert len(kept1) <= 2
    # rows byte-identical; the pinned pre-optimize snapshot intact
    assert sorted(
        tuple(r) for r in read_generation(spark, base).collect()
    ) == before
    assert sorted(
        tuple(r) for r in read_generation(spark, base, at=pre).collect()
    ) == before
    # matview across the re-layout span stays exact
    refresh_matview(spark, view)
    got = sorted(tuple(r) for r in read_matview(spark, view).collect())
    want = sorted(
        tuple(r)
        for r in read_generation(spark, base)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    )
    assert got == want


@pytest.fixture(autouse=True)
def _both_io_backends(io_backend):
    """Round 11: every test in this module runs under BOTH commit
    backends (see conftest.io_backend) — POSIX and object-store CAS."""


def test_read_plan_memo_identity_and_invalidation(
    spark, tmp_path, monkeypatch
):
    """r14 optimization: read_generation memoizes the RESOLVED lazy
    plan keyed on (session, path, at, where, merge_schema, manifest
    file identity, DV broadcast threshold). Contract pinned here:
    (a) a repeated identical read is a memo HIT (same plan object —
    the manifest parse/stats-pruning driver work is not repeated);
    (b) ANY manifest commit invalidates, so a live read sees new data
    immediately; (c) a pinned `at=` read of the old generation still
    serves the old snapshot after the commit; (d) a changed
    DV_BROADCAST_MAX_ROWS re-resolves (plan shape is part of the
    identity — test_dv_anti_leaves_broadcast_above_guard relies on
    this). No data is cached: the memoized object is a lazy plan."""
    import map_reduce_indexing_spark.sources.generations as G
    from map_reduce_indexing_spark.sources.generations import append_rows

    path = str(tmp_path / "store")
    append_rows(
        spark,
        path,
        spark.createDataFrame([(i,) for i in range(10)], "id long"),
    )
    g1 = generation_head(path)
    a = read_generation(spark, path)
    assert read_generation(spark, path) is a  # (a) memo hit

    append_rows(
        spark, path, spark.createDataFrame([(99,)], "id long")
    )
    c = read_generation(spark, path)
    assert c is not a  # (b) commit invalidated the head read
    assert sorted(r.id for r in c.collect()) == list(range(10)) + [99]
    pinned = read_generation(spark, path, at=g1)
    assert sorted(r.id for r in pinned.collect()) == list(range(10))  # (c)

    monkeypatch.setattr(G, "DV_BROADCAST_MAX_ROWS", 1)
    assert read_generation(spark, path) is not c  # (d) tunable in key
