"""Streaming tier: real Structured Streaming runs vs batch oracles."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from map_reduce_indexing_spark.plans import registry
from map_reduce_indexing_spark.streaming.events import incremental_index_append

from .conftest import SF_DIR, assert_df_matches_oracle

ORACLE_QUERIES = [
    "stream_tumbling_counts",
    "stream_session_windows",
    "stream_dedup",
    "stream_interval_join",
    "stream_incremental_index",
    "stream_sliding_counts",
    "stream_static_join",
    "stream_stateful_user_stats",
    "stream_ann_lookup",
    "stream_cdc_upsert",
    "stream_scd2_temporal_join",
]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_streaming_query_matches_oracle(spark, duck, name):
    q = registry.get(name)
    assert_df_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)


def test_stateful_user_stats(spark):
    rows = registry.get("stream_stateful_user_stats").fn(spark, SF_DIR).collect()
    assert len(rows) > 0
    # cross-check against the batch answer
    batch = {
        (r.user_id): (r.n, r.mx)
        for r in __import__("map_reduce_indexing_spark.sources.tables", fromlist=["load_table"])
        .load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    for r in rows:
        n, mx = batch[r.user_id]
        assert r.n_events == n
        assert abs(r.max_value - mx) < 1e-9


def test_incremental_index_checkpoint_recovery(spark, tmp_path):
    """Exactly-once restart semantics: with a checkpoint, a re-run after
    new files arrive appends ONLY the new files' postings (the
    reference's append-only index re-appends everything on any retry,
    SURVEY.md §2.12)."""
    from pyspark.sql import functions as F2

    from map_reduce_indexing_spark.sources.tables import load_table

    src = tmp_path / "src"
    src.mkdir()
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    docs = load_table(spark, SF_DIR, "documents").limit(200)
    batch1 = docs.filter(F2.col("doc_id") < 100)
    batch2 = docs.filter(F2.col("doc_id") >= 100)
    batch1.coalesce(1).write.mode("append").parquet(str(src))

    incremental_index_append(spark, str(src), index, checkpoint=ckpt, glob="*.parquet")
    n1 = spark.read.parquet(index).count()
    assert n1 > 0

    # second run with no new files: nothing appended
    incremental_index_append(spark, str(src), index, checkpoint=ckpt, glob="*.parquet")
    assert spark.read.parquet(index).count() == n1

    # new files arrive: only their postings are appended
    batch2.coalesce(1).write.mode("append").parquet(str(src))
    incremental_index_append(spark, str(src), index, checkpoint=ckpt, glob="*.parquet")
    total = spark.read.parquet(index).count()
    from map_reduce_indexing_spark.operators.indexing import build_postings

    expected = build_postings(batch1).count() + build_postings(batch2).count()
    assert total == expected


def test_incremental_index_crash_replay_converges_exactly_once(spark, tmp_path):
    """The exactly-once claim under a MID-STREAM crash, not just clean
    restarts: foreachBatch's at-least-once window is a crash after a
    batch's data write but before its checkpoint offset commit — on
    restart Structured Streaming REPLAYS that batch. Simulate it by
    deleting the final commit marker after a multi-batch run; the
    replayed batch must overwrite its own per-batch output, leaving the
    re-aggregated index exactly equal to the batch oracle (no dupes)."""
    import os

    from pyspark.sql import functions as F2

    from map_reduce_indexing_spark.operators.indexing import build_postings
    from map_reduce_indexing_spark.sources.tables import load_table

    src = tmp_path / "src"
    src.mkdir()
    index = str(tmp_path / "index")
    ckpt = tmp_path / "ckpt"

    docs = load_table(spark, SF_DIR, "documents").limit(120)
    docs.repartition(3).write.mode("append").parquet(str(src))

    kw = dict(checkpoint=str(ckpt), glob="*.parquet", max_files_per_trigger=1)
    incremental_index_append(spark, str(src), index, **kw)
    n_committed = spark.read.parquet(index).count()

    commits = sorted(
        f for f in os.listdir(ckpt / "commits") if not f.startswith(".")
    )
    assert len(commits) >= 3, "need a multi-batch run to crash mid-stream"
    # the crash: batch N's data is on disk, its offset commit is not.
    # (Remove the Hadoop checksum sidecar too — a real crash loses both,
    # and a stale .crc makes the replay's commit rename fail.)
    os.remove(ckpt / "commits" / commits[-1])
    crc = ckpt / "commits" / f".{commits[-1]}.crc"
    if crc.exists():
        os.remove(crc)

    incremental_index_append(spark, str(src), index, **kw)  # restart

    # replay overwrote, not re-appended: same physical row count ...
    assert spark.read.parquet(index).count() == n_committed
    # ... and the re-aggregated index equals the batch oracle exactly
    merged = {
        (r.word, r.doc_id): r.cnt
        for r in spark.read.parquet(index)
        .groupBy("word", "doc_id")
        .agg(F2.sum("cnt").alias("cnt"))
        .collect()
    }
    oracle = {
        (r.word, r.doc_id): r.cnt for r in build_postings(docs).collect()
    }
    assert merged == oracle


def test_incremental_index_append(spark, tmp_path):
    path = str(tmp_path / "stream_index")
    incremental_index_append(spark, SF_DIR, path)
    idx = spark.read.parquet(path)
    n = idx.count()
    assert n > 0
    # appending a second run doubles the postings (append semantics,
    # the reference's fopen-a+ behavior)
    incremental_index_append(spark, SF_DIR, path)
    assert spark.read.parquet(path).count() == 2 * n


def test_ann_lookup_never_broadcasts_the_store(spark):
    """stream_ann_lookup's static side is the bucket-partitioned
    embedding store — at 100 TB it cannot broadcast. The join must
    broadcast the (small) QUERY side; the store is probe-side only.
    Asserted on the batch-equivalent plan (same ann_lookup_plan the
    streaming query's microbatches execute)."""
    from map_reduce_indexing_spark.operators.dedup import spark_lsh_bucket
    from map_reduce_indexing_spark.sources.tables import load_table
    from map_reduce_indexing_spark.streaming.events import ann_lookup_plan

    queries = (
        load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") < 8)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
        .withColumn("qbucket", F.expr(spark_lsh_bucket("qv")))
    )
    df = ann_lookup_plan(spark, SF_DIR, queries)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    # Every broadcast subtree must be the query side (qv/qbucket cols),
    # never the store (v/bucket partition scan of mri_emb_store_*).
    for sub in plan.split("BroadcastExchange")[1:]:
        head = sub[:600]
        assert "mri_emb_store_" not in head, "embedding store was broadcast"


def test_cdc_upsert_never_regresses_on_out_of_order_changes(spark, tmp_path):
    """A change arriving in a LATER microbatch with an EARLIER
    (ts, event_id) must not overwrite newer state — the latest-wins
    guard of cdc_upsert_stream, proven with explicit batch ordering."""
    import datetime

    from map_reduce_indexing_spark.streaming.events import (
        cdc_upsert_stream,
        fold_cdc_upsert_updates,
    )

    src = tmp_path / "cdc_src"
    src.mkdir()
    schema = "user_id long, ts timestamp, event_id long, event_type string, value double"
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    # batch 1: the NEWER change (ts 12:30) arrives first
    spark.createDataFrame(
        [(1, t0 + datetime.timedelta(minutes=30), 100, "purchase", 9.0)], schema
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    name = "cdc_ooo_sink"
    q = (
        cdc_upsert_stream(stream)
        .writeStream.format("memory")
        .outputMode("update")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: an out-of-order change for the same user (ts 12:00)
        # and a genuinely newer one for another user
        spark.createDataFrame(
            [
                (1, t0, 99, "click", 1.0),
                (2, t0 + datetime.timedelta(minutes=5), 101, "view", 2.0),
            ],
            schema,
        ).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()

    final = {
        r["user_id"]: r
        for r in fold_cdc_upsert_updates(spark.table(name)).collect()
    }
    # user 1 keeps the 12:30 purchase despite the later-arriving older row
    assert final[1]["last_event_type"] == "purchase"
    assert final[1]["last_value"] == 9.0
    assert final[1]["n_changes"] == 2  # the stale change was still counted
    assert final[2]["last_event_type"] == "view"


def test_cdc_upsert_accepts_pre_epoch_timestamps(spark, tmp_path):
    """The have-state flag (not a sentinel tuple) must accept a change
    whose ts is before 1970 — negative ts_us would lose against a
    (-1, -1) sentinel and fabricate empty state."""
    import datetime

    from map_reduce_indexing_spark.streaming.events import (
        cdc_upsert_stream,
        fold_cdc_upsert_updates,
    )

    src = tmp_path / "cdc_pre_epoch"
    src.mkdir()
    schema = "user_id long, ts timestamp, event_id long, event_type string, value double"
    spark.createDataFrame(
        [(7, datetime.datetime(1969, 12, 31, 23, 0, 0), 5, "signup", 3.5)], schema
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    name = "cdc_pre_epoch_sink"
    q = (
        cdc_upsert_stream(stream)
        .writeStream.format("memory")
        .outputMode("update")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    final = {
        r["user_id"]: r
        for r in fold_cdc_upsert_updates(spark.table(name)).collect()
    }
    assert final[7]["last_event_type"] == "signup"
    assert final[7]["last_value"] == 3.5
    assert final[7]["last_ts"] == datetime.datetime(1969, 12, 31, 23, 0, 0)


def test_incremental_index_layout_modes_cannot_mix(spark, tmp_path):
    """Resuming a raw-append (flat letter=*) index with a checkpoint —
    or vice versa — must fail fast instead of writing a mixed-depth
    layout Spark cannot partition-discover."""
    import pytest as _pytest

    from map_reduce_indexing_spark.streaming.events import (
        incremental_index_append,
    )

    idx = tmp_path / "idx"
    (idx / "letter=a").mkdir(parents=True)  # pre-existing flat layout
    with _pytest.raises(ValueError, match="raw-append"):
        incremental_index_append(
            spark, SF_DIR, str(idx), checkpoint=str(tmp_path / "ckpt")
        )

    idx2 = tmp_path / "idx2"
    (idx2 / "batch=0").mkdir(parents=True)  # pre-existing batched layout
    with _pytest.raises(ValueError, match="checkpointed"):
        incremental_index_append(spark, SF_DIR, str(idx2), checkpoint=None)


def test_watermark_drops_late_data(spark, tmp_path):
    """§2.9 watermark semantics, proven directly: with a 1-minute
    watermark, an event arriving in a later microbatch whose timestamp
    is far behind the advanced watermark must NOT create or update its
    window; an on-time event in the same batch must."""
    import datetime
    import uuid

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("k", T.StringType()),
        ]
    )
    base = datetime.datetime(2024, 1, 1, 10, 0, 0)
    late = datetime.datetime(2024, 1, 1, 9, 0, 0)
    src = tmp_path / "src"
    src.mkdir()

    # batch 1 alone: events at 10:00 and 10:09 -> after this batch the
    # watermark advances to 10:08
    spark.createDataFrame(
        [(base, "a"), (base + datetime.timedelta(minutes=9), "a")], schema
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema(schema)
        .parquet(str(src))
        .withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "5 minutes"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2, written only after batch 1 fully processed: one
        # hopelessly late event at 9:00 and one on-time event at 10:10
        spark.createDataFrame(
            [(late, "late"), (base + datetime.timedelta(minutes=10), "ontime")],
            schema,
        ).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table(name).select(
        F.col("window.start").alias("w"), "k", "n"
    ).collect()
    keys = {r.k for r in out}
    assert "ontime" in keys, out
    assert "late" not in keys, f"late event leaked past the watermark: {out}"


def test_stream_funnel_requalifies_on_late_earlier_view(spark, tmp_path):
    """The case a greedy running-min state gets WRONG: the click
    arrives before any qualifying view exists (click@12:05, first view
    known = 12:10, so the chain is view-only); then a LATE view@12:00
    arrives in a later microbatch, pulling t_0 back and retroactively
    qualifying the already-seen click. The set-based state must emit
    the fully-converged chain."""
    import datetime

    from map_reduce_indexing_spark.streaming.events import (
        fold_funnel_updates,
        funnel_stream,
    )

    src = tmp_path / "funnel_src"
    src.mkdir()
    schema = "user_id long, ts timestamp, event_type string"
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def mins(m):
        return t0 + datetime.timedelta(minutes=m)

    # batch 1: click@5 (no qualifying view yet), view@10, purchase@7
    spark.createDataFrame(
        [(1, mins(5), "click"), (1, mins(10), "view"), (1, mins(7), "purchase")],
        schema,
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    name = "funnel_ooo_sink"
    q = (
        funnel_stream(stream, ("view", "click", "purchase"))
        .writeStream.format("memory")
        .outputMode("update")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        mid = {
            r["user_id"]: r
            for r in fold_funnel_updates(spark.table(name), 3).collect()
        }
        # before the late view: chain stops at the view (click@5 < t_0)
        assert mid[1]["t_0"] is not None and mid[1]["t_1"] is None

        # batch 2: the LATE earlier view@0 retroactively qualifies
        # click@5; purchase@7 then completes the whole chain
        spark.createDataFrame([(1, mins(0), "view")], schema).coalesce(
            1
        ).write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()

    import datetime as dt

    us = lambda m: int(  # noqa: E731
        (mins(m) - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000
    )
    final = {
        r["user_id"]: r
        for r in fold_funnel_updates(spark.table(name), 3).collect()
    }
    assert final[1]["t_0"] == us(0)
    assert final[1]["t_1"] == us(5)
    assert final[1]["t_2"] == us(7)


def test_stream_funnel_matches_batch_funnel_on_shuffled_fixture(spark, tmp_path):
    """Arrival order is adversarial: the fixture's events are split
    into 3 microbatch files by a hash that interleaves times across
    batches. The converged per-user times must equal the batch
    funnel's times frame row-for-row."""
    from pyspark.sql import functions as F

    from map_reduce_indexing_spark.operators.eventflow import (
        FUNNEL_STEPS,
        _funnel_times,
    )
    from map_reduce_indexing_spark.streaming.events import (
        fold_funnel_updates,
        funnel_stream,
    )
    from map_reduce_indexing_spark.sources.tables import load_table

    src = tmp_path / "shuffled"
    src.mkdir()
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_type"
    )
    for b in range(3):  # deterministic interleave, not time-ordered
        ev.filter(F.pmod(F.xxhash64("ts"), F.lit(3)) == b).coalesce(
            1
        ).write.mode("append").parquet(str(src / f"b{b}"))

    stream = spark.readStream.schema(
        "user_id long, ts timestamp, event_type string"
    ).option("pathGlobFilter", "*.parquet").parquet(str(src / "b*"))
    from map_reduce_indexing_spark.streaming.events import run_to_completion

    updates = run_to_completion(
        funnel_stream(stream, FUNNEL_STEPS), "update"
    )
    got = {
        r["user_id"]: (r["t_0"], r["t_1"], r["t_2"])
        for r in fold_funnel_updates(updates, 3).collect()
    }
    bt = _funnel_times(spark, SF_DIR).select(
        "user_id",
        *[F.unix_micros(f"t_{i}").alias(f"t_{i}") for i in range(3)],
    )
    want = {
        r["user_id"]: (r["t_0"], r["t_1"], r["t_2"]) for r in bt.collect()
    }
    for uid, times in want.items():
        assert got.get(uid, (None, None, None)) == times


def test_gated_ingest_per_batch_audits_and_quarantine(spark, tmp_path):
    """run_gated_ingest: every microbatch is admitted through the
    expectations gate — per-batch audits land in the store manifest,
    rejects accumulate in the .quarantine sibling with tags, and the
    admitted store equals the globally filtered stream."""
    from map_reduce_indexing_spark.sources.expectations import (
        read_quarantine,
    )
    from map_reduce_indexing_spark.sources.generations import (
        read_generation,
    )
    from map_reduce_indexing_spark.streaming.events import run_gated_ingest

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    rows = [(i, f"u{i % 3}", i * 10) for i in range(40)]  # v in 0..390
    df = spark.createDataFrame(rows, "id long, u string, v long")
    df.repartition(4, "id").write.parquet(src)
    reports = run_gated_ingest(
        spark,
        src,
        store,
        {"v_cap": [("v", "<=", 200)]},
        checkpoint=str(tmp_path / "ckpt"),
        schema=df.schema,
    )
    assert len(reports) >= 2
    assert sum(r["rows_in"] for r in reports) == 40
    admitted = read_generation(spark, store)
    assert admitted.count() == 21  # v in 0..200
    assert admitted.filter("v > 200").count() == 0
    q = read_quarantine(spark, store)
    assert q.count() == 19
    assert {r._violations for r in q.collect()} == {"v_cap"}
    # one audited generation per non-empty batch
    assert sum(r["rows_quarantined"] for r in reports) == 19


def test_gated_ingest_replay_idempotent_after_crash(spark, tmp_path):
    """Round-11 exactly-once fix: a crash AFTER a batch's generation
    publishes but BEFORE the streaming checkpoint commits the offset
    replays that batch on restart (foreachBatch is at-least-once).
    Simulated here by deleting the newest checkpoint commit marker and
    restarting the stream: the replayed batch must be skipped via the
    manifest's applied-batch bookmark — no duplicate rows, no
    duplicate generation, in BOTH the store and its quarantine."""
    import os

    from map_reduce_indexing_spark.sources.expectations import (
        read_quarantine,
    )
    from map_reduce_indexing_spark.sources.generations import (
        generation_head,
        read_generation,
    )
    from map_reduce_indexing_spark.streaming.events import run_gated_ingest

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    rows = [(i, f"u{i % 3}", i * 10) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, u string, v long")
    df.repartition(4, "id").write.parquet(src)
    expectations = {"v_cap": [("v", "<=", 200)]}
    run_gated_ingest(
        spark, src, store, expectations, checkpoint=ckpt, schema=df.schema
    )
    head0 = generation_head(store)
    n0 = read_generation(spark, store).count()
    q0 = read_quarantine(spark, store).count()
    assert n0 == 21 and q0 == 19

    # crash window: the last batch's publish landed, its offset commit
    # did not — drop the newest commit marker and restart
    commits = os.path.join(ckpt, "commits")
    newest = max(
        (f for f in os.listdir(commits) if not f.startswith(".")), key=int
    )
    os.remove(os.path.join(commits, newest))
    crc = os.path.join(commits, f".{newest}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    reports = run_gated_ingest(
        spark, src, store, expectations, checkpoint=ckpt, schema=df.schema
    )
    assert any(r.get("replayed") for r in reports)
    assert generation_head(store) == head0
    assert read_generation(spark, store).count() == n0
    assert read_quarantine(spark, store).count() == q0


def test_gated_ingest_replay_redo_completes_quarantine_window(spark, tmp_path):
    """The crash BETWEEN the quarantine publish and the main publish:
    the redo must skip the already-recorded quarantine write and still
    land the admitted rows — no lost rejects, no doubled rejects."""
    from map_reduce_indexing_spark.sources.expectations import (
        append_with_expectations,
        quarantine_path,
        read_quarantine,
    )
    from map_reduce_indexing_spark.sources.generations import (
        generation_head,
        load_manifest,
        read_generation,
    )

    store = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "id long, v long"
    )
    # first: a clean full apply records batch 0 everywhere
    rep = append_with_expectations(
        spark, store, df, {"v_cap": [("v", "<=", 100)]},
        idempotency=("ck", 0),
    )
    assert rep["rows_appended"] == 11 and rep["rows_quarantined"] == 9
    # replay of batch 0 is a no-op end to end
    rep2 = append_with_expectations(
        spark, store, df, {"v_cap": [("v", "<=", 100)]},
        idempotency=("ck", 0),
    )
    assert rep2.get("replayed") is True
    assert generation_head(store) == rep["generation"]
    assert read_generation(spark, store).count() == 11
    assert read_quarantine(spark, store).count() == 9
    # quarantine recorded its own bookmark inside the same publish
    assert (load_manifest(quarantine_path(store)).get("applied_batches"))[
        "ck"
    ] == 0

    # now the mid-crash shape for batch 1: quarantine published with
    # its record, main store did not (simulated by a quarantine-only
    # apply of the batch's rejects, as the crashed run left it)
    df1 = spark.createDataFrame(
        [(100 + i, 90 + i * 10) for i in range(6)], "id long, v long"
    )  # v: 90..140 -> 2 pass, 4 reject
    from pyspark.sql import functions as F

    from map_reduce_indexing_spark.sources.generations import (
        publish_generation,
    )

    qpath = quarantine_path(store)
    crashed_rejects = (
        df1.filter(F.col("v") > 100)
        .withColumn("_violations", F.lit("v_cap"))
        .withColumn("_src_generation", F.lit(generation_head(store) + 1))
    )
    crashed_rejects.write.mode("append").parquet(qpath)
    qm = load_manifest(qpath)
    marks = dict(qm.get("applied_batches") or {})
    marks["ck"] = 1
    publish_generation(qpath, manifest_extra={"applied_batches": marks})

    # the restart replays batch 1: main store must append its admitted
    # rows; the quarantine write must be skipped (already recorded)
    rep3 = append_with_expectations(
        spark, store, df1, {"v_cap": [("v", "<=", 100)]},
        idempotency=("ck", 1),
    )
    assert rep3.get("replayed") is None
    assert read_generation(spark, store).count() == 13
    assert read_quarantine(spark, store).count() == 13  # 9 + 4, not 9 + 8


def test_gated_ingest_redo_sweeps_half_written_batch(spark, tmp_path):
    """The third crash window: admitted rows WRITTEN but the publish
    never ran (and so no batch id was recorded). The redo must sweep
    the unpublished residue before re-applying — without it the batch
    would land twice (once as the pinned orphan generation, once as
    the redo's append)."""
    from map_reduce_indexing_spark.sources.expectations import (
        append_with_expectations,
    )
    from map_reduce_indexing_spark.sources.generations import (
        generation_head,
        read_generation,
    )

    store = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "id long, v long"
    )
    exp = {"v_cap": [("v", "<=", 100)]}
    # batch 0 applies cleanly
    append_with_expectations(spark, store, df, exp, idempotency=("ck", 0))
    n0 = read_generation(spark, store).count()

    # batch 1 crashes mid-write: admitted rows on disk, no publish,
    # no record
    df1 = spark.createDataFrame(
        [(100 + i, i) for i in range(8)], "id long, v long"
    )
    df1.coalesce(1).write.mode("append").parquet(store)
    head_before = generation_head(store)

    # the restart replays batch 1 through the sink's idempotent append
    rep = append_with_expectations(
        spark, store, df1, exp, idempotency=("ck", 1)
    )
    assert rep.get("replayed") is None and rep["rows_appended"] == 8
    assert generation_head(store) == head_before + 1
    got = sorted(r.id for r in read_generation(spark, store).collect())
    assert got == sorted(
        [i for i in range(20) if i * 10 <= 100] + list(range(100, 108))
    )
    assert read_generation(spark, store).count() == n0 + 8  # not + 16
