"""Structured Streaming over the `events` fixture (SURVEY.md §2.9 EXT).

The reference is strictly batch (one job per client request,
worker.c:61-157); its only streaming-adjacent behavior is the
append-mode master index (helper_reduce.c:241 `fopen(.., "a+")`).
This module supplies the streaming tier:

- tumbling-window aggregation with watermark (real readStream ->
  memory sink, driven to completion synchronously for verification);
- session windows (built-in `session_window`, oracle-checked against
  a gaps-and-islands SQL formulation);
- watermarked streaming dedup (`dropDuplicates`);
- a custom stateful operator via applyInPandasWithState;
- incremental index maintenance via foreachBatch append (the
  streaming analogue of the reference's S4 sink) — see
  `incremental_index_append` (exercised in tests; side-effecting,
  so not a registered query).

At scale the same code runs against Kafka/files with real triggers;
watermarks bound state, and the partitioned-parquet append commits
atomically per microbatch — fixing the reference's unlocked
concurrent-append race (SURVEY.md §2.12).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..operators.dedup import duck_cosine, duck_lsh_bucket, spark_cosine, spark_lsh_bucket
from ..plans.registry import register
from ..sources.tables import load_table

# Parquet-level schema: ts arrives as epoch-nanos long (nanosAsLong).
EVENTS_FILE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

SESSION_GAP = "5 minutes"
WINDOW = "5 minutes"


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet, ts normalized to
    microsecond timestamps (same floor semantics as the batch source).

    The ts parquet type is TIMESTAMP(NANOS): with nanosAsLong (our
    session default) it reads as epoch-nanos long; in a foreign session
    without that conf it may arrive as a timestamp already. Probe the
    batch reader's view and build the matching stream schema."""
    from ..sources.tables import _ensure_session_confs

    _ensure_session_confs(spark)
    raw_batch = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    batch_ts_type = dict(raw_batch.dtypes).get("ts")
    if batch_ts_type == "bigint":
        schema, needs_convert = EVENTS_FILE_SCHEMA, True
    else:
        fields = [
            f if f.name != "ts" else T.StructField("ts", T.TimestampType())
            for f in EVENTS_FILE_SCHEMA.fields
        ]
        schema, needs_convert = T.StructType(fields), False
    # The file source requires a directory; glob-filter to the one table.
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if needs_convert:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return raw


# Streaming state partitioning: a stateful streaming query creates one
# state store PER shuffle partition, and every microbatch pays commit +
# snapshot overhead per store. The fixture streams carry small state
# (10^3-10^4 windows/keys), so 32 stores are pure overhead — measured
# 1.47 s -> 0.97 s on stream_tumbling_counts by dropping to 8. At real
# scale size this to state volume / executor count, not to the batch
# shuffle width.
STREAM_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8"))

# spark.sql.shuffle.partitions is SESSION-global: narrowing it for a
# streaming run would silently re-plan any batch query a concurrent
# thread submits on the same SparkSession with the narrow width. The
# lock serializes every run_to_completion caller; batch callers on other
# threads are outside its reach, so the conf mutation is kept to the
# shortest possible span and restored in finally. (Per-query isolation
# would need separate SparkSessions — `spark.newSession()` — which the
# single-session driver contract here doesn't allow.)
_SHUFFLE_CONF_LOCK = __import__("threading").Lock()


def run_to_completion(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Drive a streaming aggregation over the (finite) file source to
    completion via a memory sink; returns the result as a batch DF.

    The shuffle-partition conf is narrowed to STREAM_SHUFFLE_PARTITIONS
    for the duration of the run (a streaming query pins its state layout
    at start), then restored for batch work. Runs are serialized by
    `_SHUFFLE_CONF_LOCK` (see note above on the session-global conf)."""
    spark = stream_df.sparkSession
    name = f"mem_{uuid.uuid4().hex[:12]}"
    with _SHUFFLE_CONF_LOCK:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(STREAM_SHUFFLE_PARTITIONS)
        )
        try:
            q = (
                stream_df.writeStream.outputMode(output_mode)
                .format("memory")
                .queryName(name)
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


@register(
    "stream_tumbling_counts",
    oracle=f"""
        SELECT time_bucket(INTERVAL '{WINDOW}', ts) AS bucket_start,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2
    """,
    tier="streaming",
    doc=f"Real Structured Streaming: watermarked {WINDOW} tumbling-window "
    "counts per event_type, file source -> memory sink, driven to "
    "completion synchronously. Complete mode over a finite source "
    "equals the batch answer, which is what the oracle checks.",
)
def q_stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", WINDOW), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )
    out = run_to_completion(agg, "complete")
    return out.select(
        F.col("window.start").alias("bucket_start"), "event_type", "n", "total_value"
    )


SLIDE = "5 minutes"
SLIDING_WINDOW = "10 minutes"


@register(
    "stream_sliding_counts",
    export=False,  # pytest-verified variant; kept out of the external window
    oracle=f"""
        SELECT bucket_start, event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM (
            SELECT unnest([time_bucket(INTERVAL '{SLIDE}', ts),
                           time_bucket(INTERVAL '{SLIDE}', ts) - INTERVAL '{SLIDE}'])
                     AS bucket_start,
                   event_type, value
            FROM events)
        GROUP BY 1, 2
    """,
    tier="streaming",
    doc=f"Sliding windows ({SLIDING_WINDOW} length, {SLIDE} slide): each "
    "event lands in length/slide = 2 overlapping windows. The oracle "
    "unnests the two candidate window starts per event — the relational "
    "rendering of window() with a slide.",
)
def q_stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", SLIDING_WINDOW, SLIDE), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )
    out = run_to_completion(agg, "complete")
    return out.select(
        F.col("window.start").alias("bucket_start"), "event_type", "n", "total_value"
    )


@register(
    "stream_session_windows",
    oracle=f"""
        WITH marked AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w > INTERVAL '{SESSION_GAP}'
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, ts,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
            FROM marked)
        SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sess GROUP BY user_id, session_id
    """,
    tier="streaming",
    doc=f"Session windows ({SESSION_GAP} gap) via the built-in "
    "session_window over a real watermarked readStream (file source -> "
    "memory sink, complete mode — same harness as the other streaming "
    "queries), oracle-checked against a gaps-and-islands SQL "
    "formulation. Boundary semantics verified empirically (Spark 4.1): "
    "session_window MERGES an event exactly gap after the previous one "
    "(adjacent ranges coalesce), so the oracle splits only on strict "
    "'>' — a tie cannot mismatch by construction.",
)
def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", SESSION_GAP), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    out = run_to_completion(agg, "complete")
    return out.select("user_id", "session_start", "session_end", "n_events")


@register(
    "stream_dedup",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_unique
        FROM events
    """,
    tier="streaming",
    doc="Watermarked streaming dedup (dropDuplicates on event_id): state "
    "is bounded by the watermark horizon; over the finite source the "
    "surviving count equals COUNT(DISTINCT event_id).",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    deduped = ev.withWatermark("ts", "10 minutes").dropDuplicates(["event_id"])
    counted = deduped.groupBy().agg(F.count(F.lit(1)).alias("n_unique"))
    out = run_to_completion(counted, "complete")
    total = load_table(spark, sf_dir, "events").count()
    return out.select(F.lit(total).cast("long").alias("n_events"), "n_unique")


@register(
    "stream_stateful_user_stats",
    # The memory sink accumulates one update row per (user, microbatch);
    # n_events and max_value are monotone over a user's updates, so the
    # final state is the per-user max of both — which equals the batch
    # group-by, giving an exact oracle for the stateful operator.
    oracle="""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(value) AS max_value
        FROM events GROUP BY user_id
    """,
    tier="streaming",
    doc="Custom stateful streaming operator (applyInPandasWithState): "
    "per-user running event count + max value kept in GroupState, "
    "emitted in update mode; final per-user state folded out of the "
    "update log and oracle-checked against the batch recompute. The "
    "non-SQL-expressible tier of §2.9.",
)
def q_stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = read_events_stream(spark, sf_dir).select("user_id", "value")

    def update(key, pdfs, state: GroupState):
        n, vmax = state.get if state.exists else (0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                vmax = max(vmax, float(pdf["value"].max()))
        state.update((n, vmax))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "max_value": [vmax]})

    stats = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, max_value double",
        stateStructType="n long, vmax double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    updates = run_to_completion(stats, "update")
    # Fold the update log to final state: both stats are monotone
    # non-decreasing per user, so max == last == the converged value.
    return updates.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("max_value").alias("max_value"),
    )


def _latest_state_oracle() -> str:
    from ..operators.cdc import _LATEST_SQL

    return _LATEST_SQL


@register(
    "stream_cdc_upsert",
    # Shares rel_cdc_latest_state's oracle: the continuously-maintained
    # upsert state must converge to the batch log compaction.
    oracle=_latest_state_oracle(),
    tier="streaming",
    doc="Continuous CDC upsert (the streaming half of operators/cdc.py): "
    "per-key latest-wins state in applyInPandasWithState — a change row "
    "replaces the key's state iff its (ts, event_id) exceeds the stored "
    "one, so late/out-of-order changes within a batch or across batches "
    "can never regress state. Update-mode emissions are folded to the "
    "final state by max_by over the strictly-increasing change counter. "
    "This is the operator a streaming materialized view of a mutable "
    "table needs (Kafka topic -> continuously-fresh dimension).",
)
def q_stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    return fold_cdc_upsert_updates(run_to_completion(cdc_upsert_stream(ev), "update"))


def cdc_upsert_stream(ev: DataFrame) -> DataFrame:
    """Latest-wins upsert state over a stream with (user_id, ts,
    event_id, event_type, value) columns; emits the running state per
    key in update mode. Split out so tests can drive it with an
    adversarial (out-of-order) source."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = ev.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "event_type",
        "value",
    )

    def upsert(key, pdfs, state: GroupState):
        # An explicit have-state flag, NOT a sentinel tuple: a sentinel
        # like (-1, -1) would silently reject legitimate pre-epoch
        # timestamps (negative ts_us) and could itself be emitted as
        # fabricated state.
        have = state.exists
        ts_us, eid, etype, val, n = (
            state.get if have else (0, 0, "", 0.0, 0)
        )
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            top = pdf.sort_values(["ts_us", "event_id"]).iloc[-1]
            if not have or (int(top["ts_us"]), int(top["event_id"])) > (ts_us, eid):
                ts_us, eid = int(top["ts_us"]), int(top["event_id"])
                etype, val = str(top["event_type"]), float(top["value"])
                have = True
        state.update((ts_us, eid, etype, val, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "ts_us": [ts_us],
                "event_id": [eid],
                "last_event_type": [etype],
                "last_value": [val],
                "n_changes": [n],
            }
        )

    return ev.groupBy("user_id").applyInPandasWithState(
        upsert,
        outputStructType=(
            "user_id long, ts_us long, event_id long, "
            "last_event_type string, last_value double, n_changes long"
        ),
        stateStructType="ts_us long, eid long, etype string, val double, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def fold_cdc_upsert_updates(log: DataFrame) -> DataFrame:
    # n_changes strictly increases per emission, so max_by(_, n_changes)
    # is the converged (final) state row for each key.
    return log.groupBy("user_id").agg(
        F.timestamp_micros(F.max_by(F.col("ts_us"), F.col("n_changes"))).alias(
            "last_ts"
        ),
        F.max_by(F.col("last_event_type"), F.col("n_changes")).alias(
            "last_event_type"
        ),
        F.max_by(F.col("last_value"), F.col("n_changes")).alias("last_value"),
        F.max("n_changes").alias("n_changes"),
    )


@register(
    "stream_interval_join",
    oracle="""
        SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
               p.ts AS purchase_ts, c.ts AS click_ts
        FROM events p JOIN events c
          ON c.user_id = p.user_id
         AND p.event_type = 'purchase' AND c.event_type = 'click'
         AND c.ts >= p.ts - INTERVAL '10 minutes' AND c.ts <= p.ts
    """,
    tier="streaming",
    doc="Stream-stream interval join (SURVEY.md §2.3 J6 streaming / §2.9): "
    "every click within 10 minutes before a purchase by the same user, "
    "two watermarked file-source streams, append mode. Watermarks + the "
    "two-sided time bound let Spark expire join state, so state stays "
    "bounded on an unbounded stream; over the finite fixture the result "
    "equals the batch range join the oracle computes.",
)
def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "30 minutes")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    c = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "30 minutes")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    joined = p.join(
        c,
        (F.col("c_user_id") == F.col("user_id"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
        "inner",
    )
    out = run_to_completion(
        joined.select("purchase_id", "click_id", "user_id", "purchase_ts", "click_ts"),
        "append",
    )
    return out


def _postings_oracle() -> str:
    from ..operators.indexing import POSTINGS_SQL

    return POSTINGS_SQL


@register(
    "stream_incremental_index",
    # Same oracle as the batch index build: the incrementally-maintained
    # index must converge to the batch answer.
    oracle=_postings_oracle(),
    tier="streaming",
    doc="Incremental index maintenance (streaming S4, the reference's "
    "append-mode master index helper_reduce.c:241): documents staged as "
    "many files, streamed one file per microbatch, each batch's postings "
    "appended to the letter-partitioned parquet index via foreachBatch; "
    "the final index is then re-aggregated to per-(word,doc) counts and "
    "must hash-match the batch oracle. Per-batch append commits are "
    "atomic, fixing the reference's unlocked concurrent-append race.",
)
def q_stream_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from ..operators.indexing import build_postings, with_letter
    from ..schemas import DOCUMENT

    # One workdir per Spark application, reused (and overwritten) across
    # invocations: the merged parquet must outlive this call because the
    # returned DataFrame scans it, so it can't be deleted here — keying
    # by applicationId bounds disk use to a single copy per app, and the
    # atexit hook removes it when the driver process exits.
    workdir = os.path.join(
        tempfile.gettempdir(),
        f"mri_stream_index_{spark.sparkContext.applicationId}",
    )
    staging = os.path.join(workdir, "staging")
    index_path = os.path.join(workdir, "index")
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(index_path, ignore_errors=True)
    atexit.register(shutil.rmtree, workdir, True)

    # Stage the documents table as several files so the file source
    # produces several microbatches (one per file).
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.repartition(4).write.mode("overwrite").parquet(staging)

    stream = (
        spark.readStream.schema(DOCUMENT)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        postings = with_letter(build_postings(batch_df))
        postings.write.mode("append").partitionBy("letter").parquet(index_path)

    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    try:
        q.awaitTermination()
    finally:
        q.stop()

    # Each microbatch appended its own partial counts; the index read
    # re-aggregates them (the streaming analogue of the reference's
    # reduce-side merge). Write the merged result to a compacted parquet
    # and return a scan of it: data stays on executors end-to-end (no
    # driver collect), and the returned DataFrame doesn't dangle on the
    # appended temp index. The atexit hook above removes the workdir
    # when the driver exits; until then the app reuses one copy.
    merged_path = os.path.join(workdir, "merged")
    (
        spark.read.parquet(index_path)
        .groupBy("word", "doc_id")
        .agg(F.sum("cnt").alias("cnt"))
        .select("word", "doc_id", "cnt")
        .write.mode("overwrite")
        .parquet(merged_path)
    )
    shutil.rmtree(index_path, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    return spark.read.parquet(merged_path)


def incremental_index_append(
    spark: SparkSession,
    sf_dir: str,
    index_path: str,
    checkpoint: str | None = None,
    glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
) -> None:
    """Streaming incremental index maintenance (the reference's append
    sink, helper_reduce.c:241, as a foreachBatch): each microbatch of
    documents is normalized, aggregated, and written to the
    letter-partitioned parquet index.

    With `checkpoint` set this is EXACTLY-ONCE end to end, not just
    at-least-once: the file-source offsets survive restarts (a directory
    that gained new files processes only the new files), and the sink is
    IDEMPOTENT — each microbatch writes `index_path/batch=<id>/letter=*`
    with overwrite, so a batch REPLAYED after a crash between its data
    write and its checkpoint offset commit (foreachBatch's at-least-once
    window) overwrites its own output instead of double-appending.
    Readers re-aggregate over the `batch` partition column like any
    other partial-count append. Without `checkpoint` the sink is the
    reference's raw append lifecycle (re-runs re-append; SURVEY.md
    §2.12) — don't mix the two modes on one index path.

    `max_files_per_trigger` bounds each microbatch (production knob for
    commit granularity; tests use 1 to force multi-batch runs)."""
    from ..operators.indexing import build_postings, with_letter
    from ..schemas import DOCUMENT

    # Layout guard: the two modes produce different directory depths
    # (checkpointed: batch=<id>/letter=*; raw append: letter=*). Mixing
    # them on one path yields 'Conflicting directory structures' at read
    # time — fail fast at write time instead.
    if os.path.isdir(index_path):
        has_flat = any(e.startswith("letter=") for e in os.listdir(index_path))
        if checkpoint is not None and has_flat:
            raise ValueError(
                f"{index_path!r} holds a flat letter=* index (raw-append "
                "layout); resuming it checkpointed would write the "
                "incompatible batch=<id>/letter=* layout beside it. Use a "
                "fresh index path, or compact the old index first."
            )
        has_batched = any(e.startswith("batch=") for e in os.listdir(index_path))
        if checkpoint is None and has_batched:
            raise ValueError(
                f"{index_path!r} holds a checkpointed batch=<id> index; "
                "raw-append writes would corrupt its partition discovery. "
                "Use a fresh index path."
            )

    reader = spark.readStream.schema(DOCUMENT).option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    docs = reader.parquet(sf_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.indexing import _recover_index_locked, index_writer_lock

        postings = with_letter(build_postings(batch_df))
        # Same writer lock as IndexSession.append/compact_index: a
        # microbatch append racing a compaction's directory swap would
        # otherwise be silently dropped by it (raw mode) — one flock
        # per microbatch is noise next to the batch's Spark job. Heal a
        # crashed compaction before writing, for the same reason as
        # IndexSession.append: appending into a missing live path would
        # orphan the .old copy forever.
        with index_writer_lock(index_path):
            _recover_index_locked(index_path)
            if checkpoint is not None:
                # Per-batch layout re-check under the lock (the pre-start
                # guard above runs once, outside the flock): a compaction
                # between microbatches folds batch=<id>/letter=* into the
                # flat letter=* form, and writing the next batch=<id>
                # beside flat partitions would break partition discovery
                # for every later read.
                if os.path.isdir(index_path) and any(
                    e.startswith("letter=") for e in os.listdir(index_path)
                ):
                    raise ValueError(
                        f"{index_path!r} was compacted to the flat "
                        "letter=* layout while this checkpointed ingest "
                        f"was running; writing batch={batch_id} beside "
                        "it would corrupt partition discovery. Restart "
                        "the ingest with a fresh checkpoint."
                    )
                from ..sources.generations import (
                    ensure_base_generation,
                    publish_generation,
                )

                # one pinnable generation per microbatch (snapshot
                # isolation for readers of a live ingest; the
                # raw-append branch gets this inside IndexSession-
                # style appends via the same helpers)
                ensure_base_generation(index_path)
                postings.write.mode("overwrite").partitionBy("letter").parquet(
                    os.path.join(index_path, f"batch={batch_id}")
                )
                publish_generation(index_path)
            else:
                from ..sources.generations import (
                    ensure_base_generation,
                    publish_generation,
                )

                ensure_base_generation(index_path)
                postings.write.mode("append").partitionBy("letter").parquet(
                    index_path
                )
                publish_generation(index_path)

    writer = docs.writeStream.foreachBatch(sink)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.trigger(availableNow=True).start()
    try:
        q.awaitTermination()
    finally:
        q.stop()


@register(
    "stream_static_join",
    oracle=f"""
        SELECT time_bucket(INTERVAL '{WINDOW}', ts) AS bucket_start,
               c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY 1, 2
    """,
    tier="streaming",
    doc="Stream-static enrichment join (SURVEY.md §2.9 + §2.3): the "
    "event stream joins a static broadcast customer dimension, then a "
    f"watermarked {WINDOW} tumbling aggregation rolls up per market "
    "segment. The static side is planned as a broadcast hash join "
    "inside every micro-batch — no stream-side state for the join, the "
    "canonical dimension-enrichment topology. Complete mode over the "
    "finite source equals the batch join+agg, which the oracle checks.",
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    ev = read_events_stream(spark, sf_dir)
    dim = F.broadcast(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    )
    agg = (
        ev.join(dim, ev.user_id == dim.c_custkey)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", WINDOW), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )
    out = run_to_completion(agg, "complete")
    return out.select(
        F.col("window.start").alias("bucket_start"), "c_mktsegment", "n", "total_value"
    )


# ---------------------------------------------------------------------------
# Bucket-partitioned embedding store: the ANN serving layout
# ---------------------------------------------------------------------------

@register(
    "stream_ann_lookup",
    oracle=f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        b AS (SELECT vec_id, v, {duck_lsh_bucket('v')} AS bucket FROM e),
        q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM b WHERE vec_id < 8)
        SELECT q_id,
               CAST(COUNT(*) AS BIGINT) AS n_candidates,
               MAX({duck_cosine('b.v', 'q.qv')}) AS best_cosine
        FROM b JOIN q ON b.bucket = q.bucket AND b.vec_id <> q.q_id
        GROUP BY q_id
    """,
    tier="streaming",
    doc="Online similarity serving: a stream of query embeddings joins "
    "the bucket-PARTITIONED static vector store on the bucket key. The "
    "small per-microbatch QUERY side carries the broadcast hint — the "
    "store itself is never broadcast (at 100 TB it cannot be) and never "
    "shuffled; with the bucket as a Hive partition column the broadcast "
    "join admits dynamic partition pruning of the store scan. Scores "
    "only same-bucket candidates with the exact fold cosine, emitting "
    "per-query candidate count and best score.",
)
def q_stream_ann_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.StringType()),
        ]
    )
    qstream = (
        spark.readStream.schema(emb_schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
        .filter(F.col("vec_id") < 8)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
        .withColumn("qbucket", F.expr(spark_lsh_bucket("qv")))
    )
    return run_to_completion(ann_lookup_plan(spark, sf_dir, qstream), "complete")


def ann_lookup_plan(spark: SparkSession, sf_dir: str, queries: DataFrame) -> DataFrame:
    """Join a query frame (streaming microbatch or batch) against the
    bucket-partitioned store (`operators.similarity.lsh_store` — shared
    with the batch ANN queries): broadcast the QUERY side, probe the
    store. The store is never broadcast or shuffled."""
    from ..operators.similarity import lsh_store

    static = lsh_store(spark, sf_dir)
    return (
        static.join(
            queries.hint("broadcast"),
            (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("q_id")),
        )
        .select("q_id", F.expr(spark_cosine("v", "qv")).alias("cosine"))
        .groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.max("cosine").alias("best_cosine"),
        )
    )


def incremental_vector_append(
    spark: SparkSession,
    sf_dir: str,
    store_path: str,
    checkpoint: str | None = None,
    glob: str = "embeddings.parquet",
    max_files_per_trigger: int | None = None,
) -> None:
    """Streaming ingest for the maintained vector store — the exact
    mirror of `incremental_index_append` for the ANN tier: each
    microbatch of (vec_id, embedding) rows is bucketed and appended to
    the bucket-partitioned store under the store's writer flock (an
    ingest racing a compactor's directory swap blocks instead of
    vanishing), healing a crashed compaction first.

    Exactly-once / layout semantics are `incremental_index_append`'s:
    with `checkpoint`, batches write idempotent
    `store/batch=<id>/bucket=*` partitions (a replayed batch
    overwrites its own output — for vectors this matters MORE than for
    counts, since a double-appended vector is a duplicate row, not a
    re-aggregatable partial); without it, raw reference-style appends.
    The two layouts must not mix on one path — same fail-fast guard.
    Lookups prune on `bucket` in either layout (Hive discovery handles
    the extra batch level); `compact_vector_store` folds either into
    the flat one-file-per-bucket form."""
    from ..operators.indexing import (
        _recover_index_locked,
        index_writer_lock,
        recover_index,
    )
    from ..operators.similarity import (
        _with_bucket,
        append_vectors,
        load_codebook,
        load_quantizer,
        spark_pq_code,
        store_layout_col,
    )
    from ..schemas import EMBEDDING

    # Heal a crash-stranded store BEFORE sniffing its layout: a store
    # caught between a compactor's two renames looks like an empty path,
    # which would silently bypass both guards and default the layout.
    recover_index(store_path)
    if os.path.isdir(store_path):
        has_flat = any(
            e.startswith(("bucket=", "cell=")) for e in os.listdir(store_path)
        )
        if checkpoint is not None and has_flat:
            raise ValueError(
                f"{store_path!r} holds a flat bucket=*/cell=* store "
                "(raw-append or compacted layout); resuming it "
                "checkpointed would write the incompatible "
                "batch=<id> layout beside it. Use a fresh store path."
            )
        has_batched = any(e.startswith("batch=") for e in os.listdir(store_path))
        if checkpoint is None and has_batched:
            raise ValueError(
                f"{store_path!r} holds a checkpointed batch=<id> store; "
                "raw-append writes would corrupt its partition discovery. "
                "Use a fresh store path."
            )

    reader = spark.readStream.schema(EMBEDDING).option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    vecs = reader.parquet(sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )

    # Routing key follows the STORE's layout (LSH bucket for a fresh
    # path) — a checkpointed ingest into an IVF-cell store must write
    # cell partitions, not mix bucket=* under its batch=<id> level.
    # Likewise the model: an IVF store built with trained centroids
    # carries them as a sidecar, and ingested vectors must route
    # against the SAME quantizer (read after the heal above).
    layout_col = store_layout_col(store_path)
    store_cents = load_quantizer(store_path)
    store_books = load_codebook(store_path)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if checkpoint is not None:
            bucketed = _with_bucket(batch_df, layout_col, store_cents)
            if store_books is not None:
                # a compressed store's ingest re-encodes each batch
                # against the persisted codebook, same as append_vectors
                bucketed = bucketed.withColumn(
                    "code",
                    F.expr(spark_pq_code("v", store_books)).cast(
                        "array<int>"
                    ),
                )
            bucketed = bucketed.repartition(layout_col)
            with index_writer_lock(store_path):
                _recover_index_locked(store_path)
                # Re-check the layout PER BATCH under the lock, not just
                # once before the stream started: the flock explicitly
                # admits a compactor BETWEEN microbatches, and
                # compact_vector_store folds batch=<id> partitions into
                # the flat bucket=*/cell=* form — a later microbatch
                # writing batch=<id> beside those flat partitions would
                # poison partition discovery for every subsequent read
                # (including the compaction that would have to heal it).
                if os.path.isdir(store_path) and any(
                    e.startswith(("bucket=", "cell="))
                    for e in os.listdir(store_path)
                ):
                    raise ValueError(
                        f"{store_path!r} was compacted to the flat "
                        "bucket=*/cell=* layout while this checkpointed "
                        "ingest was running; writing batch="
                        f"{batch_id} beside it would corrupt partition "
                        "discovery. Restart the ingest with a fresh "
                        "checkpoint against the compacted store."
                    )
                live_layout = store_layout_col(store_path)
                if (
                    live_layout != layout_col
                    or load_quantizer(store_path) != store_cents
                    or load_codebook(store_path) != store_books
                ):
                    raise ValueError(
                        f"{store_path!r} changed layout/quantizer "
                        f"({layout_col!r} -> {live_layout!r}) under this "
                        "running ingest; batches routed with the stale "
                        "model would land in wrong partitions."
                    )
                from ..sources.generations import (
                    ensure_base_generation,
                    publish_generation,
                )

                ensure_base_generation(store_path)
                bucketed.write.mode("overwrite").partitionBy(layout_col).parquet(
                    os.path.join(store_path, f"batch={batch_id}")
                )
                publish_generation(store_path)
        else:
            # The raw-append branch IS the batch append — one code path
            # owns lock + heal + layout guard + bucketed write, so a fix
            # to any of those applies to both the batch API and this sink.
            append_vectors(spark, batch_df, store_path)

    writer = vecs.writeStream.foreachBatch(sink)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.trigger(availableNow=True).start()
    try:
        q.awaitTermination()
    finally:
        q.stop()


def _vector_ingest_oracle() -> str:
    from ..operators.similarity import QUERY_VEC_ID

    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        b AS (SELECT vec_id, v, {duck_lsh_bucket('v')} AS bucket FROM e),
        q AS (SELECT v AS qv, bucket AS qbucket FROM b WHERE vec_id = {QUERY_VEC_ID})
        SELECT vec_id, {duck_cosine('b.v', 'q.qv')} AS cosine
        FROM b, q
        WHERE b.bucket = q.qbucket AND vec_id <> {QUERY_VEC_ID}
        ORDER BY cosine DESC, vec_id LIMIT 10
    """


@register(
    "stream_vector_ingest",
    # Same oracle as the batch LSH top-k: the incrementally-ingested
    # store must serve the same neighbors as a batch-built one.
    oracle=_vector_ingest_oracle(),
    tier="streaming",
    doc="Streaming vector-store ingest (streaming S4 for the ANN tier): "
    "embeddings staged as several files, streamed one file per "
    "microbatch, each batch flock-appended into the bucket-partitioned "
    "store via incremental_vector_append; the store then serves the "
    "fixture probe's top-k through the standard pruned bucket scan, "
    "which must hash-match the batch-built store's answer.",
)
def q_stream_vector_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from ..operators.similarity import (
        QUERY_VEC_ID,
        vector_store_topk,
    )

    # App-scoped workdir, same lifetime contract as
    # q_stream_incremental_index: the returned DataFrame scans the
    # store, so it must outlive this call; atexit removes it.
    workdir = os.path.join(
        tempfile.gettempdir(),
        f"mri_stream_vstore_{spark.sparkContext.applicationId}",
    )
    staging = os.path.join(workdir, "staging")
    store = os.path.join(workdir, "store")
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(store, ignore_errors=True)
    atexit.register(shutil.rmtree, workdir, True)

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb.repartition(4).write.mode("overwrite").parquet(staging)

    incremental_vector_append(
        spark, staging, store, glob="*.parquet", max_files_per_trigger=1
    )

    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == QUERY_VEC_ID).head().embedding
    ]
    return vector_store_topk(
        spark, store, qv, k=10, exclude_vec_id=QUERY_VEC_ID
    )


@register(
    "stream_scd2_temporal_join",
    oracle="""
        WITH ordered AS (
            SELECT user_id, ts, event_id, event_type,
                   lag(event_type) OVER w AS prev_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        changes AS (
            SELECT user_id, ts AS valid_from, event_id, event_type
            FROM ordered
            WHERE prev_type IS NULL OR event_type <> prev_type
        ),
        scd2 AS (
            SELECT user_id, event_type AS dim_type, valid_from,
                   lead(valid_from) OVER v AS valid_to,
                   CAST(row_number() OVER v AS BIGINT) AS version
            FROM changes
            WINDOW v AS (PARTITION BY user_id ORDER BY valid_from, event_id)
        )
        SELECT e.event_id, e.user_id, e.ts, d.version, d.dim_type
        FROM events e JOIN scd2 d
          ON e.user_id = d.user_id
         AND e.ts >= d.valid_from
         AND (d.valid_to IS NULL OR e.ts < d.valid_to)
    """,
    tier="streaming",
    doc="Streaming temporal join: each event enriched with the SCD2 "
    "dimension version valid AT THE EVENT'S OWN TIME (not the current "
    "version — the classic event-time-correctness trap in stream "
    "enrichment). The SCD2 frame (rel_cdc_scd2's build) is the static "
    "broadcast side; the join is user_id equality plus "
    "[valid_from, valid_to) containment, so the static side needs no "
    "stream state and every event matches exactly one version. At "
    "100 TB the dimension history is the small side by construction "
    "(|versions| << |events|); if it outgrows broadcast, the same "
    "plan co-partitions both sides on user_id. Append mode; over the "
    "finite fixture the result equals the batch temporal join the "
    "oracle runs.",
)
def q_stream_scd2_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cdc import q_cdc_scd2

    scd2 = F.broadcast(
        q_cdc_scd2(spark, sf_dir).select(
            F.col("user_id").alias("d_user_id"),
            F.col("event_type").alias("dim_type"),
            "valid_from",
            "valid_to",
            "version",
        )
    )
    ev = read_events_stream(spark, sf_dir).select("event_id", "user_id", "ts")
    joined = ev.join(
        scd2,
        (F.col("user_id") == F.col("d_user_id"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
        "inner",
    )
    return run_to_completion(
        joined.select("event_id", "user_id", "ts", "version", "dim_type"),
        "append",
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters: Misra-Gries summaries as keyed stream state
# ---------------------------------------------------------------------------

HH_RANGES = 8  # key-range groups; state = O(HH_RANGES * HH_K) total


def streaming_token_summaries(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The streaming half of operators/heavyhitters.py: the token
    stream is hashed into HH_RANGES key-range groups and each group
    maintains ONE Misra-Gries summary (k counters) in GroupState via
    applyInPandasWithState — the mergeable-summaries argument
    (heavyhitters.py docstring) is batch-order-independent, so
    out-of-order arrival needs no watermark and changes nothing.
    Every value's occurrences hash to the same range, so an item with
    global count >= n*phi survives its range's summary whenever
    k > 1/phi (we keep the batch tier's 2x margin). Emits one update
    row per (range, microbatch): the space-joined candidate set, a
    monotone version for last-snapshot selection, and the live counter
    count (n_state <= k, asserted in tests — the state-boundedness
    guarantee made observable)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.dedup import spark_tokens_expr
    from ..operators.heavyhitters import PHI_DEN, PHI_NUM
    from ..schemas import DOCUMENT

    k = 2 * PHI_DEN // PHI_NUM

    reader = spark.readStream.schema(DOCUMENT).option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    words = (
        reader.parquet(sf_dir)
        .select(F.explode(F.expr(spark_tokens_expr("text"))).alias("word"))
        .withColumn("rng", F.pmod(F.hash("word"), F.lit(HH_RANGES)))
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            ws, cs, version = state.get
            summary = dict(zip(ws, cs))
        else:
            summary, version = {}, 0
        for pdf in pdfs:
            # vectorized per-batch exact counts, then the standard MG
            # merge + prune — identical math to misra_gries_candidates
            for w, c in pdf["word"].value_counts().items():
                summary[w] = summary.get(w, 0) + int(c)
            if len(summary) > k:
                cut = sorted(summary.values(), reverse=True)[k]
                summary = {
                    w: c - cut for w, c in summary.items() if c - cut > 0
                }
        version += 1
        state.update(
            (list(summary), [summary[w] for w in summary], version)
        )
        yield pd.DataFrame(
            {
                "rng": [key[0]],
                "version": [version],
                "n_state": [len(summary)],
                "cands": [" ".join(sorted(summary))],
            }
        )

    return words.groupBy("rng").applyInPandasWithState(
        update,
        outputStructType="rng long, version long, n_state long, cands string",
        stateStructType="ws array<string>, cs array<long>, version long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _stream_hh_oracle() -> str:
    from ..operators.heavyhitters import _hh_oracle
    from ..operators.indexing import TOKENS_SQL

    return _hh_oracle(TOKENS_SQL, "word")


@register(
    "stream_heavy_hitters",
    # The continuously-maintained sketch must converge to the EXACT
    # batch answer — the same full-histogram oracle as the batch
    # index_heavy_hitters.
    oracle=_stream_hh_oracle(),
    tier="streaming",
    doc="Streaming heavy hitters (the Misra-Gries machinery of "
    "heavyhitters.py as keyed stream state): per-key-range MG "
    "summaries ride applyInPandasWithState across microbatches "
    "(update-mode snapshots, O(k) state per range), then the FINAL "
    "candidate sets fund an exact candidate-only batch recount + "
    "support threshold — output identical to the batch sketch and to "
    "the full-histogram oracle. No watermark: mergeable summaries are "
    "arrival-order-independent, so late/out-of-order data changes "
    "nothing (property-tested with shuffled multi-file corpora).",
)
def q_stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.heavyhitters import recount_candidates
    from ..operators.tokens import token_rows

    updates = run_to_completion(
        streaming_token_summaries(spark, sf_dir), "update"
    )
    last = updates.groupBy("rng").agg(
        F.max_by("cands", "version").alias("cands")
    )
    cands = (
        last.select(F.explode(F.split("cands", " ")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    tokens = token_rows(spark, sf_dir, out_col="word").select("word")
    return recount_candidates(tokens, cands, "word")


# ---------------------------------------------------------------------------
# Streaming funnel: incremental ordered-step conversion state
# ---------------------------------------------------------------------------


def funnel_stream(ev: DataFrame, steps: tuple[str, ...]) -> DataFrame:
    """Per-user funnel state over a stream with (user_id, ts,
    event_type): GroupState holds, per step, the SORTED DISTINCT event
    times seen so far, and every update re-runs the chain scan
    (t_i = earliest step-i time strictly after t_{i-1}) over those
    sets — which makes the operator EXACT under arbitrary out-of-order
    arrival: a late-arriving earlier view can retroactively pull t_0
    back and thereby qualify a click that had already been seen, a
    case any greedy per-step running-min state gets wrong (the greedy
    state would have discarded that click as "before the conversion").
    State is O(user's step events); the production lever for unbounded
    logs is watermark-based eviction of times older than the newest
    completed chain, which trades exactness on ancient stragglers for
    bounded state — documented, not needed on the fixture. Missing
    times are emitted as the -1 sentinel (fixture timestamps are all
    positive) and folded to NULL in the batch view. Split out so tests
    can drive it with an adversarial (shuffled) source."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    n_steps = len(steps)
    ev = ev.select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_type"
    ).filter(F.col("event_type").isin(list(steps)))
    out_cols = ["user_id", "n"] + [f"t_{i}" for i in range(n_steps)]

    def update(key, pdfs, state: GroupState):
        if state.exists:
            got = state.get
            n, sets = got[0], [list(a) for a in got[1:]]
        else:
            n, sets = 0, [[] for _ in range(n_steps)]
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            # one numpy pass per batch instead of a pandas .loc mask
            # per step (r14): same sorted-distinct sets, less per-key
            # Python overhead — this function runs once per user
            et = pdf["event_type"].to_numpy()
            ts_all = pdf["ts_us"].to_numpy()
            for i, step in enumerate(steps):
                ts = ts_all[et == step]
                if len(ts):
                    sets[i] = sorted(
                        set(sets[i]).union(int(t) for t in ts)
                    )
        state.update((n, *sets))
        times, prev = [], 0  # chain scan; times strictly increase
        alive = True
        for i in range(n_steps):
            cur = -1
            if alive:
                for t in sets[i]:  # sorted: first qualifying = earliest
                    if i == 0 or t > prev:
                        cur = t
                        break
            times.append(cur)
            if cur < 0:
                alive = False
            else:
                prev = cur
        # One-row output built from a single int64 block (every output
        # column is long): ~3x cheaper than the dict-of-lists
        # constructor, and this runs once per user per microbatch —
        # the remaining §4 per-key cost the r14 verdict flagged (r15).
        row = np.empty((1, 2 + n_steps), dtype=np.int64)
        row[0, 0] = key[0]
        row[0, 1] = n
        row[0, 2:] = times
        yield pd.DataFrame(row, columns=out_cols, copy=False)

    out_schema = ", ".join(f"t_{i} long" for i in range(n_steps))
    state_cols = ", ".join(f"s{i} array<long>" for i in range(n_steps))
    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=f"user_id long, n long, {out_schema}",
        stateStructType=f"n long, {state_cols}",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def fold_funnel_updates(updates: DataFrame, n_steps: int) -> DataFrame:
    """Update log -> final per-user times frame (the batch
    _funnel_times shape): the row with the highest per-user event
    count n is the converged state (n strictly increases per update),
    fetched per column with max_by; -1 sentinels become NULLs."""
    aggs = [
        F.max_by(f"t_{i}", "n").alias(f"t_{i}") for i in range(n_steps)
    ]
    folded = updates.groupBy("user_id").agg(*aggs)
    return folded.select(
        "user_id",
        *[
            F.when(F.col(f"t_{i}") >= 0, F.col(f"t_{i}")).alias(f"t_{i}")
            for i in range(n_steps)
        ],
    )


def _funnel_oracle() -> str:
    from ..operators.eventflow import _SQL_FUNNEL_STEPS, _SQL_FUNNEL_TIMES

    return _SQL_FUNNEL_TIMES + _SQL_FUNNEL_STEPS


@register(
    "stream_funnel",
    # The continuously-maintained funnel state must converge to the
    # batch funnel — the same oracle as rel_funnel.
    oracle=_funnel_oracle(),
    tier="streaming",
    doc="Streaming conversion funnel (the eventflow funnel as "
    "incremental state): per-user per-step sorted-distinct event-time "
    "sets in applyInPandasWithState, chain-rescanned on every update "
    "so late or out-of-order events can retroactively re-qualify "
    "later steps — exact under any arrival order (adversarially "
    "shuffled-source test), converging to rel_funnel's batch answer. "
    "The update log folds to final state by max_by over the per-user "
    "event counter; the summary reuses funnel_summary, so the "
    "streaming and batch forms share one output contract.",
)
def q_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.eventflow import FUNNEL_STEPS, funnel_summary

    ev = read_events_stream(spark, sf_dir).select(
        "user_id", "ts", "event_type"
    )
    updates = run_to_completion(funnel_stream(ev, FUNNEL_STEPS), "update")
    return funnel_summary(
        fold_funnel_updates(updates, len(FUNNEL_STEPS)), FUNNEL_STEPS
    )


# ---------------------------------------------------------------------------
# Continuous aggregate: a matview refreshed once per microbatch
# ---------------------------------------------------------------------------

def run_continuous_aggregate(
    spark: SparkSession,
    src_dir: str,
    store_path: str,
    view_path: str,
    key_cols: list[str],
    aggs: dict,
    row_keys: list[str],
    checkpoint: str | None = None,
    glob: str = "*.parquet",
    schema=None,
    max_files_per_trigger: int = 1,
    dims: list[dict] | None = None,
) -> list[dict]:
    """The TimescaleDB continuous-aggregate shape on the snapshot tier:
    a file-source stream lands each microbatch in a generations-managed
    raw store (append + publish under the store flock — one pinnable
    generation per batch), then advances a materialized aggregate view
    over it via `refresh_matview` — which scans ONLY that batch's files
    (the append-only diff fast path). The served view is therefore
    always one refresh behind the live head at most, and every refresh
    costs one microbatch of rows regardless of how large the store has
    grown — the whole point at 100 TB of accumulated events.

    `dims` (round 10) makes the continuous view a JOIN matview: each
    microbatch's refresh is ΔF ⋈ dims via the telescoping delta
    (create_matview_join) — the streaming half of the fact-join-dims
    dashboard, with dim appends/updates between batches handled by
    the same telescoping/retraction machinery.

    Returns the per-batch refresh reports (delta_files per refresh —
    the delta-only claim, asserted in tests)."""
    from ..operators.indexing import index_writer_lock
    from ..operators.matview import (
        create_matview,
        create_matview_join,
        refresh_matview,
    )
    from ..sources.generations import ensure_base_generation, publish_generation

    reports: list[dict] = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        with index_writer_lock(store_path):
            ensure_base_generation(store_path)
            batch_df.write.mode("append").parquet(store_path)
            publish_generation(store_path)
        if os.path.isfile(os.path.join(view_path, "_matview.json")):
            reports.append(refresh_matview(spark, view_path))
        elif dims:
            rep = create_matview_join(
                spark, view_path, store_path, dims, key_cols, aggs,
                row_keys=row_keys,
            )
            reports.append(
                {"from": 0, "to": rep["fact_gen"], "delta_files": -2,
                 "refreshed": True}
            )
        else:
            gen = create_matview(
                spark, store_path, view_path, key_cols, aggs, row_keys=row_keys
            )
            reports.append(
                {"from": 0, "to": gen, "delta_files": -2, "refreshed": True}
            )

    reader = spark.readStream.option("pathGlobFilter", glob).option(
        "maxFilesPerTrigger", str(max_files_per_trigger)
    )
    if schema is not None:
        reader = reader.schema(schema)
    stream = reader.parquet(src_dir)
    writer = stream.writeStream.foreachBatch(sink)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.trigger(availableNow=True).start()
    try:
        q.awaitTermination()
    finally:
        q.stop()
    return reports


def events_continuous_agg_demo(spark: SparkSession, sf_dir: str) -> str:
    """Built once per (application, corpus content): the events table
    split into 4 source files, streamed one file per microbatch into a
    generations-managed store, with the per-event-type view — counts,
    exact-decimal value sum, DISTINCT USERS (the support-table IVM
    under streaming), first/last ts — refreshed after every batch.
    The exported query reads the final view; its oracle aggregates the
    whole events table, so the external hash match proves four rounds
    of incremental maintenance land exactly on the full answer."""
    from ..operators.indexing import session_artifact_path

    def build(path: str) -> None:
        src = os.path.join(path, "src")
        store = os.path.join(path, "store")
        view = os.path.join(path, "view")
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            "event_type",
            F.col("value").cast("decimal(18,2)").alias("value_dec"),
            "ts",
        )
        # hash-partitioned on event_id: deterministic file contents
        ev.repartition(4, "event_id").write.parquet(src)
        reports = run_continuous_aggregate(
            spark,
            src,
            store,
            view,
            ["event_type"],
            {
                "n_events": ("count", "*"),
                "total_value": ("sum", "value_dec"),
                "n_users": ("count_distinct", "user_id"),
                "first_ts": ("min", "ts"),
                "last_ts": ("max", "ts"),
            },
            row_keys=["event_id"],
            checkpoint=os.path.join(path, "ckpt"),
            schema=ev.schema,
        )
        # every post-create refresh consumed exactly one batch's files
        assert all(r["refreshed"] for r in reports)
        assert all(r["delta_files"] >= 1 for r in reports[1:])

    return session_artifact_path(
        spark, sf_dir, "events_continuous_agg", "events.parquet", build
    )


# ---------------------------------------------------------------------------
# CDC apply: a change stream MERGED into a generations store per batch
# ---------------------------------------------------------------------------

def run_cdc_apply(
    spark: SparkSession,
    src_dir: str,
    store_path: str,
    key_cols: list[str],
    order_cols: list[str],
    checkpoint: str | None = None,
    glob: str = "*.parquet",
    schema=None,
    max_files_per_trigger: int = 1,
) -> list[dict]:
    """The CDC-into-lakehouse loop (the Debezium→Delta MERGE shape):
    a file-source stream of row VERSIONS keyed by `key_cols`, applied
    to a generations store one microbatch at a time with
    last-writer-wins semantics under `order_cols` — robust to
    OUT-OF-ORDER delivery both within a batch and across batches:

    - within a batch, only each key's newest version survives (window
      over the order columns);
    - against the store, a candidate whose order key is not strictly
      newer than the stored row's is DROPPED (a late-arriving stale
      update can never regress a row — the property a plain
      replace-on-match upsert lacks);
    - survivors merge via `upsert_rows` (manifest/bloom-pruned
      copy-on-write), publishing one pinnable generation per batch,
      so downstream matviews retract-refresh per batch and pinned
      readers see consistent states.

    The final store state is therefore the GLOBAL maximum-order
    version per key, whatever the batch partitioning — which is what
    makes the exported query's oracle (a plain window over the raw
    table) exact. Returns the per-batch upsert reports."""
    from ..operators.indexing import index_writer_lock
    from ..sources.generations import (
        ensure_base_generation,
        publish_generation,
        read_generation,
        upsert_rows,
    )

    reports: list[dict] = []
    ordering = [F.col(c).desc_nulls_last() for c in order_cols]

    def ord_struct():
        # comparison struct with a not-null FLAG before each order
        # column: a NULL order value must rank SMALLEST (matching
        # desc_nulls_last above and the oracle's NULLS LAST), but a
        # raw struct comparison with a null field yields NULL and
        # would silently drop a genuinely-newer candidate
        fields = []
        for c in order_cols:
            fields.append(F.col(c).isNotNull().cast("int"))
            fields.append(F.col(c))
        return F.struct(*fields)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        w = Window.partitionBy(*key_cols).orderBy(*ordering)
        newest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if not os.path.isdir(store_path):
            with index_writer_lock(store_path):
                newest.write.parquet(store_path)
                publish_generation(store_path)
            reports.append(
                {"batch": batch_id, "inserted_rows": newest.count(),
                 "updated_rows": 0, "stale_dropped": True}
            )
            return
        with index_writer_lock(store_path):
            ensure_base_generation(store_path)
        # drop candidates not strictly newer than the stored version.
        # The stored side reads ONLY the files that may hold the
        # batch's keys (the same per-key-column list/bounds pruning
        # upsert_rows uses — bloom-probable on unclustered keys):
        # pruning is conservative, so a stored version can never hide
        # in a pruned file, and a key with no kept file is genuinely
        # new. Without this the stale check would scan the store per
        # microbatch.
        from ..sources.generations import (
            key_prune_where,
            plan_generation_scan,
        )

        where = key_prune_where(newest, key_cols)
        root, files, _total = plan_generation_scan(store_path, where=where)
        if files:
            stored_rows = spark.read.option("basePath", root).parquet(*files)
        else:
            stored_rows = read_generation(spark, store_path).limit(0)
        stored = stored_rows.select(
            *key_cols,
            ord_struct().alias("_cur_ord"),
        )
        cand = newest.withColumn("_new_ord", ord_struct())
        fresh = (
            cand.join(stored, on=list(key_cols), how="left")
            .filter(
                F.col("_cur_ord").isNull()
                | (F.col("_new_ord") > F.col("_cur_ord"))
            )
            .drop("_cur_ord", "_new_ord")
        )
        rep = upsert_rows(spark, store_path, fresh, key_cols)
        rep["batch"] = batch_id
        reports.append(rep)

    reader = spark.readStream.option("pathGlobFilter", glob).option(
        "maxFilesPerTrigger", str(max_files_per_trigger)
    )
    if schema is not None:
        reader = reader.schema(schema)
    stream = reader.parquet(src_dir)
    writer = stream.writeStream.foreachBatch(sink)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.trigger(availableNow=True).start()
    try:
        q.awaitTermination()
    finally:
        q.stop()
    return reports


def events_cdc_apply_demo(spark: SparkSession, sf_dir: str) -> str:
    """Built once per (application, corpus content): the events table
    treated as a CDC stream of per-user row versions — hash-split into
    4 source files (NO time ordering across batches, deliberately:
    the apply's stale-drop is what keeps the result exact), streamed
    one file per microbatch into a generations store keyed by
    user_id, ordered by (ts, event_id). The final store = each user's
    globally newest event."""
    from ..operators.indexing import session_artifact_path

    def build(path: str) -> None:
        src = os.path.join(path, "src")
        store = os.path.join(path, "store")
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            "event_type",
            F.col("value").cast("decimal(18,2)").alias("value_dec"),
            "ts",
        )
        ev.repartition(4, "event_id").write.parquet(src)
        reports = run_cdc_apply(
            spark,
            src,
            store,
            key_cols=["user_id"],
            order_cols=["ts", "event_id"],
            checkpoint=os.path.join(path, "ckpt"),
            schema=ev.schema,
        )
        assert len(reports) >= 2  # several batches actually merged

    return session_artifact_path(
        spark, sf_dir, "events_cdc_apply", "events.parquet", build
    )


@register(
    "stream_cdc_apply",
    oracle="""
        SELECT user_id,
               event_type AS last_type,
               CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value,
               ts AS last_ts
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id
                ORDER BY ts DESC NULLS LAST, event_id DESC
            ) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    tier="streaming",
    doc="CDC APPLY into the store tier (streaming/events.py:"
    "run_cdc_apply — the Debezium-to-lakehouse MERGE loop): the "
    "events table is replayed as a change stream of per-user row "
    "versions, hash-split so batches arrive in NO time order, and "
    "each microbatch merges via upsert_rows with last-writer-wins "
    "under (ts, event_id) — newest-per-key within the batch, "
    "stale-vs-stored candidates dropped, one published generation "
    "per batch. The oracle is the global newest-version-per-user "
    "window over the raw table, so the external hash match proves "
    "the out-of-order apply converges to exactly the ordered "
    "result. At 100 TB this is the canonical CDC ingestion pattern: "
    "each merge rewrites only the key-overlapping files "
    "(bloom/bounds-pruned), downstream views retract-refresh per "
    "batch, and pinned readers keep consistent snapshots.",
)
def q_stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.generations import read_generation

    root = events_cdc_apply_demo(spark, sf_dir)
    df = read_generation(spark, os.path.join(root, "store"))
    return df.select(
        "user_id",
        F.col("event_type").alias("last_type"),
        F.col("value_dec").cast("double").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


@register(
    "stream_continuous_agg",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_value,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               MIN(ts) AS first_ts,
               MAX(ts) AS last_ts
        FROM events GROUP BY event_type
    """,
    tier="streaming",
    doc="A CONTINUOUS AGGREGATE (the TimescaleDB pattern on the "
    "snapshot tier): events stream in one file per microbatch, each "
    "batch publishes a generation of a raw store and refreshes the "
    "per-event-type materialized view — counts, exact-decimal sums, "
    "and DISTINCT USERS via the support-table IVM — scanning only "
    "that batch's files (streaming/events.py:run_continuous_aggregate "
    "over operators/matview.py). The oracle aggregates the full "
    "events table, so the external hash match proves four rounds of "
    "delta-only maintenance land exactly on the batch answer, distinct "
    "counts included (users active in several batches must not "
    "double-count). At 100 TB the dashboard read is group-cardinality-"
    "sized and each refresh costs one microbatch, not the store.",
)
def q_stream_continuous_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.matview import read_matview

    root = events_continuous_agg_demo(spark, sf_dir)
    v = read_matview(spark, os.path.join(root, "view"))
    return v.select(
        "event_type",
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
        F.col("n_users").cast("long").alias("n_users"),
        "first_ts",
        "last_ts",
    )


def run_gated_ingest(
    spark: SparkSession,
    src_dir: str,
    store_path: str,
    expectations: dict,
    mode: str = "quarantine",
    checkpoint: str | None = None,
    glob: str = "*.parquet",
    schema=None,
    max_files_per_trigger: int = 1,
    compact_policy: dict | None = None,
    schema_mode: str = "strict",
) -> list[dict]:
    """STREAMING ADMISSION: every microbatch passes through
    `append_with_expectations` (sources/expectations.py) on its way
    into the generations store — the gate-at-the-edge posture a 100 TB
    ingest needs, where a malformed producer must be split off the
    moment it arrives, not found in tomorrow's batch audit. Per batch:
    admitted rows publish one pinnable generation whose manifest entry
    carries the admission audit; rejects land in the store's
    `.quarantine` sibling tagged with their failed expectations (mode
    "quarantine"), are dropped ("drop"), or FAIL the streaming query
    before anything is written ("fail" — the checkpoint then replays
    the same batch after the producer is fixed). Returns the per-batch
    audits.

    Admission is exactly-once in ALL THREE modes when `checkpoint` is
    set: foreachBatch is at-least-once (a crash after the store
    publish but before the checkpoint's offset commit replays the
    batch on restart), so the sink passes (checkpoint, batch_id) as
    the append's idempotency key — the store manifest records the
    last applied batch id inside the same atomic publish, and a
    replayed batch returns {"replayed": True} without writing
    (sources/expectations.py:append_with_expectations). Without a
    checkpoint there is no replay bookkeeping and a re-run of the
    whole query re-appends everything — one-shot use only.

    `compact_policy` ({"max_files": n, "n_files": k, "cluster_by":
    [...]?, "min_file_bytes": b?}) records a small-file policy in the
    store manifest on the first batch and fires
    `generations.maybe_autocompact` after every admitted batch — one
    generation per microbatch is exactly the shape that grows file
    counts without bound, and this is the publish-time trigger that
    keeps the store read-efficient while pinned readers and matview
    consumers see ordinary rewrite spans."""
    reports: list[dict] = []
    idem_key = os.path.realpath(checkpoint) if checkpoint is not None else None

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from ..sources.expectations import append_with_expectations
        from ..sources.generations import (
            load_manifest,
            maybe_autocompact,
            set_compaction_policy,
        )

        rep = append_with_expectations(
            spark,
            store_path,
            batch_df,
            expectations,
            mode=mode,
            idempotency=(
                (idem_key, int(batch_id)) if idem_key is not None else None
            ),
            # a stream's batches share one source schema; schema_mode
            # matters on RESTART after the producer evolved (a
            # restarted query reads a wider source schema) — 'evolve'
            # lets the store follow, 'strict' (default) stops it
            schema_mode=schema_mode,
        )
        rep["batch"] = batch_id
        if compact_policy is not None and not rep.get("replayed"):
            m = load_manifest(store_path)
            if m is not None and "compact_policy" not in m:
                set_compaction_policy(store_path, **compact_policy)
            new_head = maybe_autocompact(spark, store_path)
            if new_head is not None:
                rep["compacted_to"] = new_head
        reports.append(rep)

    reader = spark.readStream.option("pathGlobFilter", glob).option(
        "maxFilesPerTrigger", str(max_files_per_trigger)
    )
    if schema is not None:
        reader = reader.schema(schema)
    stream = reader.parquet(src_dir)
    writer = stream.writeStream.foreachBatch(sink)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.trigger(availableNow=True).start()
    try:
        q.awaitTermination()
    finally:
        q.stop()
    return reports


_GATE_VALUE_CAP = 300
_GATE_TYPES = ["click", "purchase", "signup", "view"]


def events_gated_ingest_demo(spark: SparkSession, sf_dir: str) -> str:
    """Built once per (application, corpus content): the events table
    replayed as a 4-file stream through run_gated_ingest with two
    expectations — a value cap and an allowed-type list (error events
    violate; expensive error events violate both). Every microbatch
    publishes one audited generation; the quarantine sibling
    accumulates the rejects."""
    from ..operators.indexing import session_artifact_path

    def build(path: str) -> None:
        src = os.path.join(path, "src")
        store = os.path.join(path, "store")
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            "event_type",
            F.col("value").cast("decimal(18,2)").alias("value_dec"),
            "ts",
        )
        ev.repartition(4, "event_id").write.parquet(src)
        reports = run_gated_ingest(
            spark,
            src,
            store,
            {
                "value_cap": [("value_dec", "<=", _GATE_VALUE_CAP)],
                "known_type": [("event_type", "in", _GATE_TYPES)],
            },
            checkpoint=os.path.join(path, "ckpt"),
            schema=ev.schema,
        )
        assert len(reports) >= 2  # several gated batches landed

    return session_artifact_path(
        spark, sf_dir, "events_gated_ingest", "events.parquet", build
    )


@register(
    "stream_gated_ingest",
    oracle=f"""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_value
        FROM events
        WHERE CAST(value AS DECIMAL(18,2)) <= {_GATE_VALUE_CAP}
          AND event_type IN ({', '.join(repr(t) for t in _GATE_TYPES)})
        GROUP BY event_type
    """,
    tier="streaming",
    doc="GATED STREAMING INGEST (streaming/events.py:run_gated_ingest "
    "over sources/expectations.py): the events table streams in one "
    "file per microbatch and every batch is admitted through two "
    "declared expectations — rejects split to the store's .quarantine "
    "sibling, each admitted batch publishing one generation whose "
    "manifest entry carries the admission audit. The query aggregates "
    "the admitted store; the oracle aggregates the raw table under "
    "the same predicates, so the hash match proves per-batch gating "
    "across the whole stream == one global filter. The gate cost is "
    "one map-side-combined aggregate per batch — at 100 TB ingest the "
    "edge check is batch-sized, and 'how dirty was the feed' is a "
    "manifest read, not a cluster job.",
)
def q_stream_gated_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.generations import read_generation

    root = events_gated_ingest_demo(spark, sf_dir)
    df = read_generation(spark, os.path.join(root, "store"))
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value_dec").cast("double").alias("total_value"),
    )


def events_autocompact_ingest_demo(spark: SparkSession, sf_dir: str) -> str:
    """Publish-time auto-compaction under streaming ingest (round 11),
    built once per (application, corpus content): the events table
    replayed as a 16-file stream through run_gated_ingest with a
    SMALL-FILE POLICY ({max_files: 6 -> fold to 2}) recorded in the
    store manifest on the first batch — one generation per microbatch
    is the unbounded-file-count shape, and the policy is the
    publish-time trigger that keeps the store read-efficient
    (generations.set_compaction_policy / maybe_autocompact). The
    build asserts the policy FIRED repeatedly and the head file count
    stayed bounded the whole run."""
    from ..operators.indexing import session_artifact_path
    from ..sources.generations import load_manifest

    def build(path: str) -> None:
        src = os.path.join(path, "src")
        store = os.path.join(path, "store")
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            "event_type",
            F.col("value").cast("decimal(18,2)").alias("value_dec"),
            "ts",
        )
        ev.repartition(16, "event_id").write.parquet(src)
        reports = run_gated_ingest(
            spark,
            src,
            store,
            {
                "value_cap": [("value_dec", "<=", _GATE_VALUE_CAP)],
                "known_type": [("event_type", "in", _GATE_TYPES)],
            },
            checkpoint=os.path.join(path, "ckpt"),
            schema=ev.schema,
            compact_policy={"max_files": 6, "n_files": 2},
        )
        assert len(reports) >= 10
        assert sum(1 for r in reports if "compacted_to" in r) >= 2
        m = load_manifest(store)
        assert len(m["gens"][str(m["head"])]["files"]) <= 7
        assert m["compact_policy"]["max_files"] == 6  # survived the swaps

    return session_artifact_path(
        spark, sf_dir, "events_autocompact_ingest", "events.parquet", build
    )


@register(
    "stream_autocompact_ingest",
    oracle=f"""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_value
        FROM events
        WHERE CAST(value AS DECIMAL(18,2)) <= {_GATE_VALUE_CAP}
          AND event_type IN ({', '.join(repr(t) for t in _GATE_TYPES)})
        GROUP BY event_type
    """,
    tier="streaming",
    doc="AUTO-COMPACTED STREAMING INGEST (round 11 — "
    "streaming/events.py:run_gated_ingest with a compact_policy over "
    "generations.set_compaction_policy/maybe_autocompact): the events "
    "table streams in one file per microbatch through the expectations "
    "gate while a manifest-recorded small-file policy fires "
    "optimize_store whenever the head exceeds 6 files, folding to 2 — "
    "the build asserts the policy fired repeatedly and the file count "
    "stayed bounded. The query aggregates the admitted store; the "
    "oracle applies the same gate to the raw table, so the hash match "
    "proves the repeated rewrite spans preserved every admitted row "
    "exactly (compaction is a pure re-layout). At 100 TB per-"
    "microbatch publishes without this trigger drown the scan planner "
    "in small files; with it the store self-maintains at publish "
    "time.",
)
def q_stream_autocompact_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.generations import read_generation

    root = events_autocompact_ingest_demo(spark, sf_dir)
    df = read_generation(spark, os.path.join(root, "store"))
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value_dec").cast("double").alias("total_value"),
    )
