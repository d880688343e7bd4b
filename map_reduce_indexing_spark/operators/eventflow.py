"""Batch event-flow analytics over the ``events`` table: gap-based
sessionization, ordered funnels, and cohort retention (SURVEY.md §2 EXT
tier — the batch complement of streaming/events.py's session windows,
and the analytics a training-data/telemetry pipeline runs daily).

Reference parity note: the reference engine (GingerBear/
map-reduce-indexing, helper_reduce.c:153) has only COUNT-GROUP-BY over
tokens; event-flow analytics is part of the EXT surface SURVEY.md §2
calls for beyond it. The streaming twin of ``rel_sessionize`` is
``stream_session_windows`` (streaming/events.py) — same 30-minute gap
semantics, so the two can be cross-checked on a static fixture.

Scale notes (the 100-TB plan, not just the fixture plan):

* Every query here shuffles the events table AT MOST ONCE on
  ``user_id`` (the sessionize window, the per-user firsts, the cohort
  join all hash-partition on the same key); Spark reuses that single
  exchange across the window and the following groupBy because the
  grouping keys are a superset of the partitioning key.
* Ordering inside a user is (ts, event_id) — a unique composite — so
  window frames and "first event after X" are deterministic even with
  timestamp collisions.
* Durations and week offsets are integer microsecond arithmetic
  (``unix_micros`` // divisor), never float seconds and never
  boundary-counting date_diff — identical floor semantics in the
  DuckDB oracle via ``epoch_us``.
* Funnel conversion ratios divide two exact BIGINT counts once, cast
  to double at the end — bit-stable across partitionings.
* Per-user state is bounded by that user's event count; a pathological
  hot user skews one task, and the fix is the same salting pattern as
  operators/asof.py:137 (chunk the user's timeline, carry one summary
  row per chunk) — not needed at fixture scale, documented here so the
  review trail shows the limit is known.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..plans.registry import register
from ..sources.tables import load_table

# Session gap: 30 minutes, expressed in integer microseconds so both
# engines cut sessions with identical floor semantics.
GAP_US = 30 * 60 * 1_000_000
US_PER_S = 1_000_000
US_PER_WEEK = 7 * 86_400 * 1_000_000

# The ordered funnel: a user converts step i only with an event of
# step i's type STRICTLY AFTER their conversion time for step i-1.
FUNNEL_STEPS = ("view", "click", "purchase")


_SESSIONIZE_ORACLE = f"""
        WITH marked AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                             > {GAP_US} THEN 1
                        WHEN lag(ts) OVER w IS NULL THEN 1
                        ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
            SELECT user_id, ts,
                   SUM(is_new) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM marked
        )
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(ts) AS start_ts, MAX(ts) AS end_ts,
               (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // {US_PER_S}
                   AS duration_s
        FROM numbered
        GROUP BY user_id, session_seq
    """


@register(
    "rel_sessionize",
    oracle=_SESSIONIZE_ORACLE,
    tier="relational",
    doc="Gap-based sessionization (30-min inactivity gap): one row per "
    "(user, session) with event count, bounds, and integer-second "
    "duration. Single shuffle on user_id; the running SUM(is_new) "
    "frame and the session group-by reuse the same exchange. The "
    "batch twin of stream_session_windows.",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    return sessionize(ev, GAP_US)


def sessionize(ev: DataFrame, gap_us: int) -> DataFrame:
    """Gap-based sessionization of a (user_id, ts, event_id) frame.

    Sessions split when the gap STRICTLY exceeds ``gap_us`` — the same
    merge-at-exactly-gap boundary rule as Spark's built-in
    ``session_window`` (verified empirically, streaming/events.py:231),
    so the batch and streaming forms agree event-for-event
    (tests/test_eventflow.py::test_sessionize_agrees_with_stream).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    is_new = F.when(us - F.lag(us).over(w) > gap_us, 1).otherwise(
        F.when(F.lag("ts").over(w).isNull(), 1).otherwise(0)
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    numbered = ev.withColumn("is_new", is_new).withColumn(
        "session_seq", F.sum("is_new").over(run).cast("long")
    )
    return (
        numbered.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
                "_dur_us"
            ),
        )
        # integer DIV, same floor semantics as the oracle's `//`
        .withColumn("duration_s", F.expr(f"_dur_us DIV {US_PER_S}"))
        .drop("_dur_us")
    )


@register(
    "rel_attribution_first_touch",
    oracle=f"""
        WITH marked AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                             > {GAP_US} THEN 1
                        WHEN lag(ts) OVER w IS NULL THEN 1
                        ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
            SELECT user_id, ts, event_id, event_type,
                   SUM(is_new) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM marked
        ), firsts AS (
            SELECT user_id, session_seq, event_type AS first_touch
            FROM (
                SELECT user_id, session_seq, event_type,
                       row_number() OVER (PARTITION BY user_id, session_seq
                                          ORDER BY ts, event_id) AS rn
                FROM numbered
            ) WHERE rn = 1
        )
        SELECT f.first_touch, CAST(COUNT(*) AS BIGINT) AS n_purchases
        FROM numbered e JOIN firsts f
          ON e.user_id = f.user_id AND e.session_seq = f.session_seq
        WHERE e.event_type = 'purchase'
        GROUP BY f.first_touch
    """,
    tier="relational",
    doc="Session-based first-touch attribution: every purchase is "
    "credited to the event type that OPENED its session (the 30-min "
    "gap sessions of rel_sessionize). Composes the sessionization "
    "window with a per-session min_by and a co-partitioned join — "
    "everything stays on the single user_id exchange until the final "
    "5-key rollup. The canonical marketing-attribution query a "
    "clickstream warehouse runs daily.",
)
def q_attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    is_new = F.when(us - F.lag(us).over(w) > GAP_US, 1).otherwise(
        F.when(F.lag("ts").over(w).isNull(), 1).otherwise(0)
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    numbered = ev.withColumn("is_new", is_new).withColumn(
        "session_seq", F.sum("is_new").over(run).cast("long")
    )
    firsts = numbered.groupBy("user_id", "session_seq").agg(
        F.min_by("event_type", F.struct("ts", "event_id")).alias("first_touch")
    )
    return (
        numbered.filter(F.col("event_type") == "purchase")
        .join(firsts, ["user_id", "session_seq"])
        .groupBy("first_touch")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )


# Default phase-1 chunk span for the hot-user-safe form: 6 hours.
CHUNK_US = 6 * 3600 * 1_000_000


@register(
    "rel_sessionize_chunked",
    oracle=_SESSIONIZE_ORACLE,  # provably identical output to rel_sessionize
    tier="relational",
    doc="Hot-user-safe sessionization — the salted two-phase form of "
    "rel_sessionize (same pattern as the salted as-of join, "
    "asof.py:137): phase 1 windows within (user, 6-hour time chunk), "
    "so no task ever sorts more than one chunk of one user's events; "
    "phase 2 re-runs the SAME gap logic over the per-chunk session "
    "summaries (one row per local session), merging sessions that "
    "span chunk boundaries — transitively, via the running-sum chain, "
    "so a session crossing many chunks reassembles exactly. "
    "Correctness argument: within-chunk splits have gap > GAP by "
    "construction so phase 2 preserves them, and boundary gaps get "
    "the identical strict-> test, so output == the single-window "
    "form for EVERY chunk size (property-tested at 10 min / 1 h / "
    "6 h, including chunks smaller than the gap). Phase-2 work is "
    "O(local sessions) ~ O(output), the irreducible floor. Shares "
    "rel_sessionize's oracle verbatim.",
)
def q_sessionize_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    return sessionize_chunked(ev, GAP_US, CHUNK_US)


def sessionize_chunked(ev: DataFrame, gap_us: int, chunk_us: int) -> DataFrame:
    """Two-phase chunked sessionization; output-identical to
    ``sessionize(ev, gap_us)`` for any ``chunk_us`` (see the
    registration docstring for the argument)."""
    us = F.unix_micros("ts")
    chunked = ev.withColumn("chunk", F.expr(f"unix_micros(ts) DIV {chunk_us}"))

    # Phase 1: local sessions within (user, chunk) — bounded windows.
    w1 = Window.partitionBy("user_id", "chunk").orderBy("ts", "event_id")
    is_new1 = F.when(us - F.lag(us).over(w1) > gap_us, 1).otherwise(
        F.when(F.lag("ts").over(w1).isNull(), 1).otherwise(0)
    )
    run1 = w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = (
        chunked.withColumn("is_new", is_new1)
        .withColumn("local_seq", F.sum("is_new").over(run1))
        .groupBy("user_id", "chunk", "local_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
        )
    )

    # Phase 2: the summaries are themselves a (start-ordered, disjoint)
    # event stream — apply the same gap rule to merge across chunks.
    w2 = Window.partitionBy("user_id").orderBy("start_ts")
    boundary_gap = F.unix_micros("start_ts") - F.lag(
        F.unix_micros("end_ts")
    ).over(w2)
    is_new2 = F.when(boundary_gap > gap_us, 1).otherwise(
        F.when(boundary_gap.isNull(), 1).otherwise(0)
    )
    run2 = w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        local.withColumn("is_new", is_new2)
        .withColumn("session_seq", F.sum("is_new").over(run2).cast("long"))
        .groupBy("user_id", "session_seq")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.min("start_ts").alias("start_ts"),
            F.max("end_ts").alias("end_ts"),
            (
                F.unix_micros(F.max("end_ts")) - F.unix_micros(F.min("start_ts"))
            ).alias("_dur_us"),
        )
        .withColumn("duration_s", F.expr(f"_dur_us DIV {US_PER_S}"))
        .drop("_dur_us")
    )


@register(
    "rel_resample_daily",
    oracle="""
        WITH bounds AS (
            SELECT CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS lo,
                   CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP) AS hi
            FROM events
        ), grid AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
            FROM bounds
        ), daily AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   COUNT(*) AS n
            FROM events GROUP BY 1
        )
        SELECT strftime(grid.day, '%Y-%m-%d') AS day,
               CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_events
        FROM grid LEFT JOIN daily ON grid.day = daily.day
    """,
    tier="relational",
    doc="Time-series densification: daily event counts over a gap-free "
    "day grid from min to max timestamp (missing days resampled to "
    "explicit zeros — the shape every downstream charting/anomaly "
    "job needs). The grid is sequence() over a 2-value bound row "
    "exploded JVM-side, then a broadcast left join onto the "
    "aggregated dailies: grid size is O(days), never O(rows), so "
    "at 100 TB the expensive side stays one groupBy on day.",
)
def q_resample_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("ts")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    grid = (
        ev.agg(
            F.date_trunc("day", F.min("ts")).alias("lo"),
            F.date_trunc("day", F.max("ts")).alias("hi"),
        )
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
            ).alias("day")
        )
    )
    return (
        grid.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        )
    )


@register(
    "rel_rolling_active_users",
    oracle="""
        WITH user_days AS (
            SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   user_id
            FROM events
        ), days AS (SELECT DISTINCT day FROM user_days)
        SELECT strftime(d.day, '%Y-%m-%d') AS day,
               CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
        FROM days d JOIN user_days u
          ON u.day > d.day - INTERVAL 7 DAY AND u.day <= d.day
        GROUP BY d.day
    """,
    tier="relational",
    doc="7-day rolling active users (WAU per day): dedup events to "
    "(day, user) grain — the big shuffle, done once — then count "
    "distinct users over each day's trailing 7-day window via a "
    "range join of the small day grid against user-days. Distinct-"
    "over-sliding-window has no single-pass exact form; the exact "
    "range join costs O(days x active-users/day) pairs, fine while "
    "user-days per week fits a shuffle. The 100-TB form keeps the "
    "same first pass but merges 7 per-day HLL sketches per window "
    "(approx_count_distinct partials) instead of re-pairing users — "
    "documented here, exact kept as the oracle-checkable contract.",
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    user_days = (
        load_table(spark, sf_dir, "events")
        .select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .distinct()
    )
    days = user_days.select("day").distinct()
    u = user_days.select(F.col("day").alias("u_day"), "user_id")
    return (
        days.join(
            u,
            (F.col("u_day") > F.col("day") - F.expr("INTERVAL 7 DAY"))
            & (F.col("u_day") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "wau")
    )


@register(
    "rel_event_transitions",
    oracle="""
        WITH pairs AS (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS to_type
            FROM events
        )
        SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM pairs WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    """,
    tier="relational",
    doc="Event-type transition counts (first-order Markov edges): for "
    "each consecutive pair in a user's (ts, event_id)-ordered "
    "timeline, count (from_type -> to_type). One shuffle on user_id "
    "for the lead() window; the follow-up groupBy runs on the "
    "5x5-key pair space with map-side partials. The raw material "
    "for path analysis, next-action models, and anomaly detection "
    "over a 100-TB clickstream.",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def rolling_wau_hll_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, wau_est): the 100-TB WAU form — one HLL sketch per day
    (hll_sketch_agg over user_id, map-side mergeable, one pass), then
    each day's trailing 7-day window unions SEVEN per-day sketches
    (hll_union_agg) instead of re-pairing every user-day. Work per day
    is O(sketch bytes), independent of user count."""
    daily_sk = (
        load_table(spark, sf_dir, "events")
        .select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
    )
    days = daily_sk.select(F.col("day").alias("d"))
    return (
        days.join(
            daily_sk,
            (F.col("day") > F.col("d") - F.expr("INTERVAL 7 DAY"))
            & (F.col("day") <= F.col("d")),
        )
        .groupBy("d")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("wau_est")
        )
        .select(F.date_format("d", "yyyy-MM-dd").alias("day"), "wau_est")
    )


@register(
    "rel_rolling_active_users_hll",
    oracle="""
        WITH user_days AS (
            SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   user_id
            FROM events
        ), days AS (SELECT DISTINCT day FROM user_days)
        SELECT strftime(d.day, '%Y-%m-%d') AS day,
               CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau,
               TRUE AS hll_within_5pct
        FROM days d JOIN user_days u
          ON u.day > d.day - INTERVAL 7 DAY AND u.day <= d.day
        GROUP BY d.day
    """,
    tier="relational",
    export=False,
    doc="WAU sketch calibration in the tolerance-verdict form (the "
    "pattern that turned every former rows-only check into an oracle "
    "row): per day, the EXACT trailing-7-day distinct-user count plus "
    "a boolean asserting the HLL estimate (rolling_wau_hll_estimates, "
    "lgConfigK=14 — the production path at 100 TB) lands within 5% of "
    "it. The oracle recomputes the exact count and pins the verdict "
    "TRUE, so a drifting sketch fails the hash, not just a pytest "
    "bound. Spark's HLL estimate itself is engine-specific and "
    "deliberately NOT in the output.",
)
def q_rolling_active_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = q_rolling_active_users(spark, sf_dir)
    est = rolling_wau_hll_estimates(spark, sf_dir)
    return exact.join(est, "day").select(
        "day",
        "wau",
        (
            F.abs(F.col("wau_est") - F.col("wau")) <= 0.05 * F.col("wau")
        ).alias("hll_within_5pct"),
    )


@register(
    "rel_anomaly_daily",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   epoch_us(CAST(date_trunc('day', ts) AS TIMESTAMP))
                       // 86400000000 AS day_no,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ), framed AS (
            SELECT event_type, day_no, n,
                   COUNT(n) OVER w AS c,
                   SUM(n) OVER w AS s1,
                   SUM(n * n) OVER w AS s2
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day_no
                         RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
        )
        SELECT event_type, day_no, n,
               CASE WHEN c >= 2
                     AND CAST(s2 AS DOUBLE) * c - CAST(s1 AS DOUBLE) * s1 > 0
                    THEN round(
                        (CAST(n AS DOUBLE) * c - CAST(s1 AS DOUBLE))
                        / sqrt((CAST(s2 AS DOUBLE) * c
                                - CAST(s1 AS DOUBLE) * s1) * c / (c - 1)),
                        6)
                    ELSE NULL END AS z
        FROM framed
    """,
    tier="relational",
    doc="Daily count anomaly score per event type: z-score of each "
    "day's count against its trailing 7-day window (RANGE frame on "
    "integer day numbers, so gap days shrink the baseline instead "
    "of silently sliding it). The windowed moments are exact BIGINT "
    "sums (COUNT, SUM n, SUM n^2); the z expression is one identical "
    "IEEE double tree on both engines, rounded once. Shuffles: one "
    "on (event_type, day) for the count, one on event_type for the "
    "frame — both tiny key spaces at any scale.",
)
def q_anomaly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.expr("unix_micros(date_trunc('day', ts)) DIV 86400000000").alias(
                "day_no"
            ),
        )
        .groupBy("event_type", "day_no")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_no")
        .rangeBetween(-7, -1)
    )
    framed = daily.select(
        "event_type",
        "day_no",
        "n",
        F.count("n").over(w).alias("c"),
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
    )
    c, s1, s2, n = (F.col(x).cast("double") for x in ("c", "s1", "s2", "n"))
    var_num = s2 * c - s1 * s1  # c^2 * sample-var * (c-1)/c, >0 test only
    z = F.round(
        (n * c - s1) / F.sqrt(var_num * c / (c - F.lit(1.0))), 6
    )
    return framed.select(
        "event_type",
        "day_no",
        "n",
        F.when((F.col("c") >= 2) & (var_num > 0), z).alias("z"),
    )


def funnel_times(
    ev: DataFrame,
    steps: tuple[str, ...] | list[str],
    deadlines_us: list[int | None] | None = None,
    strategy: str = "window",
) -> DataFrame:
    """Per-user conversion times for an ARBITRARY ordered funnel: one
    output row per user who reached step 0, with columns t_0..t_{n-1}
    (NULL from the first unreached step on).

    Step i is MIN(ts) among events of ``steps[i]``'s type strictly
    after the user's step i-1 time — and, when ``deadlines_us[i-1]``
    is set, no later than that many integer microseconds after it
    (per-step deadlines: the deadline-bounded funnel every growth
    dashboard actually runs, generalized from one global bound).

    Two physical strategies, identical semantics (property-tested
    output-equal on random funnels, tests/test_eventflow.py):

    ``strategy="window"`` (default): N STACKED whole-partition window
    aggregates over one user_id partitioning — each step's MIN
    references the previous step's column, so Catalyst plans N Window
    nodes sharing a single exchange and a single events scan
    regardless of step count (plan-audited). The right trade for
    normal fan-out; but it materializes each user's whole event
    partition in one task, and funnel steps can't be chunk-split like
    sessionize (step i's condition references the user's GLOBAL
    t_{i-1}) — a pathological hot user (a bot with millions of
    events) skews one task.

    ``strategy="join_chain"``: the hot-user fallback
    (`_funnel_times_join_chain`) — each step is a filtered scan +
    equi-join + hash MIN aggregation, so a hot key is flattened by
    map-side partial aggregation and AQE's skew-join splitting, at
    the documented cost of one events scan per step. Use it when a
    user's event count can exceed what one task should materialize.
    """
    steps = tuple(steps)
    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps, got {steps!r}")
    if deadlines_us is None:
        deadlines_us = [None] * (len(steps) - 1)
    if len(deadlines_us) != len(steps) - 1:
        raise ValueError(
            f"deadlines_us must have one entry per transition "
            f"({len(steps) - 1}), got {len(deadlines_us)}"
        )
    if strategy == "join_chain":
        return _funnel_times_join_chain(ev, steps, deadlines_us)
    if strategy != "window":
        raise ValueError(
            f"unknown funnel strategy {strategy!r}; use 'window' or 'join_chain'"
        )
    w = Window.partitionBy("user_id")
    df = ev.withColumn(
        "t_0",
        F.min(F.when(F.col("event_type") == steps[0], F.col("ts"))).over(w),
    )
    for i, step in enumerate(steps[1:], start=1):
        prev = F.col(f"t_{i-1}")
        cond = (F.col("event_type") == step) & (F.col("ts") > prev)
        if deadlines_us[i - 1] is not None:
            cond = cond & (
                F.unix_micros("ts") - F.unix_micros(prev) <= deadlines_us[i - 1]
            )
        df = df.withColumn(f"t_{i}", F.min(F.when(cond, F.col("ts"))).over(w))
    return (
        df.filter(F.col("t_0").isNotNull())
        .groupBy("user_id")
        .agg(*[F.min(f"t_{i}").alias(f"t_{i}") for i in range(len(steps))])
    )


def _funnel_times_join_chain(
    ev: DataFrame,
    steps: tuple[str, ...],
    deadlines_us: list[int | None],
) -> DataFrame:
    """The hot-user funnel strategy: step-by-step hash aggregations.

    s_0 = MIN(ts) per user over step-0 events (a hash agg — map-side
    combine collapses a bot's millions of rows to one partial per
    input partition BEFORE the shuffle, which the whole-partition
    window form cannot do). Each s_i joins step-i events to
    s_{i-1}(user_id, t_{i-1}) on user_id, filters the
    strictly-after/deadline predicate, and hash-aggregates MIN(ts).
    The equi-join is skew-splittable by AQE (a window partition is
    not), and the per-step frames hold ONE ROW PER QUALIFYING USER —
    the only whole-user state anywhere. Final assembly left-joins
    s_1..s_{n-1} onto s_0 so unreached steps are NULL, matching the
    window form's contract exactly.

    Cost: the events scan re-embeds per step (the documented 2N+1
    scans — each a pushdown-filtered single-column-heavier read, not
    a full materialization). This is the fallback the window form's
    skew note priced in; it exists for the corpus where one user's
    events overflow a task, not as the default."""
    ev = ev.select("user_id", "ts", "event_type")
    s0 = (
        ev.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_0"))
    )
    frames = [s0]
    for i, step in enumerate(steps[1:], start=1):
        prev_t = F.col(f"t_{i - 1}")
        cond = F.col("ts") > prev_t
        if deadlines_us[i - 1] is not None:
            cond = cond & (
                F.unix_micros("ts") - F.unix_micros(prev_t) <= deadlines_us[i - 1]
            )
        frames.append(
            ev.filter(F.col("event_type") == step)
            .join(frames[i - 1].select("user_id", f"t_{i - 1}"), "user_id")
            .filter(cond)
            .groupBy("user_id")
            .agg(F.min("ts").alias(f"t_{i}"))
        )
    out = frames[0]
    for i, s_i in enumerate(frames[1:], start=1):
        out = out.join(s_i.select("user_id", f"t_{i}"), "user_id", "left")
    return out


def _funnel_times(
    spark: SparkSession, sf_dir: str, max_delay_us: int | None = None
) -> DataFrame:
    """The registered 3-step view->click->purchase funnel over the
    events fixture — `funnel_times` with FUNNEL_STEPS and one shared
    per-transition deadline."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    return funnel_times(
        ev, FUNNEL_STEPS, [max_delay_us] * (len(FUNNEL_STEPS) - 1)
    )


def _sql_funnel_times(max_delay_us: int | None = None) -> str:
    """DuckDB CTE mirroring `_funnel_times` (optionally deadline-bounded)."""

    def bound(prev: str) -> str:
        if max_delay_us is None:
            return ""
        return f" AND epoch_us(e.ts) - epoch_us({prev}) <= {max_delay_us}"

    return f"""
    WITH s0 AS (
        SELECT user_id, MIN(ts) AS t_0 FROM events
        WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
    ), s1 AS (
        SELECT e.user_id, MIN(e.ts) AS t_1
        FROM events e JOIN s0 ON e.user_id = s0.user_id
        WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s0.t_0{bound('s0.t_0')}
        GROUP BY e.user_id
    ), s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t_2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s1.t_1{bound('s1.t_1')}
        GROUP BY e.user_id
    ), f AS (
        SELECT s0.user_id, t_0, t_1, t_2
        FROM s0 LEFT JOIN s1 ON s0.user_id = s1.user_id
                LEFT JOIN s2 ON s1.user_id = s2.user_id
    )
"""


_SQL_FUNNEL_TIMES = _sql_funnel_times()

_SQL_FUNNEL_STEPS = f"""
        SELECT CAST(step_no AS BIGINT) AS step_no, step,
               CAST(n_users AS BIGINT) AS n_users,
               CAST(n_users AS DOUBLE)
                 / CAST(MAX(n_users) OVER () AS DOUBLE) AS conv_from_first
        FROM (
            SELECT 1 AS step_no, '{FUNNEL_STEPS[0]}' AS step,
                   COUNT(t_0) AS n_users FROM f
            UNION ALL
            SELECT 2, '{FUNNEL_STEPS[1]}', COUNT(t_1) FROM f
            UNION ALL
            SELECT 3, '{FUNNEL_STEPS[2]}', COUNT(t_2) FROM f
        ) steps
    """

FUNNEL_DEADLINE_US = 24 * 3600 * 1_000_000


@register(
    "rel_funnel",
    oracle=_SQL_FUNNEL_TIMES + _SQL_FUNNEL_STEPS,
    tier="relational",
    doc="Ordered conversion funnel view -> click -> purchase: a user "
    "counts for step i only with a step-i event strictly after their "
    "step-(i-1) conversion time. Emits one row per step with the "
    "user count and the conversion rate vs step 1 (exact BIGINT "
    "division, cast once). The per-user times frame is one shuffle "
    "on user_id; the 3-row summary is a driver-free union of "
    "aggregates.",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_summary(_funnel_times(spark, sf_dir), FUNNEL_STEPS)


@register(
    "rel_funnel_join_chain",
    oracle=_SQL_FUNNEL_TIMES + _SQL_FUNNEL_STEPS,
    tier="relational",
    export=False,  # pytest/sweep-verified variant of rel_funnel
    doc="The hot-user funnel strategy (per-step skew-splittable hash "
    "aggregations, no whole-partition window) against the SAME DuckDB "
    "oracle as rel_funnel — the two strategies' equivalence is both "
    "property-tested on random logs and oracle-checked on the fixture.",
)
def q_funnel_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    f = funnel_times(ev, FUNNEL_STEPS, strategy="join_chain")
    return funnel_summary(f, FUNNEL_STEPS)


def funnel_summary(f: DataFrame, steps: tuple[str, ...] | list[str]) -> DataFrame:
    """Per-user times frame -> one row per step: (step_no, step,
    n_users, conv_from_first) for a funnel of ANY length."""
    steps = tuple(steps)
    agg = f.agg(
        *[
            F.count(f"t_{i}").alias(f"n_{i + 1}")
            for i in range(len(steps))
        ]
    )
    # explode(array(struct...)) the single stats row into N step rows.
    # A union of N selects over `agg` would recompute the whole
    # per-user chain per branch (3N source scans, plan-audited); this
    # keeps it at one computation, like stack() — but built from
    # Column objects, so caller-supplied step names pass through
    # F.lit verbatim (the former selectExpr text embedding doubled
    # quotes yet missed backslashes: a name ending in '\' swallowed
    # the closing quote — injection into the stack() expression). The
    # ratio's denominator is null-guarded: with no step-0 users,
    # 0.0/0.0 would yield NaN, which poisons downstream arithmetic —
    # NULL is the honest value for "conversion rate of an empty
    # funnel".
    n_1 = F.col("n_1").cast("double")
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).cast("long").alias("step_no"),
                    F.lit(step).alias("step"),
                    F.col(f"n_{i}").alias("n_users"),
                    F.when(
                        n_1 != 0.0, F.col(f"n_{i}").cast("double") / n_1
                    ).alias("conv_from_first"),
                )
                for i, step in enumerate(steps, start=1)
            ]
        )
    ).alias("r")
    return agg.select(rows).select(
        "r.step_no", "r.step", "r.n_users", "r.conv_from_first"
    )


@register(
    "rel_funnel_24h",
    oracle=_sql_funnel_times(FUNNEL_DEADLINE_US) + _SQL_FUNNEL_STEPS,
    tier="relational",
    doc="Deadline-bounded funnel: same ordered view -> click -> purchase "
    "chain, but each step must land within 24 hours of the previous "
    "step's conversion time (strictly-after AND within-deadline, "
    "integer-microsecond bound on both engines). The realistic form "
    "of rel_funnel — unbounded funnels overcount conversions that "
    "happen weeks later.",
)
def q_funnel_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_summary(
        _funnel_times(spark, sf_dir, FUNNEL_DEADLINE_US), FUNNEL_STEPS
    )


@register(
    "rel_retention_cohorts",
    oracle=f"""
        WITH firsts AS (
            SELECT user_id,
                   CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS wk0
            FROM events GROUP BY user_id
        )
        SELECT strftime(f.wk0, '%Y-%m-%d') AS cohort_week,
               (epoch_us(CAST(date_trunc('week', e.ts) AS TIMESTAMP))
                  - epoch_us(f.wk0)) // {US_PER_WEEK} AS week_offset,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
        FROM events e JOIN firsts f ON e.user_id = f.user_id
        GROUP BY 1, 2
    """,
    tier="relational",
    doc="Weekly cohort retention: users grouped by the ISO week of "
    "their first event; n_active = distinct users of that cohort "
    "seen in each subsequent week (offset 0 = the cohort week "
    "itself). Week math is integer microseconds over Monday-"
    "truncated stamps — both engines truncate weeks to Monday, and "
    "the offset division is exact because both operands are week "
    "boundaries. Cohort assignment joins co-partitioned on user_id "
    "(the firsts frame is per-user — broadcast at fixture scale, "
    "shuffle-join on the same key at 100 TB).",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("wk0")
    )
    return (
        ev.join(firsts, "user_id")
        .select(
            F.date_format("wk0", "yyyy-MM-dd").alias("cohort_week"),
            (
                F.unix_micros(F.date_trunc("week", F.col("ts")))
                - F.unix_micros("wk0")
            ).alias("_off_us"),
            "user_id",
        )
        .withColumn("week_offset", F.expr(f"_off_us DIV {US_PER_WEEK}"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
