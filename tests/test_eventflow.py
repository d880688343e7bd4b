"""Batch event-flow analytics (operators/eventflow.py): oracle parity
plus semantic invariants the oracle alone would not pin down."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from map_reduce_indexing_spark.operators import eventflow
from map_reduce_indexing_spark.plans.registry import get
from tests.conftest import SF_DIR, assert_df_matches_oracle


@pytest.mark.parametrize(
    "name",
    [
        "rel_sessionize",
        "rel_funnel",
        "rel_retention_cohorts",
        "rel_event_transitions",
        "rel_resample_daily",
        "rel_rolling_active_users",
        "rel_anomaly_daily",
        "rel_funnel_24h",
        "rel_attribution_first_touch",
    ],
)
def test_oracle_parity(spark, duck, name):
    q = get(name)
    assert_df_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)


def test_sessionize_invariants(spark):
    df = eventflow.q_sessionize(spark, SF_DIR).cache()
    try:
        rows = df.collect()
        assert rows, "no sessions produced"
        # Sessions partition the event stream: per-user session_seq is
        # 1..n dense, and durations are non-negative.
        assert all(r.duration_s >= 0 for r in rows)
        assert all(r.n_events >= 1 for r in rows)
        per_user = (
            df.groupBy("user_id")
            .agg(
                F.min("session_seq").alias("lo"),
                F.max("session_seq").alias("hi"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        for r in per_user:
            assert (r.lo, r.hi - r.lo + 1) == (1, r.n)
        # Event conservation: session event counts sum to the table size.
        total = df.agg(F.sum("n_events")).collect()[0][0]
        n_events = (
            spark.read.parquet(f"{SF_DIR}/events.parquet").count()
        )
        assert total == n_events
    finally:
        df.unpersist()


def test_sessionize_gap_is_strict(spark):
    # Within a session no consecutive gap exceeds GAP_US; across a
    # session boundary the gap does. Verified on one heavy user.
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .orderBy("ts", "event_id")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    uid, evs = max(by_user.items(), key=lambda kv: len(kv[1]))
    expected_sessions = 1
    for a, b in zip(evs, evs[1:]):
        gap = (b.ts - a.ts).total_seconds() * 1_000_000
        if gap > eventflow.GAP_US:
            expected_sessions += 1
    got = (
        eventflow.q_sessionize(spark, SF_DIR)
        .filter(F.col("user_id") == uid)
        .count()
    )
    assert got == expected_sessions


@pytest.mark.parametrize(
    "chunk_us",
    [10 * 60 * 1_000_000, 3600 * 1_000_000, 6 * 3600 * 1_000_000],
    ids=["10min", "1h", "6h"],
)
def test_chunked_sessionize_equals_plain(spark, chunk_us):
    """The two-phase hot-user-safe form is output-identical to the
    single-window form for any chunk size — including chunks smaller
    than the 30-min gap."""
    from map_reduce_indexing_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts", "event_id")
    plain = {tuple(r) for r in eventflow.sessionize(ev, eventflow.GAP_US).collect()}
    chunked = {
        tuple(r)
        for r in eventflow.sessionize_chunked(ev, eventflow.GAP_US, chunk_us).collect()
    }
    assert plain == chunked


def test_chunked_sessionize_registered_oracle(spark, duck):
    q = get("rel_sessionize_chunked")
    assert_df_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)


def test_sessionize_agrees_with_stream(spark):
    """Batch sessionize at the streaming gap must equal the streaming
    session_window result event-for-event — the two forms implement one
    semantic (split only when the gap STRICTLY exceeds the threshold)."""
    from map_reduce_indexing_spark.plans import registry
    from map_reduce_indexing_spark.sources.tables import load_table

    gap_us = 5 * 60 * 1_000_000  # streaming/events.py SESSION_GAP
    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts", "event_id")
    batch = {
        (r.user_id, r.start_ts, r.end_ts, r.n_events)
        for r in eventflow.sessionize(ev, gap_us).collect()
    }
    stream = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in registry.get("stream_session_windows").fn(spark, SF_DIR).collect()
    }
    assert batch == stream


def test_funnel_plan_is_single_scan_single_exchange(spark):
    """The stacked-window formulation must keep one events scan and one
    user_id exchange — the join-chain form cost 7 scans."""
    plan = (
        eventflow.q_funnel(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("events.parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_bounded_funnel_never_exceeds_unbounded(spark):
    unbounded = {r.step: r.n_users for r in eventflow.q_funnel(spark, SF_DIR).collect()}
    bounded = {r.step: r.n_users for r in eventflow.q_funnel_24h(spark, SF_DIR).collect()}
    assert bounded[eventflow.FUNNEL_STEPS[0]] == unbounded[eventflow.FUNNEL_STEPS[0]]
    for s in eventflow.FUNNEL_STEPS[1:]:
        assert bounded[s] <= unbounded[s]


def test_funnel_monotone(spark):
    rows = {r.step: r for r in eventflow.q_funnel(spark, SF_DIR).collect()}
    assert set(rows) == set(eventflow.FUNNEL_STEPS)
    n = [rows[s].n_users for s in eventflow.FUNNEL_STEPS]
    assert n[0] >= n[1] >= n[2] >= 0
    assert rows["view"].conv_from_first == 1.0
    assert all(0.0 <= rows[s].conv_from_first <= 1.0 for s in rows)


def test_transitions_conserve_pairs(spark):
    # Sum of transition counts == total events minus one per user
    # (each user's timeline of length n contributes n-1 edges).
    df = eventflow.q_event_transitions(spark, SF_DIR)
    total = df.agg(F.sum("n")).collect()[0][0]
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total == n_events - n_users


def test_resample_grid_is_gap_free(spark):
    import datetime

    rows = sorted(
        eventflow.q_resample_daily(spark, SF_DIR).collect(),
        key=lambda r: r.day,
    )
    days = [datetime.date.fromisoformat(r.day) for r in rows]
    assert days == [days[0] + datetime.timedelta(days=i) for i in range(len(days))]
    assert sum(r.n_events for r in rows) == spark.read.parquet(
        f"{SF_DIR}/events.parquet"
    ).count()


def test_rolling_wau_bounds_daily_active(spark):
    wau = {r.day: r.wau for r in eventflow.q_rolling_active_users(spark, SF_DIR).collect()}
    dau = {
        r.day: r.n
        for r in (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .select(
                F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
                "user_id",
            )
            .distinct()
            .groupBy("day")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    n_users = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    for day, w in wau.items():
        assert dau[day] <= w <= n_users


def test_rolling_wau_hll_tracks_exact(spark):
    exact = {
        r.day: r.wau
        for r in eventflow.q_rolling_active_users(spark, SF_DIR).collect()
    }
    est = {
        r.day: r.wau_est
        for r in eventflow.q_rolling_active_users_hll(spark, SF_DIR).collect()
    }
    assert set(est) == set(exact)
    for day, e in est.items():
        assert e == pytest.approx(exact[day], rel=0.05), day


def test_attribution_conserves_purchases(spark):
    # Every purchase is attributed to exactly one session opener.
    rows = eventflow.q_attribution_first_touch(spark, SF_DIR).collect()
    total = sum(r.n_purchases for r in rows)
    n_purchases = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert total == n_purchases


def test_retention_offsets_start_at_zero(spark):
    df = eventflow.q_retention_cohorts(spark, SF_DIR)
    rows = df.collect()
    assert rows
    assert all(r.week_offset >= 0 for r in rows)
    # Offset 0 of a cohort contains the whole cohort (every user is
    # active in their own first week by definition).
    zero = {r.cohort_week: r.n_active for r in rows if r.week_offset == 0}
    later = [
        r
        for r in rows
        if r.week_offset > 0 and r.n_active > zero[r.cohort_week]
    ]
    assert not later, f"cohort grew after week 0: {later[:3]}"
