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


def _join_chain_funnel_model(rows, steps, deadlines_us):
    """The reference semantics as plain Python — the join-chain form:
    t_i = MIN(ts) of step-i events strictly after t_{i-1} and within
    its per-transition deadline. Returns {user: (t_0..t_{n-1})} for
    users who reached step 0."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, ts, et in rows:
        by_user[u].append((ts, et))
    out = {}
    for u, evs in by_user.items():
        t0 = min((ts for ts, et in evs if et == steps[0]), default=None)
        if t0 is None:
            continue
        times = [t0]
        for i in range(1, len(steps)):
            prev = times[i - 1]
            if prev is None:
                times.append(None)
                continue
            d = deadlines_us[i - 1]
            cand = [
                ts
                for ts, et in evs
                if et == steps[i]
                and ts > prev
                and (d is None or _us(ts) - _us(prev) <= d)
            ]
            times.append(min(cand, default=None))
        out[u] = tuple(times)
    return out


def _us(dt):
    import datetime

    return (dt - datetime.datetime(1970, 1, 1)) // datetime.timedelta(
        microseconds=1
    )


_PROP_STEPS = ("s0", "s1", "s2", "s3")  # 4-step funnel
_PROP_TYPES = _PROP_STEPS + ("noise",)


def test_parametric_funnel_matches_join_chain_model(spark):
    """VERDICT r5 #6: property-test N-step funnel_times against the
    join-chain oracle model — random event logs, 4 steps, random
    per-transition deadline mixes."""
    import datetime

    import hypothesis.strategies as st
    from hypothesis import HealthCheck, given, settings

    from map_reduce_indexing_spark.operators.eventflow import funnel_times

    base = datetime.datetime(2024, 1, 1)

    events_strategy = st.lists(
        st.tuples(
            st.integers(0, 3),  # user
            st.integers(0, 500),  # seconds offset
            st.sampled_from(_PROP_TYPES),
        ),
        min_size=0,
        max_size=30,
    )
    deadline_strategy = st.tuples(
        *[
            st.one_of(st.none(), st.integers(1, 300).map(lambda s: s * 1_000_000))
            for _ in range(len(_PROP_STEPS) - 1)
        ]
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
    )
    @given(evs=events_strategy, deadlines=deadline_strategy)
    def run(evs, deadlines):
        rows = [
            (u, base + datetime.timedelta(seconds=s), et) for u, s, et in evs
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string"
        ) if rows else spark.createDataFrame(
            [], "user_id long, ts timestamp, event_type string"
        )
        expected = _join_chain_funnel_model(rows, _PROP_STEPS, list(deadlines))
        for strategy in ("window", "join_chain"):
            got = {
                r.user_id: tuple(r[f"t_{i}"] for i in range(len(_PROP_STEPS)))
                for r in funnel_times(
                    df, _PROP_STEPS, list(deadlines), strategy=strategy
                ).collect()
            }
            assert got == expected, strategy

    run()


def test_parametric_funnel_plan_is_single_exchange_any_step_count(spark):
    """The claim behind funnel_times' generalization: N stacked Window
    nodes share ONE user_id exchange and ONE source scan for ANY step
    count — deadlines included."""
    from map_reduce_indexing_spark.operators.eventflow import funnel_times
    from map_reduce_indexing_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts", "event_type")
    five = funnel_times(
        ev,
        ["view", "click", "view", "click", "purchase"],
        [None, 3600_000_000, None, 3600_000_000],
    )
    plan = five._jdf.queryExecution().executedPlan().toString()
    assert plan.count("events.parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Window") >= 5, plan


def test_funnel_join_chain_plan_is_hash_aggs_no_window(spark):
    """The hot-user fallback's physical claim: NO whole-partition
    Window node anywhere — every per-user reduction is a hash
    aggregation (partial + final, so map-side combine flattens a hot
    key before the shuffle), and the events scans carry the per-step
    event_type filter pushed down."""
    from map_reduce_indexing_spark.operators.eventflow import funnel_times
    from map_reduce_indexing_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts", "event_type")
    f = funnel_times(
        ev,
        ["view", "click", "purchase"],
        [None, 3600_000_000],
        strategy="join_chain",
    )
    plan = f._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert plan.count("HashAggregate") >= 6, plan  # 3 steps x partial+final
    assert "PushedFilters" in plan and "event_type" in plan, plan
    with pytest.raises(ValueError):
        funnel_times(ev, ["a", "b"], strategy="nope")


def test_api_funnel_four_steps(spark):
    """The api.funnel surface: arbitrary step list + per-transition
    deadlines, summary and per-user forms."""
    import datetime

    from map_reduce_indexing_spark import api

    base = datetime.datetime(2024, 1, 1)

    def ev(u, s, et):
        return (u, base + datetime.timedelta(seconds=s), et)

    rows = [
        # u1 converts all four steps within deadlines
        ev(1, 0, "signup"), ev(1, 10, "activate"), ev(1, 20, "invite"), ev(1, 30, "purchase"),
        # u2 misses the activate deadline (gap 200 s > 60 s bound)
        ev(2, 0, "signup"), ev(2, 200, "activate"), ev(2, 210, "invite"), ev(2, 220, "purchase"),
        # u3 stops after step 2
        ev(3, 0, "signup"), ev(3, 5, "activate"),
        # u4 never signs up
        ev(4, 0, "activate"), ev(4, 1, "invite"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    steps = ["signup", "activate", "invite", "purchase"]
    summary = {
        r.step: (r.step_no, r.n_users, r.conv_from_first)
        for r in api.funnel(
            df, steps, deadlines_us=[60 * 1_000_000, None, None]
        ).collect()
    }
    assert summary == {
        "signup": (1, 3, 1.0),
        "activate": (2, 2, 2 / 3),
        "invite": (3, 1, 1 / 3),
        "purchase": (4, 1, 1 / 3),
    }
    per_user = api.funnel(
        df, steps, deadlines_us=[60 * 1_000_000, None, None], per_user=True
    )
    assert set(per_user.columns) == {"user_id", "t_0", "t_1", "t_2", "t_3"}
    u2 = per_user.filter(F.col("user_id") == 2).head()
    assert u2.t_0 is not None and u2.t_1 is None and u2.t_3 is None
    # invalid shapes raise loudly
    with pytest.raises(ValueError):
        api.funnel(df, ["only_one"])
    with pytest.raises(ValueError):
        api.funnel(df, steps, deadlines_us=[None])
    # caller-supplied step names pass through verbatim — quotes,
    # backslashes, escape-sequence lookalikes (ADVICE r6: the former
    # selectExpr embedding let a trailing '\' swallow the closing
    # quote and '\n' silently change the label)
    for tricky in ("don't churn", "trailing\\", "with\\nnewline-lookalike"):
        quoted = api.funnel(df, ["signup", tricky]).collect()
        assert {r.step for r in quoted} == {"signup", tricky}
    # empty funnel: NULL conversion rates, not NaN (0.0/0.0)
    empty = api.funnel(df, ["never_happens", "also_never"]).collect()
    assert [(r.n_users, r.conv_from_first) for r in empty] == [
        (0, None),
        (0, None),
    ]


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
        for r in eventflow.rolling_wau_hll_estimates(spark, SF_DIR).collect()
    }
    assert set(est) == set(exact)
    for day, e in est.items():
        assert e == pytest.approx(exact[day], rel=0.05), day
    # the registered tolerance-verdict form must agree
    for r in eventflow.q_rolling_active_users_hll(spark, SF_DIR).collect():
        assert r.hll_within_5pct, r.day


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
