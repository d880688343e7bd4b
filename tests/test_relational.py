"""Relational-tier queries vs the DuckDB oracle."""

from __future__ import annotations

import pytest

from map_reduce_indexing_spark.plans import registry

from .conftest import SF_DIR, assert_df_matches_oracle

RELATIONAL_QUERIES = [
    "rel_q1_pricing_summary",
    "rel_distinct_counts",
    "rel_rollup_orders",
    "rel_cube_lineitem",
    "rel_grouping_sets",
    "rel_pivot_status",
    "rel_q3_shipping_priority",
    "rel_q5_local_supplier",
    "rel_join_outer_counts",
    "rel_join_semi",
    "rel_join_anti",
    "rel_theta_join_bands",
    "rel_window_running_total",
    "rel_window_lag_gap",
    "rel_window_rank_parts",
    "rel_set_ops",
    "rel_scalar_functions",
    "rel_topk_orders",
    "rel_q6_revenue",
    "rel_json_parse",
    "rel_join_asof",
    "rel_join_asof_forward",
    "rel_q17_small_quantity",
    "rel_q18_large_orders",
    "rel_array_map_functions",
    "rel_window_ntile",
    "rel_window_value_functions",
    "rel_window_range_frame",
    "rel_q4_order_priority",
    "rel_q13_custdist",
    "rel_q14_promo_revenue",
    "rel_q19_disjunctive",
    "rel_q22_dormant_customers",
    "rel_percentiles",
    "rel_approx_percentiles",
    "rel_approx_distinct",
    "rel_corr_covar",
    "rel_q2_min_balance_supplier",
    "rel_q7_nation_volume",
    "rel_q8_market_share",
    "rel_q9_product_type_revenue",
    "rel_q10_returned_items",
    "rel_q11_important_parts",
    "rel_q12_priority_lines",
    "rel_q15_top_supplier",
    "rel_q16_supplier_part_count",
    "rel_q20_excess_suppliers",
    "rel_q21_waiting_suppliers",
]


def test_asof_join_randomized_differential(spark):
    """Randomized differential test for the union+window as-of join vs
    a brute-force python reference (seeded; includes timestamp ties on
    and across sides)."""
    import random
    from datetime import datetime, timedelta

    from map_reduce_indexing_spark.operators.asof import asof_join_backward

    rng = random.Random(99)
    base = datetime(2024, 1, 1)
    # coarse second granularity forces plenty of exact-tie cases
    lefts = [
        (rng.randrange(5), base + timedelta(seconds=rng.randrange(30)), i)
        for i in range(120)
    ]
    rights = [
        (rng.randrange(5), base + timedelta(seconds=rng.randrange(30)), 1000 + i)
        for i in range(120)
    ]

    expected = {}
    for k, t, lid in lefts:
        cands = [(rt, rid) for rk, rt, rid in rights if rk == k and rt <= t]
        if cands:
            expected[lid] = max(cands)[1]  # latest ts, then max rid

    left = spark.createDataFrame(lefts, "k long, ts timestamp, lid long")
    right = spark.createDataFrame(rights, "k long, rts timestamp, rid long")
    out = asof_join_backward(
        left, right, key="k", left_ts="ts", right_ts="rts",
        payload_cols=["rid"], tiebreak="rid",
    )
    got = {r.lid: r.rid for r in out.collect()}
    assert got == expected


def test_asof_forward_randomized_differential(spark):
    """Forward direction of the same differential: earliest right row at
    or after each left timestamp, MIN tiebreak on equal timestamps."""
    import random
    from datetime import datetime, timedelta

    from map_reduce_indexing_spark.operators.asof import asof_join_forward

    rng = random.Random(77)
    base = datetime(2024, 1, 1)
    lefts = [
        (rng.randrange(5), base + timedelta(seconds=rng.randrange(30)), i)
        for i in range(120)
    ]
    rights = [
        (rng.randrange(5), base + timedelta(seconds=rng.randrange(30)), 1000 + i)
        for i in range(120)
    ]

    expected = {}
    for k, t, lid in lefts:
        cands = [(rt, rid) for rk, rt, rid in rights if rk == k and rt >= t]
        if cands:
            expected[lid] = min(cands)[1]  # earliest ts, then min rid

    left = spark.createDataFrame(lefts, "k long, ts timestamp, lid long")
    right = spark.createDataFrame(rights, "k long, rts timestamp, rid long")
    out = asof_join_forward(
        left, right, key="k", left_ts="ts", right_ts="rts",
        payload_cols=["rid"], tiebreak="rid",
    )
    got = {r.lid: r.rid for r in out.collect()}
    assert got == expected


def test_operators_tolerate_empty_inputs(spark):
    """Edge robustness: core composable operators must return empty
    results (same schema), not throw, on empty inputs."""
    from map_reduce_indexing_spark.operators.asof import asof_join_backward
    from map_reduce_indexing_spark.operators.indexing import build_postings

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert build_postings(empty_docs).count() == 0

    left = spark.createDataFrame([], "k long, ts timestamp, lid long")
    right = spark.createDataFrame([], "k long, rts timestamp, rid long")
    out = asof_join_backward(
        left, right, key="k", left_ts="ts", right_ts="rts",
        payload_cols=["rid"], tiebreak="rid",
    )
    assert out.count() == 0
    # non-empty left, empty right -> no matches survive (inner semantics)
    left2 = spark.createDataFrame(
        [(1, __import__("datetime").datetime(2024, 1, 1), 9)],
        "k long, ts timestamp, lid long",
    )
    assert asof_join_backward(
        left2, right, key="k", left_ts="ts", right_ts="rts",
        payload_cols=["rid"], tiebreak="rid",
    ).count() == 0


@pytest.mark.parametrize("name", RELATIONAL_QUERIES)
def test_relational_query_matches_oracle(spark, duck, name):
    q = registry.get(name)
    assert_df_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)


def test_approx_distinct_close_to_exact(spark):
    # Tolerance-verdict shape: exact counts + booleans asserting the HLL
    # estimate is within 5% (the booleans ARE the sketch check).
    row = registry.get("rel_approx_distinct").fn(spark, SF_DIR).head()
    exact = registry.get("rel_distinct_counts").fn(spark, SF_DIR).head()
    assert row.exact_parts == exact.n_parts
    assert row.exact_orders == exact.n_orders
    assert row.parts_within_5pct and row.orders_within_5pct


def test_asof_join_semantics(spark):
    """Pin as-of tie/boundary semantics on a hand-built frame:
    equal timestamps match (<=), latest-at-or-before wins, max-tiebreak
    wins among same-timestamp right rows, unmatched left rows drop."""
    from datetime import datetime

    from map_reduce_indexing_spark.operators.asof import asof_join_backward

    t = lambda s: datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, t("2024-01-01T00:10:00"), 100),  # after r2 -> picks rid 21
            (1, t("2024-01-01T00:05:00"), 101),  # ties r2 exactly -> rid 21
            (1, t("2024-01-01T00:01:00"), 102),  # only r1 before -> rid 10
            (2, t("2024-01-01T00:00:30"), 103),  # no right row before -> drop
        ],
        "k long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [
            (1, t("2024-01-01T00:00:00"), 10),
            (1, t("2024-01-01T00:05:00"), 20),  # same ts as next: max rid wins
            (1, t("2024-01-01T00:05:00"), 21),
            (2, t("2024-01-01T00:01:00"), 30),
        ],
        "k long, rts timestamp, rid long",
    )
    out = asof_join_backward(
        left, right, key="k", left_ts="ts", right_ts="rts",
        payload_cols=["rid"], tiebreak="rid",
    )
    got = {r.lid: r.rid for r in out.collect()}
    assert got == {100: 21, 101: 21, 102: 10}


def test_q5_broadcasts_dims(spark):
    df = registry.get("rel_q5_local_supplier").fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_q4_decorrelates_to_semi_join(spark):
    """The EXISTS subquery must execute as one left-semi join with the
    non-equi clause as a join filter — no per-row subquery probe."""
    df = registry.get("rel_q4_order_priority").fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_q22_anti_join_and_broadcast_scalar(spark):
    """NOT EXISTS runs as a left-anti join; the scalar-average threshold
    is broadcast (a 1-row build side), never a shuffle."""
    df = registry.get("rel_q22_dormant_customers").fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q6_pushdown_and_pruning(spark):
    """Predicates reach the parquet scan and only the 4 referenced
    columns (of 11) are read — the scan-efficiency contract that makes
    this query IO-bound-only at 100 TB."""
    df = registry.get("rel_q6_revenue").fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull" in plan
    scan_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_quantity" in scan_schema and "l_shipdate" in scan_schema
    for unused in ("l_orderkey", "l_returnflag", "l_tax", "l_partkey"):
        assert unused not in scan_schema


def test_approx_percentiles_close_to_exact(spark):
    """The t-digest scale path must land within 2% relative error of
    the exact interpolated quantiles; the query's own within-bound
    booleans encode that verdict, and its exact columns must agree
    with rel_percentiles."""
    exact = {
        r.l_returnflag: (r.qty_q50, r.median_price)
        for r in registry.get("rel_percentiles").fn(spark, SF_DIR).collect()
    }
    approx = registry.get("rel_approx_percentiles").fn(spark, SF_DIR).collect()
    assert len(approx) == len(exact) > 0
    for r in approx:
        q50, med = exact[r.l_returnflag]
        assert r.exact_q50 == q50
        assert r.exact_median_price == med
        assert r.q50_within_2pct and r.median_within_2pct


def test_asof_null_timestamps_dropped_both_directions(spark):
    """SQL comparison semantics: a NULL timestamp can never satisfy
    ts <= t or ts >= t, so NULL-ts rows on either side must be dropped,
    not matched (regression: forward direction once phantom-matched a
    NULL-ts left row against every right row)."""
    from datetime import datetime

    from map_reduce_indexing_spark.operators.asof import (
        asof_join_backward,
        asof_join_forward,
    )

    t = datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, None, 1), (1, t, 2)], "k long, ts timestamp, lid long"
    )
    right = spark.createDataFrame(
        [(1, t, 100), (1, None, 999)], "k long, rts timestamp, rid long"
    )
    for fn in (asof_join_backward, asof_join_forward):
        got = {
            r.lid: r.rid
            for r in fn(
                left, right, key="k", left_ts="ts", right_ts="rts",
                payload_cols=["rid"], tiebreak="rid",
            ).collect()
        }
        assert got == {2: 100}, (fn.__name__, got)


def test_asof_salted_matches_plain(spark):
    """The salted two-phase as-of must be result-identical to the
    single-window form, including ties; tiny chunks (2 s over a 30 s
    span) force most matches through the cross-chunk phase-2 path."""
    import random
    from datetime import datetime, timedelta

    from map_reduce_indexing_spark.operators.asof import (
        asof_join_backward,
        asof_join_backward_salted,
    )

    rng = random.Random(42)
    base = datetime(2024, 1, 1)
    lefts = [
        (rng.randrange(5), base + timedelta(seconds=rng.randrange(30)), i)
        for i in range(150)
    ]
    # extra payload column that is frequently NULL: the plain form
    # carries each column's last non-null value INDEPENDENTLY, so the
    # salted cross-chunk fallback must too (ADVICE r4) — a non-null
    # value from an earlier chunk must survive a later all-NULL chunk.
    rights = [
        (
            rng.randrange(5),
            base + timedelta(seconds=rng.randrange(30)),
            1000 + i,
            rng.choice([None, None, rng.randrange(100)]),
        )
        for i in range(60)  # sparse right side -> many cross-chunk matches
    ]
    left = spark.createDataFrame(lefts, "k long, ts timestamp, lid long")
    right = spark.createDataFrame(
        rights, "k long, rts timestamp, rid long, extra long"
    )
    kw = dict(key="k", left_ts="ts", right_ts="rts",
              payload_cols=["rid", "extra"], tiebreak="rid")
    plain = {
        (r.lid, r.rid, r.extra)
        for r in asof_join_backward(left, right, **kw).collect()
    }
    assert any(e is not None for (_, _, e) in plain)  # NULL path exercised
    assert any(e is None for (_, _, e) in plain)
    for chunk_s in (2, 7, 3600):
        salted = {
            (r.lid, r.rid, r.extra)
            for r in asof_join_backward_salted(
                left, right, chunk_seconds=chunk_s, **kw
            ).collect()
        }
        assert salted == plain, f"chunk_seconds={chunk_s}"
