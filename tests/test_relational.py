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
]


@pytest.mark.parametrize("name", RELATIONAL_QUERIES)
def test_relational_query_matches_oracle(spark, duck, name):
    q = registry.get(name)
    assert_df_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)


def test_approx_distinct_close_to_exact(spark):
    approx = registry.get("rel_approx_distinct").fn(spark, SF_DIR).head()
    exact = registry.get("rel_distinct_counts").fn(spark, SF_DIR).head()
    assert abs(approx.approx_parts - exact.n_parts) / exact.n_parts < 0.05
    assert abs(approx.approx_orders - exact.n_orders) / exact.n_orders < 0.05


def test_q5_broadcasts_dims(spark):
    df = registry.get("rel_q5_local_supplier").fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
