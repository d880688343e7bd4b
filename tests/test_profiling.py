"""Profiling + deterministic sampling (operators/profiling.py)."""

from __future__ import annotations

import pytest

from map_reduce_indexing_spark.operators import profiling
from map_reduce_indexing_spark.plans.registry import get
from tests.conftest import SF_DIR, assert_df_matches_oracle


@pytest.mark.parametrize(
    "name",
    [
        "rel_profile_columns",
        "rel_profile_columns_approx",  # tolerance-verdict form, r6
        "rel_sample_stratified",
        "rel_histogram_totalprice",
    ],
)
def test_oracle_parity(spark, duck, name):
    q = get(name)
    assert_df_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)


def test_profile_shape(spark):
    rows = {r.column_name: r for r in profiling.q_profile_columns(spark, SF_DIR).collect()}
    assert set(rows) == {c for c, _ in profiling._PROFILE_COLS}
    for r in rows.values():
        assert r.n_nulls >= 0
        assert 0 < r.n_distinct <= r.n_rows
    # Key column is unique; status column is low-cardinality.
    assert rows["o_orderkey"].n_distinct == rows["o_orderkey"].n_rows
    assert rows["o_orderstatus"].n_distinct < 10


def test_profile_approx_tracks_exact(spark):
    exact = {
        r.column_name: r.n_distinct
        for r in profiling.q_profile_columns(spark, SF_DIR).collect()
    }
    approx = {
        r.column_name: r.n_distinct
        for r in profiling.profile_estimates(spark, SF_DIR).collect()
    }
    for col, nd in exact.items():
        assert approx[col] == pytest.approx(nd, rel=0.1), col
    # the registered tolerance-verdict form must agree
    for r in profiling.q_profile_columns_approx(spark, SF_DIR).collect():
        assert r.approx_within_10pct, r.column_name


def test_stratified_sample_rates(spark):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    totals = {r.l_returnflag: r.n for r in li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()}
    sampled = {r.l_returnflag: r.n_sampled for r in profiling.q_sample_stratified(spark, SF_DIR).collect()}
    for flag, pct in profiling._STRATA_PCT:
        # md5 buckets are uniform; at fixture scale allow generous slack.
        expect = totals[flag] * pct / 100
        assert sampled.get(flag, 0) == pytest.approx(expect, rel=0.5), flag


def test_stratified_sample_is_stable(spark):
    a = sorted(map(tuple, profiling.q_sample_stratified(spark, SF_DIR).collect()))
    b = sorted(map(tuple, profiling.q_sample_stratified(spark, SF_DIR).collect()))
    assert a == b


def test_histogram_conserves_rows(spark):
    from pyspark.sql import functions as F

    df = profiling.q_histogram_totalprice(spark, SF_DIR)
    total = df.agg(F.sum("n")).collect()[0][0]
    assert total == spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert all(r.bin_lo % profiling._BIN_W == 0 for r in df.collect())


def test_profile_drift_psi_semantics(spark):
    """PSI terms: sign matches the proportion shift, total PSI is
    non-negative and equals an independent driver-side recompute, and
    comparing a distribution to ITSELF yields exactly zero."""
    import math

    rows = get("rel_profile_drift").fn(spark, SF_DIR).collect()
    assert rows
    t_a = sum(r.n_a for r in rows)
    t_b = sum(r.n_b for r in rows)
    total = 0.0
    for r in rows:
        p_a, p_b = r.n_a / t_a, r.n_b / t_b
        want = round((p_a - p_b) * math.log(p_a / p_b), 9)
        # driver recompute can differ by float assoc only at <1e-9
        assert abs(r.psi_term - want) < 2e-9
        assert r.psi_term >= 0 or abs(r.psi_term) < 1e-12  # terms >= 0
        total += r.psi_term
    assert total >= 0.0

    # self-drift is exactly zero: same column, same half on both sides
    from pyspark.sql import functions as F

    from map_reduce_indexing_spark.operators.profiling import _BIN_W
    from map_reduce_indexing_spark.sources.tables import load_table

    orders = load_table(spark, SF_DIR, "orders")
    bin_lo = (
        F.floor(F.col("o_totalprice") / F.lit(_BIN_W)).cast("long") * _BIN_W
    )
    b = orders.groupBy(bin_lo.alias("bin_lo")).agg(
        F.count(F.lit(1)).alias("n_a"), F.count(F.lit(1)).alias("n_b")
    )
    t = b.agg(
        F.sum("n_a").cast("double").alias("t_a"),
        F.sum("n_b").cast("double").alias("t_b"),
    )
    p_a = F.col("n_a").cast("double") / F.col("t_a")
    p_b = F.col("n_b").cast("double") / F.col("t_b")
    zero = (
        b.crossJoin(F.broadcast(t))
        .select(F.round((p_a - p_b) * F.log(p_a / p_b), 9).alias("x"))
        .agg(F.sum("x"))
        .head()[0]
    )
    assert zero == 0.0
