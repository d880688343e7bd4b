"""Dataset profiling and deterministic sampling (SURVEY.md §2 EXT tier
— the data-quality / corpus-curation layer of a training-data pipeline).

Reference parity note: the reference engine (GingerBear/
map-reduce-indexing, helper_reduce.c:153) computes one histogram over
tokens; profiling arbitrary tabular columns and drawing reproducible
samples is part of the EXT surface SURVEY.md §2 calls for beyond it.

Why hash-based sampling instead of ``df.sample()``: RNG sampling is
not reproducible across engines, partitionings, or reruns, which makes
it untestable against an oracle and unusable for train/eval splits
(the same row must land in the same split forever). Hashing a stable
key (md5 hex prefix -> integer bucket 0..99) gives a deterministic
per-row coin flip that both Spark and DuckDB compute bit-identically
— the same mechanism as textstats.py's train/val/test split, here
applied per-stratum. (Spark's built-in ``hash()`` is Murmur3 with
Spark-specific seeding, and DuckDB's ``hash()`` is a different
function entirely; md5 is the one hash both engines share.)

Scale notes:

* ``rel_profile_columns`` is ONE pass over the table: a single
  aggregate computes per-column counts/nulls/min/max/distinct, then a
  6-row unpivot. Multiple exact COUNT(DISTINCT) in one aggregate make
  Catalyst plan an Expand (row x #distinct-aggs before the shuffle) —
  the honest cost of exact profiling. At 100 TB swap the exact
  distincts for ``approx_count_distinct`` (HLL, no Expand) — the
  variant `rel_profile_columns_approx` below is exactly that and is
  pytest-verified with rows-only bounds (HLL estimates have no SQL
  oracle).
* Sampling/histogram queries are scan + per-row expression + one
  small-key aggregate: map-side partials, no joins, no skew exposure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..localrel import local_rows_df
from ..plans.registry import register
from ..sources.tables import load_table

# ---------------------------------------------------------------------------
# Column profiling
# ---------------------------------------------------------------------------

# (column, SQL expression rendering min/max as a cross-engine-stable
# string). Doubles go through DECIMAL(18,2) first: both engines render
# 2-place decimals identically, while raw double->string formatting is
# engine-specific.
_PROFILE_COLS: tuple[tuple[str, str], ...] = (
    ("o_orderkey", "o_orderkey"),
    ("o_custkey", "o_custkey"),
    ("o_orderstatus", "o_orderstatus"),
    ("o_totalprice", "CAST(o_totalprice AS DECIMAL(18,2))"),
    ("o_orderdate", "o_orderdate"),
    ("o_orderpriority", "o_orderpriority"),
)


def _profile(
    spark: SparkSession,
    sf_dir: str,
    exact: bool,
    with_verdict: bool = False,
) -> DataFrame:
    """One aggregate pass + stack() unpivot. `exact` picks the distinct
    estimator; `with_verdict` runs BOTH and appends the
    approx-within-10% tolerance-verdict boolean (implies exact
    n_distinct in the output)."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, expr in _PROFILE_COLS:
        e = F.expr(expr)
        aggs += [
            F.count(e).alias(f"{col}__nn"),
            (
                F.countDistinct(e)
                if exact or with_verdict
                else F.approx_count_distinct(e)
            ).alias(f"{col}__nd"),
            F.min(e).cast("string").alias(f"{col}__min"),
            F.max(e).cast("string").alias(f"{col}__max"),
        ]
        if with_verdict:
            aggs.append(F.approx_count_distinct(e).alias(f"{col}__nda"))
    one = orders.agg(*aggs)
    # Unpivot the single stats row into one row per column via stack().
    stack_args = ", ".join(
        f"'{col}', {col}__nn, {col}__nd, {col}__min, {col}__max"
        + (f", {col}__nda" if with_verdict else "")
        for col, _ in _PROFILE_COLS
    )
    stack_cols = "column_name, n_non_null, n_distinct, min_value, max_value" + (
        ", n_distinct_approx" if with_verdict else ""
    )
    out = one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS ({stack_cols})",
        "n_rows",
    ).select(
        "column_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("n_rows") - F.col("n_non_null")).cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
        *(
            [
                (
                    F.abs(F.col("n_distinct_approx") - F.col("n_distinct"))
                    <= 0.1 * F.col("n_distinct")
                ).alias("approx_within_10pct")
            ]
            if with_verdict
            else []
        ),
    )
    return out


def _profile_oracle() -> str:
    parts = []
    for col, expr in _PROFILE_COLS:
        parts.append(
            f"""SELECT '{col}' AS column_name,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) - COUNT({expr}) AS BIGINT) AS n_nulls,
                   CAST(COUNT(DISTINCT {expr}) AS BIGINT) AS n_distinct,
                   CAST(MIN({expr}) AS VARCHAR) AS min_value,
                   CAST(MAX({expr}) AS VARCHAR) AS max_value
            FROM orders"""
        )
    return " UNION ALL ".join(parts)


@register(
    "rel_profile_columns",
    oracle=_profile_oracle(),
    tier="relational",
    doc="One-pass exact column profile of `orders`: per column the row "
    "count, null count, exact distinct count, and min/max rendered "
    "as strings (doubles via DECIMAL(18,2) so both engines format "
    "identically). Single aggregate + 6-row stack() unpivot; the "
    "oracle's UNION-ALL-of-scans form is the correctness mirror, "
    "not the plan. Exact multi-column COUNT(DISTINCT) costs an "
    "Expand — see rel_profile_columns_approx for the 100-TB form.",
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _profile(spark, sf_dir, exact=True)


@register(
    "rel_profile_columns_approx",
    oracle=_profile_oracle().replace(
        "AS max_value", "AS max_value, TRUE AS approx_within_10pct"
    ),
    tier="relational",
    export=False,
    doc="The 100-TB profile calibration in the tolerance-verdict form: "
    "per column the EXACT profile plus a boolean asserting "
    "approx_count_distinct (HLL sketch, mergeable map-side, no Expand "
    "— the estimator the production profile runs instead of exact "
    "distincts) lands within 10% of the exact count. Both estimators "
    "run in ONE aggregate pass; the oracle recomputes the exact "
    "profile and pins the verdict TRUE, so estimator drift fails the "
    "value hash. The engine-specific estimate itself stays out of "
    "the output (profile_estimates exposes it for pytest).",
)
def q_profile_columns_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _profile(spark, sf_dir, exact=True, with_verdict=True)


def profile_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw approx-only profile (what production runs at 100 TB) —
    exposed for the pytest accuracy bound; the registered query wraps
    the estimate in a tolerance verdict instead of exporting it."""
    return _profile(spark, sf_dir, exact=False)


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------

# Per-stratum sampling rates in percent: oversample returns ('R'),
# keep a small slice of the rest — the classic class-rebalancing shape.
_STRATA_PCT: tuple[tuple[str, int], ...] = (("R", 10), ("A", 4), ("N", 2))


def _bucket_expr_spark() -> F.Column:
    key = F.concat_ws(
        "|", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % 100
    )


_SQL_BUCKET = (
    "CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|' || "
    "CAST(l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
)


@register(
    "rel_sample_stratified",
    oracle=f"""
        WITH rates(flag, pct) AS (VALUES {", ".join(f"('{f}', {p})" for f, p in _STRATA_PCT)})
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_sampled,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_qty
        FROM lineitem JOIN rates ON l_returnflag = rates.flag
        WHERE {_SQL_BUCKET} < rates.pct
        GROUP BY l_returnflag
    """,
    tier="relational",
    doc="Deterministic stratified sample of lineitem by return flag "
    "(R 10%, A 4%, N 2%): each row's md5-derived bucket 0..99 is "
    "compared to its stratum's rate, so membership is a pure row "
    "property — reproducible across engines, partitionings, and "
    "reruns, and rows never migrate between samples when the table "
    "grows. Plan: scan + broadcast 3-row rate dim + per-row hash + "
    "map-side-partial aggregate; no full-table shuffle. Emits "
    "per-stratum sampled counts/sums (the downstream-visible "
    "contract of a sampler).",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    rates = local_rows_df(
        spark,
        list(_STRATA_PCT), "flag: string, pct: int"
    )
    return (
        li.join(F.broadcast(rates), li.l_returnflag == F.col("flag"))
        .filter(_bucket_expr_spark() < F.col("pct"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram
# ---------------------------------------------------------------------------

_BIN_W = 25_000  # o_totalprice spans ~1e3..5e5; 20 populated bins


@register(
    "rel_histogram_totalprice",
    oracle=f"""
        SELECT CAST(FLOOR(o_totalprice / {_BIN_W}) AS BIGINT) * {_BIN_W}
                   AS bin_lo,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        GROUP BY 1
    """,
    tier="relational",
    doc="Fixed-width histogram of order totals (bin width 25k): "
    "per-row FLOOR bucketing + count. FLOOR on a double is exact in "
    "both engines away from bin boundaries, and the fixture's 2-dp "
    "prices never sit on a 25k boundary with a representation "
    "error. Map-side partial aggregation over ~20 keys — the "
    "cheapest possible distribution sketch of a 100-TB column.",
)
def q_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bin_lo = (
        F.floor(F.col("o_totalprice") / F.lit(_BIN_W)).cast("long") * _BIN_W
    )
    return (
        orders.groupBy(bin_lo.alias("bin_lo"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Distribution drift: PSI between two corpus halves
# ---------------------------------------------------------------------------

_DRIFT_CUT = "1998-04-25"  # the fixture's median order date


@register(
    "rel_profile_drift",
    oracle=f"""
        WITH b AS (
            SELECT CAST(FLOOR(o_totalprice / {_BIN_W}) AS BIGINT) * {_BIN_W}
                       AS bin_lo,
                   SUM(CASE WHEN o_orderdate < TIMESTAMP '{_DRIFT_CUT}'
                            THEN 1 ELSE 0 END) AS n_a,
                   SUM(CASE WHEN o_orderdate >= TIMESTAMP '{_DRIFT_CUT}'
                            THEN 1 ELSE 0 END) AS n_b
            FROM orders GROUP BY 1),
        t AS (SELECT SUM(n_a) AS t_a, SUM(n_b) AS t_b FROM b)
        SELECT bin_lo,
               CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
               ROUND((CAST(n_a AS DOUBLE) / CAST(t_a AS DOUBLE)
                      - CAST(n_b AS DOUBLE) / CAST(t_b AS DOUBLE))
                     * ln((CAST(n_a AS DOUBLE) / CAST(t_a AS DOUBLE))
                          / (CAST(n_b AS DOUBLE) / CAST(t_b AS DOUBLE))),
                     9) AS psi_term
        FROM b CROSS JOIN t
        WHERE n_a > 0 AND n_b > 0
    """,
    tier="relational",
    doc=f"Distribution-drift detection (population stability index) "
    f"between the order-total distributions before/after the fixture's "
    f"median order date: per 25k-wide bin, the reference and current "
    "proportions and the PSI contribution (p_a - p_b) * ln(p_a / p_b) "
    "— the monitoring check a production pipeline runs on every "
    "incoming batch before it trains on it. ONE scan builds both "
    "halves' histograms as conditional aggregations over the same "
    "~20-key groupBy; the totals are a 1-row broadcast back onto the "
    "bins. Bins populated in only one half are excluded (the standard "
    "PSI smoothing concern, made deterministic); every double op is "
    "the same IEEE tree on both engines with one final 9-dp round. At "
    "100 TB: a map-side-combined 20-key aggregate — the cheapest "
    "possible drift monitor.",
)
def q_rel_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bin_lo = (
        F.floor(F.col("o_totalprice") / F.lit(_BIN_W)).cast("long") * _BIN_W
    )
    cut = F.lit(_DRIFT_CUT).cast("timestamp")
    b = orders.groupBy(bin_lo.alias("bin_lo")).agg(
        F.sum(F.when(F.col("o_orderdate") < cut, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("o_orderdate") >= cut, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    t = b.agg(
        F.sum("n_a").cast("double").alias("t_a"),
        F.sum("n_b").cast("double").alias("t_b"),
    )
    p_a = F.col("n_a").cast("double") / F.col("t_a")
    p_b = F.col("n_b").cast("double") / F.col("t_b")
    return (
        b.crossJoin(F.broadcast(t))
        .filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .select(
            "bin_lo",
            "n_a",
            "n_b",
            F.round((p_a - p_b) * F.log(p_a / p_b), 9).alias("psi_term"),
        )
    )
