"""Relational breadth over the TPC-H-ish fixtures (SURVEY.md §2 EXT tier;
§2.3 J1-J5, §2.4 A6-A7, §2.5 W1-W3, §2.6, §2.7, §2.8).

The reference implements no joins, windows, or set ops — its only
relational computation is COUNT GROUP BY (helper_reduce.c:153). This
module supplies the query surface a user of an analytics engine needs,
expressed declaratively so Catalyst does join selection (broadcast for
dims under the threshold, sort-merge above), pushdown, and AQE re-planning.

FP determinism discipline for oracle hashing: never SUM raw doubles —
Spark's partial-agg addition order differs run to run and from DuckDB's.
Instead cast inputs to DECIMAL(18,2) (exact, associative), SUM exactly,
and cast the final decimal to DOUBLE once. Averages are exact-decimal
sums divided as doubles. Both engines then produce bit-identical values.

Scale notes (100 TB posture) are on each query's docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..localrel import local_rows_df
from ..plans.registry import register
from ..sources.tables import load_table, register_views


def dec(col: str) -> F.Column:
    """Exact money/quantity arithmetic: double -> DECIMAL(18,2)."""
    return F.col(col).cast("decimal(18,2)")


def dsum(expr, alias: str) -> F.Column:
    """Exact decimal SUM surfaced as a deterministic double."""
    return F.sum(expr).cast("double").alias(alias)


# DuckDB-side fragments for the same discipline.
def sql_dec(col: str) -> str:
    return f"CAST({col} AS DECIMAL(18,2))"


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE) AS {alias}"


# ---------------------------------------------------------------------------
# Aggregation queries
# ---------------------------------------------------------------------------


@register(
    "rel_q1_pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum(sql_dec('l_quantity'), 'sum_qty')},
               {sql_dsum(sql_dec('l_extendedprice'), 'sum_base_price')},
               {sql_dsum(f"{sql_dec('l_extendedprice')} * (1 - {sql_dec('l_discount')})", 'sum_disc_price')},
               {sql_dsum(f"{sql_dec('l_extendedprice')} * (1 - {sql_dec('l_discount')}) * (1 + {sql_dec('l_tax')})", 'sum_charge')},
               CAST(SUM({sql_dec('l_quantity')}) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM({sql_dec('l_extendedprice')}) AS DOUBLE) / COUNT(*) AS avg_price,
               CAST(SUM({sql_dec('l_discount')}) AS DOUBLE) / COUNT(*) AS avg_disc,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    tier="relational",
    doc="TPC-H Q1-style pricing summary: wide multi-aggregate groupBy; "
    "map-side partial agg bounds shuffle volume at any scale.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp")
    )
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(dec("l_quantity"), "sum_qty"),
        dsum(dec("l_extendedprice"), "sum_base_price"),
        dsum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")), "sum_disc_price"),
        dsum(
            dec("l_extendedprice") * (F.lit(1) - dec("l_discount")) * (F.lit(1) + dec("l_tax")),
            "sum_charge",
        ),
        (F.sum(dec("l_quantity")).cast("double") / n).alias("avg_qty"),
        (F.sum(dec("l_extendedprice")).cast("double") / n).alias("avg_price"),
        (F.sum(dec("l_discount")).cast("double") / n).alias("avg_disc"),
        n.cast("long").alias("count_order"),
    )


@register(
    "rel_distinct_counts",
    export=False,  # pytest-verified variant; kept out of the external window
    oracle="""
        SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
    """,
    tier="relational",
    doc="Exact multi-column COUNT DISTINCT (SURVEY.md §2.4 A6). At 100 TB "
    "prefer approx_count_distinct (see rel_approx_distinct).",
)
def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "rel_approx_distinct",
    # Tolerance-verdict oracle: HLL sketch values are engine-specific, so
    # the query emits the EXACT distinct counts plus booleans asserting the
    # HLL++ estimate (rsd=1%) lands within 5%; the oracle emits the same
    # exact counts and literal TRUE. Hash-checkable, and a broken sketch
    # flips the boolean.
    oracle="""
        SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
               TRUE AS parts_within_5pct,
               TRUE AS orders_within_5pct
        FROM lineitem
    """,
    tier="relational",
    doc="approx_count_distinct (HyperLogLog++): the 100 TB-tier form of A6. "
    "Verified via the tolerance-verdict pattern: the query asserts "
    "|approx-exact|/exact <= 5% as booleans the oracle hash-matches.",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("_ap_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("_ap_orders"),
    )
    within = lambda ap, ex: F.abs(ap - ex) / ex <= F.lit(0.05)  # noqa: E731
    return agg.select(
        "exact_parts",
        "exact_orders",
        within(F.col("_ap_parts"), F.col("exact_parts")).alias("parts_within_5pct"),
        within(F.col("_ap_orders"), F.col("exact_orders")).alias("orders_within_5pct"),
    )


@register(
    "rel_rollup_orders",
    export=False,  # pytest-verified variant; kept out of the external window
    oracle="""
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    tier="relational",
    doc="Hierarchical rollup (SURVEY.md §2.4 A7); NULL subtotal markers "
    "coalesced to 'ALL' for oracle comparability.",
)
def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(dec("o_totalprice"), "total_price"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "rel_cube_lineitem",
    export=False,  # pytest-verified variant; kept out of the external window
    oracle="""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tier="relational",
    doc="Full cube over two dimensions (SURVEY.md §2.4 A7).",
)
def q_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum(dec("l_quantity"), "qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "qty",
        )
    )


@register(
    "rel_grouping_sets",
    oracle="""
        SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
               COALESCE(CAST(n_name AS VARCHAR), 'ALL') AS nation,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((c_mktsegment), (n_name))
    """,
    tier="relational",
    doc="Explicit GROUPING SETS via the SQL API (same Catalyst plan as the "
    "DataFrame form).",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "nation"))
    return spark.sql(
        """
        SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
               COALESCE(n_name, 'ALL') AS nation,
               COUNT(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((c_mktsegment), (n_name))
        """
    )


@register(
    "rel_pivot_status",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
               CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F"
        FROM lineitem GROUP BY l_returnflag
    """,
    tier="relational",
    doc="Pivot (wide conditional aggregation) — SURVEY.md §2.8 EXT.",
)
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.count(F.lit(1)))
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "rel_q3_shipping_priority",
    oracle=f"""
        SELECT l_orderkey,
               {sql_dsum(f"{sql_dec('l_extendedprice')} * (1 - {sql_dec('l_discount')})", 'revenue')},
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    tier="relational",
    doc="TPC-H Q3-style 3-way join + agg + top-k. customer is the small "
    "side: Catalyst/AQE broadcasts it; lineitem never shuffles twice.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "rel_q5_local_supplier",
    oracle=f"""
        SELECT n_name,
               {sql_dsum(f"{sql_dec('l_extendedprice')} * (1 - {sql_dec('l_discount')})", 'revenue')}
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    tier="relational",
    doc="TPC-H Q5-style 6-way star join. region/nation/supplier/customer "
    "are broadcast dims; only orders-lineitem is a big-big join.",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")), "revenue"))
    )


@register(
    "rel_join_outer_counts",
    oracle="""
        SELECT c_custkey, c_mktsegment,
               CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
               CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_mktsegment
    """,
    tier="relational",
    doc="Left outer join preserving order-less customers (SURVEY.md §2.3 J4).",
)
def q_join_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0)).cast("double").alias("spend"),
        )
    )


@register(
    "rel_join_semi",
    oracle="""
        SELECT c_custkey FROM customer
        WHERE c_custkey IN (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
    tier="relational",
    doc="Left-semi join (EXISTS) — SURVEY.md §2.3 J3.",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select("c_custkey")


@register(
    "rel_join_anti",
    oracle="""
        SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    tier="relational",
    doc="Left-anti join (NOT EXISTS) — SURVEY.md §2.3 J3.",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select("c_custkey")


@register(
    "rel_theta_join_bands",
    oracle="""
        SELECT b.band, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders o
        JOIN (VALUES ('small', 0, 100000), ('medium', 100000, 300000),
                     ('large', 300000, 1000000)) AS b(band, lo, hi)
          ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        GROUP BY b.band
    """,
    tier="relational",
    doc="Theta/range join against a tiny banding dim (SURVEY.md §2.3 J5): "
    "broadcast nested-loop — the right physical plan when one side is rows.",
)
def q_theta_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bands = local_rows_df(
        spark,
        [("small", 0, 100000), ("medium", 100000, 300000), ("large", 300000, 1000000)],
        "band string, lo long, hi long",
    )
    return (
        orders.join(
            F.broadcast(bands),
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(dec("o_totalprice"), "total"),
        )
    )


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------


@register(
    "rel_window_running_total",
    export=False,  # pytest-verified variant; kept out of the external window
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS running_spend
        FROM orders WHERE o_custkey < 100
    """,
    tier="relational",
    doc="Running total per customer (SURVEY.md §2.5 W2/W3); exact-decimal "
    "accumulation keeps the window deterministic.",
)
def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@register(
    "rel_window_lag_gap",
    oracle="""
        SELECT user_id, event_id,
               CAST(date_diff('second',
                    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    ts) AS BIGINT) AS gap_s
        FROM events WHERE user_id < 20
    """,
    tier="relational",
    doc="lag() inter-event gap per user (SURVEY.md §2.5 W2) — the building "
    "block of batch sessionization (see streaming module).",
)
def q_window_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap = (F.unix_timestamp("ts") - F.unix_timestamp(prev)).cast("long")
    return e.select("user_id", "event_id", gap.alias("gap_s"))


@register(
    "rel_window_rank_parts",
    oracle="""
        SELECT p_brand, p_partkey, p_retailprice, CAST(rnk AS BIGINT) AS rnk FROM (
            SELECT p_brand, p_partkey, p_retailprice,
                   RANK() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rnk
            FROM part)
        WHERE rnk <= 3
    """,
    tier="relational",
    doc="Top-k per group via ranking window (SURVEY.md §2.5 W1, §2.6 O4).",
)
def q_window_rank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        p.withColumn("rnk", F.rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rnk")
    )


# ---------------------------------------------------------------------------
# Set operations & scalar-function coverage
# ---------------------------------------------------------------------------


@register(
    "rel_set_ops",
    oracle="""
        SELECT 'building_or_machinery' AS op, CAST(COUNT(*) AS BIGINT) AS n FROM (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            UNION
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
        UNION ALL
        SELECT 'open_and_closed' AS op, CAST(COUNT(*) AS BIGINT) AS n FROM (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        UNION ALL
        SELECT 'open_not_closed' AS op, CAST(COUNT(*) AS BIGINT) AS n FROM (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
    tier="relational",
    doc="UNION / INTERSECT / EXCEPT (SURVEY.md §2.7) summarized as counts.",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    machinery = cust.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    open_ = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    closed = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")

    def one(op: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(op).alias("op"), "n")

    return (
        one("building_or_machinery", building.union(machinery).distinct())
        .unionAll(one("open_and_closed", open_.intersect(closed)))
        .unionAll(one("open_not_closed", open_.subtract(closed)))
    )


@register(
    "rel_scalar_functions",
    oracle="""
        SELECT event_id,
               upper(event_type) AS kind_u,
               substr(event_type, 1, 3) AS kind3,
               CAST(length(props) AS BIGINT) AS props_len,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
               date_trunc('hour', ts) AS ts_hour,
               CAST(year(ts) AS BIGINT) AS y,
               CAST(hour(ts) AS BIGINT) AS h,
               concat(event_type, '#', CAST(user_id AS VARCHAR)) AS tag,
               CAST(abs(value) AS DOUBLE) AS absval
        FROM events WHERE event_id < 500
    """,
    tier="relational",
    doc="Scalar-function coverage (SURVEY.md §2.8): string, JSON "
    "(the reference's positional get_value_by_index parsing, "
    "worker.c:231-249, generalized), date/time, math.",
)
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return e.select(
        "event_id",
        F.upper("event_type").alias("kind_u"),
        F.substring("event_type", 1, 3).alias("kind3"),
        F.length("props").cast("long").alias("props_len"),
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.date_trunc("hour", "ts").alias("ts_hour"),
        F.year("ts").cast("long").alias("y"),
        F.hour("ts").cast("long").alias("h"),
        F.concat(F.col("event_type"), F.lit("#"), F.col("user_id").cast("string")).alias("tag"),
        F.abs("value").cast("double").alias("absval"),
    )


@register(
    "rel_q6_revenue",
    oracle=f"""
        SELECT {sql_dsum(f"{sql_dec('l_extendedprice')} * {sql_dec('l_discount')}", 'revenue')},
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    tier="relational",
    doc="TPC-H Q6-style forecast-revenue: pure filter+aggregate. The "
    "point at scale is pushdown — all four predicates reach the parquet "
    "scan (PushedFilters) and only 4 of 11 columns are read (ReadSchema); "
    "no shuffle beyond the single-row final agg.",
)
def q6_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(dec("l_extendedprice") * dec("l_discount"), "revenue"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


@register(
    "rel_json_parse",
    oracle=f"""
        SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_decile,
               CAST(COUNT(*) AS BIGINT) AS n,
               {sql_dsum(sql_dec('value'), 'total_value')},
               CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
               CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
        FROM events
        GROUP BY 1
    """,
    tier="relational",
    doc="Schema-on-read JSON (SURVEY.md §2.8 EXT): from_json the `props` "
    "column into a typed struct (the generalization of the reference's "
    "positional get_value_by_index text parsing, worker.c:231-249), then "
    "aggregate on the parsed field. At scale from_json is JVM-side "
    "(Jackson) inside codegen — no Python in the loop.",
)
def q_json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", "k BIGINT"))
    return (
        parsed.withColumn("k_decile", F.col("p.k") % 10)
        .groupBy("k_decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(dec("value"), "total_value"),
            F.min("p.k").alias("k_min"),
            F.max("p.k").alias("k_max"),
        )
    )


@register(
    "rel_q17_small_quantity",
    oracle=f"""
        SELECT {sql_dsum(sql_dec('l_extendedprice'), 'total_price')},
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        WHERE l_quantity < (
            SELECT 0.5 * AVG(l_quantity) FROM lineitem i
            WHERE i.l_partkey = lineitem.l_partkey)
    """,
    tier="relational",
    doc="TPC-H Q17-style correlated aggregate subquery: lineitems below "
    "half their part's average quantity. Catalyst decorrelates into an "
    "aggregate + equi-join — no per-row re-execution; at scale this is "
    "one extra shuffle on l_partkey, not O(rows) subquery probes.",
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("v_lineitem_q17")
    return spark.sql(
        f"""
        SELECT CAST(SUM({sql_dec('l_extendedprice')}) AS DOUBLE) AS total_price,
               COUNT(*) AS n_items
        FROM v_lineitem_q17
        WHERE l_quantity < (
            SELECT 0.5 * AVG(l_quantity) FROM v_lineitem_q17 i
            WHERE i.l_partkey = v_lineitem_q17.l_partkey)
        """
    )


@register(
    "rel_q18_large_orders",
    oracle="""
        SELECT o.o_orderkey, o.o_custkey,
               CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_custkey
        HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 150
        ORDER BY total_qty DESC, o_orderkey LIMIT 50
    """,
    tier="relational",
    doc="TPC-H Q18-style large-volume orders: join + groupBy + HAVING + "
    "top-k. The HAVING filter runs post-aggregation where cardinality "
    "has already collapsed to |orders|; top-k is TakeOrderedAndProject.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 150)
        .select("o_orderkey", "o_custkey", F.col("q").cast("double").alias("total_qty"))
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(50)
    )


@register(
    "rel_array_map_functions",
    oracle="""
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_toks,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
               array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3,
               CAST(len(list_filter(toks, t -> length(t) > 4)) AS BIGINT) AS n_long,
               list_sort(list_transform(list_distinct(toks), t -> upper(t)))[1] AS first_upper
        FROM (
            SELECT doc_id,
                   list_filter(list_transform(
                       string_split(lower(replace(text, chr(10), ' ')), ' '),
                       t -> regexp_replace(t, '[^a-z]', '', 'g')), t -> t <> '') AS toks
            FROM documents) WHERE doc_id < 100
    """,
    tier="relational",
    doc="Array-function breadth (SURVEY.md §2.8 EXT): size, distinct, "
    "sort+slice, filter-by-predicate, transform — all JVM-side array "
    "expressions over the tokenized documents.",
)
def q_array_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import normalize_tokens_expr

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    t = docs.select("doc_id", normalize_tokens_expr("text").alias("toks"))
    return t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_toks"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
        F.concat_ws(",", F.slice(F.array_sort(F.array_distinct("toks")), 1, 3)).alias("first3"),
        F.size(F.filter("toks", lambda x: F.length(x) > 4)).cast("long").alias("n_long"),
        F.element_at(
            F.array_sort(F.transform(F.array_distinct("toks"), F.upper)), 1
        ).alias("first_upper"),
    )


@register(
    "rel_window_ntile",
    oracle="""
        SELECT o_orderkey,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile,
               round(percent_rank() OVER w, 9) AS pr,
               round(cume_dist() OVER w, 9) AS cd
        FROM orders
        WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
        QUALIFY o_orderkey < 500
    """,
    tier="relational",
    doc="Distribution windows (SURVEY.md §2.5): ntile quartiles, "
    "percent_rank, cume_dist over the global price order (rounded to "
    "9 dp so the rank-ratio division folds identically).",
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.round(F.percent_rank().over(w), 9).alias("pr"),
            F.round(F.cume_dist().over(w), 9).alias("cd"),
        )
        .filter(F.col("o_orderkey") < 500)
    )


@register(
    "rel_window_value_functions",
    oracle="""
        SELECT o_orderkey,
               first_value(o_orderkey) OVER w AS cheapest_key,
               last_value(o_orderkey) OVER
                   (PARTITION BY o_orderstatus
                    ORDER BY o_totalprice, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND UNBOUNDED FOLLOWING) AS priciest_key,
               nth_value(o_orderkey, 2) OVER
                   (PARTITION BY o_orderstatus
                    ORDER BY o_totalprice, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND UNBOUNDED FOLLOWING) AS second_cheapest_key
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice, o_orderkey)
        QUALIFY o_orderkey < 500
    """,
    tier="relational",
    doc="Value-window functions (SURVEY.md §2.5 W3): first/last/nth "
    "order key by price within each status partition. last_value and "
    "nth_value use the explicit UNBOUNDED FOLLOWING frame (the default "
    "frame ends at CURRENT ROW, the classic silent-wrong-answer); the "
    "(price, key) composite order makes every pick deterministic.",
)
def q_window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.first("o_orderkey").over(w).alias("cheapest_key"),
            F.last("o_orderkey").over(full).alias("priciest_key"),
            F.nth_value("o_orderkey", 2).over(full).alias("second_cheapest_key"),
        )
        .filter(F.col("o_orderkey") < 500)
    )


@register(
    "rel_topk_orders",
    export=False,  # pytest-verified variant; kept out of the external window
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    tier="relational",
    doc="Global top-k (SURVEY.md §2.6 O4): TakeOrderedAndProject — "
    "per-partition heaps, no full sort at scale.",
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Subquery patterns (decorrelated by Catalyst) and distribution stats
# ---------------------------------------------------------------------------


@register(
    "rel_q4_order_priority",
    oracle="""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """,
    tier="relational",
    doc="TPC-H q4 shape (correlated EXISTS, worker has nothing like it): "
    "orders with at least one lineitem shipped after the order date, "
    "counted by priority. Catalyst decorrelates the EXISTS into a left-"
    "semi join with the non-equi clause as a join filter, so at 100 TB "
    "this is one shuffle on orderkey (both sides co-partitioned), never "
    "a per-row subquery probe.",
)
def q_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "rel_q13_custdist",
    oracle="""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
            SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey)
        GROUP BY c_count
    """,
    tier="relational",
    doc="TPC-H q13 shape: customer order-count distribution including "
    "zero-order customers (outer join preserved through two aggregation "
    "levels). The filter rides in the join condition, not a WHERE — a "
    "WHERE would turn the outer join inner and drop the zero bucket. "
    "Scale: first agg shares the join's custkey partitioning (no extra "
    "exchange); second agg's key space (distinct counts) is tiny.",
)
def q_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "rel_q14_promo_revenue",
    oracle=f"""
        SELECT CAST(month(l_shipdate) AS BIGINT) AS ship_month,
               CAST(100.0 AS DOUBLE)
                 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                            THEN {sql_dec('l_extendedprice')} * (1 - {sql_dec('l_discount')})
                            ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM({sql_dec('l_extendedprice')} * (1 - {sql_dec('l_discount')})) AS DOUBLE)
                 AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY month(l_shipdate)
    """,
    tier="relational",
    doc="TPC-H q14 shape (conditional-aggregate ratio): share of revenue "
    "from PROMO parts per ship month. Both sums are exact decimals; the "
    "one double division happens after aggregation, so the ratio is "
    "bit-stable across engines and partitionings. Scale: part is the "
    "small side -> broadcast join, single shuffle on the group key.",
)
def q_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.month("l_shipdate").cast("long").alias("ship_month"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_pct")
        )
    )


@register(
    "rel_q19_disjunctive",
    oracle=f"""
        SELECT {sql_dsum(f"{sql_dec('l_extendedprice')} * (1 - {sql_dec('l_discount')})", 'revenue')},
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
    """,
    tier="relational",
    doc="TPC-H q19 shape (disjunctive multi-table predicate): revenue "
    "under an OR of brand/size/quantity conjunctions. Catalyst keeps "
    "the join equi (l_partkey = p_partkey), evaluates the disjunction "
    "as a post-join filter, and pushes the derivable per-table bounds "
    "(p_size >= 1, quantity range union) down to the scans — the "
    "pattern that defeats naive engines into cross products.",
)
def q_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & q.between(20, 40))
    )
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return joined.filter(cond).agg(
        dsum(rev, "revenue"), F.count(F.lit(1)).alias("n_lines")
    )


@register(
    "rel_q22_dormant_customers",
    oracle=f"""
        SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_cust,
               {sql_dsum(sql_dec('c_acctbal'), 'total_bal')}
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM({sql_dec('c_acctbal')}) AS DOUBLE) / COUNT(*)
                           FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
    """,
    tier="relational",
    doc="TPC-H q22 shape (scalar subquery + NOT EXISTS): above-average-"
    "balance customers who never ordered, by segment. The threshold is "
    "an exact-decimal sum divided once as a double (bit-stable), "
    "broadcast to every partition; the NOT EXISTS is a left-anti join "
    "on custkey. Scale: scalar agg is one tiny job; the anti join "
    "shuffles on custkey or broadcasts the distinct o_custkey set.",
)
def q_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    avg_pos = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("thresh"))
    )
    return (
        cust.join(F.broadcast(avg_pos))  # 1-row scalar, broadcast everywhere
        .filter(F.col("c_acctbal") > F.col("thresh"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dsum(dec("c_acctbal"), "total_bal"),
        )
    )


@register(
    "rel_percentiles",
    oracle="""
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.25), 6) AS qty_q25,
               round(quantile_cont(l_quantity, 0.5), 6) AS qty_q50,
               round(quantile_cont(l_quantity, 0.75), 6) AS qty_q75,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
               round(quantile_cont(l_extendedprice, 0.99), 6) AS p99_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tier="relational",
    doc="Distribution statistics (SURVEY.md §2.4 A6 extension): exact "
    "interpolated percentiles per group — quartiles, median, p99, as "
    "scalar columns (the driver canonicalizer can't sort array cells). "
    "Both engines sort the group and linearly interpolate the same two "
    "order statistics; rounded to 6 dp to absorb last-ulp FMA "
    "differences. Scale note: exact percentiles materialize each "
    "group's values — at 100 TB swap in approx_percentile (t-digest), "
    "same call shape.",
)
def q_rel_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.25)), 6).alias("qty_q25"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("qty_q50"),
        F.round(F.percentile("l_quantity", F.lit(0.75)), 6).alias("qty_q75"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("median_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 6).alias("p99_price"),
    )


@register(
    "rel_approx_percentiles",
    # Tolerance-verdict oracle: Spark emits the EXACT interpolated quantile
    # plus a boolean asserting the t-digest estimate is within 2% of it;
    # the oracle emits the same exact values and literal TRUE. The sketch's
    # engine-specific value never reaches the hash, but a broken sketch
    # flips the boolean and fails the row.
    oracle="""
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.5), 6) AS exact_q50,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS exact_median_price,
               TRUE AS q50_within_2pct,
               TRUE AS median_within_2pct
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tier="relational",
    doc="approx_percentile (t-digest) — the scale path rel_percentiles "
    "swaps to at 100 TB: mergeable sketches, no per-group value "
    "materialization. Verified via the tolerance-verdict pattern: the "
    "query itself asserts |approx-exact|/exact <= 2% as a boolean the "
    "oracle can hash-match.",
)
def q_rel_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def within(approx, exact):
        return (F.abs(approx - exact) / F.abs(exact) <= F.lit(0.02)) | (
            approx == exact
        )

    agg = li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("_ex_q50"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("_ex_med"),
        F.percentile_approx("l_quantity", F.lit(0.5), 10000).alias("_ap_q50"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), 10000).alias("_ap_med"),
    )
    return agg.select(
        "l_returnflag",
        F.round("_ex_q50", 6).alias("exact_q50"),
        F.round("_ex_med", 6).alias("exact_median_price"),
        within(F.col("_ap_q50"), F.col("_ex_q50")).alias("q50_within_2pct"),
        within(F.col("_ap_med"), F.col("_ex_med")).alias("median_within_2pct"),
    )


@register(
    "rel_corr_covar",
    oracle=f"""
        SELECT l_returnflag,
               CAST(n AS BIGINT) AS n,
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS slope,
               round((n * sxy - sx * sy)
                     / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 9) AS corr,
               round((sxy - sx * sy / n) / n, 9) AS covar_pop
        FROM (
            SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
                   {sql_dsum(sql_dec('l_quantity'), 'sx')},
                   {sql_dsum(sql_dec('l_extendedprice'), 'sy')},
                   {sql_dsum(f"{sql_dec('l_quantity')} * {sql_dec('l_quantity')}", 'sxx')},
                   {sql_dsum(f"{sql_dec('l_extendedprice')} * {sql_dec('l_extendedprice')}", 'syy')},
                   {sql_dsum(f"{sql_dec('l_quantity')} * {sql_dec('l_extendedprice')}", 'sxy')}
            FROM lineitem GROUP BY l_returnflag)
    """,
    tier="relational",
    doc="Statistical aggregates (corr / covar_pop / regression slope of "
    "price on quantity) computed from exact-decimal moment sums, not "
    "the built-in corr()/covar_pop() whose double accumulation is "
    "partition-order-dependent. The five moments sum exactly, the "
    "closed-form combination runs once per group as identical IEEE "
    "arithmetic in both engines, rounded at 9 dp. Scale: one shuffle, "
    "five mergeable partial sums — same cost as any grouped agg.",
)
def q_rel_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    moments = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec("l_quantity")).cast("double").alias("sx"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sy"),
        F.sum(dec("l_quantity") * dec("l_quantity")).cast("double").alias("sxx"),
        F.sum(dec("l_extendedprice") * dec("l_extendedprice")).cast("double").alias("syy"),
        F.sum(dec("l_quantity") * dec("l_extendedprice")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return moments.select(
        "l_returnflag",
        n.cast("long").alias("n"),
        F.round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9).alias("slope"),
        F.round((n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 9).alias("corr"),
        F.round((sxy - sx * sy / n) / n, 9).alias("covar_pop"),
    )


@register(
    "rel_window_range_frame",
    oracle="""
        SELECT event_id, user_id, ts,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_5min,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_5min
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 5 MINUTE PRECEDING AND CURRENT ROW)
    """,
    tier="relational",
    doc="Time-RANGE window frame (SURVEY.md §2.5 W3 extension): per "
    "event, count and exact-decimal sum of the same user's events in "
    "the trailing 5 minutes — a frame bounded by VALUE distance, not "
    "row count, the sliding-metric shape rows-frames can't express. "
    "Spark's rangeBetween needs a numeric ordering key, so ts is "
    "ordered as epoch microseconds with a 300e6-us preceding bound "
    "(identical semantics to the oracle's INTERVAL frame). One shuffle "
    "on user_id; frames never cross partitions.",
)
def q_rel_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-300_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_5min"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("sum_5min"),
    )
