"""Randomized differential fuzz: Spark vs DuckDB on generated pipelines.

The engine's correctness story is anchored on ~116 hand-written
query/oracle pairs. This property test hardens it beyond those shapes:
hypothesis draws small filter -> groupBy -> agg pipelines over the
`orders` / `lineitem` fixtures from a grammar rendered BOTH as a Spark
DataFrame chain and as DuckDB SQL, and every example must pass the same
order-insensitive row-count + schema + stringified-value comparison the
driver applies (`assert_df_matches_oracle`).

Aggregate dtype discipline mirrors the registered queries: COUNT ->
BIGINT on both sides, SUM over integers CAST to BIGINT (DuckDB widens
to HUGEINT), SUM over doubles through DECIMAL(18,2) (order-independent,
exact on the 2-decimal fixture values), MIN/MAX untouched.

Example count: $SPARK_GRAFT_FUZZ_EXAMPLES (default 120 since r15 —
the suite must fit the external verifier's wall-clock budget, and the
differential grammar's value is shape coverage, which saturates well
below 100 examples per property; set the env var higher for a deep
soak outside the verify path).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from pyspark.sql import functions as F

from map_reduce_indexing_spark.sources.tables import load_table

from .conftest import SF_DIR, assert_df_matches_oracle

MAX_EXAMPLES = int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "120"))

# Column pools per table. Values drawn for predicates need not exist in
# the fixture — empty and tiny results are valid differential cases.
TABLES = {
    "orders": {
        "int": ["o_orderkey", "o_custkey"],
        "double": ["o_totalprice"],
        "cat": ["o_orderstatus", "o_orderpriority"],
        "ts": ["o_orderdate"],
        "cat_domain": {
            "o_orderstatus": ["O", "F", "P"],
            "o_orderpriority": [
                "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
            ],
        },
        "int_hi": 8000,
        "double_hi": 400000,
    },
    "lineitem": {
        "int": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "double": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "cat": ["l_returnflag", "l_linestatus"],
        "ts": ["l_shipdate"],
        "cat_domain": {
            "l_returnflag": ["A", "N", "R"],
            "l_linestatus": ["O", "F"],
        },
        "int_hi": 8000,
        "double_hi": 80000,
    },
}

CMP_OPS = ["<", "<=", ">", ">=", "=", "<>"]


@dataclass(frozen=True)
class Pred:
    sql: str
    col: str
    op: str
    val: object  # int | float | str (category or timestamp) | list[str]

    def spark(self):
        c = F.col(self.col)
        if self.op == "in":
            return c.isin(list(self.val))
        v = (
            F.lit(self.val).cast("timestamp")
            if self.sql.endswith("/*ts*/")
            else F.lit(self.val)
        )
        return {
            "<": c < v, "<=": c <= v, ">": c > v, ">=": c >= v,
            "=": c == v, "<>": c != v,
        }[self.op]


@dataclass(frozen=True)
class Agg:
    kind: str  # count | count_distinct | min | max | sum_int | sum_dec
    col: str | None
    alias: str

    def spark(self):
        if self.kind == "count":
            e = F.count(F.lit(1))
        elif self.kind == "count_distinct":
            e = F.countDistinct(self.col)
        elif self.kind == "min":
            e = F.min(self.col)
        elif self.kind == "max":
            e = F.max(self.col)
        elif self.kind == "sum_int":
            e = F.sum(self.col).cast("bigint")
        else:  # sum_dec: order-independent exact decimal fold
            e = F.sum(F.col(self.col).cast("decimal(18,2)")).cast("double")
        return e.alias(self.alias)

    def sql(self):
        if self.kind == "count":
            e = "CAST(COUNT(*) AS BIGINT)"
        elif self.kind == "count_distinct":
            e = f"CAST(COUNT(DISTINCT {self.col}) AS BIGINT)"
        elif self.kind == "min":
            e = f"MIN({self.col})"
        elif self.kind == "max":
            e = f"MAX({self.col})"
        elif self.kind == "sum_int":
            e = f"CAST(SUM({self.col}) AS BIGINT)"
        else:
            e = f"CAST(SUM(CAST({self.col} AS DECIMAL(18,2))) AS DOUBLE)"
        return f"{e} AS {self.alias}"


@st.composite
def pipelines(draw):
    table = draw(st.sampled_from(sorted(TABLES)))
    spec = TABLES[table]

    preds = _draw_preds(draw, table, draw(st.integers(0, 2)), with_cat_in=True)

    keys = draw(
        st.lists(
            st.sampled_from(spec["cat"] + (["l_linenumber"] if table == "lineitem" else [])),
            min_size=0, max_size=2, unique=True,
        )
    )

    agg_pool = (
        [("count", None)]
        + [("count_distinct", c) for c in spec["int"] + spec["cat"]]
        + [("min", c) for c in spec["int"] + spec["cat"] + spec["double"] + spec["ts"]]
        + [("max", c) for c in spec["int"] + spec["cat"] + spec["double"] + spec["ts"]]
        + [("sum_int", c) for c in spec["int"]]
        + [("sum_dec", c) for c in spec["double"]]
    )
    picks = draw(
        st.lists(
            st.sampled_from(agg_pool), min_size=1, max_size=3, unique=True
        )
    )
    aggs = [Agg(kind, col, f"a{i}") for i, (kind, col) in enumerate(picks)]
    return table, tuple(preds), tuple(keys), tuple(aggs)


def _render_sql(table, preds, keys, aggs) -> str:
    sel = ", ".join([*keys, *(a.sql() for a in aggs)])
    q = f"SELECT {sel} FROM {table}"
    if preds:
        q += " WHERE " + " AND ".join(p.sql.replace("/*ts*/", "") for p in preds)
    if keys:
        q += " GROUP BY " + ", ".join(keys)
    return q


@settings(
    max_examples=MAX_EXAMPLES,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(spec=pipelines())
def test_random_pipeline_matches_duckdb(spark, duck, spec):
    table, preds, keys, aggs = spec
    df = load_table(spark, SF_DIR, table)
    for p in preds:
        df = df.filter(p.spark())
    exprs = [a.spark() for a in aggs]
    out = df.groupBy(*keys).agg(*exprs) if keys else df.agg(*exprs)
    assert_df_matches_oracle(out, duck, _render_sql(table, preds, keys, aggs))


# ---------------------------------------------------------------------------
# Join-stage fuzz: filter -> join -> groupBy -> agg over both tables
# ---------------------------------------------------------------------------


def _draw_preds(draw, table: str, n: int, with_cat_in: bool = False) -> list[Pred]:
    """n predicates over `table` — THE predicate grammar; both the
    single-table and the join strategies draw from here so the families
    cannot drift apart. `with_cat_in` adds the IN-list family."""
    spec = TABLES[table]
    families = ["int", "double", "cat", "ts"] + (["cat_in"] if with_cat_in else [])
    preds = []
    for _ in range(n):
        family = draw(st.sampled_from(families))
        if family == "int":
            col = draw(st.sampled_from(spec["int"]))
            op = draw(st.sampled_from(CMP_OPS))
            v = draw(st.integers(0, spec["int_hi"]))
            preds.append(Pred(f"{col} {op} {v}", col, op, v))
        elif family == "double":
            col = draw(st.sampled_from(spec["double"]))
            op = draw(st.sampled_from(["<", "<=", ">", ">="]))
            v = draw(st.integers(0, spec["double_hi"])) / 100.0
            preds.append(Pred(f"{col} {op} {v!r}", col, op, v))
        elif family == "cat":
            col = draw(st.sampled_from(spec["cat"]))
            op = draw(st.sampled_from(["=", "<>"]))
            v = draw(st.sampled_from(spec["cat_domain"][col]))
            preds.append(Pred(f"{col} {op} '{v}'", col, op, v))
        elif family == "cat_in":
            col = draw(st.sampled_from(spec["cat"]))
            vals = draw(
                st.lists(
                    st.sampled_from(spec["cat_domain"][col]),
                    min_size=1, max_size=3, unique=True,
                )
            )
            quoted = ", ".join(f"'{v}'" for v in vals)
            preds.append(Pred(f"{col} IN ({quoted})", col, "in", tuple(vals)))
        else:
            col = draw(st.sampled_from(spec["ts"]))
            op = draw(st.sampled_from(["<", ">="]))
            import datetime

            day = draw(st.integers(0, 2555))
            d = datetime.date(1992, 1, 1) + datetime.timedelta(days=day)
            v = f"{d} 00:00:00"
            preds.append(Pred(f"{col} {op} TIMESTAMP '{v}'/*ts*/", col, op, v))
    return preds


_JOIN_KEY_COLS = ["l_returnflag", "l_linestatus", "o_orderstatus", "o_orderpriority"]


@st.composite
def join_pipelines(draw):
    """lineitem JOIN orders on orderkey, semi or inner, then group/agg.

    Column names are disjoint across the two fixtures, so qualified
    references are unnecessary and the SQL renders from the same Pred/
    Agg fragments as the single-table grammar.
    """
    how = draw(st.sampled_from(["inner", "left_semi"]))
    li_preds = _draw_preds(draw, "lineitem", draw(st.integers(0, 2)), with_cat_in=True)
    o_preds = _draw_preds(draw, "orders", draw(st.integers(0, 2)), with_cat_in=True)

    li, orders = TABLES["lineitem"], TABLES["orders"]
    if how == "left_semi":  # only lineitem columns survive a semi join
        key_pool = ["l_returnflag", "l_linestatus"]
        agg_pool = (
            [("count", None)]
            + [("count_distinct", c) for c in li["int"] + li["cat"]]
            + [("min", c) for c in li["int"] + li["double"]]
            + [("max", c) for c in li["cat"] + li["ts"]]
            + [("sum_dec", c) for c in li["double"]]
        )
    else:
        key_pool = _JOIN_KEY_COLS
        agg_pool = (
            [("count", None)]
            + [("count_distinct", c) for c in li["int"] + orders["int"]]
            + [("min", c) for c in li["double"] + orders["double"] + orders["ts"]]
            + [("max", c) for c in li["cat"] + orders["cat"]]
            + [("sum_int", c) for c in li["int"] + orders["int"]]
            + [("sum_dec", c) for c in li["double"] + orders["double"]]
        )
    keys = draw(st.lists(st.sampled_from(key_pool), min_size=0, max_size=2, unique=True))
    picks = draw(st.lists(st.sampled_from(agg_pool), min_size=1, max_size=3, unique=True))
    aggs = [Agg(kind, col, f"a{i}") for i, (kind, col) in enumerate(picks)]
    return how, tuple(li_preds), tuple(o_preds), tuple(keys), tuple(aggs)


def _render_join_sql(how, li_preds, o_preds, keys, aggs) -> str:
    sel = ", ".join([*keys, *(a.sql() for a in aggs)])
    li_where = " AND ".join(p.sql.replace("/*ts*/", "") for p in li_preds) or "TRUE"
    o_where = " AND ".join(p.sql.replace("/*ts*/", "") for p in o_preds) or "TRUE"
    if how == "left_semi":
        q = (
            f"SELECT {sel} FROM lineitem WHERE ({li_where}) AND l_orderkey IN "
            f"(SELECT o_orderkey FROM orders WHERE {o_where})"
        )
    else:
        q = (
            f"SELECT {sel} FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            f"WHERE ({li_where}) AND ({o_where})"
        )
    if keys:
        q += " GROUP BY " + ", ".join(keys)
    return q


# ---------------------------------------------------------------------------
# Window-function fuzz: rank/offset/running aggregates over random windows
# ---------------------------------------------------------------------------

# Window ORDER BY always ends with o_orderkey (unique), so every window
# function below is fully deterministic — no rank/offset tie ambiguity.
# Exception: range_running_sum orders by the (possibly tied) column
# ALONE — a RANGE frame aggregates peer rows together, so it is
# deterministic under ties by construction, and that is exactly the
# semantics difference vs ROWS this family exists to cover.
_WIN_PARTS = ["o_orderstatus", "o_orderpriority"]
_WIN_ORDERS = ["o_totalprice", "o_orderdate", "o_custkey"]
_WIN_FNS = [
    "row_number", "rank", "dense_rank", "lag", "lead", "running_sum",
    "ntile", "percent_rank", "cume_dist", "range_running_sum",
]


@st.composite
def window_pipelines(draw):
    parts = draw(
        st.lists(st.sampled_from(_WIN_PARTS), min_size=0, max_size=2, unique=True)
    )
    order_col = draw(st.sampled_from(_WIN_ORDERS))
    desc = draw(st.booleans())
    fn = draw(st.sampled_from(_WIN_FNS))
    # keep output small: one status slice + a key cap
    status = draw(st.sampled_from(TABLES["orders"]["cat_domain"]["o_orderstatus"]))
    key_cap = draw(st.integers(500, 4000))
    return tuple(parts), order_col, desc, fn, status, key_cap


def _render_window(parts, order_col, desc, fn):
    over = []
    if parts:
        over.append("PARTITION BY " + ", ".join(parts))
    direction = "DESC" if desc else "ASC"
    if fn == "range_running_sum":
        # NO unique tie-break: RANGE aggregates peers together.
        over.append(f"ORDER BY {order_col} {direction}")
        return (
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER "
            f"({' '.join(over)} RANGE BETWEEN UNBOUNDED PRECEDING AND "
            "CURRENT ROW) AS DOUBLE)"
        )
    over.append(f"ORDER BY {order_col} {direction}, o_orderkey")
    if fn == "running_sum":
        expr = (
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER "
            f"({' '.join(over)} ROWS UNBOUNDED PRECEDING) AS DOUBLE)"
        )
    elif fn in ("lag", "lead"):
        expr = f"{fn}(o_orderkey) OVER ({' '.join(over)})"
    elif fn == "ntile":
        expr = f"CAST(ntile(4) OVER ({' '.join(over)}) AS BIGINT)"
    elif fn in ("percent_rank", "cume_dist"):
        # exact integer ratios, one double division — identical IEEE
        # result in both engines, rounded once for belt and braces
        expr = f"round({fn}() OVER ({' '.join(over)}), 6)"
    else:
        expr = f"CAST({fn}() OVER ({' '.join(over)}) AS BIGINT)"
    return expr


@settings(
    max_examples=max(40, MAX_EXAMPLES // 4),
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(spec=window_pipelines())
def test_random_window_matches_duckdb(spark, duck, spec):
    from pyspark.sql import Window

    parts, order_col, desc, fn, status, key_cap = spec
    sql = (
        f"SELECT o_orderkey, {_render_window(parts, order_col, desc, fn)} AS w "
        f"FROM orders WHERE o_orderstatus = '{status}' AND o_orderkey < {key_cap}"
    )
    df = (
        load_table(spark, SF_DIR, "orders")
        .filter(
            (F.col("o_orderstatus") == status) & (F.col("o_orderkey") < key_cap)
        )
    )
    part = Window.partitionBy(*parts) if parts else Window.partitionBy()
    ordered = F.col(order_col).desc() if desc else F.col(order_col).asc()
    w = part.orderBy(ordered, F.col("o_orderkey"))
    if fn == "range_running_sum":
        e = (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(
                part.orderBy(ordered).rangeBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            .cast("double")
        )
    elif fn == "running_sum":
        e = (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double")
        )
    elif fn == "lag":
        e = F.lag("o_orderkey").over(w)
    elif fn == "lead":
        e = F.lead("o_orderkey").over(w)
    elif fn == "ntile":
        e = F.ntile(4).over(w).cast("bigint")
    elif fn in ("percent_rank", "cume_dist"):
        e = F.round(getattr(F, fn)().over(w), 6)
    else:
        e = getattr(F, fn)().over(w).cast("bigint")
    out = df.select("o_orderkey", e.alias("w"))
    assert_df_matches_oracle(out, duck, sql)


# ---------------------------------------------------------------------------
# Set-op fuzz: filter -> project -> UNION/INTERSECT/EXCEPT (ALL and
# DISTINCT forms) -> count per key, over one table against itself
# ---------------------------------------------------------------------------

# (spark DataFrame method, SQL operator)
_SET_OPS = {
    "union_all": ("unionAll", "UNION ALL"),
    "union": ("union_distinct", "UNION"),
    "intersect": ("intersect", "INTERSECT"),
    "intersect_all": ("intersectAll", "INTERSECT ALL"),
    "except": ("subtract", "EXCEPT"),
    "except_all": ("exceptAll", "EXCEPT ALL"),
}


@st.composite
def setop_pipelines(draw):
    table = draw(st.sampled_from(sorted(TABLES)))
    spec = TABLES[table]
    op = draw(st.sampled_from(sorted(_SET_OPS)))
    a_preds = _draw_preds(draw, table, draw(st.integers(0, 2)), with_cat_in=True)
    b_preds = _draw_preds(draw, table, draw(st.integers(0, 2)), with_cat_in=True)
    cols = draw(
        st.lists(st.sampled_from(spec["cat"]), min_size=1, max_size=2, unique=True)
    )
    return table, op, tuple(a_preds), tuple(b_preds), tuple(cols)


def _render_setop_sql(table, op, a_preds, b_preds, cols) -> str:
    sel = ", ".join(cols)
    a_where = " AND ".join(p.sql.replace("/*ts*/", "") for p in a_preds) or "TRUE"
    b_where = " AND ".join(p.sql.replace("/*ts*/", "") for p in b_preds) or "TRUE"
    inner = (
        f"SELECT {sel} FROM {table} WHERE {a_where} "
        f"{_SET_OPS[op][1]} "
        f"SELECT {sel} FROM {table} WHERE {b_where}"
    )
    return (
        f"SELECT {sel}, CAST(COUNT(*) AS BIGINT) AS cnt FROM ({inner}) s "
        f"GROUP BY {sel}"
    )


@settings(
    max_examples=max(40, MAX_EXAMPLES // 4),
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(spec=setop_pipelines())
def test_random_setop_matches_duckdb(spark, duck, spec):
    table, op, a_preds, b_preds, cols = spec
    base = load_table(spark, SF_DIR, table)
    a, b = base, base
    for p in a_preds:
        a = a.filter(p.spark())
    for p in b_preds:
        b = b.filter(p.spark())
    a, b = a.select(*cols), b.select(*cols)
    method = _SET_OPS[op][0]
    combined = (
        a.union(b).distinct() if method == "union_distinct" else getattr(a, method)(b)
    )
    out = combined.groupBy(*cols).agg(F.count(F.lit(1)).alias("cnt"))
    assert_df_matches_oracle(
        out, duck, _render_setop_sql(table, op, a_preds, b_preds, cols)
    )


# ---------------------------------------------------------------------------
# Grouping-set fuzz: ROLLUP / CUBE / GROUPING SETS over two cat keys
# ---------------------------------------------------------------------------


@st.composite
def groupingset_pipelines(draw):
    table = draw(st.sampled_from(sorted(TABLES)))
    spec = TABLES[table]
    mode = draw(st.sampled_from(["rollup", "cube", "grouping_sets"]))
    preds = _draw_preds(draw, table, draw(st.integers(0, 2)), with_cat_in=True)
    keys = tuple(
        draw(
            st.lists(
                st.sampled_from(spec["cat"]), min_size=2, max_size=2, unique=True
            )
        )
    )
    agg_pool = (
        [("count", None)]
        + [("sum_int", c) for c in spec["int"]]
        + [("sum_dec", c) for c in spec["double"]]
    )
    picks = draw(
        st.lists(st.sampled_from(agg_pool), min_size=1, max_size=2, unique=True)
    )
    aggs = [Agg(kind, col, f"a{i}") for i, (kind, col) in enumerate(picks)]
    return table, mode, tuple(preds), keys, tuple(aggs)


def _render_groupingset_sql(table, mode, preds, keys, aggs) -> str:
    # Coalesce the grouping NULLs to a sentinel on BOTH sides: fixture
    # cat columns are never null, so 'ALL' unambiguously marks subtotal
    # rows in the value-hash comparison.
    sel = ", ".join(
        [f"COALESCE({k}, 'ALL') AS {k}" for k in keys]
        + [a.sql() for a in aggs]
    )
    where = " AND ".join(p.sql.replace("/*ts*/", "") for p in preds) or "TRUE"
    by = {
        "rollup": f"ROLLUP({keys[0]}, {keys[1]})",
        "cube": f"CUBE({keys[0]}, {keys[1]})",
        "grouping_sets": f"GROUPING SETS (({keys[0]}), ({keys[1]}), ())",
    }[mode]
    return f"SELECT {sel} FROM {table} WHERE {where} GROUP BY {by}"


@settings(
    max_examples=max(40, MAX_EXAMPLES // 4),
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(spec=groupingset_pipelines())
def test_random_groupingset_matches_duckdb(spark, duck, spec):
    from hypothesis import assume

    table, mode, preds, keys, aggs = spec
    # Documented engine divergence, excluded from the differential: on
    # an EMPTY input relation the SQL standard (and DuckDB) still emit
    # the () grouping set's grand-total row; Spark emits no rows.
    where = " AND ".join(p.sql.replace("/*ts*/", "") for p in preds) or "TRUE"
    assume(
        duck.sql(f"SELECT COUNT(*) FROM {table} WHERE {where}").fetchone()[0] > 0
    )
    df = load_table(spark, SF_DIR, table)
    for p in preds:
        df = df.filter(p.spark())
    grouped = {
        "rollup": lambda: df.rollup(*keys),
        "cube": lambda: df.cube(*keys),
        "grouping_sets": lambda: df.groupingSets(
            [[keys[0]], [keys[1]], []], *keys
        ),
    }[mode]()
    out = grouped.agg(*[a.spark() for a in aggs]).select(
        *[F.coalesce(F.col(k), F.lit("ALL")).alias(k) for k in keys],
        *[F.col(a.alias) for a in aggs],
    )
    assert_df_matches_oracle(
        out, duck, _render_groupingset_sql(table, mode, preds, keys, aggs)
    )


# ---------------------------------------------------------------------------
# Percentile fuzz: exact interpolated quantiles per group
# ---------------------------------------------------------------------------

_PCTS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


@st.composite
def percentile_pipelines(draw):
    table = draw(st.sampled_from(sorted(TABLES)))
    spec = TABLES[table]
    preds = _draw_preds(draw, table, draw(st.integers(0, 2)), with_cat_in=True)
    keys = tuple(
        draw(st.lists(st.sampled_from(spec["cat"]), min_size=0, max_size=1))
    )
    picks = draw(
        st.lists(
            st.tuples(st.sampled_from(spec["double"]), st.sampled_from(_PCTS)),
            min_size=1,
            max_size=2,
            unique=True,
        )
    )
    return table, tuple(preds), keys, tuple(picks)


@settings(
    max_examples=max(40, MAX_EXAMPLES // 4),
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(spec=percentile_pipelines())
def test_random_percentile_matches_duckdb(spark, duck, spec):
    # Bridge from the hand-written rel_percentiles: Spark percentile()
    # and DuckDB quantile_cont() both sort the group and linearly
    # interpolate the same two order statistics; round(6) absorbs
    # last-ulp FMA differences.
    table, preds, keys, picks = spec
    df = load_table(spark, SF_DIR, table)
    for p in preds:
        df = df.filter(p.spark())
    exprs = [
        F.round(F.percentile(col, F.lit(p)), 6).alias(f"a{i}")
        for i, (col, p) in enumerate(picks)
    ]
    out = df.groupBy(*keys).agg(*exprs) if keys else df.agg(*exprs)
    sel = ", ".join(
        [*keys]
        + [
            f"round(quantile_cont({col}, {p}), 6) AS a{i}"
            for i, (col, p) in enumerate(picks)
        ]
    )
    where = " AND ".join(p.sql.replace("/*ts*/", "") for p in preds) or "TRUE"
    sql = f"SELECT {sel} FROM {table} WHERE {where}"
    if keys:
        sql += " GROUP BY " + ", ".join(keys)
    assert_df_matches_oracle(out, duck, sql)


@settings(
    max_examples=max(50, MAX_EXAMPLES // 2),
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(spec=join_pipelines())
def test_random_join_pipeline_matches_duckdb(spark, duck, spec):
    how, li_preds, o_preds, keys, aggs = spec
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    for p in li_preds:
        li = li.filter(p.spark())
    for p in o_preds:
        orders = orders.filter(p.spark())
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey, how)
    exprs = [a.spark() for a in aggs]
    out = joined.groupBy(*keys).agg(*exprs) if keys else joined.agg(*exprs)
    assert_df_matches_oracle(
        out, duck, _render_join_sql(how, li_preds, o_preds, keys, aggs)
    )


# ---------------------------------------------------------------------------
# HAVING + conditional-aggregate fuzz: filter -> groupBy -> agg ->
# HAVING on an aggregate, with a CASE-WHEN conditional sum alongside
# ---------------------------------------------------------------------------


@st.composite
def having_pipelines(draw):
    """Random (table, preds, key, cond-pred, int col, having threshold):
    SELECT key, COUNT(*) n, SUM(CASE WHEN cond THEN c ELSE 0 END) cs
    ... GROUP BY key HAVING COUNT(*) > t — the post-aggregation filter
    path (Catalyst rewrites HAVING into a Filter above Aggregate) and
    the conditional-aggregation path, neither covered by the plain
    pipeline family."""
    table = draw(st.sampled_from(sorted(TABLES)))
    spec = TABLES[table]
    preds = _draw_preds(draw, table, draw(st.integers(0, 1)))
    key = draw(st.sampled_from(spec["cat"]))
    cond = _draw_preds(draw, table, 1)[0]
    col = draw(st.sampled_from(spec["int"]))
    t = draw(st.integers(0, 50))
    return table, tuple(preds), key, cond, col, t


def _render_having_sql(table, preds, key, cond, col, t) -> str:
    where = " AND ".join(p.sql.replace("/*ts*/", "") for p in preds) or "TRUE"
    cond_sql = cond.sql.replace("/*ts*/", "")
    return (
        f"SELECT {key}, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM(CASE WHEN {cond_sql} THEN {col} ELSE 0 END) AS BIGINT) AS cs "
        f"FROM {table} WHERE {where} GROUP BY {key} HAVING COUNT(*) > {t}"
    )


@settings(
    max_examples=max(40, MAX_EXAMPLES // 4),
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(spec=having_pipelines())
def test_random_having_matches_duckdb(spark, duck, spec):
    table, preds, key, cond, col, t = spec
    df = load_table(spark, SF_DIR, table)
    for p in preds:
        df = df.filter(p.spark())
    out = (
        df.groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(cond.spark(), F.col(col)).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("cs"),
        )
        .filter(F.col("n") > t)
    )
    assert_df_matches_oracle(
        out, duck, _render_having_sql(table, preds, key, cond, col, t)
    )
