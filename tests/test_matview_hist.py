"""The histogram matview aggregate (round 10 third wave).

operators/matview.py: op "hist:<lo>:<hi>:<nbins>" stores nbins+2
bin counts per group (underflow / interior / overflow; NULLs count
nowhere) as sum-monoid ingredients and serves one array<long>.
Pinned here: create == direct recompute, incremental append ==
rebuild, RETRACTION across a delete span == rebuild (bin counts are
signed-summable), rollup re-adds bins element-wise, and
hist_quantile's interpolation against hand-computed values.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_indexing_spark.operators.matview import (
    create_matview,
    hist_bins,
    hist_quantile,
    read_matview,
    refresh_matview,
    rollup_matview,
)
from map_reduce_indexing_spark.sources.generations import (
    delete_rows,
    publish_generation,
    read_generation,
)

HIST_OP = "hist:0:100:10"  # width-10 bins over [0, 100)
AGGS = {"n": ("count", "*"), "h": (HIST_OP, "v")}


def _chunk(spark, lo: int, n: int):
    # values fan across underflow (<0), all interior bins, overflow
    # (>=100), and NULLs
    rows = []
    for i in range(n):
        rid = lo + i
        v = None if rid % 13 == 0 else (rid * 7) % 130 - 10
        rows.append((rid, f"g{rid % 3}", v))
    return spark.createDataFrame(rows, "rid long, grp string, v long")


def _direct(spark, base: str):
    """The histogram recomputed from the base with independent logic
    (CASE/floor, not the view's bin expressions)."""
    df = read_generation(spark, base)
    idx = (
        F.when(F.col("v") < 0, F.lit(0))
        .when(F.col("v") >= 100, F.lit(11))
        .otherwise(F.least(F.floor(F.col("v") / 10), F.lit(9)) + 1)
    )
    per_bin = (
        df.filter(F.col("v").isNotNull())
        .groupBy("grp", idx.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = {}
    for r in per_bin.collect():
        out.setdefault(r.grp, [0] * 12)[int(r.bin)] = r.n
    return out


def _served(spark, view: str):
    return {
        r.grp: list(r.h) for r in read_matview(spark, view).collect()
    }


def test_create_matches_direct_recompute(spark, tmp_path):
    base, view = str(tmp_path / "b"), str(tmp_path / "v")
    _chunk(spark, 0, 60).coalesce(2).write.parquet(base)
    publish_generation(base)
    create_matview(spark, base, view, ["grp"], AGGS, row_keys=["rid"])
    assert _served(spark, view) == _direct(spark, base)
    # sum of bins == non-null row count per group
    nn = {
        r.grp: r.c
        for r in read_generation(spark, base)
        .filter(F.col("v").isNotNull())
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert {g: sum(h) for g, h in _served(spark, view).items()} == nn


def test_append_refresh_equals_rebuild(spark, tmp_path):
    base, view = str(tmp_path / "b"), str(tmp_path / "v")
    _chunk(spark, 0, 40).coalesce(2).write.parquet(base)
    publish_generation(base)
    create_matview(spark, base, view, ["grp"], AGGS, row_keys=["rid"])
    _chunk(spark, 40, 35).coalesce(1).write.mode("append").parquet(base)
    publish_generation(base)
    rep = refresh_matview(spark, view)
    assert rep["mode"] == "incremental"
    assert _served(spark, view) == _direct(spark, base)


def test_delete_span_retracts_bins_exactly(spark, tmp_path):
    base, view = str(tmp_path / "b"), str(tmp_path / "v")
    _chunk(spark, 0, 60).coalesce(3).write.parquet(base)
    publish_generation(base)
    create_matview(spark, base, view, ["grp"], AGGS, row_keys=["rid"])
    delete_rows(spark, base, [("v", "between", (25, 55))])
    rep = refresh_matview(spark, view)
    assert rep["mode"] == "retract"
    assert _served(spark, view) == _direct(spark, base)


def test_rollup_re_adds_bins(spark, tmp_path):
    base, view = str(tmp_path / "b"), str(tmp_path / "v")
    df = _chunk(spark, 0, 60).withColumn(
        "sub", (F.col("rid") % 2).cast("string")
    )
    df.coalesce(2).write.parquet(base)
    publish_generation(base)
    create_matview(
        spark, base, view, ["grp", "sub"], AGGS, row_keys=["rid"]
    )
    rolled = {
        r.grp: list(r.h)
        for r in rollup_matview(spark, view, ["grp"]).collect()
    }
    assert rolled == _direct(spark, base)
    # global rollup: one row, element-wise total
    g = rollup_matview(spark, view, []).collect()
    assert len(g) == 1
    tot = [0] * 12
    for h in _direct(spark, base).values():
        tot = [a + b for a, b in zip(tot, h)]
    assert list(g[0].h) == tot


def test_hist_bins_and_quantile(spark, tmp_path):
    base, view = str(tmp_path / "b"), str(tmp_path / "v")
    # one group, a hand-computable shape: 10 rows in bin [0,10),
    # 30 in [10,20), 60 in [20,30)
    rows = (
        [(i, "g", 5) for i in range(10)]
        + [(100 + i, "g", 15) for i in range(30)]
        + [(200 + i, "g", 25) for i in range(60)]
    )
    spark.createDataFrame(rows, "rid long, grp string, v long").coalesce(
        1
    ).write.parquet(base)
    publish_generation(base)
    create_matview(spark, base, view, ["grp"], AGGS, row_keys=["rid"])

    b = hist_bins(read_matview(spark, view), "h", ["grp"]).collect()
    assert {(r.bin, r.n) for r in b if r.n > 0} == {(1, 10), (2, 30), (3, 60)}

    q = hist_quantile(
        read_matview(spark, view), "h", HIST_OP, ["grp"], [0.5, 0.9]
    ).collect()
    got = {r.p: r.q for r in q}
    # p50: target 50; cum(bin1)=10, cum(bin2)=40, lands in bin3
    # (0-based interior idx 2): 20 + 10*(50-40)/60
    assert got[0.5] == pytest.approx(20 + 10 * (50 - 40) / 60)
    # p90: target 90 -> bin3: 20 + 10*(90-40)/60
    assert got[0.9] == pytest.approx(20 + 10 * (90 - 40) / 60)


def test_malformed_hist_op_rejected(spark, tmp_path):
    base, view = str(tmp_path / "b"), str(tmp_path / "v")
    _chunk(spark, 0, 10).coalesce(1).write.parquet(base)
    publish_generation(base)
    for bad in ("hist:10:0:5", "hist:0:100:0", "hist:0:100"):
        with pytest.raises(ValueError):
            create_matview(
                spark, base, view, ["grp"], {"h": (bad, "v")}
            )


def test_hist_in_join_matview(spark, tmp_path):
    """The histogram aggregate flows through join matviews: fact-delta
    incremental refresh and a fact-delete retraction both land exactly
    on the direct fact⋈dim recompute."""
    from map_reduce_indexing_spark.operators.matview import (
        create_matview_join,
    )

    fact = str(tmp_path / "fact")
    dim = str(tmp_path / "dim")
    view = str(tmp_path / "view")

    def mk_fact(spark, lo, n):
        return spark.createDataFrame(
            [(lo + i, (lo + i) % 4, ((lo + i) * 7) % 120 - 10)
             for i in range(n)],
            "rid long, k long, v long",
        )

    mk_fact(spark, 0, 40).coalesce(2).write.parquet(fact)
    publish_generation(fact)
    spark.createDataFrame(
        [(k, f"g{k % 2}") for k in range(4)], "k long, grp string"
    ).coalesce(1).write.parquet(dim)
    publish_generation(dim)
    create_matview_join(
        spark,
        view,
        fact,
        [{"path": dim, "on": ["k"], "select": ["grp"]}],
        ["grp"],
        AGGS,
        row_keys=["rid"],
    )

    def direct():
        f = read_generation(spark, fact)
        d = read_generation(spark, dim)
        j = f.join(d, on="k", how="inner")
        idx = (
            F.when(F.col("v") < 0, F.lit(0))
            .when(F.col("v") >= 100, F.lit(11))
            .otherwise(F.least(F.floor(F.col("v") / 10), F.lit(9)) + 1)
        )
        per_bin = (
            j.filter(F.col("v").isNotNull())
            .groupBy("grp", idx.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        out = {}
        for r in per_bin.collect():
            out.setdefault(r.grp, [0] * 12)[int(r.bin)] = r.n
        return out

    def served():
        return {
            r.grp: list(r.h) for r in read_matview(spark, view).collect()
        }

    assert served() == direct()
    # fact append: incremental
    mk_fact(spark, 40, 20).coalesce(1).write.mode("append").parquet(fact)
    publish_generation(fact)
    rep = refresh_matview(spark, view)
    assert rep["mode"] == "incremental"
    assert served() == direct()
    # fact delete: retraction through the join
    delete_rows(spark, fact, [("v", "between", (30, 70))])
    rep = refresh_matview(spark, view)
    assert rep["mode"] in ("retract", "rebuild")
    assert served() == direct()


def test_hist_quantile_plan_constant_in_percentile_count(spark, tmp_path):
    """Round-11 single-pass form: the number of Window nodes in the
    plan must not grow with |ps| (the old form unioned one filtered
    window branch per requested percentile)."""
    from map_reduce_indexing_spark.operators.matview import hist_quantile

    df = spark.createDataFrame(
        [("a", [0, 0] + [1] * 32)], "k string, h array<long>"
    )

    def n_windows(ps):
        plan = hist_quantile(
            df, "h", "hist:0:32:32", ["k"], ps
        )._jdf.queryExecution().optimizedPlan().toString()
        return plan.count("Window ")

    one = n_windows([0.5])
    many = n_windows([i / 20 for i in range(1, 20)])
    assert one == many
    assert one <= 3


def test_hist_quantile_paths_identical(spark, tmp_path, monkeypatch):
    """Round 12: hist_quantile serves small percentile lists through
    the union plan and large ones through the single-pass plan — the
    two paths must be value-IDENTICAL on the same view (same integer
    bin counts, same one-double interpolation)."""
    from map_reduce_indexing_spark.operators import matview as MV
    from map_reduce_indexing_spark.sources.generations import append_rows

    base = str(tmp_path / "base")
    view = str(tmp_path / "view")
    df = spark.range(0, 500).selectExpr(
        "id % 3 AS grp", "CAST(id % 97 AS DOUBLE) AS x"
    )
    append_rows(spark, base, df)
    MV.create_matview(
        spark, base, view, ["grp"], {"h": ("hist:0:100:10", "x")}
    )
    v = MV.read_matview(spark, view)
    ps = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    assert len(ps) > MV.HIST_QUANTILE_UNION_MAX

    def rows(df_):
        return sorted(
            (r.grp, r.p, round(r.q, 12)) for r in df_.collect()
        )

    single = rows(MV.hist_quantile(v, "h", "hist:0:100:10", ["grp"], ps))
    monkeypatch.setattr(MV, "HIST_QUANTILE_UNION_MAX", 100)
    union = rows(MV.hist_quantile(v, "h", "hist:0:100:10", ["grp"], ps))
    assert single == union
