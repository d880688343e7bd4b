"""Schema evolution on generations stores (round 12, VERDICT task 3).

Per-generation schemas recorded in the manifest; reads reconcile
mixed-schema listings (null-fill added columns, cast widened types);
writers declare evolution explicitly (schema_mode='evolve') and
strict (the default) rejects drift; pinned reads of pre-evolution
generations keep their original shape; DML, CDF, matviews, and
pipelines tolerate an evolved source. Runs under BOTH IO backends.

Reference basis: the reference has one frozen record shape end-to-end
(word/doc/count, helper_reduce.c:238-257); evolution is extension-tier
(the Iceberg/Delta schema-versioning shape reduced to this repo's
manifest).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_indexing_spark.sources.generations import (
    SchemaEvolutionError,
    append_rows,
    check_schema_evolution,
    delete_rows,
    generation_changes,
    generation_diff,
    generation_head,
    load_manifest,
    optimize_store,
    read_generation,
    store_schema,
    upsert_rows,
)


@pytest.fixture(autouse=True)
def _both_io_backends(io_backend):
    """Every test here runs under POSIX and object-store CAS."""


def _v1(spark, lo, n):
    return spark.createDataFrame(
        [(lo + i, int(i % 5)) for i in range(n)], "id long, v int"
    )


def _v2(spark, lo, n):
    # v widened int -> long, w added
    return spark.createDataFrame(
        [(lo + i, (i % 5) * 100, f"w{i}") for i in range(n)],
        "id long, v long, w string",
    )


def _build_evolved(spark, tmp_path) -> str:
    path = str(tmp_path / "store")
    append_rows(spark, path, _v1(spark, 0, 6))
    append_rows(spark, path, _v2(spark, 100, 4), schema_mode="evolve")
    return path


def test_strict_rejects_drift(spark, tmp_path):
    path = str(tmp_path / "store")
    append_rows(spark, path, _v1(spark, 0, 4))
    with pytest.raises(SchemaEvolutionError):
        append_rows(spark, path, _v2(spark, 100, 2))  # default strict
    # nothing was written
    assert generation_head(path) == 1


def test_evolve_add_and_widen(spark, tmp_path):
    path = _build_evolved(spark, tmp_path)
    head = read_generation(spark, path)
    assert dict(head.dtypes) == {"id": "bigint", "v": "bigint", "w": "string"}
    rows = {r.id: (r.v, r.w) for r in head.collect()}
    assert len(rows) == 10
    assert rows[3] == (3, None)  # old row: v cast, w null-filled
    assert rows[103] == (300, "w3")
    # pinned read of the pre-evolution generation keeps its shape
    g1 = read_generation(spark, path, at=1)
    assert dict(g1.dtypes) == {"id": "bigint", "v": "int"}
    assert g1.count() == 6
    # declared schemas are queryable from the manifest alone
    assert store_schema(path, at=1).fieldNames() == ["id", "v"]
    assert store_schema(path).fieldNames() == ["id", "v", "w"]


def test_evolve_rejects_drops_and_narrowing(spark, tmp_path):
    path = str(tmp_path / "store")
    append_rows(spark, path, _v2(spark, 0, 3), schema_mode="evolve")
    with pytest.raises(SchemaEvolutionError):  # drop w
        append_rows(spark, path, _v1(spark, 10, 2), schema_mode="evolve")
    narrowed = spark.createDataFrame(
        [(1, 2, "x")], "id long, v int, w string"
    )
    with pytest.raises(SchemaEvolutionError):  # v long -> int narrows
        append_rows(spark, path, narrowed, schema_mode="evolve")


def test_check_schema_evolution_unit():
    old = {
        "type": "struct",
        "fields": [
            {"name": "a", "type": "integer", "nullable": True, "metadata": {}},
            {"name": "b", "type": "float", "nullable": False, "metadata": {}},
        ],
    }
    widened = {
        "type": "struct",
        "fields": [
            {"name": "b", "type": "double", "nullable": True, "metadata": {}},
            {"name": "a", "type": "long", "nullable": True, "metadata": {}},
            {"name": "c", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
    # order/nullability-insensitive identity reuses the declared json
    same_reordered = {
        "type": "struct",
        "fields": [
            {"name": "b", "type": "float", "nullable": True, "metadata": {}},
            {"name": "a", "type": "integer", "nullable": False, "metadata": {}},
        ],
    }
    assert check_schema_evolution(old, same_reordered, "strict") is old
    assert check_schema_evolution(old, widened, "evolve") is widened
    with pytest.raises(SchemaEvolutionError):
        check_schema_evolution(old, widened, "strict")
    assert check_schema_evolution(None, old, "strict") is old


def test_generation_diff_spans_second_evolution(spark, tmp_path):
    path = _build_evolved(spark, tmp_path)  # gens 1 (v int), 2 (+w, v long)
    v3 = spark.createDataFrame(
        [(200 + i, 7, "z", 1.5) for i in range(3)],
        "id long, v long, w string, x double",
    )
    append_rows(spark, path, v3, schema_mode="evolve")  # gen 3 (+x)
    # delta 1 -> 3 mixes files written under schemas 2 and 3; the diff
    # aligns to generation 3's declared schema
    d = generation_diff(spark, path, since=1, until=3)
    assert dict(d.dtypes) == {
        "id": "bigint", "v": "bigint", "w": "string", "x": "double",
    }
    got = {r.id: (r.v, r.w, r.x) for r in d.collect()}
    assert len(got) == 7
    assert got[100] == (0, "w0", None)  # schema-2 file: x null-filled
    assert got[200] == (7, "z", 1.5)


def test_cdf_across_evolution_aligns_to_newer(spark, tmp_path):
    path = _build_evolved(spark, tmp_path)
    ch = generation_changes(spark, path, since=1, until=2, key_cols=("id",))
    assert "w" in ch.columns
    ins = {
        r.id for r in ch.filter(F.col("change_type") == "insert").collect()
    }
    assert ins == set(range(100, 104))


def test_delete_on_evolved_store(spark, tmp_path):
    path = _build_evolved(spark, tmp_path)
    rep = delete_rows(spark, path, [("id", "<", 3)])
    assert rep["deleted_rows"] == 3
    head = read_generation(spark, path)
    assert head.count() == 7
    assert dict(head.dtypes)["w"] == "string"
    # deleted only the targeted pre-evolution rows
    assert head.filter(F.col("id") < 3).count() == 0
    assert head.filter(F.col("w").isNull()).count() == 3


def test_upsert_on_evolved_store(spark, tmp_path):
    path = _build_evolved(spark, tmp_path)
    upd = spark.createDataFrame(
        [(3, 999, "fixed"), (500, 1, "new")], "id long, v long, w string"
    )
    rep = upsert_rows(spark, path, upd, ["id"])
    assert rep["updated_rows"] == 1 and rep["inserted_rows"] == 1
    rows = {r.id: (r.v, r.w) for r in read_generation(spark, path).collect()}
    assert rows[3] == (999, "fixed")
    assert rows[500] == (1, "new")
    assert rows[4] == (4, None)  # untouched pre-evolution row intact


def test_optimize_folds_to_one_schema(spark, tmp_path):
    path = _build_evolved(spark, tmp_path)
    before = {
        r.id: (r.v, r.w) for r in read_generation(spark, path).collect()
    }
    optimize_store(spark, path, cluster_by=["id"], n_files=2)
    m = load_manifest(path)
    g = m["gens"][str(m["head"])]
    sids = {
        (g["stats"][rel] or {}).get("schema_id") for rel in g["files"]
    }
    assert len(sids) == 1  # the retrofit: one schema version after fold
    after = {
        r.id: (r.v, r.w) for r in read_generation(spark, path).collect()
    }
    assert after == before


def test_matview_refresh_tolerates_evolved_base(spark, tmp_path):
    from map_reduce_indexing_spark.operators.matview import (
        create_matview,
        read_matview,
        refresh_matview,
    )

    base = str(tmp_path / "base")
    view = str(tmp_path / "view")
    append_rows(spark, base, _v1(spark, 0, 6))
    create_matview(
        spark, base, view, ["v"], {"n": ("count", "id"), "s": ("sum", "id")}
    )
    append_rows(spark, base, _v2(spark, 100, 4), schema_mode="evolve")
    refresh_matview(spark, view)
    got = {
        r.v: (r.n, r.s) for r in read_matview(spark, view).collect()
    }
    # oracle: group the union by v (old v int values 0..4, new 0/100/
    # 200/300 as longs)
    import collections

    want = collections.defaultdict(lambda: [0, 0])
    for i in range(6):
        want[i % 5][0] += 1
        want[i % 5][1] += i
    for i in range(4):
        want[(i % 5) * 100][0] += 1
        want[(i % 5) * 100][1] += 100 + i
    assert got == {k: tuple(v) for k, v in want.items()}


def test_pipeline_tolerates_evolved_source(spark, tmp_path):
    from map_reduce_indexing_spark.sources.pipeline import (
        run_incremental_pipeline,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    append_rows(spark, src, _v1(spark, 0, 6))

    def transform(df):
        return df.select("id", (F.col("v") * 2).alias("v2"))

    run_incremental_pipeline(spark, src, dst, transform)
    append_rows(spark, src, _v2(spark, 100, 4), schema_mode="evolve")
    rep = run_incremental_pipeline(spark, src, dst, transform)
    assert rep["mode"] == "append"  # delta-sized, not a rebuild
    got = {r.id: r.v2 for r in read_generation(spark, dst).collect()}
    assert len(got) == 10
    assert got[2] == 4 and got[101] == 200


def test_gated_append_evolves(spark, tmp_path):
    from map_reduce_indexing_spark.sources.expectations import (
        append_with_expectations,
    )

    path = str(tmp_path / "store")
    exp = {"nonneg": [("id", ">=", 0)]}
    append_with_expectations(spark, path, _v1(spark, 0, 5), exp)
    with pytest.raises(SchemaEvolutionError):
        append_with_expectations(spark, path, _v2(spark, 100, 3), exp)
    rep = append_with_expectations(
        spark, path, _v2(spark, 100, 3), exp, schema_mode="evolve"
    )
    assert rep["rows_appended"] == 3
    head = read_generation(spark, path)
    assert head.count() == 8
    assert head.filter(F.col("w").isNull()).count() == 5


def test_register_store_and_store_sql(spark, tmp_path):
    from map_reduce_indexing_spark.sources.catalog import (
        register_store,
        store_sql,
    )
    from map_reduce_indexing_spark.sources.generations import tag_generation

    path = _build_evolved(spark, tmp_path)
    tag_generation(path, "before_evo", at=1)
    register_store(spark, "evo_head", path)
    assert spark.sql("SELECT count(*) AS n FROM evo_head").first().n == 10
    # time travel inline: pinned generation vs head in ONE query
    df = store_sql(
        spark,
        """
        SELECT (SELECT count(*) FROM evostore) AS n_head,
               (SELECT count(*) FROM evostore@1) AS n_g1,
               (SELECT count(*) FROM evostore@before_evo) AS n_tag
        """,
        {"evostore": path},
    )
    r = df.first()
    assert (r.n_head, r.n_g1, r.n_tag) == (10, 6, 6)


def test_store_sql_literals_and_comments_survive(spark, tmp_path):
    """r12 advice: the name@selector rewrite must never touch string
    literals or comments — a registered store name inside one is DATA,
    and mangling it silently changes the predicate. The @999 selector
    in the comment doubles as a tripwire: if the rewrite saw it,
    register_store would raise (no such generation)."""
    from map_reduce_indexing_spark.sources.catalog import store_sql

    path = _build_evolved(spark, tmp_path)
    df = store_sql(
        spark,
        """
        -- a comment naming evostore@999 must not register a view
        SELECT 'ping evostore@1' AS note,  /* nor evostore@999 here */
               count(*) AS n_head,
               (SELECT count(*) FROM evostore@1) AS n_g1
        FROM evostore
        WHERE 'it''s evostore@999' != 'x'
        """,
        {"evostore": path},
    )
    r = df.first()
    assert r.note == "ping evostore@1"  # the literal survived verbatim
    assert (r.n_head, r.n_g1) == (10, 6)  # real travel still resolves


def test_drop_columns_rewrite(spark, tmp_path):
    from map_reduce_indexing_spark.sources.generations import (
        drop_columns,
        schema_history,
    )

    path = _build_evolved(spark, tmp_path)  # head: id, v(long), w
    wide = {r.id: (r.v, r.w) for r in read_generation(spark, path).collect()}
    pre_head = generation_head(path)
    new_head = drop_columns(spark, path, ["w"])
    assert new_head == pre_head + 1
    head = read_generation(spark, path)
    assert dict(head.dtypes) == {"id": "bigint", "v": "bigint"}
    assert {r.id: r.v for r in head.collect()} == {
        k: v for k, (v, _w) in wide.items()
    }
    # pinned pre-drop generation still serves the wide shape
    g2 = read_generation(spark, path, at=pre_head)
    assert "w" in g2.columns
    assert {r.id: (r.v, r.w) for r in g2.collect()} == wide
    # lineage is queryable
    hist = schema_history(path)
    assert hist["generations"][new_head] != hist["generations"][pre_head]
    assert "w" not in hist["schemas"][hist["generations"][new_head]]
    # appends after the drop follow the narrowed schema strictly
    with pytest.raises(SchemaEvolutionError):
        append_rows(spark, path, _v2(spark, 900, 1))
    append_rows(
        spark,
        path,
        spark.createDataFrame([(900, 1)], "id long, v long"),
    )
    assert read_generation(spark, path).count() == 11


def test_drop_columns_refusals(spark, tmp_path):
    from map_reduce_indexing_spark.sources.generations import drop_columns

    path = str(tmp_path / "store")
    append_rows(spark, path, _v2(spark, 0, 4), schema_mode="evolve")
    with pytest.raises(ValueError):
        drop_columns(spark, path, [])
    with pytest.raises(ValueError):
        drop_columns(spark, path, ["nope"])
    with pytest.raises(ValueError):
        drop_columns(spark, path, ["id", "v", "w"])  # every column
    # partitioned store: dropping the partition column is refused
    p2 = str(tmp_path / "parted")
    append_rows(
        spark,
        p2,
        spark.createDataFrame(
            [(i, i % 2, f"s{i}") for i in range(6)],
            "id long, bucket long, s string",
        ),
        partition_by=["bucket"],
    )
    with pytest.raises(ValueError):
        drop_columns(spark, p2, ["bucket"])


def test_evolve_partitioned_store(spark, tmp_path):
    path = str(tmp_path / "store")
    b1 = spark.createDataFrame(
        [(i, i % 2, i * 10) for i in range(6)],
        "id long, bucket long, v int",
    )
    append_rows(spark, path, b1, partition_by=["bucket"])
    b2 = spark.createDataFrame(
        [(100 + i, i % 2, (i + 1) * 1000, f"w{i}") for i in range(4)],
        "id long, bucket long, v long, w string",
    )
    append_rows(
        spark, path, b2, partition_by=["bucket"], schema_mode="evolve"
    )
    head = read_generation(spark, path)
    assert dict(head.dtypes)["v"] == "bigint"
    assert head.count() == 10
    # partition pruning still works through the reconciled read
    assert head.filter(F.col("bucket") == 0).count() == 5
    got = {r.id: (r.v, r.w) for r in head.collect()}
    assert got[0] == (0, None)
    assert got[101] == (2000, "w1")


def test_reconciled_read_keeps_pushdown_and_pruning(spark, tmp_path):
    """Scale guard: the schema-reconciled union must not cost the plan
    its parquet pushdown — a filter on a shared column reaches the
    scan of EVERY schema group (Catalyst pushes through the union and
    the alignment projections), and a manifest-prunable predicate
    still skips whole files before Spark ever plans."""
    path = _build_evolved(spark, tmp_path)
    df = read_generation(spark, path).filter(F.col("id") >= 3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters" in ln
    ]
    assert len(pushed) >= 2  # one scan per schema group
    for ln in pushed:
        assert "GreaterThanOrEqual(id,3)" in ln, ln
    # filter on the ADDED column: old-group rows are typed NULLs, so
    # the predicate constant-folds there and the result is exact
    assert df.filter(F.col("w").isNotNull()).count() == 4
    # manifest pruning: a predicate provably excluding the old files
    # never reads them (the kept listing is schema-uniform, so the
    # read takes the fast path too)
    from map_reduce_indexing_spark.sources.generations import (
        plan_generation_scan,
    )

    _root, kept, total = plan_generation_scan(
        path, None, [("id", ">=", 100)]
    )
    assert 0 < len(kept) < total


def test_partition_evolution_relayout(spark, tmp_path):
    """Round 12: changing a store's partition layout is an explicit
    rewrite (optimize_store(partition_by=...)); appends under the
    wrong layout are refused BEFORE anything lands (a mismatched
    append would make every later read fail on conflicting directory
    structures)."""
    from map_reduce_indexing_spark.sources.generations import (
        optimize_store,
        plan_generation_scan,
    )

    path = str(tmp_path / "store")
    flat = spark.createDataFrame(
        [(i, i % 3, i * 10) for i in range(12)],
        "id long, bucket long, v long",
    )
    append_rows(spark, path, flat)  # unpartitioned era
    pre_head = generation_head(path)
    # a partitioned append against the flat layout is refused loudly
    with pytest.raises(ValueError, match="layout"):
        append_rows(
            spark,
            path,
            spark.createDataFrame([(100, 0, 1)], "id long, bucket long, v long"),
            partition_by=["bucket"],
        )
    assert generation_head(path) == pre_head  # nothing written
    # the explicit re-layout verb
    optimize_store(spark, path, cluster_by=["id"], n_files=2,
                   partition_by=["bucket"])
    head = read_generation(spark, path)
    assert head.count() == 12
    assert {r.id for r in head.filter(F.col("bucket") == 1).collect()} == {
        1, 4, 7, 10,
    }
    # partition pruning now fires on the new layout
    _root, kept, total = plan_generation_scan(path, None, [("bucket", "=", 1)])
    assert 0 < len(kept) < total
    # pinned pre-layout generation still reads (its own flat snapshot)
    g_old = read_generation(spark, path, at=pre_head)
    assert g_old.count() == 12
    # appends must follow the NEW layout now
    with pytest.raises(ValueError, match="layout"):
        append_rows(
            spark,
            path,
            spark.createDataFrame([(100, 0, 1)], "id long, bucket long, v long"),
        )
    append_rows(
        spark,
        path,
        spark.createDataFrame([(100, 0, 1)], "id long, bucket long, v long"),
        partition_by=["bucket"],
    )
    assert read_generation(spark, path).count() == 13
    # and the store can flatten again
    optimize_store(spark, path, cluster_by=None, n_files=2, partition_by=[])
    flat_again = read_generation(spark, path)
    assert flat_again.count() == 13
    assert "bucket" in flat_again.columns


def test_gated_append_layout_guard(spark, tmp_path):
    from map_reduce_indexing_spark.sources.expectations import (
        append_with_expectations,
    )

    path = str(tmp_path / "store")
    exp = {"nonneg": [("id", ">=", 0)]}
    append_with_expectations(
        spark,
        path,
        spark.createDataFrame(
            [(i, i % 2) for i in range(6)], "id long, bucket long"
        ),
        exp,
        partition_by=["bucket"],
    )
    with pytest.raises(ValueError, match="layout"):
        append_with_expectations(
            spark,
            path,
            spark.createDataFrame([(9, 1)], "id long, bucket long"),
            exp,  # no partition_by: conflicts with the bucketed layout
        )


def test_catalog_persistence(spark, tmp_path):
    """save_catalog / load_catalog / attach_catalog: store names
    outlive the session that registered them (one JSON, atomic)."""
    from map_reduce_indexing_spark.sources.catalog import (
        attach_catalog,
        load_catalog,
        save_catalog,
        store_sql,
    )

    s1 = str(tmp_path / "s1")
    s2 = str(tmp_path / "s2")
    append_rows(spark, s1, _v1(spark, 0, 4))
    append_rows(spark, s2, _v1(spark, 100, 6))
    cat = str(tmp_path / "catalog.json")
    save_catalog(cat, {"alpha": s1, "beta": s2})
    assert set(load_catalog(cat)) == {"alpha", "beta"}
    # merge + removal semantics
    save_catalog(cat, {"beta": None})
    assert set(load_catalog(cat)) == {"alpha"}
    save_catalog(cat, {"beta": s2})
    # a "fresh session" (same spark here) attaches by one call
    attached = attach_catalog(spark, cat)
    assert set(attached) == {"alpha", "beta"}
    assert spark.sql("SELECT count(*) AS n FROM alpha").first().n == 4
    # and the same names drive time travel through store_sql
    append_rows(spark, s2, _v1(spark, 200, 2))
    r = store_sql(
        spark,
        "SELECT (SELECT count(*) FROM beta) AS now_n, "
        "(SELECT count(*) FROM beta@1) AS then_n",
        load_catalog(cat),
    ).first()
    assert (r.now_n, r.then_n) == (8, 6)
    with pytest.raises(ValueError):
        save_catalog(cat, {"not a name": s1})
