"""Column RENAME via schema aliasing (round 13, r12 verdict missing
#2): `rename_columns` is METADATA-ONLY — the manifest records a
{new: old} rename-chain step and registers the renamed schema as a new
generation over the SAME file listing. Readers resolve a renamed
logical column to the physical name old files carry (parquet is
name-addressed; a drop+add rename would silently serve NULL for the
new name), pinned pre-rename generations keep their old shape, and
file pruning translates predicates on renamed columns to the physical
stat names, staying lossless. The soundness invariant: a RETIRED
physical name can never re-enter the schema (check_schema_evolution
refuses; rename_columns refuses target collisions including the
swap shape) — the name-reuse hazard Iceberg solves with field ids.

Reference basis: none (the reference has no schema at all, SURVEY.md
§2.12); Iceberg RENAME COLUMN is the public shape.
"""

from __future__ import annotations

import pytest

from map_reduce_indexing_spark.sources.generations import (
    SchemaEvolutionError,
    append_rows,
    delete_rows,
    delete_rows_dv,
    generation_head,
    generation_row_count,
    load_manifest,
    optimize_store,
    plan_generation_scan,
    read_generation,
    rename_columns,
    store_schema,
    upsert_rows,
)


@pytest.fixture(autouse=True)
def _both_io_backends(io_backend):
    """Runs under POSIX and object-store CAS."""


def _frame(spark, lo, n, schema="id long, v long"):
    return spark.createDataFrame(
        [(lo + i, (lo + i) * 10) for i in range(n)], schema
    )


def test_rename_is_metadata_only_and_serves_history(spark, tmp_path):
    path = str(tmp_path / "store")
    append_rows(spark, path, _frame(spark, 0, 6))
    m0 = load_manifest(path)
    files0 = m0["gens"][str(m0["head"])]["files"]
    g_pre = int(m0["head"])
    rename_columns(spark, path, {"v": "val"})
    m1 = load_manifest(path)
    assert m1["gens"][str(m1["head"])]["files"] == files0  # no rewrite
    assert store_schema(path).fieldNames() == ["id", "val"]
    # old files serve their data UNDER THE NEW NAME
    got = {r.id: r.val for r in read_generation(spark, path).collect()}
    assert got == {i: i * 10 for i in range(6)}
    # pinned pre-rename read keeps the old shape, byte-stable
    pre = read_generation(spark, path, at=g_pre)
    assert pre.columns == ["id", "v"]
    assert {r.id: r.v for r in pre.collect()} == got
    # a STRICT append under the new name just works; union is exact
    append_rows(spark, path, _frame(spark, 100, 2, "id long, val long"))
    got = {r.id: r.val for r in read_generation(spark, path).collect()}
    assert got[100] == 1000 and got[0] == 0 and len(got) == 8
    assert generation_row_count(path) == 8


def test_rename_chains_compose(spark, tmp_path):
    path = str(tmp_path / "store")
    append_rows(spark, path, _frame(spark, 0, 4))
    rename_columns(spark, path, {"v": "val"})
    append_rows(spark, path, _frame(spark, 10, 2, "id long, val long"))
    rename_columns(spark, path, {"val": "amount"})
    got = {r.id: r.amount for r in read_generation(spark, path).collect()}
    assert got == {i: i * 10 for i in [0, 1, 2, 3, 10, 11]}
    # rename composed with WIDENING evolution (rename . widen)
    wide = spark.createDataFrame([(20, 200, "x")], "id long, amount long, tag string")
    append_rows(spark, path, wide, schema_mode="evolve")
    rows = {r.id: (r.amount, r.tag) for r in read_generation(spark, path).collect()}
    assert rows[20] == (200, "x") and rows[0] == (0, None)


def test_retired_names_never_return(spark, tmp_path):
    path = str(tmp_path / "store")
    append_rows(spark, path, _frame(spark, 0, 4))
    rename_columns(spark, path, {"v": "val"})
    # evolve-append re-adding the retired physical name is refused
    sneaky = spark.createDataFrame(
        [(50, 1, 2)], "id long, val long, v long"
    )
    with pytest.raises(SchemaEvolutionError, match="retired"):
        append_rows(spark, path, sneaky, schema_mode="evolve")
    # renaming TO a retired name is refused
    with pytest.raises(ValueError, match="retired"):
        rename_columns(spark, path, {"val": "v"})
    # the swap shape is refused (a->b while b->c would make 'val'
    # retired and live at once)
    append_rows(
        spark,
        path,
        spark.createDataFrame([(60, 1, 2)], "id long, val long, extra long"),
        schema_mode="evolve",
    )
    with pytest.raises(ValueError, match="retired"):
        rename_columns(spark, path, {"val": "amount", "extra": "val"})
    # plain collisions refused too
    with pytest.raises(ValueError, match="already exists"):
        rename_columns(spark, path, {"val": "extra"})


def test_rename_refusals(spark, tmp_path):
    path = str(tmp_path / "store")
    append_rows(
        spark,
        path,
        spark.createDataFrame([(1, "a", 2)], "id long, k string, v long"),
        partition_by=["k"],
    )
    with pytest.raises(ValueError, match="partition column"):
        rename_columns(spark, path, {"k": "kk"})
    with pytest.raises(ValueError, match="not in"):
        rename_columns(spark, path, {"nope": "x"})
    with pytest.raises(ValueError, match="no-op"):
        rename_columns(spark, path, {"v": "v"})
    with pytest.raises(ValueError, match="collide"):
        rename_columns(spark, path, {"v": "x", "id": "x"})


def test_rename_pruning_stays_lossless(spark, tmp_path):
    """Predicates on a RENAMED column still prune files: the footer
    stats are keyed by the physical (old) name, and _file_matches
    translates through the chain."""
    path = str(tmp_path / "store")
    append_rows(spark, path, _frame(spark, 0, 10))       # v in [0, 90]
    append_rows(spark, path, _frame(spark, 1000, 10))    # v in [10000, ...]
    rename_columns(spark, path, {"v": "val"})
    _root, kept, total = plan_generation_scan(
        path, None, [("val", ">=", 10000)]
    )
    assert 0 < len(kept) < total, (len(kept), total)
    df = read_generation(spark, path, where=[("val", ">=", 10000)])
    assert df.count() == 10


def test_rename_dml_and_dv_compose(spark, tmp_path):
    """The DML triad against the renamed logical name: DV delete, CoW
    delete, and upsert all act on pre-rename files' rows exactly."""
    path = str(tmp_path / "store")
    append_rows(spark, path, _frame(spark, 0, 10))
    rep0 = delete_rows_dv(spark, path, [("v", "<", 20)])  # pre-rename DV
    assert rep0["deleted_rows"] == 2
    rename_columns(spark, path, {"v": "val"})
    # the DV carried through the metadata-only rename publish
    assert generation_row_count(path) == 8
    got = {r.id for r in read_generation(spark, path).collect()}
    assert got == set(range(2, 10))
    # DV delete on the NEW name hits old files' rows
    rep = delete_rows_dv(spark, path, [("val", ">=", 80)])
    assert rep["deleted_rows"] == 2
    assert {r.id for r in read_generation(spark, path).collect()} == set(
        range(2, 8)
    )
    # CoW delete on the new name folds everything clean
    rep = delete_rows(spark, path, [("val", "=", 70)])
    assert rep["deleted_rows"] == 1
    m = load_manifest(path)
    assert "dv" not in m["gens"][str(m["head"])]
    # upsert keyed on id with the RENAMED schema
    upd = spark.createDataFrame([(2, 999), (777, 1)], "id long, val long")
    rep = upsert_rows(spark, path, upd, ["id"])
    assert rep["updated_rows"] == 1 and rep["inserted_rows"] == 1
    rows = {r.id: r.val for r in read_generation(spark, path).collect()}
    assert rows[2] == 999 and rows[777] == 1 and 7 not in rows


def test_optimize_folds_rename_physically(spark, tmp_path):
    """A rewrite lands files under the NEW physical names; the chain
    stays recorded but resolution short-circuits (name == physical)."""
    path = str(tmp_path / "store")
    append_rows(spark, path, _frame(spark, 0, 8))
    rename_columns(spark, path, {"v": "val"})
    optimize_store(spark, path, cluster_by=["val"], n_files=2)
    got = {r.id: r.val for r in read_generation(spark, path).collect()}
    assert got == {i: i * 10 for i in range(8)}
    # post-fold: head files are stamped with the head schema (one
    # group, plain read path)
    m = load_manifest(path)
    g = m["gens"][str(m["head"])]
    sids = {
        (g["stats"].get(r) or {}).get("schema_id") for r in g["files"]
    }
    assert sids == {g["schema_id"]}


def test_rename_cdf_aligns_to_new_name(spark, tmp_path):
    """generation_changes across a rename span speaks the NEWER
    schema's names; the metadata-only rename itself emits no changes."""
    from map_reduce_indexing_spark.sources.generations import (
        generation_changes,
    )

    path = str(tmp_path / "store")
    append_rows(spark, path, _frame(spark, 0, 4))
    pre = generation_head(path)
    rename_columns(spark, path, {"v": "val"})
    assert (
        generation_changes(spark, path, since=pre, key_cols=("id",)).count()
        == 0
    )
    append_rows(spark, path, _frame(spark, 100, 1, "id long, val long"))
    ch = generation_changes(spark, path, since=pre, key_cols=("id",))
    rows = ch.collect()
    assert len(rows) == 1
    assert rows[0].change_type == "insert" and rows[0].val == 1000
