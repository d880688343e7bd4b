"""OPTIMIZE ZORDER on generations stores (round 13):
optimize_store(zorder_by=[...]) rewrites the store clustered on the
bit-interleaved space-filling curve, so manifest file skipping prunes
selective predicates on ANY listed dimension — single-column
clustering is blind on the others."""

from __future__ import annotations

import pytest

from map_reduce_indexing_spark.sources.generations import (
    append_rows,
    generation_row_count,
    load_manifest,
    optimize_store,
    plan_generation_scan,
    read_generation,
)

N = 4096


def _store(spark, tmp_path) -> str:
    path = str(tmp_path / "store")
    df = spark.range(N).selectExpr(
        "id AS x",
        f"pmod(id * 2654435761, {N}) AS y",
        "id AS payload",
    )
    append_rows(spark, path, df)
    return path


def test_zorder_prunes_on_every_dimension(spark, tmp_path):
    path = _store(spark, tmp_path)
    optimize_store(spark, path, cluster_by=None, n_files=8,
                   zorder_by=["x", "y"])
    for col in ("x", "y"):
        _r, kept, total = plan_generation_scan(
            path, None, [(col, "between", (0, N // 16))]
        )
        assert 0 < len(kept) < total, (col, len(kept), total)
    # the rewrite lost and doubled nothing
    assert generation_row_count(path) == N
    s = read_generation(spark, path).selectExpr("sum(payload) AS s").first().s
    assert s == N * (N - 1) // 2
    # contrast: single-column clustering is blind on the OTHER column
    path2 = _store(spark, tmp_path / "b")
    optimize_store(spark, path2, cluster_by=["x"], n_files=8)
    _r, kept_x, total = plan_generation_scan(
        path2, None, [("x", "between", (0, N // 16))]
    )
    _r, kept_y, _t = plan_generation_scan(
        path2, None, [("y", "between", (0, N // 16))]
    )
    assert len(kept_x) < total  # clustered column prunes
    assert len(kept_y) == total  # the other is blind


def test_zorder_within_partitioned_layout(spark, tmp_path):
    path = str(tmp_path / "store")
    df = spark.range(N).selectExpr(
        "pmod(id, 4) AS p", "id AS x", f"pmod(id * 48271, {N}) AS y",
        "id AS payload",
    )
    append_rows(spark, path, df, partition_by=["p"])
    optimize_store(spark, path, cluster_by=None, n_files=8,
                   zorder_by=["x", "y"])
    m = load_manifest(path)
    g = m["gens"][str(m["head"])]
    assert all(r.startswith("p=") for r in g["files"])  # layout kept
    _r, kept, total = plan_generation_scan(
        path, None, [("p", "=", "1"), ("y", "between", (0, N // 16))]
    )
    assert 0 < len(kept) < total
    assert generation_row_count(path) == N


def test_zorder_refusals(spark, tmp_path):
    path = _store(spark, tmp_path)
    with pytest.raises(ValueError, match="not both"):
        optimize_store(spark, path, cluster_by=["x"], zorder_by=["x", "y"])
    with pytest.raises(ValueError, match=">= 2"):
        optimize_store(spark, path, cluster_by=None, zorder_by=["x"])
