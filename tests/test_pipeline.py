"""Incremental store-to-store pipelines (round 10 third wave).

sources/pipeline.py:run_incremental_pipeline — chained ETL over
generations stores with exactly-once bookmarks derived from the
destination manifest. Pinned here: first run == full transform;
subsequent runs consume ONLY the source delta and the chained result
equals transform(full source); a completed span re-runs as a noop
(exactly-once); a source REWRITE span rebuilds the destination
exactly (or refuses under on_rewrite='error'); two-stage chains
compose; the bookmark survives the destination's own compaction
carry.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_indexing_spark.sources.generations import (
    delete_rows,
    generation_head,
    publish_generation,
    read_generation,
)
from map_reduce_indexing_spark.sources.pipeline import (
    pipeline_bookmark,
    run_incremental_pipeline,
)


def _rows(spark, lo, n):
    return spark.createDataFrame(
        [(lo + i, (lo + i) % 5, f"w{(lo + i) % 7}") for i in range(n)],
        "rid long, k long, w string",
    )


def _double(df):
    return df.select("rid", (F.col("k") * 2).alias("k2"), "w")


def _collect(spark, path):
    return sorted(tuple(r) for r in read_generation(spark, path).collect())


def test_first_run_then_delta_only(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _rows(spark, 0, 20).coalesce(2).write.parquet(src)
    publish_generation(src)
    rep = run_incremental_pipeline(spark, src, dst, _double)
    assert rep["mode"] == "append" and rep["src_to"] == 1
    assert _collect(spark, dst) == sorted(
        tuple(r) for r in _double(_rows(spark, 0, 20)).collect()
    )

    _rows(spark, 20, 10).coalesce(1).write.mode("append").parquet(src)
    publish_generation(src)
    rep = run_incremental_pipeline(spark, src, dst, _double)
    assert rep["mode"] == "append" and rep["src_from"] == 1
    assert _collect(spark, dst) == sorted(
        tuple(r) for r in _double(_rows(spark, 0, 30)).collect()
    )
    # the destination advanced exactly one generation per run
    assert generation_head(dst) == 2


def test_rerun_is_noop(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _rows(spark, 0, 10).coalesce(1).write.parquet(src)
    publish_generation(src)
    run_incremental_pipeline(spark, src, dst, _double)
    before = _collect(spark, dst)
    rep = run_incremental_pipeline(spark, src, dst, _double)
    assert rep["mode"] == "noop"
    assert _collect(spark, dst) == before
    assert pipeline_bookmark(dst, src) == 1


def test_source_rewrite_rebuilds_exactly(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _rows(spark, 0, 30).coalesce(3).write.parquet(src)
    publish_generation(src)
    run_incremental_pipeline(spark, src, dst, _double)
    delete_rows(spark, src, [("rid", "between", (5, 14))])
    rep = run_incremental_pipeline(spark, src, dst, _double)
    assert rep["mode"] == "rebuild"
    expected = sorted(
        tuple(r)
        for r in _double(
            _rows(spark, 0, 30).filter(~F.col("rid").between(5, 14))
        ).collect()
    )
    assert _collect(spark, dst) == expected
    # and the next append after the rebuild is back to delta-sized
    _rows(spark, 30, 5).coalesce(1).write.mode("append").parquet(src)
    publish_generation(src)
    rep = run_incremental_pipeline(spark, src, dst, _double)
    assert rep["mode"] == "append"
    assert len(_collect(spark, dst)) == 25


def test_on_rewrite_error_refuses(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _rows(spark, 0, 10).coalesce(2).write.parquet(src)
    publish_generation(src)
    run_incremental_pipeline(spark, src, dst, _double)
    delete_rows(spark, src, [("rid", "=", 3)])
    with pytest.raises(ValueError, match="rewrote files"):
        run_incremental_pipeline(
            spark, src, dst, _double, on_rewrite="error"
        )


def test_two_stage_chain(spark, tmp_path):
    """bronze -> silver -> gold: stage 2 consumes stage 1's
    generations with the same delta discipline."""
    src = str(tmp_path / "bronze")
    mid = str(tmp_path / "silver")
    out = str(tmp_path / "gold")
    _rows(spark, 0, 20).coalesce(2).write.parquet(src)
    publish_generation(src)
    run_incremental_pipeline(spark, src, mid, _double)
    filt = lambda df: df.filter(F.col("k2") > 2)
    run_incremental_pipeline(spark, mid, out, filt)

    _rows(spark, 20, 10).coalesce(1).write.mode("append").parquet(src)
    publish_generation(src)
    r1 = run_incremental_pipeline(spark, src, mid, _double)
    r2 = run_incremental_pipeline(spark, mid, out, filt)
    assert r1["mode"] == "append" and r2["mode"] == "append"
    expected = sorted(
        tuple(r)
        for r in filt(_double(_rows(spark, 0, 30))).collect()
    )
    assert _collect(spark, out) == expected


def test_gated_pipeline_quarantines_transformed_rejects(spark, tmp_path):
    """The medallion promotion gate: the silver store admits only
    transformed rows proving the expectations; rejects land in the
    destination's .quarantine sibling, tagged; the audit rides the
    destination generation entry; a later delta run gates again."""
    from map_reduce_indexing_spark.sources.expectations import (
        ExpectationError,
        expectation_audit,
        read_quarantine,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    exp = {"k2_cap": [("k2", "<=", 6)]}
    _rows(spark, 0, 10).coalesce(1).write.parquet(src)  # k in 0..4, k2 in 0..8
    publish_generation(src)
    rep = run_incremental_pipeline(
        spark, src, dst, _double, expectations=exp
    )
    admitted = read_generation(spark, dst)
    assert admitted.filter(F.col("k2") > 6).count() == 0
    q = read_quarantine(spark, dst)
    assert {r._violations for r in q.collect()} == {"k2_cap"}
    assert q.count() + admitted.count() == 10
    audit = expectation_audit(dst)
    assert audit["rows_quarantined"] == q.count()

    # the delta run gates too, and audits stay per-generation
    _rows(spark, 10, 5).coalesce(1).write.mode("append").parquet(src)
    publish_generation(src)
    rep = run_incremental_pipeline(
        spark, src, dst, _double, expectations=exp
    )
    assert rep["mode"] == "append" and rep["src_from"] == 1
    assert expectation_audit(dst)["rows_in"] == 5
    total = read_generation(spark, dst).count() + read_quarantine(
        spark, dst
    ).count()
    assert total == 15


def test_gated_pipeline_fail_mode_preserves_the_span(spark, tmp_path):
    """expect_mode='fail' aborts BEFORE writing; the bookmark did not
    advance, so the retry consumes the same span (exactly-once through
    failures)."""
    from map_reduce_indexing_spark.sources.expectations import (
        ExpectationError,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _rows(spark, 0, 10).coalesce(1).write.parquet(src)
    publish_generation(src)
    with pytest.raises(ExpectationError):
        run_incremental_pipeline(
            spark,
            src,
            dst,
            _double,
            expectations={"k2_cap": [("k2", "<=", 6)]},
            expect_mode="fail",
        )
    assert pipeline_bookmark(dst, src) == 0
    # retry with a satisfiable gate consumes the SAME span
    rep = run_incremental_pipeline(
        spark,
        src,
        dst,
        _double,
        expectations={"k2_cap": [("k2", "<=", 100)]},
        expect_mode="fail",
    )
    assert rep["src_from"] == 0 and rep["src_to"] == 1
    assert read_generation(spark, dst).count() == 10


def test_pipeline_runs_lineage(spark, tmp_path):
    from map_reduce_indexing_spark.sources.pipeline import pipeline_runs

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _rows(spark, 0, 10).coalesce(1).write.parquet(src)
    publish_generation(src)
    run_incremental_pipeline(spark, src, dst, _double)
    _rows(spark, 10, 5).coalesce(1).write.mode("append").parquet(src)
    publish_generation(src)
    run_incremental_pipeline(
        spark, src, dst, _double,
        expectations={"k2_cap": [("k2", "<=", 100)]},
    )
    runs = pipeline_runs(spark, dst).orderBy("generation").collect()
    assert [(r.since, r.until, r.mode) for r in runs] == [
        (0, 1, "append"), (1, 2, "append"),
    ]
    assert runs[0].gated_rows_in is None
    assert runs[1].gated_rows_in == 5 and runs[1].gated_rows_appended == 5


def test_gated_rebuild_replaces_the_quarantine(spark, tmp_path):
    """A rebuild recomputes every destination row, so its reject set
    REPLACES the quarantine (an append would duplicate rows earlier
    runs already quarantined), and a rebuild whose rejects are empty
    CLEARS a stale quarantine."""
    from map_reduce_indexing_spark.sources.expectations import (
        read_quarantine,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    exp = {"k2_cap": [("k2", "<=", 4)]}
    _rows(spark, 0, 20).coalesce(2).write.parquet(src)  # k2 in 0..8
    publish_generation(src)
    run_incremental_pipeline(spark, src, dst, _double, expectations=exp)
    q0 = read_quarantine(spark, dst).count()
    assert q0 == 8  # k in {3,4} fail the cap

    # source rewrite -> gated rebuild: quarantine REPLACED, not doubled
    delete_rows(spark, src, [("rid", "=", 3)])  # k=3 row removed
    rep = run_incremental_pipeline(
        spark, src, dst, _double, expectations=exp
    )
    assert rep["mode"] == "rebuild"
    assert read_quarantine(spark, dst).count() == 7

    # delete every failing source row -> the next rebuild CLEARS it
    delete_rows(spark, src, [("k", ">=", 3)])
    rep = run_incremental_pipeline(
        spark, src, dst, _double, expectations=exp
    )
    assert rep["mode"] == "rebuild"
    assert read_quarantine(spark, dst).count() == 0
    assert read_generation(spark, dst).count() == 12  # k in 0..2


def test_bookmark_survives_retention_and_dst_mutations(
    spark, tmp_path, monkeypatch
):
    """The durable bookmark: non-pipeline writes on the destination
    (deletes) churn its generations, and with the TTL forced to zero
    retention expires the generation that carried the pipeline entry —
    the top-level bookmark map must still prevent a duplicate
    re-consume."""
    from map_reduce_indexing_spark.sources import generations as G

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _rows(spark, 0, 10).coalesce(1).write.parquet(src)
    publish_generation(src)
    run_incremental_pipeline(spark, src, dst, _double)
    assert pipeline_bookmark(dst, src) == 1

    monkeypatch.setattr(G, "GEN_TTL_SECONDS", 0.0)
    for rid in (0, 1, 2, 3):
        delete_rows(spark, dst, [("rid", "=", rid)])
    m = G.load_manifest(dst)
    # the generation carrying the pipeline entry is gone...
    assert not any(g.get("pipeline") for g in m["gens"].values())
    # ...but the bookmark survives, so the rerun is a noop
    assert pipeline_bookmark(dst, src) == 1
    rep = run_incremental_pipeline(spark, src, dst, _double)
    assert rep["mode"] == "noop"
    assert read_generation(spark, dst).count() == 6  # no duplicates


def test_multi_source_fan_in_independent_bookmarks(spark, tmp_path):
    """Two sources feeding ONE destination keep independent bookmarks
    (the map is keyed by source path): each source's delta lands once,
    and advancing one source never re-consumes the other."""
    a, b, dst = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "dst")
    _rows(spark, 0, 10).coalesce(1).write.parquet(a)
    publish_generation(a)
    _rows(spark, 100, 5).coalesce(1).write.parquet(b)
    publish_generation(b)
    run_incremental_pipeline(spark, a, dst, _double)
    run_incremental_pipeline(spark, b, dst, _double)
    assert read_generation(spark, dst).count() == 15

    _rows(spark, 10, 3).coalesce(1).write.mode("append").parquet(a)
    publish_generation(a)
    rep_a = run_incremental_pipeline(spark, a, dst, _double)
    rep_b = run_incremental_pipeline(spark, b, dst, _double)
    assert rep_a["mode"] == "append" and rep_a["src_from"] == 1
    assert rep_b["mode"] == "noop"
    assert read_generation(spark, dst).count() == 18
    assert pipeline_bookmark(dst, a) == 2 and pipeline_bookmark(dst, b) == 1


def test_crash_orphans_swept_before_retry(spark, tmp_path):
    """Round-11 crash-window fix: a run that crashed BETWEEN its
    output append and its publish leaves unpublished orphan files with
    the bookmark unadvanced. The retry must sweep them under the
    writer lock and land the span exactly once — without the sweep the
    retry's append plus the orphans would fold into one generation as
    permanent duplicate rows."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _rows(spark, 0, 20).coalesce(2).write.parquet(src)
    publish_generation(src)
    run_incremental_pipeline(spark, src, dst, _double)

    _rows(spark, 20, 10).coalesce(1).write.mode("append").parquet(src)
    publish_generation(src)
    # simulate the crash residue: the delta's transformed output is on
    # the destination's live listing, but no publish recorded it
    _double(_rows(spark, 20, 10)).coalesce(1).write.mode("append").parquet(dst)
    assert pipeline_bookmark(dst, src) == 1  # bookmark unadvanced

    rep = run_incremental_pipeline(spark, src, dst, _double)
    assert rep["mode"] == "append" and rep["src_from"] == 1
    assert _collect(spark, dst) == sorted(
        tuple(r) for r in _double(_rows(spark, 0, 30)).collect()
    )


def test_symlinked_source_shares_bookmark(spark, tmp_path):
    """Bookmarks key by realpath: a symlinked alias of an
    already-consumed source must resolve to the SAME bookmark (an
    alias starting at 0 would re-append the full source)."""
    import os

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _rows(spark, 0, 12).coalesce(1).write.parquet(src)
    publish_generation(src)
    run_incremental_pipeline(spark, src, dst, _double)
    alias = str(tmp_path / "src_alias")
    os.symlink(src, alias)
    rep = run_incremental_pipeline(spark, alias, dst, _double)
    assert rep["mode"] == "noop"
    assert read_generation(spark, dst).count() == 12
    assert pipeline_bookmark(dst, alias) == 1


def test_on_first_run_error_refuses_nonempty_destination(spark, tmp_path):
    """A declared single-source destination refuses a bookmark-less
    full-source read when it already holds published data (the
    aliased-path / different-mount duplication guard); the default
    posture still allows multi-source fan-in."""
    a, b, dst = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "dst")
    _rows(spark, 0, 10).coalesce(1).write.parquet(a)
    publish_generation(a)
    _rows(spark, 50, 5).coalesce(1).write.parquet(b)
    publish_generation(b)
    run_incremental_pipeline(spark, a, dst, _double)
    with pytest.raises(ValueError, match="on_first_run"):
        run_incremental_pipeline(
            spark, b, dst, _double, on_first_run="error"
        )
    assert read_generation(spark, dst).count() == 10  # nothing written
    # the same source with its bookmark present is never refused
    rep = run_incremental_pipeline(spark, a, dst, _double, on_first_run="error")
    assert rep["mode"] == "noop"
    # default posture: fan-in proceeds
    run_incremental_pipeline(spark, b, dst, _double)
    assert read_generation(spark, dst).count() == 15


@pytest.fixture(autouse=True)
def _both_io_backends(io_backend):
    """Round 11: every test in this module runs under BOTH commit
    backends (see conftest.io_backend) — POSIX and object-store CAS."""
