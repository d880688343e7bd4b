"""Publish-time expectations (round 10 third wave).

sources/expectations.py:append_with_expectations — the admission gate
over generations stores. Pinned here: the three modes' row routing
(quarantine split, drop, all-or-nothing fail), multi-violation
tagging, NULL-is-a-violation semantics, the durable manifest audit,
the quarantine sibling surviving store swaps, and gate+store
composition (diff of the admitted generation == the admitted rows).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from map_reduce_indexing_spark.sources.expectations import (
    ExpectationError,
    append_with_expectations,
    expectation_audit,
    read_quarantine,
)
from map_reduce_indexing_spark.sources.generations import (
    generation_diff,
    generation_head,
    read_generation,
)

EXPECT = {
    "score_cap": [("score", "<=", 100)],
    "known_kind": [("kind", "in", ["a", "b"])],
}


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id bigint, kind string, score bigint")


GOOD = [(1, "a", 10), (2, "b", 99)]
BAD_SCORE = [(3, "a", 150)]
BAD_KIND = [(4, "z", 5)]
BAD_BOTH = [(5, "z", 999)]


def test_quarantine_split_and_audit(spark, tmp_path):
    store = str(tmp_path / "store")
    out = append_with_expectations(
        spark,
        store,
        _batch(spark, GOOD + BAD_SCORE + BAD_KIND + BAD_BOTH),
        EXPECT,
        mode="quarantine",
    )
    assert out["rows_in"] == 5
    assert out["rows_appended"] == 2
    assert out["rows_quarantined"] == 3
    assert out["violations"] == {"score_cap": 2, "known_kind": 2}

    # admitted rows only; the quarantine lives in a SIBLING store
    admitted = read_generation(spark, store)
    assert sorted(r.id for r in admitted.collect()) == [1, 2]

    q = read_quarantine(spark, store).collect()
    tags = {r.id: r._violations for r in q}
    assert tags == {
        3: "score_cap",
        4: "known_kind",
        5: "known_kind,score_cap",  # name-sorted multi-violation tag
    }
    assert {r._src_generation for r in q} == {out["generation"]}

    # audit is durable and metadata-served
    audit = expectation_audit(store)
    assert audit["mode"] == "quarantine"
    assert audit["violations"] == {"score_cap": 2, "known_kind": 2}
    assert audit["rows_appended"] == 2


def test_drop_mode(spark, tmp_path):
    store = str(tmp_path / "store")
    out = append_with_expectations(
        spark, store, _batch(spark, GOOD + BAD_SCORE), EXPECT, mode="drop"
    )
    assert out["rows_dropped"] == 1
    assert read_generation(spark, store).count() == 2
    assert not os.path.isdir(store + ".quarantine")


def test_fail_mode_writes_nothing(spark, tmp_path):
    store = str(tmp_path / "store")
    with pytest.raises(ExpectationError) as ei:
        append_with_expectations(
            spark, store, _batch(spark, GOOD + BAD_BOTH), EXPECT, mode="fail"
        )
    assert ei.value.counts == {"score_cap": 1, "known_kind": 1}
    assert not os.path.exists(os.path.join(store, "_generations.json"))

    # a clean batch in fail mode admits normally
    out = append_with_expectations(
        spark, store, _batch(spark, GOOD), EXPECT, mode="fail"
    )
    assert out["rows_appended"] == 2
    assert read_generation(spark, store).count() == 2


def test_null_is_a_violation(spark, tmp_path):
    store = str(tmp_path / "store")
    rows = [(1, "a", 10), (2, None, 5), (3, "a", None)]
    out = append_with_expectations(
        spark, store, _batch(spark, rows), EXPECT, mode="quarantine"
    )
    assert out["rows_appended"] == 1
    assert out["violations"] == {"score_cap": 1, "known_kind": 1}
    q = {r.id: r._violations for r in read_quarantine(spark, store).collect()}
    assert q == {2: "known_kind", 3: "score_cap"}


def test_gate_composes_with_diff(spark, tmp_path):
    """Each gated append is exactly one generation whose diff is the
    admitted rows — the downstream incremental consumers (matview
    refresh, CDC) see only what the gate admitted."""
    store = str(tmp_path / "store")
    append_with_expectations(
        spark, store, _batch(spark, GOOD), EXPECT, mode="quarantine"
    )
    g1 = generation_head(store)
    append_with_expectations(
        spark,
        store,
        _batch(spark, [(6, "b", 42)] + BAD_SCORE),
        EXPECT,
        mode="quarantine",
    )
    g2 = generation_head(store)
    delta = generation_diff(spark, store, since=g1, until=g2)
    assert [(r.id, r.score) for r in delta.collect()] == [(6, 42)]
    # per-generation audits stay separate
    assert expectation_audit(store, at=g1)["rows_appended"] == 2
    assert expectation_audit(store, at=g2)["violations"]["score_cap"] == 1


def test_or_predicates_and_clean_batch(spark, tmp_path):
    """CNF OR branches work in expectations; an all-clean quarantine
    batch creates no quarantine store at all."""
    store = str(tmp_path / "store")
    exp = {"a_or_high": [[("kind", "=", "a"), ("score", ">", 50)]]}
    out = append_with_expectations(
        spark,
        store,
        _batch(spark, [(1, "a", 1), (2, "b", 99), (3, "b", 10)]),
        exp,
        mode="quarantine",
    )
    assert out["rows_appended"] == 2
    assert out["violations"] == {"a_or_high": 1}

    store2 = str(tmp_path / "store2")
    out2 = append_with_expectations(
        spark, store2, _batch(spark, GOOD), EXPECT, mode="quarantine"
    )
    assert out2["rows_quarantined"] == 0
    assert not os.path.isdir(store2 + ".quarantine")


def test_quarantine_survives_store_swaps(spark, tmp_path):
    """Compaction/delete/optimize replace the store DIRECTORY via
    publish_swap — the quarantine is a sibling precisely so those
    swaps cannot destroy it."""
    from map_reduce_indexing_spark.sources.generations import delete_rows

    store = str(tmp_path / "store")
    append_with_expectations(
        spark,
        store,
        _batch(spark, GOOD + BAD_SCORE + BAD_BOTH),
        EXPECT,
        mode="quarantine",
    )
    before = sorted(
        (r.id, r._violations) for r in read_quarantine(spark, store).collect()
    )
    delete_rows(spark, store, [("id", "=", 1)])
    assert read_generation(spark, store).count() == 1
    after = sorted(
        (r.id, r._violations) for r in read_quarantine(spark, store).collect()
    )
    assert after == before and before


def test_readmit_repairs_and_regates(spark, tmp_path):
    """readmit closes the repair loop: quarantined rows are fixed,
    re-gated, appended as an audited 'readmit' generation; rows the
    fix did not cure stay quarantined with fresh tags; a second
    readmit with a curing fix drains the quarantine."""
    from map_reduce_indexing_spark.sources.expectations import readmit

    store = str(tmp_path / "store")
    append_with_expectations(
        spark,
        store,
        _batch(spark, GOOD + BAD_SCORE + BAD_KIND + BAD_BOTH),
        EXPECT,
        mode="quarantine",
    )
    assert read_quarantine(spark, store).count() == 3

    # fix only the score problem: cap scores at 100
    cap_fix = lambda df: df.withColumn(
        "score", F.least(F.col("score"), F.lit(100))
    )
    rep = readmit(spark, store, EXPECT, fix=cap_fix)
    # id 3 (score-only) is cured; ids 4 and 5 still have bad kind
    assert rep["readmitted"] == 1
    assert rep["still_quarantined"] == 2
    assert sorted(r.id for r in read_generation(spark, store).collect()) == [
        1, 2, 3,
    ]
    q = {r.id: r._violations for r in read_quarantine(spark, store).collect()}
    assert q == {4: "known_kind", 5: "known_kind"}  # score now capped
    # the readmit generation is audited and distinguishable
    audit = expectation_audit(store)
    assert audit.get("readmitted") is True and audit["rows_appended"] == 1

    # second repair cures the kind too: quarantine drains
    kind_fix = lambda df: cap_fix(df).withColumn("kind", F.lit("a"))
    rep = readmit(spark, store, EXPECT, fix=kind_fix)
    assert rep["readmitted"] == 2 and rep["still_quarantined"] == 0
    assert read_quarantine(spark, store).count() == 0
    assert read_generation(spark, store).count() == 5


def test_readmit_noop_without_quarantine(spark, tmp_path):
    from map_reduce_indexing_spark.sources.expectations import readmit

    store = str(tmp_path / "store")
    append_with_expectations(
        spark, store, _batch(spark, GOOD), EXPECT, mode="quarantine"
    )
    rep = readmit(spark, store, EXPECT)
    assert rep == {"readmitted": 0, "still_quarantined": 0, "violations": {}}


def test_gate_pins_nondeterministic_batch(spark, tmp_path):
    """Round-11 determinism pin: the gate's counts, the admit write,
    and the quarantine write must split ONE evaluation of the batch.
    A rand()-bearing lineage evaluated per action would route rows
    inconsistently (lost or double-routed); with the localCheckpoint
    pin the audit, the store, and the quarantine agree exactly."""
    import pyspark.sql.functions as F

    from map_reduce_indexing_spark.sources.expectations import (
        append_with_expectations,
        read_quarantine,
    )
    from map_reduce_indexing_spark.sources.generations import read_generation

    store = str(tmp_path / "store")
    base = spark.range(500).select(
        F.col("id").alias("rid"), F.rand().alias("score")
    )
    rep = append_with_expectations(
        spark, store, base, {"score_cap": [("score", "<=", 0.5)]}
    )
    kept = read_generation(spark, store)
    quar = read_quarantine(spark, store)
    assert rep["rows_in"] == 500
    assert kept.count() == rep["rows_appended"]
    assert quar.count() == rep["rows_quarantined"]
    assert rep["rows_appended"] + rep["rows_quarantined"] == 500
    kept_ids = {r.rid for r in kept.select("rid").collect()}
    quar_ids = {r.rid for r in quar.select("rid").collect()}
    assert kept_ids.isdisjoint(quar_ids)
    assert len(kept_ids | quar_ids) == 500
    # and the split respected the pinned values, not a re-roll
    assert kept.filter(F.col("score") > 0.5).count() == 0
    assert quar.filter(F.col("score") <= 0.5).count() == 0


@pytest.fixture(autouse=True)
def _both_io_backends(io_backend):
    """Round 11: every test in this module runs under BOTH commit
    backends (see conftest.io_backend) — POSIX and object-store CAS."""
