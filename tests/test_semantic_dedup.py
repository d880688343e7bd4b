"""Semantic dedup over trained k-means cells (dedup_semantic_pairs).

Oracle equivalence (bit-exact pair set vs DuckDB's replay of the
training + assignment + cosine) is covered by the contract sweep; these
tests pin the semantics — blocked output is a TRUE subset of the
exhaustive pair set (precision 1), recall is substantial, the plan is
an equi-join with no cartesian and no Python in the hot path at
coarse-quantizer k — and the composition property: the blocking key is
the SAME memoized model ann_ivf_trained_topk serves.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_indexing_spark.operators.dedup import spark_cosine
from map_reduce_indexing_spark.operators.similarity import (
    SEMANTIC_COSINE,
    assign_nearest,
    embeddings_double,
    trained_quantizer,
)
from map_reduce_indexing_spark.plans import registry

from .conftest import SF_DIR


def _pairs(spark):
    return registry.get("dedup_semantic_pairs").fn(spark, SF_DIR)


def _exhaustive(spark):
    ev = embeddings_double(spark, SF_DIR).select("vec_id", "v")
    a, b = ev.alias("a"), ev.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.expr(spark_cosine("a.v", "b.v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= SEMANTIC_COSINE)
    )


def test_emits_real_pairs_with_consistent_cells(spark):
    rows = _pairs(spark).collect()
    assert rows, "fixture-calibrated threshold must yield real pairs"
    cell = {
        r.vec_id: r.cell
        for r in assign_nearest(
            embeddings_double(spark, SF_DIR).select("vec_id", "v"),
            trained_quantizer(spark, SF_DIR),
            out_col="cell",
        ).collect()
    }
    for r in rows:
        assert r.vec_a < r.vec_b
        assert r.cosine >= SEMANTIC_COSINE
        assert cell[r.vec_a] == cell[r.vec_b] == r.cell


def test_precision_one_and_recall_floor(spark):
    """Every blocked pair is a true near-dup pair (the exact verify
    guarantees precision 1); recall has a floor. The fixture's
    synthetic embeddings are near-uniform on the sphere — no cluster
    structure for the quantizer to learn — so ANY 8-way partition
    splits many moderate-cosine pairs (measured ~0.35-0.42 here; on
    real clustered corpora SemDeDup recall is far higher, and the
    documented lever is multi-cell assignment, the nprobe knob the
    serving tier already has)."""
    got = {(r.vec_a, r.vec_b) for r in _pairs(spark).collect()}
    want = {(r.vec_a, r.vec_b) for r in _exhaustive(spark).collect()}
    assert got <= want  # precision 1
    assert want and len(got) / len(want) >= 0.3


def test_plan_is_equi_join_no_python(spark):
    """Candidates must come from an equi self-join on the cell key (no
    CartesianProduct / BroadcastNestedLoopJoin), and at coarse-
    quantizer k the assignment is the literal map-only path — no
    Python (mapInPandas) anywhere in the plan."""
    df = _pairs(spark)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "MapInPandas" not in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_blocking_key_is_the_served_model(spark):
    """trained_quantizer is memoized: the dedup query and the ANN
    serving query must read the identical model object (train once,
    serve everywhere)."""
    m1 = trained_quantizer(spark, SF_DIR)
    m2 = trained_quantizer(spark, SF_DIR)
    assert m1 is m2
