"""Trained linear quality classifier (operators/classifier.py).

The oracle equivalence itself (Spark vs DuckDB, bit-exact weights) is
covered by the contract sweep; these tests pin the SEMANTICS — the
solver really solves the ridge system, the model really learns the
discriminative feature, serving is consistent with training — and the
engineering properties (memoization, determinism, plan shape).
"""

from __future__ import annotations

import numpy as np
import pytest

from map_reduce_indexing_spark.operators.classifier import (
    CLF_FEATURES,
    CLF_L2,
    _D,
    _solve_steps,
    clf_features,
    train_classifier,
    trained_classifier,
)
from map_reduce_indexing_spark.plans import registry

from .conftest import SF_DIR


def test_solver_matches_numpy_on_random_systems():
    """The shared-expression LDL^T solve is an exact linear solver:
    on random SPD ridge systems it agrees with numpy.linalg.solve to
    float precision."""
    rng = np.random.default_rng(7)
    for _ in range(25):
        x = rng.normal(size=(50, _D))
        yv = rng.normal(size=50)
        m = x.T @ x / 50 + CLF_L2 * np.eye(_D)
        b = x.T @ yv / 50
        env = {"n": 1, "lam": CLF_L2}
        for j in range(_D):
            for k in range(j, _D):
                env[f"m{j}{k}"] = m[j][k]
            env[f"b{j}"] = b[j]
        # n=1 and pre-divided stats: the a/r steps then reduce to the
        # matrix entries themselves (a{jj} double-adds lam, so build m
        # WITHOUT it here).
        env = {"n": 1, "lam": CLF_L2}
        gram = x.T @ x / 50
        for j in range(_D):
            for k in range(j, _D):
                env[f"m{j}{k}"] = gram[j][k]
            env[f"b{j}"] = b[j]
        for name, expr in _solve_steps():
            env[name] = eval(expr, {"__builtins__": {}}, env)  # noqa: S307
        w = np.array([env[f"w{j}"] for j in range(_D)])
        expect = np.linalg.solve(gram + CLF_L2 * np.eye(_D), b)
        np.testing.assert_allclose(w, expect, rtol=1e-9, atol=1e-12)


def test_trained_weights_solve_the_quantized_system(spark):
    """End-to-end: the trained weights equal numpy's solution of the
    ridge system over the ACTUAL feature matrix to within the 1e-6
    statistic quantization (so the one-pass statistics aggregation is
    faithful to the data)."""
    rows = clf_features(spark, SF_DIR).collect()
    x = np.array([[r[f"x{j}"] for j in range(_D)] for r in rows])
    yv = np.array([r["y"] for r in rows])
    n = len(rows)
    expect = np.linalg.solve(
        x.T @ x / n + CLF_L2 * np.eye(_D), x.T @ yv / n
    )
    w = np.array(train_classifier(spark, SF_DIR))
    # Quantization perturbs the statistics by <= 1e-6/n per entry;
    # through the solve that stays far below 1e-3 on these scales.
    np.testing.assert_allclose(w, expect, atol=1e-3)


def test_model_learns_the_discriminative_feature(spark):
    """Synthetic negatives differ ONLY in stopword_frac (the vowel
    rotation preserves token lengths and distinct counts), so a
    correct trainer must put dominant weight there — and must separate
    the classes."""
    w = dict(zip(CLF_FEATURES, train_classifier(spark, SF_DIR)))
    assert w["stopword_frac"] > 1.0
    assert w["stopword_frac"] > 5 * abs(w["type_token_ratio"])
    row = registry.get("text_classifier_eval").fn(spark, SF_DIR).head()
    assert row["n_docs"] == 2 * row["n_pos"]  # 1:1 synthetic negatives
    assert row["accuracy"] >= 0.75
    # mean-threshold on a separable 1:1 mix: negatives mostly below
    assert row["tn"] > 0.8 * (row["n_docs"] - row["n_pos"])


def test_training_is_deterministic_and_memoized(spark):
    w1 = train_classifier(spark, SF_DIR)
    w2 = train_classifier(spark, SF_DIR)
    assert w1 == w2  # bit-identical, not approximately
    m1 = trained_classifier(spark, SF_DIR)
    assert m1 == w1
    assert trained_classifier(spark, SF_DIR) is m1  # served, not retrained


def test_filter_keeps_high_scoring_docs(spark):
    out = registry.get("text_classifier_filter").fn(spark, SF_DIR)
    rows = out.collect()
    assert rows, "filter kept nothing"
    assert set(out.columns) == {"doc_id", "score"}
    eval_row = registry.get("text_classifier_eval").fn(spark, SF_DIR).head()
    assert len(rows) == eval_row["tp"] + eval_row["fp"]


def test_training_plan_is_one_pass(spark):
    """The statistics aggregation must be a single artifact scan with
    map-side partial aggregation — no join, no explode-to-shuffle of
    per-term rows."""
    feats = clf_features(spark, SF_DIR)
    from pyspark.sql import functions as F

    from map_reduce_indexing_spark.operators.classifier import (
        CLF_SCALE,
        CLF_SUM_DEC,
    )

    agg = feats.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.floor(F.col("x1") * F.col("y") * F.lit(CLF_SCALE)).cast(
                CLF_SUM_DEC
            )
        ).alias("b1"),
    )
    plan = agg._sc._jvm.PythonSQLUtils.explainString(
        agg._jdf.queryExecution(), "formatted"
    )
    assert "Join" not in plan
    # one scan node (each appears twice in "formatted": tree + detail)
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "HashAggregate" in plan


@pytest.mark.parametrize("name", [
    "text_classifier_train",
    "text_classifier_eval",
    "text_classifier_filter",
])
def test_registered_and_exported(name):
    q = registry.get(name)
    assert q.oracle is not None
    assert q.export


# ---------------------------------------------------------------------------
# Incremental maintenance: mergeable sufficient statistics
# ---------------------------------------------------------------------------


def test_stats_artifact_path_matches_direct_trainer(spark):
    from map_reduce_indexing_spark.operators.classifier import (
        train_classifier_from_stats,
    )

    assert train_classifier_from_stats(spark, SF_DIR) == train_classifier(
        spark, SF_DIR
    )  # bit-identical, not approximately


def test_incremental_stats_append_is_bit_exact(spark, tmp_path):
    """Corpus append -> the stats artifact absorbs ONE partial row
    computed from the delta docs only, and the merged solve is
    bit-identical to a from-scratch fit of the grown corpus (integer-
    quantized sums are associative: stats(corpus+delta) =
    stats(corpus) + stats(delta) exactly)."""
    import os

    from pyspark.sql import functions as F

    from map_reduce_indexing_spark.operators.classifier import (
        clf_stats,
        train_classifier_from_stats,
    )
    from map_reduce_indexing_spark.sources.tables import load_table

    corpus = str(tmp_path / "corpus")
    load_table(spark, SF_DIR, "documents").write.parquet(
        os.path.join(corpus, "documents.parquet")
    )
    w0 = train_classifier_from_stats(spark, corpus)  # full build
    assert clf_stats(spark, corpus).count() == 1

    spark.createDataFrame(
        [
            (10**7 + i, f"the appended delta document number {i}", "en", "t")
            for i in range(3)
        ],
        "doc_id long, text string, lang string, source string",
    ).write.mode("append").parquet(os.path.join(corpus, "documents.parquet"))

    w_inc = train_classifier_from_stats(spark, corpus)  # delta path
    assert clf_stats(spark, corpus).count() == 2  # base + ONE partial row
    assert w_inc != w0  # the delta really changed the model

    # ground truth: the direct one-pass trainer over the grown corpus
    w_full = train_classifier(spark, corpus)
    assert w_inc == w_full  # bit-identical merge
