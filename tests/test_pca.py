"""PCA encoder (ann_pca_train / pca_components / pca_project).

The moment statistics' oracle equivalence is covered by the contract
sweep; these tests pin the SPECTRAL semantics against numpy on the raw
data — the assembled covariance is the real covariance (to the 1e-6
term quantization), the served axes diagonalize it, and the map-only
projection matches the dense numpy projection — plus determinism of
the sign-canonicalized model and the memo.
"""

from __future__ import annotations

import numpy as np

from map_reduce_indexing_spark.operators.similarity import (
    DIM,
    PCA_K,
    embeddings_double,
    pca_components,
    pca_project,
)
from map_reduce_indexing_spark.plans import registry

from .conftest import SF_DIR


def _raw(spark):
    rows = embeddings_double(spark, SF_DIR).select("vec_id", "v").collect()
    rows.sort(key=lambda r: r.vec_id)
    return np.array([list(r.v) for r in rows])


def test_components_diagonalize_the_real_covariance(spark):
    x = _raw(spark)
    cov = np.cov(x, rowvar=False, bias=True)
    comps, evals, mean = pca_components(spark, SF_DIR)
    np.testing.assert_allclose(mean, x.mean(axis=0), atol=1e-5)
    assert comps.shape == (PCA_K, DIM)
    # orthonormal axes, eigenvalues descending and matching numpy's top-k
    np.testing.assert_allclose(comps @ comps.T, np.eye(PCA_K), atol=1e-9)
    assert all(a >= b for a, b in zip(evals, evals[1:]))
    want = np.sort(np.linalg.eigvalsh(cov))[::-1][:PCA_K]
    np.testing.assert_allclose(evals, want, atol=1e-4)
    # each served axis is an eigenvector of the REAL covariance
    for c, lam in zip(comps, evals):
        np.testing.assert_allclose(cov @ c, lam * c, atol=1e-4)


def test_projection_matches_numpy_and_is_deterministic(spark):
    x = _raw(spark)
    comps, _evals, mean = pca_components(spark, SF_DIR)
    out = pca_project(
        embeddings_double(spark, SF_DIR).select("vec_id", "v"), comps, mean
    ).collect()
    got = {r.vec_id: np.array(list(r.pv)) for r in out}
    want = (x - x.mean(axis=0)) @ comps.T
    ids = sorted(got)
    for idx, vid in enumerate(ids):
        np.testing.assert_allclose(got[vid], want[idx], atol=1e-5)
    # memoized model: served, not retrained
    assert pca_components(spark, SF_DIR) is pca_components(spark, SF_DIR)


def test_registered_and_oracle_backed():
    q = registry.get("ann_pca_train")
    assert q.export and q.oracle is not None
