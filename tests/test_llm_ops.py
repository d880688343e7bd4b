"""Similarity, text-analysis, and multimodal tiers vs the DuckDB oracle."""

from __future__ import annotations

import pytest

from map_reduce_indexing_spark.operators.multimodal import decode_image_real
from map_reduce_indexing_spark.plans import registry

from .conftest import SF_DIR, assert_df_matches_oracle

ORACLE_QUERIES = [
    "ann_knn_bruteforce",
    "ann_lsh_bucket_histogram",
    "ann_lsh_topk",
    "ann_ivf_cells",
    "ann_ivf_topk",
    "text_quality",
    "text_langid",
    "text_token_counts",
    "text_train_val_test_split",
    "multimodal_image_meta",
    "multimodal_frame_sample",
    "multimodal_corpus_bytes",
    "multimodal_resize",
]


def test_multimodal_embed_matches_oracle(spark, duck):
    """Element-wise embedding comparison (array column needs list
    coercion before frame equality, same as the fingerprint test)."""
    q = registry.get("multimodal_embed")
    sp = q.fn(spark, SF_DIR).toPandas()
    du = duck.execute(q.oracle).fetchdf()
    sp["emb"] = sp["emb"].map(list)
    du["emb"] = du["emb"].map(list)
    sp = sp.sort_values("doc_id", ignore_index=True)
    du = du.sort_values("doc_id", ignore_index=True)
    assert sp["doc_id"].tolist() == du["doc_id"].tolist()
    assert sp["emb"].tolist() == du["emb"].tolist()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_llm_query_matches_oracle(spark, duck, name):
    q = registry.get(name)
    assert_df_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)


def test_fingerprint_matches_oracle(spark, duck):
    q = registry.get("text_fingerprint")
    sp = q.fn(spark, SF_DIR).toPandas()
    du = duck.execute(q.oracle).fetchdf()
    sp["fp"] = sp["fp"].map(list)
    du["fp"] = du["fp"].map(list)
    sp = sp.sort_values("doc_id", ignore_index=True)
    du = du.sort_values("doc_id", ignore_index=True)
    assert sp["doc_id"].tolist() == du["doc_id"].tolist()
    assert sp["fp"].tolist() == du["fp"].tolist()


def test_lsh_topk_is_subset_of_bruteforce_space(spark):
    """LSH returns true neighbors from its bucket: its cosines must all
    appear in the brute-force ranking's value set for those ids."""
    brute = {
        r.vec_id: r.cosine
        for r in registry.get("ann_knn_bruteforce").fn(spark, SF_DIR).collect()
    }
    lsh = registry.get("ann_lsh_topk").fn(spark, SF_DIR).collect()
    assert len(lsh) > 0
    for r in lsh:
        if r.vec_id in brute:
            assert abs(brute[r.vec_id] - r.cosine) < 1e-12


def test_knn_batch_numpy_matches_sql(spark):
    """The applyInPandas/numpy batch-KNN path must reproduce the SQL
    brute-force top-k for the shared query vector (BLAS summation order
    differs, hence the tolerance instead of a DuckDB hash oracle)."""
    brute = registry.get("ann_knn_bruteforce").fn(spark, SF_DIR).collect()
    batch = registry.get("ann_knn_batch_numpy").fn(spark, SF_DIR).collect()
    q0 = sorted(
        ((r.vec_id, r.cosine) for r in batch if r.q_id == 0),
        key=lambda t: (-t[1], t[0]),
    )
    assert [v for v, _ in q0] == [r.vec_id for r in brute]
    for (_, got), want in zip(q0, brute):
        assert abs(got - want.cosine) < 1e-9
    # every query id produced a full top-k
    qids = {r.q_id for r in batch}
    assert len(qids) == 8
    for q in qids:
        assert sum(1 for r in batch if r.q_id == q) == 10


def test_real_decode_is_gated(spark):
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG....")
