"""Dedup-tier queries vs the DuckDB oracle, plus semantic sanity checks."""

from __future__ import annotations

import pytest

from map_reduce_indexing_spark.plans import registry

from .conftest import SF_DIR, assert_df_matches_oracle

ORACLE_QUERIES = [
    "dedup_exact",
    "dedup_exact_kept",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_embedding_pairs",
    "dedup_clusters",
]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_dedup_query_matches_oracle(spark, duck, name):
    q = registry.get(name)
    assert_df_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)


def test_minhash_signatures_match_oracle(spark, duck):
    # sig is a comma-joined string of K permutation minima (scalar,
    # driver-sortable)
    q = registry.get("dedup_minhash_signatures")
    assert_df_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)


def test_lsh_pairs_match_oracle(spark, duck):
    q = registry.get("dedup_minhash_lsh_pairs")
    assert_df_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)


def test_exact_dedup_finds_injected_dups(spark):
    rows = registry.get("dedup_exact").fn(spark, SF_DIR).collect()
    # the dup-injected corpus copies every doc_id % 3 == 0
    assert all(r.n_copies >= 2 for r in rows)
    assert len(rows) > 0


def test_lsh_recall_against_exact_jaccard(spark):
    """Every high-Jaccard pair should be an LSH candidate (recall check);
    with 4x4 bands at J>=0.8 collision prob is ~1-(1-0.8^4)^4 ~ 0.88,
    and near-identical pairs (J~1) collide with certainty."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in registry.get("dedup_ngram_jaccard").fn(spark, SF_DIR).collect()
        if r.jaccard >= 0.95
    }
    cand = {
        (r.doc_a, r.doc_b)
        for r in registry.get("dedup_minhash_lsh_pairs").fn(spark, SF_DIR).collect()
    }
    assert exact <= cand, f"missed near-identical pairs: {exact - cand}"


def test_clusters_are_consistent_with_pairs(spark):
    """Cluster labels must respect the verified-pair graph: the edge set
    is LSH candidates that pass exact Jaccard, so every Jaccard pair
    that is ALSO an LSH candidate must share a label, and each label is
    the min doc_id of its member set (canonical representative)."""
    jac = {
        (r.doc_a, r.doc_b)
        for r in registry.get("dedup_ngram_jaccard").fn(spark, SF_DIR).collect()
    }
    cand = {
        (r.doc_a, r.doc_b)
        for r in registry.get("dedup_minhash_lsh_pairs").fn(spark, SF_DIR).collect()
    }
    labels = {
        r.doc_id: r.cluster_id
        for r in registry.get("dedup_clusters").fn(spark, SF_DIR).collect()
    }
    verified = jac & cand
    assert len(verified) > 0 and len(labels) > 0
    for a, b in verified:
        assert labels[a] == labels[b]
    # every clustered doc appears in at least one verified edge
    edge_nodes = {d for p in verified for d in p}
    assert set(labels) == edge_nodes
    members: dict[int, list[int]] = {}
    for doc, lab in labels.items():
        members.setdefault(lab, []).append(doc)
    for lab, docs in members.items():
        assert lab == min(docs)
