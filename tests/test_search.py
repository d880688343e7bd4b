"""Search-surface queries vs the DuckDB oracle (SURVEY.md §2 IMPLIED tier)."""

from __future__ import annotations

import pytest

from map_reduce_indexing_spark.plans import registry

from .conftest import SF_DIR, assert_df_matches_oracle

SEARCH_QUERIES = [
    "search_term_lookup",
    "search_and",
    "search_or",
    "search_not",
    "search_term_topk",
    "search_topk_per_term",
    "search_phrase",
    "search_tfidf_rank",
    "search_bm25_rank",
    "search_prefix",
    "index_bigram_postings",
]


def test_phrase_search_positional_semantics(spark):
    """Pin adjacency semantics on a hand-built corpus: phrase matches
    only consecutive normalized tokens, across punctuation but not
    across an intervening word."""
    from map_reduce_indexing_spark.operators.search import positional_postings
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "the table hash join"),  # match
            (2, "table of hash"),  # no: intervening token
            (3, "TABLE! hash."),  # match: normalization first
            (4, "hash table"),  # no: wrong order
        ],
        "doc_id long, text string",
    )
    pp = positional_postings(docs)
    a = pp.filter(F.col("word") == "table").select("doc_id", F.col("pos").alias("pa"))
    b = pp.filter(F.col("word") == "hash").select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb")
    )
    hits = sorted(
        r.doc_id
        for r in a.join(b, (a.doc_id == b.doc_b) & (b.pb == a.pa + 1))
        .select("doc_id")
        .distinct()
        .collect()
    )
    assert hits == [1, 3]


@pytest.mark.parametrize("name", SEARCH_QUERIES)
def test_search_query_matches_oracle(spark, duck, name):
    q = registry.get(name)
    assert_df_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)


def test_doc_tf_vector(spark, duck):
    # tf is a space-joined word:count string (scalar, driver-sortable)
    q = registry.get("search_doc_tf_vector")
    assert_df_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)
    sample = q.fn(spark, SF_DIR).filter("doc_id = 1").head()
    assert sample is not None and ":" in sample.tf


def test_entry_smoke(spark):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"word", "total", "n_docs"}
    # every registered oracle belongs to a registered query
    qs, os_ = mod.queries(), mod.oracle_sql()
    assert set(os_) <= set(qs)


def test_doc_tf_vector_is_map_only(spark):
    """The per-doc TF vector is a per-row sorted run-length fold over
    the tokens artifact: zero Exchange, zero Generate — the former
    shape scanned the whole term-partitioned index and shuffled it on
    doc_id for a 50-doc answer."""
    plan = (
        registry.get("search_doc_tf_vector")
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan
