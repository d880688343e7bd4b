"""Indexing pipeline: golden semantics, partitioned index write + pruning,
and oracle parity for the registered index queries."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from map_reduce_indexing_spark.operators.indexing import (
    build_postings,
    read_index,
    with_letter,
    write_index,
)
from map_reduce_indexing_spark.operators.search import term_lookup
from map_reduce_indexing_spark.plans import registry

from .conftest import SF_DIR, assert_df_matches_oracle
from .test_tokenizer import python_tokens


def test_build_postings_golden(spark):
    docs = [
        (1, "the cat sat\tthe cat"),  # tab does not split: "sat\tthe" -> satthe
        (2, "Dog! dog DOG 42"),
        (3, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.word, r.doc_id): r.cnt for r in build_postings(df).collect()}
    expected: dict[tuple[str, int], int] = collections.Counter()
    for doc_id, text in docs:
        for t in python_tokens(text):
            expected[(t, doc_id)] += 1
    assert got == dict(expected)
    # the tab case specifically
    assert got[("satthe", 1)] == 1
    assert ("sat", 1) not in got


def test_index_write_and_pruned_lookup(spark, tmp_path):
    path = str(tmp_path / "index")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    postings = build_postings(docs)
    write_index(postings, path)
    idx = read_index(spark, path)
    # letter column materialized as a partition and lookup prunes on it
    hit = term_lookup(idx, "spark")
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "letter" in plan
    # same answer as recomputing from source
    direct = postings.filter(F.col("word") == "spark").select("doc_id", "cnt")
    assert sorted((r.doc_id, r.cnt) for r in hit.select("doc_id", "cnt").collect()) == sorted(
        (r.doc_id, r.cnt) for r in direct.collect()
    )
    # append mode works (the reference's fopen(.., "a+") helper_reduce.c:241)
    write_index(postings, path, mode="append")
    assert read_index(spark, path).count() == 2 * postings.count()


def test_registered_index_queries_match_oracle(spark, duck):
    for name in (
        "index_postings",
        "index_corpus_stats",
        "index_letter_histogram",
        "index_vocabulary_topk",
    ):
        q = registry.get(name)
        assert_df_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)
