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


# ---------------------------------------------------------------------------
# Related documents (search_related_docs)
# ---------------------------------------------------------------------------


def test_related_docs_semantics_and_monotone_ranks(spark):
    from map_reduce_indexing_spark.operators.search import (
        RELATED_QUERY_MAX,
        RELATED_TOPK,
    )

    rows = registry.get("search_related_docs").fn(spark, SF_DIR).collect()
    assert rows
    by_a: dict[int, list] = {}
    for r in rows:
        assert r.doc_a < RELATED_QUERY_MAX
        assert r.doc_b != r.doc_a
        assert -1.000001 <= r.cosine <= 1.000001
        by_a.setdefault(r.doc_a, []).append(r)
    for _doc_a, rs in by_a.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= RELATED_TOPK
        # scores non-increasing with rank
        for lo, hi in zip(rs, rs[1:]):
            assert lo.cosine >= hi.cosine


def test_related_docs_agree_with_dense_vectors(spark):
    """Independent reference: materialize each doc's TF-IDF vector
    driver-side (dict over words) and recompute every query doc's
    top-k by exact cosine — the posting-join formulation must agree on
    the winning SETS at each distinct score level (ties broken by
    doc_b both sides)."""
    import math

    from map_reduce_indexing_spark.operators.indexing import (
        indexed_postings,
    )
    from map_reduce_indexing_spark.operators.search import (
        RELATED_QUERY_MAX,
        RELATED_TOPK,
    )

    p = indexed_postings(spark, SF_DIR).select("word", "doc_id", "cnt").collect()
    docs: dict[int, dict[str, int]] = {}
    df: dict[str, int] = {}
    for r in p:
        docs.setdefault(r.doc_id, {})[r.word] = r.cnt
        df[r.word] = df.get(r.word, 0) + 1
    n = len(docs)
    vecs = {
        d: {w: c * math.log(n / df[w]) for w, c in ws.items()}
        for d, ws in docs.items()
    }
    nrm = {d: math.sqrt(sum(x * x for x in v.values())) for d, v in vecs.items()}
    got = {}
    for r in registry.get("search_related_docs").fn(spark, SF_DIR).collect():
        got.setdefault(r.doc_a, []).append((r.rank, r.doc_b, r.cosine))
    assert got
    for qa, rs in got.items():
        sims = []
        for db, v in vecs.items():
            if db == qa or nrm[db] == 0 or nrm[qa] == 0:
                continue
            dot = sum(wt * vecs[qa][w] for w, wt in v.items() if w in vecs[qa])
            sims.append((round(dot / (nrm[qa] * nrm[db]), 6), db))
        sims.sort(key=lambda t: (-t[0], t[1]))
        want = [(i + 1, db, c) for i, (c, db) in enumerate(sims[:RELATED_TOPK])]
        for (gr, gb, gc), (wr, wb, wc) in zip(sorted(rs), want):
            assert gr == wr and gb == wb
            assert abs(gc - wc) < 2e-6  # driver float sum vs decimal sum


def test_related_docs_plan_no_cartesian(spark):
    df = registry.get("search_related_docs").fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
