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
]


@pytest.mark.parametrize("name", SEARCH_QUERIES)
def test_search_query_matches_oracle(spark, duck, name):
    q = registry.get(name)
    assert_df_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)


def test_doc_tf_vector(spark, duck):
    q = registry.get("search_doc_tf_vector")
    sp = q.fn(spark, SF_DIR).toPandas()
    du = duck.execute(q.oracle).fetchdf()
    sp["tf"] = sp["tf"].map(list)
    du["tf"] = du["tf"].map(list)
    sp = sp.sort_values("doc_id", ignore_index=True)
    du = du.sort_values("doc_id", ignore_index=True)
    assert sp["doc_id"].tolist() == du["doc_id"].tolist()
    assert sp["tf"].tolist() == du["tf"].tolist()


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
