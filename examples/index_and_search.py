"""End-to-end: the reference's workflow on this engine.

The reference's user runs `client <host> <port> <docpath>` per document
and greps ./index/<letter> afterwards (SURVEY.md §3.1). Here the same
workflow is one script: point it at a directory tree of text files
(`<collection>/<doc>.txt`, the reference's data/ layout), and it builds
the letter-partitioned parquet index and runs the implied query surface
over it.

    python examples/index_and_search.py /root/reference/data /tmp/mri_index
    python examples/index_and_search.py --demo   # tiny built-in corpus

(The reference corpus path works wherever a data/ tree exists; --demo
needs nothing.)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_indexing_spark.operators.indexing import (  # noqa: E402
    build_postings,
    compact_index,
    read_index,
    write_index,
)
from map_reduce_indexing_spark.operators.search import (  # noqa: E402
    search_and,
    search_not,
    term_lookup,
)
from map_reduce_indexing_spark.session import get_spark  # noqa: E402
from map_reduce_indexing_spark.sources.corpus import read_corpus_dir  # noqa: E402

DEMO_DOCS = {
    ("comedies", "tempest.txt"): "We are such stuff as dreams are made on",
    ("tragedies", "hamlet.txt"): "To be or not to be that is the question",
    ("tragedies", "macbeth.txt"): "Double double toil and trouble fire burn",
}


def main() -> None:
    if "--demo" in sys.argv:
        root = tempfile.mkdtemp(prefix="mri_demo_corpus_")
        for (coll, name), text in DEMO_DOCS.items():
            os.makedirs(os.path.join(root, coll), exist_ok=True)
            with open(os.path.join(root, coll, name), "w") as f:
                f.write(text)
        corpus_dir, index_path = root, tempfile.mkdtemp(prefix="mri_demo_index_")
    elif len(sys.argv) < 2:
        print(
            "usage: python examples/index_and_search.py <corpus_dir> [index_path]\n"
            "       (corpus layout: <corpus_dir>/<collection>/<file>.txt)\n"
            "       or: python examples/index_and_search.py --demo",
            file=sys.stderr,
        )
        sys.exit(2)
    else:
        corpus_dir = sys.argv[1]
        index_path = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="mri_index_")

    spark = get_spark(app_name="mri-example")

    # 1. Index: what took the reference 6 processes + 2 daemons (§3.1)
    corpus = read_corpus_dir(spark, os.path.join(corpus_dir, "*", "*"))
    postings = build_postings(corpus, doc_col="doc_id")
    write_index(postings, index_path)
    compact_index(spark, index_path)  # no-op merge here; shown for the workflow
    idx = read_index(spark, index_path)
    n_words = idx.select("word").distinct().count()
    print(f"indexed {corpus.count()} docs -> {idx.count()} postings, {n_words} words")

    # 2. Query surface the index implies
    probe = idx.groupBy("word").count().orderBy(F.desc("count")).first()["word"]
    print(f"\nterm_lookup({probe!r}):")
    term_lookup(idx, probe).orderBy(F.desc("cnt")).show(5, truncate=False)

    top2 = [r["word"] for r in idx.groupBy("word").count().orderBy(F.desc("count")).take(2)]
    print(f"AND search {top2}:")
    search_and(idx, top2).show(5, truncate=False)
    print(f"NOT search ({top2[0]} AND NOT {top2[1]}):")
    search_not(idx, top2[0], top2[1]).show(5, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
