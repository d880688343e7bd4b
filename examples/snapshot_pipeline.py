"""Snapshot-isolated maintenance: train on generation S while ingest
continues (round 9, sources/generations.py).

The scenario every long-lived training-data store hits: a curation /
training job takes minutes-to-hours and must see ONE consistent view
of the corpus, while ingest keeps appending and a compactor
periodically rewrites the files underneath it. Generations give that
without stopping either side:

1. build an index + a vector store, append a batch, PIN the head
   generation;
2. keep appending + compacting (the full maintenance lifecycle);
3. the pinned reads — postings_at(g), vectors_at(g) — return exactly
   the rows generation g had, across every later mutation, while the
   live reads see everything.

    python examples/snapshot_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_indexing_spark.api import IndexSession, VectorStore  # noqa: E402
from map_reduce_indexing_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="snapshot-pipeline")
    work = tempfile.mkdtemp(prefix="mri_snapshot_")

    def docs(lo: int, n: int, word: str):
        return spark.createDataFrame(
            [(lo + i, f"{word} shared corpus text") for i in range(n)],
            "doc_id long, text string",
        )

    # -- index: pin, then churn --------------------------------------------
    idx = IndexSession.build(spark, docs(0, 50, "alpha"), os.path.join(work, "idx"))
    idx.append(docs(100, 20, "beta"))
    pin = idx.generation()
    pinned_docs = idx.postings_at(pin).select("doc_id").distinct().count()

    idx.append(docs(200, 30, "gamma"))  # ingest continues...
    idx.compact()  # ...and maintenance rewrites the files
    idx.append(docs(300, 10, "delta"))

    stable = idx.postings_at(pin).select("doc_id").distinct().count()
    live = idx.postings().select("doc_id").distinct().count()
    assert stable == pinned_docs == 70, (stable, pinned_docs)
    assert live == 110, live

    # -- vector store: the training-input pin ------------------------------
    vs = VectorStore.build(
        spark,
        spark.createDataFrame(
            [(i, [float((i * d) % 7) for d in range(64)]) for i in range(100)],
            "vec_id long, v array<double>",
        ),
        os.path.join(work, "store"),
    )
    vs.append(
        spark.createDataFrame(
            [(1000, [1.0] * 64)], "vec_id long, v array<double>"
        )
    )
    vpin = vs.generation()
    train_view = vs.vectors_at(vpin)  # what a trainer would read
    n_train = train_view.count()
    vs.append(
        spark.createDataFrame(
            [(2000, [2.0] * 64)], "vec_id long, v array<double>"
        )
    )
    vs.compact()
    assert vs.vectors_at(vpin).count() == n_train == 101
    assert vs.vectors_at().count() == 102

    print(
        {
            "index_pin": pin,
            "index_docs_pinned": stable,
            "index_docs_live": live,
            "store_pin": vpin,
            "store_rows_pinned": n_train,
            "store_rows_live": 102,
        }
    )


if __name__ == "__main__":
    main()
