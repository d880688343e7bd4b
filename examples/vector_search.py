"""Similarity search over a MAINTAINED vector store.

The ANN tier as a user would run it in production: build a
bucket-partitioned store at a path of your choosing, serve top-k
lookups from it (one pruned partition scan each), keep ingesting new
vectors, and compact when the per-bucket file counts grow — the same
build / append / compact lifecycle the inverted index has, with the
same flock-serialized writers and crash-safe compaction swap.

    python examples/vector_search.py [sf_dir]

Defaults to /root/testdata/sf0.001. The store lands in a temp
directory; point the path at shared storage on a real cluster.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_indexing_spark.api import VectorStore  # noqa: E402
from map_reduce_indexing_spark.session import get_spark  # noqa: E402
from map_reduce_indexing_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="vector-search", master="local[4]")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    workdir = tempfile.mkdtemp(prefix="mri_example_vstore_")
    path = os.path.join(workdir, "vectors")
    try:
        # Build from the first half of the fixture...
        half = emb.agg(F.max("vec_id")).head()[0] // 2
        vs = VectorStore.build(spark, emb.filter(F.col("vec_id") <= half), path)
        probe = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().v]

        print("== top-5 neighbors from the freshly built store ==")
        vs.topk(probe, k=5).show()

        # ...ingest the rest incrementally: immediately visible,
        # still one pruned bucket scan per lookup.
        vs.append(emb.filter(F.col("vec_id") > half))
        print("== top-5 after appending the second half ==")
        vs.topk(probe, k=5).show()

        # Fold the appended partials back to one file per bucket.
        vs.compact()
        print("== same answer after compaction ==")
        vs.topk(probe, k=5).show()
        print(f"store rows: {vs.vectors().count()}")

        # The same lifecycle runs on the IVF layout: partition on the
        # nearest coarse centroid instead of the hyperplane bucket
        # (recall/latency trade — fewer, larger cells). append/compact/
        # topk infer the layout from the store's directories.
        ivf = VectorStore.build(
            spark,
            emb.filter(F.col("vec_id") <= half),
            os.path.join(workdir, "vectors_ivf"),
            layout="ivf",
        )
        ivf.append(emb.filter(F.col("vec_id") > half))
        print("== IVF-layout store: top-5 from one pruned cell scan ==")
        ivf.topk(probe, k=5).show()

        # Train the quantizer instead of using the pinned centroids:
        # Lloyd's k-means over the corpus, and the trained model is
        # persisted INSIDE the store — every later append, lookup,
        # streaming ingest, and compaction of this path routes with it
        # automatically (train once, the store carries its model).
        from map_reduce_indexing_spark.operators.similarity import (
            train_kmeans,
        )

        cents = train_kmeans(spark, sf_dir)
        trained = VectorStore.build(
            spark,
            emb,
            os.path.join(workdir, "vectors_trained"),
            layout="ivf",
            centroids=cents,
        )
        print("== trained-quantizer store: top-5 from the trained cell ==")
        trained.topk(probe, k=5).show()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
