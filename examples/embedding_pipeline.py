"""End-to-end embedding curation + serving over the embeddings fixture
— the vector-side twin of training_data_pipeline.py. Every model here
is TRAINED by a registered, oracle-verified operator; every stage
composes the same build-then-query artifacts the queries serve from:

    quantizer      -> Lloyd k-means coarse quantizer (ann_kmeans_train)
    semantic dedup -> drop the higher vec_id of each within-cell
                      near-dup pair (dedup_semantic_pairs, SemDeDup)
    store          -> VectorStore.build(layout="ivf",
                      centroids=<trained>, pq=True): kept vectors,
                      cell-partitioned, 4-bit PQ codes + sidecars
    serve          -> topk probes via exact and PQ (ADC + re-rank)
    encoder        -> PCA trained from exact moments (ann_pca_train ->
                      pca_components), map-only projection to k dims

    python examples/embedding_pipeline.py [sf_dir]

Defaults to /root/testdata/sf0.001. Everything stays a DataFrame until
the bounded summary collects (model fetches and top-k results).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_indexing_spark.api import VectorStore  # noqa: E402
from map_reduce_indexing_spark.plans import registry  # noqa: E402
from map_reduce_indexing_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="embedding-pipeline", master="local[4]")

    from map_reduce_indexing_spark.operators.similarity import (
        embeddings_double,
        pca_components,
        pca_project,
        trained_quantizer,
    )

    vecs = embeddings_double(spark, sf_dir).select("vec_id", "v")
    n0 = vecs.count()

    # 1. train the coarse quantizer once; every later stage serves it.
    cents = trained_quantizer(spark, sf_dir)

    # 2. semantic dedup: within-trained-cell near-dup pairs; keep the
    #    lower vec_id of each pair (the registered SemDeDup operator).
    losers = (
        registry.get("dedup_semantic_pairs")
        .fn(spark, sf_dir)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    kept = vecs.join(losers, "vec_id", "left_anti")

    # 3. maintained store over the KEPT vectors: IVF layout routed by
    #    the trained quantizer, PQ codes + codebook sidecar for the
    #    compressed serving tier.
    store_path = os.path.join(
        tempfile.mkdtemp(prefix="mri_emb_pipeline_"), "store"
    )
    vs = VectorStore.build(
        spark, kept, store_path, layout="ivf", centroids=cents, pq=True
    )

    # 4. serve one probe both ways from the same store.
    probe = [float(x) for x in vecs.orderBy("vec_id").first().v]
    exact = vs.topk(probe, k=5, serving="exact").collect()
    pq = vs.topk(probe, k=5, serving="pq").collect()

    # 5. train the PCA encoder (exact-moment statistics pass) and
    #    project the kept vectors to PCA_K dims — the data-derived
    #    encoder a downstream ANN/clustering stage would consume.
    comps, evals, mean = pca_components(spark, sf_dir)
    projected = pca_project(kept, comps, mean)
    total_var = float(
        sum(evals)
    )  # top-k explained variance, for the summary

    summary = {
        "vectors_in": n0,
        "semantic_dups_dropped": n0 - kept.count(),
        "store_cells": vs.vectors().select("cell").distinct().count(),
        "exact_top5": [r.vec_id for r in exact],
        "pq_top5": [r.vec_id for r in pq],
        "pca_dims": len(comps),
        "pca_topk_variance": round(total_var, 6),
        "projected_rows": projected.count(),
    }
    print(summary)
    spark.stop()


if __name__ == "__main__":
    main()
