"""End-to-end training-data curation over the documents fixture.

The LLM-pipeline tier as a user would chain it (each stage is a
registered, oracle-verified query — see COVERAGE.md "North-star
extensions"):

    quality filter  -> drop the bottom quartile + too-short docs
    trained filter  -> drop docs the trained linear classifier scores
                       below the corpus mean (model-based gate)
    exact dedup     -> one canonical doc per content hash
    near dedup      -> drop LSH-verified near-duplicate clusters
    image dedup     -> drop perceptual (dHash) near-duplicate images
    boilerplate     -> drop template-heavy docs (shared-passage frac)
    decontaminate   -> drop docs overlapping the eval split
    LM resample     -> perplexity-stratified keep rates (upsample the
                       high-quality strata under the corpus bigram LM)
    split           -> stable hash-bucket train/val/test assignment
    pack            -> concat-and-chunk into fixed token windows
    shard           -> seed-stable global shuffle into export shards

    python examples/training_data_pipeline.py [sf_dir]

Defaults to /root/testdata/sf0.001. Everything stays a DataFrame until
the final small summary `.collect()`.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_indexing_spark.plans import registry  # noqa: E402
from map_reduce_indexing_spark.session import get_spark  # noqa: E402
from map_reduce_indexing_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="training-data-pipeline", master="local[4]")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    q = lambda name: registry.get(name).fn(spark, sf_dir)  # noqa: E731

    # 1. corpus-relative quality filter (stopword-ratio >= corpus P25):
    #    a per-doc frame of the keepers.
    quality_ids = q("text_quality_filter").select("doc_id")

    # 1b. model-based quality filter: the trained linear classifier
    #     (ridge solved from one-pass sufficient statistics,
    #     operators/classifier.py) keeps docs scoring at/above the
    #     corpus mean. Its synthetic-negative training rows live at
    #     negative doc_ids — restrict to real corpus ids. Kept docs must
    #     pass BOTH the heuristic and the model (the CCNet-style
    #     two-gate stack).
    clf_ids = (
        q("text_classifier_filter")
        .filter(F.col("doc_id") >= 0)
        .select("doc_id")
    )
    quality_ids = quality_ids.join(clf_ids, "doc_id")

    # 2. exact dedup over the real corpus: keep the canonical
    #    (min doc_id) copy per content hash, drop the rest — the same
    #    hash-groupBy shape as the registered dedup_exact query (which
    #    runs over a duplicate-injected test corpus).
    keepers = docs.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("keep_doc")
    )
    exact_losers = (
        docs.select("doc_id", F.md5("text").alias("content_hash"))
        .join(keepers, "content_hash")
        .filter(F.col("doc_id") != F.col("keep_doc"))
        .select("doc_id")
    )

    # 3. near dedup with the QUALITY-AWARE keeper policy: of each
    #    LSH-verified duplicate cluster keep the highest-stopword-ratio
    #    member (the cleanest extraction), not an arbitrary min doc_id
    #    — the registered dedup_cluster_keep_best composition.
    keepers_best = q("dedup_cluster_keep_best").select(
        F.col("keep_doc").alias("doc_id")
    )
    near_dup_losers = (
        q("dedup_clusters")
        .select("doc_id")
        .join(keepers_best, "doc_id", "left_anti")
    )

    # 4. perceptual image dedup: each doc's (synthetic) image is
    #    decoded, dHash-fingerprinted, and Hamming-blocked; of each
    #    near-duplicate image pair the lower doc_id is kept — the
    #    multimodal analogue of stages 2-3, catching re-encoded /
    #    lightly-edited images text dedup can't see.
    image_dup_losers = q("multimodal_dedup_pairs").select(
        F.col("doc_b").alias("doc_id")
    ).distinct()

    # 5. boilerplate filter: drop template-heavy docs — more than half
    #    of their distinct 8-gram passages also appear in other docs
    #    (the substring-level duplication doc-level near-dedup misses).
    boilerplate_losers = (
        q("dedup_boilerplate_frac")
        .filter(F.col("boilerplate_frac") > 0.5)
        .select("doc_id")
    )

    # 6. decontamination: train docs sharing 3-shingles with eval docs.
    contaminated = q("text_decontaminate").select("doc_id").distinct()

    # Sequential funnel: each stage's count is the SURVIVORS after that
    # stage, so the numbers reconcile top to bottom (a doc dropped by
    # two stages is only counted against the first that removed it).
    s1 = quality_ids
    s2 = s1.join(exact_losers, "doc_id", "left_anti")
    s3 = s2.join(near_dup_losers, "doc_id", "left_anti")
    s3b = s3.join(image_dup_losers, "doc_id", "left_anti")
    s4 = s3b.join(boilerplate_losers, "doc_id", "left_anti")
    kept = s4.join(contaminated, "doc_id", "left_anti")

    # 6b. perplexity-stratified resampling: the surviving docs are
    #     scored under the corpus bigram LM (registered scorer — reads
    #     the persisted lm_counts artifact), stratified into deciles
    #     by broadcast percentile cutpoints (map-only range lookup —
    #     the scale-safe form, no global window), and kept at a
    #     per-decile rate (decile d keeps d*10% via the engine's
    #     seed-stable md5 coin) — quality-weighted mixture, same
    #     primitives as the registered text_lm_resample contract.
    #     Docs too short to have bigrams carry no LM evidence and pass
    #     through unresampled.
    from map_reduce_indexing_spark.operators.textstats import (
        _RESAMPLE_PCTS,
        RESAMPLE_DECILES,
        RESAMPLE_SEED,
    )

    scored = q("text_lm_score").select("doc_id", F.col("avg_logp").alias("s"))
    scored_kept = kept.join(scored, "doc_id")
    unscored_kept = kept.join(scored, "doc_id", "left_anti")
    cuts = scored_kept.agg(
        F.transform(
            F.percentile("s", F.array(*[F.lit(p) for p in _RESAMPLE_PCTS])),
            lambda c: F.round(c, 6),
        ).alias("cs")
    )
    scored_kept = scored_kept.crossJoin(F.broadcast(cuts))
    dec = F.lit(1) + F.size(F.filter("cs", lambda c: F.col("s") > c))
    coin = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(f":{RESAMPLE_SEED}"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    resampled = (
        scored_kept.withColumn("decile", dec)
        .filter(coin < F.col("decile") * RESAMPLE_DECILES)
        .select("doc_id")
        .union(unscored_kept.select("doc_id"))
    )

    # 7. stable split assignment for the kept docs — the engine's
    #    SPLIT_PCT thresholds, so assignments agree with
    #    text_train_val_test_split and text_decontaminate's eval set.
    from map_reduce_indexing_spark.operators.textstats import SPLIT_PCT

    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = resampled.select(
        "doc_id",
        F.when(bucket < SPLIT_PCT[0], "train")
        .when(bucket < SPLIT_PCT[0] + SPLIT_PCT[1], "val")
        .otherwise("test")
        .alias("split"),
    )

    # 8. pack into fixed token windows. NOTE: the registered query packs
    #    the FULL corpus (it is a standalone oracle-checked operator);
    #    in a production pipeline this stage would run over the kept
    #    train split — the count below is reported as full-corpus.
    packed = q("text_pack_sequences")

    # 9. export shuffle: a seed-stable pseudo-random permutation of the
    #    kept train docs into N shards — shard = md5(doc_id:seed) mod N,
    #    within-shard order = the md5 itself, so the write below is a
    #    plain hash partition + local sort (one exchange, no global
    #    sort) and reproduces bit-for-bit on any cluster size.
    from map_reduce_indexing_spark.operators.textstats import (
        shard_id_col,
        shuffle_hash_col,
    )

    train = split.filter(F.col("split") == "train").select("doc_id")
    sharded = train.select(
        "doc_id",
        shuffle_hash_col().alias("h"),
    ).withColumn("shard_id", shard_id_col(F.col("h")))
    shard_sizes = (
        sharded.groupBy("shard_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )

    # 10. the DURABLE export (full-corpus demo of sources/export.py):
    #     one file per shard in the pinned physical order, manifest
    #     sidecar computed by reading back the landed files, verified.
    import tempfile

    from map_reduce_indexing_spark.sources.export import (
        export_shards,
        verify_export,
    )

    out = os.path.join(tempfile.mkdtemp(prefix="mri_export_"), "shards")
    manifest = export_shards(spark, sf_dir, out)
    assert verify_export(spark, out) == {}

    summary = {
        "docs_in": n0,
        "after_quality": s1.count(),
        "after_exact_dedup": s2.count(),
        "after_near_dedup": s3.count(),
        "after_image_dedup": s3b.count(),
        "after_boilerplate": s4.count(),
        "kept_after_decontam": kept.count(),
        "kept_after_lm_resample": resampled.count(),
        "splits": {
            r["split"]: r["n"]
            for r in split.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        },
        "packed_sequences_full_corpus": packed.count(),
        "train_export_shards": {
            "n_shards": len(shard_sizes),
            "docs": sum(r["n"] for r in shard_sizes),
        },
        "durable_export": {
            "shards": len(manifest["shards"]),
            "docs": manifest["total_docs"],
            "verified": True,
        },
    }
    print(summary)
    spark.stop()


if __name__ == "__main__":
    main()
