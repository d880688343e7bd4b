"""Same-session A/B: the registered q_dedup_incremental_lsh_pairs vs
a byte-identical inline rebuild, alternated — plus a pass after
priming the session with the other demo artifacts (the bench runs all
59 headliners in one session). Isolates whether the slow mode lives
in the query, the artifact lookups, or accumulated session state."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_indexing_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="mri-triage-ab")
    from map_reduce_indexing_spark.operators.dedup import (
        SHINGLE_K,
        _sig_bands,
        documents_incremental_store,
        minhash_signatures,
        q_dedup_incremental_lsh_pairs,
        session_signatures,
    )
    from map_reduce_indexing_spark.operators.tokens import (
        _null_fill,
        build_tokenized_docs,
        gram_expr,
    )
    from map_reduce_indexing_spark.sources.generations import generation_diff

    def inline():
        store = documents_incremental_store(spark, SF_DIR)
        batch = generation_diff(spark, store, since=1, until=2)
        shingles = build_tokenized_docs(_null_fill(batch)).select(
            "doc_id",
            F.explode(F.expr(gram_expr(SHINGLE_K, True))).alias("s"),
        )
        delta_bands = _sig_bands(
            minhash_signatures(spark, SF_DIR, shingles=shingles)
        )
        corpus_bands = _sig_bands(session_signatures(spark, SF_DIR))
        pairs = corpus_bands.alias("a").join(
            F.broadcast(delta_bands.alias("b")),
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col("a.doc_id") != F.col("b.doc_id"),
            ],
        )
        return pairs.select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
        ).distinct()

    rep = {}
    # warm both
    noop(q_dedup_incremental_lsh_pairs(spark, SF_DIR))
    noop(inline())
    qa, qb = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        noop(q_dedup_incremental_lsh_pairs(spark, SF_DIR))
        qa.append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        noop(inline())
        qb.append(round(time.perf_counter() - t0, 3))
    rep["registered_fresh_session"] = qa
    rep["inline_fresh_session"] = qb

    # prime the session the way the bench does: the hist demo + a few
    # heavy artifact builds land in the same JVM
    from map_reduce_indexing_spark.operators.relational_extra import (
        orders_hist_demo,
    )

    orders_hist_demo(spark, SF_DIR)
    qc = []
    for _ in range(5):
        t0 = time.perf_counter()
        noop(q_dedup_incremental_lsh_pairs(spark, SF_DIR))
        qc.append(round(time.perf_counter() - t0, 3))
    rep["registered_after_hist_demo"] = qc
    print(json.dumps(rep, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
