"""Deeper split of dedup_incremental_lsh_pairs' slow mode: time the
join under different strategies and with/without distinct, plus the
broadcast build (driver collect) alone. Not part of the graded
surface."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_indexing_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(os.environ.get("TRIAGE_SAMPLES", "5"))


def timed(fn, n=N):
    fn()
    xs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        xs.append(round(time.perf_counter() - t0, 3))
    return {"median": sorted(xs)[len(xs) // 2], "samples": xs}


def main() -> None:
    spark = get_spark(app_name="mri-triage-lsh")
    from map_reduce_indexing_spark.operators.dedup import (
        SHINGLE_K,
        _sig_bands,
        documents_incremental_store,
        minhash_signatures,
        session_signatures,
    )
    from map_reduce_indexing_spark.operators.tokens import (
        _null_fill,
        build_tokenized_docs,
        gram_expr,
    )
    from map_reduce_indexing_spark.sources.generations import generation_diff

    store = documents_incremental_store(spark, SF_DIR)

    def delta_bands():
        batch = generation_diff(spark, store, since=1, until=2)
        shingles = build_tokenized_docs(_null_fill(batch)).select(
            "doc_id",
            F.explode(F.expr(gram_expr(SHINGLE_K, True))).alias("s"),
        )
        return _sig_bands(
            minhash_signatures(spark, SF_DIR, shingles=shingles)
        )

    def corpus_bands():
        return _sig_bands(session_signatures(spark, SF_DIR))

    n_delta = delta_bands().count()
    n_corpus = corpus_bands().count()
    rep = {"n_delta_bands": n_delta, "n_corpus_bands": n_corpus}

    def join(db, hint):
        b = db.alias("b")
        if hint == "broadcast":
            b = F.broadcast(b)
        elif hint:
            b = b.hint(hint)
        return (
            corpus_bands()
            .alias("a")
            .join(
                b,
                on=[
                    F.col("a.band_idx") == F.col("b.band_idx"),
                    F.col("a.band_hash") == F.col("b.band_hash"),
                    F.col("a.doc_id") != F.col("b.doc_id"),
                ],
            )
            .select(
                F.least("a.doc_id", "b.doc_id").alias("doc_a"),
                F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
            )
        )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    rep["collect_delta_bands"] = timed(lambda: delta_bands().collect())
    rep["join_bcast_nodistinct"] = timed(
        lambda: noop(join(delta_bands(), "broadcast"))
    )
    rep["join_bcast_distinct"] = timed(
        lambda: noop(join(delta_bands(), "broadcast").distinct())
    )
    rep["join_smj_distinct"] = timed(
        lambda: noop(join(delta_bands(), "merge").distinct())
    )
    rep["join_shuffle_hash_distinct"] = timed(
        lambda: noop(join(delta_bands(), "shuffle_hash").distinct())
    )
    # pre-materialized delta (what a cached artifact would look like)
    mat = delta_bands().localCheckpoint(eager=True)
    rep["join_bcast_distinct_premat"] = timed(
        lambda: noop(join(mat, "broadcast").distinct())
    )
    print(json.dumps(rep, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
