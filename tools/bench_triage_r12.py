"""Round-12 bench triage (VERDICT r11, task 1): the driver's
BENCH_r11.json showed two rows far above its run's 1.15x box factor —
rel_matview_hist_quantile (3.1x normalized; its code DID change in
r11: the single-pass rewrite) and dedup_incremental_lsh_pairs (19.5x,
bimodal 1.2s-15.9s; untouched code). This tool produces the evidence
VERDICT asked for:

  A. hist_quantile head-to-head: the r11 single-pass form vs the r10
     union form, inlined, over the SAME materialized view, >=5 timed
     samples each — is the rewrite itself slower at sf0.1?
  B. dedup_incremental_lsh_pairs: >=6 timed end-to-end samples plus
     per-stage splits (store diff + delta signatures / corpus
     signature artifact scan / band join) — does the 15 s mode
     reproduce, and if so where does it live?

Run: python tools/bench_triage_r12.py [sf_dir] (default sf0.1).
Prints one JSON document. Not part of the graded surface.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from map_reduce_indexing_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(os.environ.get("TRIAGE_SAMPLES", "6"))


def timed(fn, n=N) -> dict:
    fn()  # warmup
    xs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        xs.append(round(time.perf_counter() - t0, 3))
    return {
        "median": sorted(xs)[len(xs) // 2],
        "min": min(xs),
        "max": max(xs),
        "samples": xs,
    }


def noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def hist_quantile_r10_union(df, name, op, key_cols, ps) -> DataFrame:
    """The pre-r11 union form, verbatim shape (one filtered-window
    branch per percentile) for the head-to-head."""
    from map_reduce_indexing_spark.operators.matview import _hist_params

    lo, hi, nb = _hist_params(op)
    w = (hi - lo) / nb
    b = df.select(
        *key_cols, F.posexplode(F.slice(F.col(name), 2, nb)).alias("_i", "_n")
    )
    grp = Window.partitionBy(*key_cols)
    win = grp.orderBy("_i")
    b = b.withColumn("_cum", F.sum("_n").over(win)).withColumn(
        "_tot", F.sum("_n").over(grp)
    )
    out = None
    for p in ps:
        target = F.lit(float(p)) * F.col("_tot").cast("double")
        hit = (
            b.filter(
                (F.col("_tot") > 0)
                & (F.col("_n") > 0)
                & (F.col("_cum").cast("double") >= target)
            )
            .withColumn("_rk", F.row_number().over(win))
            .filter(F.col("_rk") == 1)
        )
        q = F.lit(lo) + F.lit(w) * (
            F.col("_i").cast("double")
            + (target - (F.col("_cum") - F.col("_n")).cast("double"))
            / F.col("_n").cast("double")
        )
        one = hit.select(*key_cols, F.lit(float(p)).alias("p"), q.alias("q"))
        out = one if out is None else out.unionByName(one)
    return out


def main() -> None:
    spark = get_spark(app_name="mri-triage-r12")
    report: dict = {"sf_dir": SF_DIR, "n_samples": N}

    # --- A. hist_quantile head-to-head ---------------------------------
    from map_reduce_indexing_spark.operators.matview import (
        hist_quantile,
        read_matview,
    )
    from map_reduce_indexing_spark.operators.relational_extra import (
        _HIST_OP,
        orders_hist_demo,
    )

    root = orders_hist_demo(spark, SF_DIR)  # artifact: built once, unmeasured
    view = os.path.join(root, "view")

    def run_new():
        noop(
            hist_quantile(
                read_matview(spark, view),
                "price_hist",
                _HIST_OP,
                ["o_orderpriority"],
                [0.5, 0.95],
            )
        )

    def run_r10():
        noop(
            hist_quantile_r10_union(
                read_matview(spark, view),
                "price_hist",
                _HIST_OP,
                ["o_orderpriority"],
                [0.5, 0.95],
            )
        )

    report["hist_quantile_single_pass_r11"] = timed(run_new)
    report["hist_quantile_union_r10"] = timed(run_r10)

    # --- B. dedup_incremental_lsh_pairs --------------------------------
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

    store = documents_incremental_store(spark, SF_DIR)  # artifact warm

    def stage_delta_sigs():
        batch = generation_diff(spark, store, since=1, until=2)
        shingles = build_tokenized_docs(_null_fill(batch)).select(
            "doc_id", F.explode(F.expr(gram_expr(SHINGLE_K, True))).alias("s")
        )
        noop(
            _sig_bands(minhash_signatures(spark, SF_DIR, shingles=shingles))
        )

    def stage_corpus_scan():
        noop(_sig_bands(session_signatures(spark, SF_DIR)))

    def full_query():
        noop(q_dedup_incremental_lsh_pairs(spark, SF_DIR))

    report["incr_lsh_stage_delta_signatures"] = timed(stage_delta_sigs)
    report["incr_lsh_stage_corpus_band_scan"] = timed(stage_corpus_scan)
    report["incr_lsh_full"] = timed(full_query, n=max(N, 8))

    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
