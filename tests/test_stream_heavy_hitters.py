"""Streaming heavy hitters: MG summaries as keyed stream state.

The registered query is oracle-checked by the sweep; pinned here is
what the single-file fixture can't show — state carried ACROSS
microbatches (multi-file staged corpus, maxFilesPerTrigger=1), arrival
-order independence (the same corpus in shuffled file order converges
to the identical exact answer), and the O(k)-per-range state bound
(every emitted snapshot's live counter count <= k).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from map_reduce_indexing_spark.operators.heavyhitters import (
    PHI_DEN,
    PHI_NUM,
    exact_heavy_hitters,
)
from map_reduce_indexing_spark.operators.tokens import token_rows
from map_reduce_indexing_spark.streaming.events import (
    HH_RANGES,
    run_to_completion,
    streaming_token_summaries,
)
from tests.conftest import SF_DIR


def _stage_files(spark, dest: str, order):
    """Write each doc-id slice of the fixture as its own parquet file,
    named so the file source lists them in `order`."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    table = os.path.join(dest, "documents.parquet")
    os.makedirs(table)
    for pos, (lo, hi) in enumerate(order):
        part = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        part.coalesce(1).write.parquet(os.path.join(dest, f"tmp{pos}"))
        src = next(
            f
            for f in os.listdir(os.path.join(dest, f"tmp{pos}"))
            if f.endswith(".parquet")
        )
        os.rename(
            os.path.join(dest, f"tmp{pos}", src),
            os.path.join(table, f"part-{pos:03d}.parquet"),
        )


def _final_hitters(spark, sf_dir):
    # staged corpora hold part-NNN.parquet under documents.parquet/;
    # the file source does not recurse, so stream the TABLE directory
    # and glob by extension (the fixture's single-file layout instead
    # streams sf_dir globbing the one file by name)
    updates = run_to_completion(
        streaming_token_summaries(
            spark,
            os.path.join(sf_dir, "documents.parquet"),
            glob="*.parquet",
            max_files_per_trigger=1,
        ),
        "update",
    )
    k = 2 * PHI_DEN // PHI_NUM
    rows = updates.collect()
    assert rows, "no summary snapshots emitted"
    assert max(r["n_state"] for r in rows) <= k  # O(k) state per range
    assert {r["rng"] for r in rows} <= set(range(HH_RANGES))
    n_batches = max(r["version"] for r in rows)
    last = {}
    for r in rows:
        if r["rng"] not in last or r["version"] > last[r["rng"]][0]:
            last[r["rng"]] = (r["version"], r["cands"])
    cand_words = {
        w for _, cands in last.values() for w in cands.split() if w
    }
    # exact recount of candidates only, same threshold as the batch op
    tokens = token_rows(spark, sf_dir, out_col="word").select("word")
    n_total = tokens.count()
    thresh = (n_total * PHI_NUM + PHI_DEN - 1) // PHI_DEN
    counts = (
        tokens.filter(F.col("word").isin(list(cand_words)))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    return (
        {(r["word"], r["cnt"]) for r in counts if r["cnt"] >= thresh},
        n_batches,
    )


def test_multibatch_state_and_order_independence(spark, tmp_path):
    fwd = str(tmp_path / "fwd")
    rev = str(tmp_path / "rev")
    slices = [(0, 120), (120, 260), (260, 10**9)]
    _stage_files(spark, fwd, slices)
    _stage_files(spark, rev, list(reversed(slices)))

    exact = {
        (r["word"], r["cnt"])
        for r in exact_heavy_hitters(
            token_rows(spark, fwd, out_col="word").select("word"), "word"
        ).collect()
    }
    assert exact, "fixture has no heavy hitters?"

    got_fwd, batches_fwd = _final_hitters(spark, fwd)
    got_rev, batches_rev = _final_hitters(spark, rev)
    assert batches_fwd >= 3 and batches_rev >= 3  # state really crossed batches
    assert got_fwd == exact
    assert got_rev == exact  # arrival order changes nothing
