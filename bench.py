"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON line (metric, total, per-query medians) as the
FINAL stdout line, and writes the full payload (per-query min/max
spread, pre/post contention markers) to BENCH_LOCAL_r{N}.json next to
this file. The split exists because the round driver archives only the
last 2000 characters of stdout: round 6's single fat line outgrew that
budget and the archived JSON was front-truncated, unparseable by
tools/compare_bench.py. The compact line fits the tail budget; the
local file carries everything and compare_bench prefers it (the
compact line names it in its "local" field).

Each query is forced end-to-end with the noop sink (full computation,
no driver-side collect). Run `python bench.py --explain` to dump the
formatted physical plan of every headline query instead of timing it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from map_reduce_indexing_spark.plans import registry  # noqa: E402
from map_reduce_indexing_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per tier, heaviest representatives.
HEADLINE = [
    "index_postings",          # the reference's entire pipeline
    "index_vocabulary_topk",   # index + global ranking
    "search_and",              # boolean search join
    "rel_q1_pricing_summary",  # wide agg
    "rel_q3_shipping_priority",  # 3-way join + topk
    "rel_q5_local_supplier",   # 6-way star join
    "rel_q18_large_orders",    # join + agg + having + topk
    "rel_join_asof",           # as-of join (union+window)
    "rel_window_running_total",  # window
    "dedup_exact_kept",        # content-hash dedup
    "dedup_minhash_signatures",  # sketch build (array-expr pipeline)
    "dedup_minhash_lsh_pairs",  # LSH band join
    "dedup_simhash",           # simhash build
    "ann_knn_bruteforce",      # dense similarity
    "ann_lsh_topk",            # bucketed ANN
    "text_quality",            # quality metrics pass
    "text_token_counts",       # token accounting
    "text_repetition",         # n-gram repetition signals (2 agg chains)
    "text_lm_score",           # bigram LM scoring (n-gram count joins)
    "text_pack_sequences",     # per-source windowed packing
    "text_pmi_windowed",       # windowed collocation mining (production PMI)
    "rel_q14_promo_revenue",   # broadcast join + conditional-agg ratio
    "rel_sessionize",          # gap sessionization (single-shuffle window)
    "rel_cdc_latest_state",    # CDC log compaction (max_by agg)
    "index_heavy_hitters",     # Misra-Gries candidates + exact recount
    "dedup_clusters",          # iterative connected components
    "ann_kmeans_train",        # iterative Lloyd rounds (trained quantizer)
    "text_shuffle_shards",     # deterministic export shuffle (1-exchange)
    "multimodal_image_meta",   # Arrow mapInPandas pass
    "multimodal_dedup_pairs",  # perceptual dHash + pigeonhole pairs (r8)
    "stream_tumbling_counts",  # structured streaming run
    "stream_heavy_hitters",    # MG summaries as stream state + recount (r8)
    "rel_pagerank_trade",      # iterative graph: damped power iteration (r8)
    "rel_triangles_trade",     # degree-oriented wedge join (r8)
    "text_classifier_train",   # one-pass stats + exact ridge solve (r8)
    "dedup_semantic_pairs",    # learned-cell-blocked near-dup pairs (r8)
    "search_related_docs",     # posting-join TF-IDF all-pairs topk (r8)
    "stream_funnel",           # incremental ordered-step state (r8)
    "rel_bucketed_join_agg",   # exchange-free bucketed-layout join (r8)
    "rel_snapshot_pruned_scan",  # manifest-stats file-skipping scan (r9)
    "rel_matview_refresh",     # incremental materialized aggregate (r9)
    "rel_matview_rollup_route",  # view routing: coarser GROUP BY from partials (r9)
    "rel_bloom_point_lookup",  # bloom-sidecar point lookup, metadata-path (r9)
    "rel_generation_changes",  # row-level snapshot change feed (r9)
    "rel_metadata_count",      # manifest-served COUNT(*), zero Spark jobs (r9)
    "rel_matview_join_refresh",  # join-IVM: fact-delta + dim-backfill refresh (r10)
    "rel_delete_rows",         # manifest-pruned copy-on-write DELETE (r10)
    "rel_upsert_rows",         # store-level MERGE: bloom-pruned replace+insert (r10)
    "stream_cdc_apply",        # per-batch CDC merge loop, out-of-order exact (r10)
    "rel_expectations_quarantine",  # publish-time admission gate + quarantine split (r10)
    "rel_matview_hist_quantile",  # maintained histogram -> served percentiles (r10)
    "dedup_incremental_lsh_pairs",  # delta-vs-corpus batch dedup via generation diff (r10)
    "text_incremental_pipeline",  # chained store-to-store incremental ETL (r10)
    "rel_concurrent_append",   # optimistic lock-free appends via manifest CAS (r11)
    "stream_autocompact_ingest",  # gated ingest + publish-time small-file policy (r11)
    "stream_gated_ingest",     # exactly-once gated admission, replay-idempotent (r11)
    "ann_filtered_topk",       # predicate pushed inside the pruned IVF cell scan (r11)
    "rel_expectations_readmit",  # quarantine repair loop: fix -> re-gate -> append (r11)
    "rel_schema_evolution",    # mixed-schema reconciled read (null-fill + widen) (r12)
    "rel_store_sql_travel",    # spark.sql over store views, inline @gen travel (r12)
    "rel_store_maintenance",   # maintain(): policy fold + residue vacuum (r12)
    "rel_delete_dv",           # merge-on-read DELETE: vector sidecar, 0 rewrites (r12)
    "rel_partition_evolution", # re-layout rewrite + append layout guard (r12)
    "rel_schema_rename",       # metadata-only column rename via alias chain (r13)
    "stream_store_cdf",        # change-feed subscription: bookmark-resumed CDF (r13)
    "rel_upsert_dv",           # merge-on-read MERGE: vector + append, 0 rewrites (r13)
    "rel_optimize_zorder",     # OPTIMIZE ZORDER: curve-clustered store rewrite (r13)
]


def contention_marker(spark, n_samples: int = 3) -> dict:
    """Fixed-work micro-jobs timed in the SAME process as the headline
    queries — the bench's contention normalizer. Round-over-round
    headline deltas on this shared box are noise-limited (BENCH_r05's
    24 shared queries drifted ~25% with zero code changes); these
    markers pin how slow the box itself was during the run, so a
    reader can divide before comparing rounds (SCALING.md explains
    the normalization).

    Two markers because contention has two faces here:
    - `python_md5`: a single-core pure-Python md5 chain (fixed 200k
      iterations) — scheduler pressure on one core, the shape of the
      single-threaded reference baseline.
    - `spark_sum`: a pinned 32-partition sum over range(100M), noop
      sink — JVM/task-scheduler pressure at the bench's own
      parallelism, the shape of the headline queries.
    - `python_worker` (round 9): a fixed trivial mapInPandas identity
      over range(32k) in 32 partitions — the Python-worker/Arrow
      round-trip tier. Added after the r8 multimodal_image_meta
      "regression" bisected to exactly this tier: the box's fixed
      per-job Python-worker latency ~doubled between the r7 and r8
      bench runs with zero code change (the r7 checkout reproduced
      r8's timing), while python_md5 and spark_sum stayed flat —
      mapInPandas-bound queries need their own normalizer
      (SCALING.md: contention section).
    """
    import hashlib

    def stats(xs: list[float]) -> dict:
        return {
            "median": round(sorted(xs)[len(xs) // 2], 3),
            "min": round(min(xs), 3),
            "max": round(max(xs), 3),
        }

    py = []
    for _ in range(n_samples):
        t0 = time.perf_counter()
        h = b"x" * 64
        for _ in range(200_000):
            h = hashlib.md5(h).digest()
        py.append(time.perf_counter() - t0)
    # One unmeasured spark_sum warmup: the PRE marker runs before any
    # headline query, so without this its first sample is dominated by
    # cold JVM/codegen start, not box contention (BENCH_r06: pre median
    # 0.387 vs post 0.09), biasing compare_bench's pre/post-averaged
    # normalization factor. Both markers must measure a warm engine.
    spark.range(0, 100_000_000, 1, 32).selectExpr(
        "sum(id % 7) AS s"
    ).write.format("noop").mode("overwrite").save()
    sp = []
    for _ in range(n_samples):
        t0 = time.perf_counter()
        spark.range(0, 100_000_000, 1, 32).selectExpr(
            "sum(id % 7) AS s"
        ).write.format("noop").mode("overwrite").save()
        sp.append(time.perf_counter() - t0)

    def _ident(batches):
        for b in batches:
            yield b

    def _pyworker_job():
        spark.range(0, 32_000, 1, 32).mapInPandas(
            _ident, schema="id long"
        ).write.format("noop").mode("overwrite").save()

    _pyworker_job()  # unmeasured warmup: daemon + worker pool spin-up
    pw = []
    for _ in range(n_samples):
        t0 = time.perf_counter()
        _pyworker_job()
        pw.append(time.perf_counter() - t0)

    # parquet_scan (round 10): a fixed columnar scan+agg over the SF
    # dir's largest table. The round-10 lesson: a host I/O-contended
    # regime leaves python_md5/spark_sum (pure CPU) FLAT while every
    # scan-heavy query runs 15-40% slow — bisect-proven code-independent
    # by re-running the prior round's commit in a worktree (SCALING.md).
    # This marker pins the scan tier so that regime is visible in the
    # run record instead of masquerading as a query regression.
    def _scan_job():
        spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).selectExpr(
            "sum(l_extendedprice) AS s", "count(*) AS n"
        ).write.format("noop").mode("overwrite").save()

    _scan_job()  # warmup: footer cache + page cache
    sc = []
    for _ in range(n_samples):
        t0 = time.perf_counter()
        _scan_job()
        sc.append(time.perf_counter() - t0)

    # manifest_read (round 11): the driver-bound manifest tier —
    # build+publish a tiny generations store ONCE (unmeasured), then
    # time open+parse of its manifest, the metadata-only count, and
    # the tiny createDataFrame that metadata-served queries end with
    # (rel_metadata_count's whole runtime lives here: zero Spark jobs,
    # pure driver work + one JSON read). Round-10's rel_metadata_count
    # flag (+32%) had no marker covering this tier; now the regime is
    # pinned in the run record like the scan tier.
    def _manifest_store() -> str:
        import tempfile

        from map_reduce_indexing_spark.sources.generations import (
            publish_generation,
        )

        d = tempfile.mkdtemp(prefix="mri_bench_manifest_")
        store = os.path.join(d, "store")
        spark.range(0, 10_000, 1, 4).selectExpr(
            "id", "id % 97 AS k"
        ).write.parquet(store)
        publish_generation(store)
        return store

    store = _manifest_store()

    def _manifest_job():
        from map_reduce_indexing_spark.sources.generations import (
            generation_row_count,
            load_manifest,
        )

        m = load_manifest(store)
        n = generation_row_count(store)
        spark.createDataFrame(
            [(n, len(m["gens"]))], "n long, gens int"
        ).collect()

    _manifest_job()  # warmup: session state for createDataFrame
    mf = []
    for _ in range(n_samples):
        t0 = time.perf_counter()
        _manifest_job()
        mf.append(time.perf_counter() - t0)
    import shutil as _shutil

    _shutil.rmtree(os.path.dirname(store), ignore_errors=True)

    # band_join (round 12): the shuffle/join tier — a fixed synthetic
    # two-sided equi-join on (band_idx, band_hash) pinned to SORT-MERGE
    # (the hint defeats AQE's broadcast conversion, so BOTH sides pay a
    # real exchange + sort every run). Added per the r11 verdict: the
    # driver's dedup_incremental_lsh_pairs 15 s mode was not pinnable
    # by any existing marker (the query is pure JVM, join-bound); this
    # marker makes a shuffle-tier host regime visible in the run
    # record the way parquet_scan did for the scan tier.
    def _band_join_job():
        a = spark.range(0, 400_000, 1, 32).selectExpr(
            "id % 16 AS band_idx", "id % 9973 AS band_hash", "id AS doc"
        )
        b = spark.range(0, 100_000, 1, 32).selectExpr(
            "id % 16 AS band_idx", "id % 9973 AS band_hash",
            "id + 1000000 AS doc",
        )
        a.join(b.hint("merge"), ["band_idx", "band_hash"]).selectExpr(
            "count(*) AS n"
        ).write.format("noop").mode("overwrite").save()

    _band_join_job()  # warmup: codegen for the join shape
    bj = []
    for _ in range(n_samples):
        t0 = time.perf_counter()
        _band_join_job()
        bj.append(time.perf_counter() - t0)
    return {
        "python_md5": stats(py),
        "spark_sum": stats(sp),
        "python_worker": stats(pw),
        "parquet_scan": stats(sc),
        "manifest_read": stats(mf),
        "band_join": stats(bj),
    }


def run_headline(
    spark,
    names: list[str],
    sf_dir: str,
    n_samples: int = 3,
    get=None,
) -> tuple[dict[str, float], dict[str, str], dict[str, dict]]:
    """Warm up then time each query (median of n_samples, plus min/max
    spread per query so a reader can tell a real regression from box
    noise), with per-query error isolation: one broken query must NOT
    kill the whole bench (round 3 lost its entire perf signal to one
    AnalysisException) — its failure is recorded in the errors dict and
    the rest keep timing. `get` defaults to the registry lookup;
    injectable for tests."""
    if get is None:
        get = registry.get
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    spreads: dict[str, dict] = {}
    # Unmeasured warmup pass: JIT/codegen compilation, parquet footer
    # cache, Python-worker (Arrow) spin-up. The reference baseline was
    # measured warm (BASELINE.md: "warm page cache"), so the timed pass
    # below is the comparable steady-state figure.
    for name in names:
        try:
            get(name).fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001 — recorded, not swallowed
            errors[name] = f"{type(e).__name__}: {e}"[:500]
    for name in names:
        if name in errors:
            continue
        # Median of n timed passes: the box is shared, so single samples
        # swing 2x on scheduler noise; the median is robust to one outlier
        # in either direction, making round-over-round deltas signal.
        samples = []
        try:
            for _ in range(n_samples):
                t0 = time.perf_counter()
                get(name).fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"[:500]
            continue
        times[name] = round(sorted(samples)[len(samples) // 2], 3)
        spreads[name] = {
            "min": round(min(samples), 3),
            "max": round(max(samples), 3),
        }
    return times, errors, spreads


def compact_errors(errors: dict) -> dict:
    """Bounded error summary for the compact stdout line: the driver
    archives only the last 2000 chars of stdout, so a run with several
    500-char failure messages must not push the line past that budget
    (the exact front-truncation failure the compact/local split exists
    to prevent). First line of each message, capped at 80 chars, at
    most 8 entries; full messages live in the local payload."""
    head = list(errors.items())[:8]
    out = {"errors": {n: m.splitlines()[0][:80] for n, m in head}}
    if len(errors) > len(head):
        out["errors_truncated"] = len(errors) - len(head)
    return out


# The driver archives the LAST 2000 characters of stdout; the final
# JSON line must fit under that with margin or the archived record is
# front-truncated mid-JSON and unparseable (exactly BENCH_r12's
# "parsed": null — 63 queries at default json.dumps spacing hit 2015
# chars). Budget below the cap to leave room for a stray warning line.
COMPACT_BUDGET = 1950


def compact_line(full: dict, local_name: str, budget: int = COMPACT_BUDGET) -> str:
    """The final-stdout-line JSON, GUARANTEED under `budget` chars:
    tight separators, per-query values at 2 decimals (full precision
    lives in the local payload), and — only if a grown headline list
    ever outruns even that — the fastest queries drop from the line
    (slowest-first kept; `queries_omitted` records the count, the
    local file always carries every query)."""
    base = {k: full[k] for k in ("metric", "value", "unit", "sf")}
    base["local"] = local_name
    if full.get("errors"):
        base.update(compact_errors(full["errors"]))
    q = {k: round(v, 2) for k, v in full["queries"].items()}
    by_cost = sorted(q, key=lambda k: -q[k])
    keep = len(q)
    while keep >= 0:
        line = dict(base)
        kept = sorted(by_cost[:keep])  # stable name order for diffing
        line["queries"] = {k: q[k] for k in kept}
        if keep < len(q):
            line["queries_omitted"] = len(q) - keep
        s = json.dumps(line, separators=(",", ":"))
        if len(s) <= budget:
            return s
        keep -= max(1, len(q) // 10)
    return json.dumps(base, separators=(",", ":"))


def next_round_no(repo_dir: str) -> int:
    """1 + the highest round number among the driver's BENCH_r{N}.json
    archives — so the local payload this run writes lands beside the
    BENCH_r{N}.json the driver is about to record for the same round.
    Deliberately ignores BENCH_LOCAL_r*.json: every bench run within a
    round (iterating locally, then the driver's final run) overwrites
    the SAME local file rather than escalating the round number."""
    import glob
    import re

    rounds = [0]
    for f in glob.glob(os.path.join(repo_dir, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", f)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds) + 1


def main() -> None:
    explain = "--explain" in sys.argv
    spark = get_spark(app_name="mri-bench")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    if explain:
        for name in HEADLINE:
            print(f"===== {name} =====")
            try:
                registry.get(name).fn(spark, SF_DIR).explain("formatted")
            except Exception as e:  # noqa: BLE001
                print(f"EXPLAIN FAILED: {type(e).__name__}: {e}")
        spark.stop()
        return
    # Marker BEFORE and AFTER the timed queries: contention that ramps
    # mid-run shows up as disagreement between the two. Error-isolated
    # like the queries themselves — a broken marker must not cost the
    # round its whole perf signal (the round-3 lesson, run_headline).
    def safe_marker():
        try:
            return contention_marker(spark)
        except Exception as e:  # noqa: BLE001 — recorded, not fatal
            return {"error": f"{type(e).__name__}: {e}"[:300]}

    marker_pre = safe_marker()
    times, errors, spreads = run_headline(spark, HEADLINE, SF_DIR)
    marker_post = safe_marker()
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    local_name = f"BENCH_LOCAL_r{next_round_no(repo_dir):02d}.json"
    full = {
        "metric": "headline_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "spread": spreads,
        "marker": {"pre": marker_pre, "post": marker_post},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        full["errors"] = errors
    # Full payload to disk (spread + markers survive any stdout
    # truncation); compact line — medians only, naming the local file —
    # as the final stdout line, sized for the driver's 2000-char tail.
    try:
        with open(os.path.join(repo_dir, local_name), "w") as f:
            json.dump(full, f)
    except OSError as e:  # read-only checkout: compact line still lands
        print(f"WARNING: could not write {local_name}: {e}", file=sys.stderr)
    print(compact_line(full, local_name))
    spark.stop()
    # Non-zero exit only if NOTHING ran; partial results are still signal.
    if not times:
        sys.exit(1)


if __name__ == "__main__":
    main()
