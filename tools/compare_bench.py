"""Compare two bench runs with contention normalization.

Implements SCALING.md "Contention normalization": divides the newer
run's times by the marker-derived box factor before calling anything a
regression, and requires the normalized delta to clear BOTH runs'
per-query min/max spread bands.

    python tools/compare_bench.py BENCH_r06.json BENCH_r07.json
    python tools/compare_bench.py old.json new.json --threshold 1.3

Accepts, in preference order per argument:
1. a full bench payload (BENCH_LOCAL_r{N}.json, or a pre-r7 one-line
   bench.py dump) — has queries + spread + markers;
2. the compact line bench.py prints since r7 — its "local" field names
   the sibling BENCH_LOCAL file, which is loaded for spread/markers
   when present next to the given path;
3. the driver's BENCH_r{N}.json wrapper, whose "tail" field embeds the
   (possibly front-truncated) stdout — the last parseable bench line
   is extracted, then rule 2 applies.
Runs without markers/spread (pre-round-6) compare unnormalized with a
warning. Exit code: 0 = no flagged regressions, 2 = at least one query
regressed beyond noise.
"""

from __future__ import annotations

import json
import os
import re
import sys


def _bench_line(text: str) -> dict | None:
    """Last parseable bench-JSON line inside captured stdout."""
    for line in reversed(text.splitlines()):
        start = line.find('{"metric"')
        if start < 0:
            continue
        try:
            parsed = json.loads(line[start:])
        except json.JSONDecodeError:
            continue
        if "queries" in parsed:
            return parsed
    # single-line pre-r7 dumps: fall back to a greedy brace match
    m = re.search(r'\{"metric".*\}', text)
    if m:
        try:
            return json.loads(m.group(0))
        except json.JSONDecodeError:
            return None
    return None


def load_bench(path: str) -> dict:
    with open(path) as f:
        raw = json.load(f)
    bench = None
    if "queries" in raw:
        bench = raw
    else:
        # driver wrapper: the bench line is embedded in a string field
        for v in raw.values():
            if isinstance(v, str) and '"queries"' in v:
                bench = _bench_line(v)
                if bench:
                    break
    if bench is not None and "spread" in bench:
        return bench
    # No full payload in the file itself: look for the sibling local
    # file — named by the compact line's "local" field, else inferred
    # from the wrapper's own round number (covers BENCH_r06.json, whose
    # embedded line was front-truncated beyond parsing but whose full
    # payload was recovered into BENCH_LOCAL_r06.json).
    names = []
    if bench is not None and bench.get("local"):
        names.append(bench["local"])
    m = re.search(r"BENCH_r(\d+)\.json$", os.path.basename(path))
    if m:
        names.append(f"BENCH_LOCAL_r{m.group(1)}.json")
    for name in names:
        local = os.path.join(os.path.dirname(os.path.abspath(path)), name)
        if os.path.isfile(local):
            with open(local) as f:
                full = json.load(f)
            if "queries" in full:
                return full
    if bench is None:
        raise SystemExit(f"{path}: no bench JSON found (no 'queries' key)")
    print(
        f"NOTE: {path}: local payload not found; "
        "using compact medians (no spread/markers)",
        file=sys.stderr,
    )
    return bench


def marker_median(bench: dict, which: str = "spark_sum") -> float | None:
    """Mean of the pre/post medians (SCALING.md: disagreement means
    contention ramped mid-run; the mean is the best single factor)."""
    marker = bench.get("marker")
    if not marker:
        return None
    vals = []
    for slot in ("pre", "post"):
        stats = marker.get(slot, {}).get(which)
        if isinstance(stats, dict) and "median" in stats:
            vals.append(stats["median"])
    return sum(vals) / len(vals) if vals else None


# Headliners whose wall is dominated by the Python-worker/Arrow
# round-trip tier, which drifts independently of CPU pressure
# (SCALING.md: the r8 multimodal_image_meta bisect — the box's fixed
# per-job Python-worker latency doubled while python_md5/spark_sum
# stayed flat). When both runs carry the round-9 `python_worker`
# marker, these normalize by ITS ratio instead of spark_sum's.
PYWORKER_QUERIES = {
    "multimodal_image_meta",
    "multimodal_dedup_pairs",
    "ann_knn_batch_numpy",
    "stream_tumbling_counts",
    "stream_heavy_hitters",
    "stream_funnel",
}

# Headliners whose wall is dominated by the parquet SCAN tier —
# file-page reads + decompression — which the round-10 bisect showed
# drifting independently of BOTH cpu markers (an I/O-contended host
# regime left python_md5/spark_sum flat while every scan-heavy query
# ran 15-40% slow on the PRIOR round's own commit; SCALING.md,
# "Round-10 bench context"). When both runs carry the round-10
# `parquet_scan` marker, these normalize by ITS ratio.
SCAN_QUERIES = {
    "rel_q1_pricing_summary",
    "rel_q3_shipping_priority",
    "rel_q5_local_supplier",
    "rel_q18_large_orders",
    "rel_q14_promo_revenue",
    "rel_window_running_total",
    "dedup_exact_kept",
    "dedup_minhash_signatures",
    "dedup_simhash",
    "ann_knn_bruteforce",
    "text_quality",
    "text_token_counts",
    "text_repetition",
}

# Headliners whose wall is driver-bound manifest work — one JSON read
# plus a tiny createDataFrame, zero Spark jobs (metadata-served
# aggregates). Round-10's rel_metadata_count flag (+32%, spreads
# disjoint) sat in this tier with NO covering marker; the round-11
# `manifest_read` marker pins it. When both runs carry it, these
# normalize by ITS ratio.
MANIFEST_QUERIES = {
    "rel_metadata_count",
}

# Headliners whose wall is dominated by a two-sided shuffle equi-join
# (the LSH band joins). The r11 driver run's
# dedup_incremental_lsh_pairs row sat 19.5x over r10 with a bimodal
# 1.2-15.9 s spread on untouched pure-JVM code, and NO marker covered
# the shuffle/join tier — the round-12 `band_join` marker (a fixed
# sort-merge join micro-job, bench.py) pins it. When both runs carry
# it, these normalize by ITS ratio.
JOIN_QUERIES = {
    "dedup_incremental_lsh_pairs",
    "dedup_minhash_lsh_pairs",
}


def compare(old: dict, new: dict, threshold: float) -> int:
    oq, nq = old["queries"], new["queries"]
    osp, nsp = old.get("spread", {}), new.get("spread", {})
    om, nm = marker_median(old), marker_median(new)
    if om and nm:
        factor = nm / om
        print(f"box factor (new/old spark_sum marker): {factor:.2f}")
    else:
        factor = 1.0
        print("WARNING: marker missing in one run; comparing unnormalized")
    opw = marker_median(old, "python_worker")
    npw = marker_median(new, "python_worker")
    pw_factor = None
    if opw and npw:
        pw_factor = npw / opw
        print(f"pyworker factor (new/old python_worker marker): {pw_factor:.2f}")
    osc = marker_median(old, "parquet_scan")
    nsc = marker_median(new, "parquet_scan")
    scan_factor = None
    if osc and nsc:
        scan_factor = nsc / osc
        print(f"scan factor (new/old parquet_scan marker): {scan_factor:.2f}")
    omf = marker_median(old, "manifest_read")
    nmf = marker_median(new, "manifest_read")
    manifest_factor = None
    if omf and nmf:
        manifest_factor = nmf / omf
        print(
            f"manifest factor (new/old manifest_read marker): "
            f"{manifest_factor:.2f}"
        )
    obj = marker_median(old, "band_join")
    nbj = marker_median(new, "band_join")
    join_factor = None
    if obj and nbj:
        join_factor = nbj / obj
        print(f"join factor (new/old band_join marker): {join_factor:.2f}")
    shared = sorted(set(oq) & set(nq))
    flagged = []
    print(f"{'query':36} {'old':>8} {'new':>8} {'norm_ratio':>10}")
    for q in shared:
        if q in PYWORKER_QUERIES and pw_factor:
            factor = pw_factor
        elif q in SCAN_QUERIES and scan_factor:
            factor = scan_factor
        elif q in MANIFEST_QUERIES and manifest_factor:
            factor = manifest_factor
        elif q in JOIN_QUERIES and join_factor:
            factor = join_factor
        else:
            factor = nm / om if om and nm else 1.0
        norm = (nq[q] / factor) / oq[q] if oq[q] else float("inf")
        # regression only if the normalized new time clears the old
        # run's max AND the old time sits below the new run's min —
        # i.e. the bands don't overlap even after normalization.
        old_hi = osp.get(q, {}).get("max", oq[q])
        new_lo = nsp.get(q, {}).get("min", nq[q])
        beyond_noise = (new_lo / factor) > old_hi
        mark = ""
        if norm > threshold and beyond_noise:
            flagged.append(q)
            mark = "  REGRESSION"
        elif norm > threshold:
            mark = "  (within spread)"
        print(f"{q:36} {oq[q]:8.3f} {nq[q]:8.3f} {norm:10.2f}{mark}")
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        print("new-only:", ", ".join(f"{q}={nq[q]}" for q in only_new))
    only_old = sorted(set(oq) - set(nq))
    if only_old:
        print("dropped:", ", ".join(only_old))
    if flagged:
        print(f"\n{len(flagged)} regression(s) beyond noise: {flagged}")
        return 2
    print("\nno regressions beyond noise")
    return 0


def main() -> None:
    # hand-rolled so `--threshold 1.3` and `--threshold=1.3` both work:
    # the space form's value must be consumed, not left positional
    argv = sys.argv[1:]
    threshold = 1.25
    paths: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--threshold":
            if i + 1 >= len(argv):
                raise SystemExit("--threshold needs a value")
            threshold = float(argv[i + 1])
            i += 2
        elif a.startswith("--threshold="):
            threshold = float(a.split("=", 1)[1])
            i += 1
        elif a.startswith("--"):
            raise SystemExit(f"unknown option {a}\n{__doc__}")
        else:
            paths.append(a)
            i += 1
    if len(paths) != 2:
        raise SystemExit(__doc__)
    sys.exit(compare(load_bench(paths[0]), load_bench(paths[1]), threshold))


if __name__ == "__main__":
    main()
