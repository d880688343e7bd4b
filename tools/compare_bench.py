"""Compare two bench runs with contention normalization.

Implements SCALING.md "Contention normalization": divides the newer
run's times by the marker-derived box factor before calling anything a
regression, and requires the normalized delta to clear BOTH runs'
per-query min/max spread bands.

    python tools/compare_bench.py BENCH_r05.json BENCH_r06.json
    python tools/compare_bench.py old.json new.json --threshold 1.3

Accepts either the raw one-line JSON bench.py prints or the driver's
BENCH_r{N}.json wrapper (which embeds that line inside its "tail"
field). Runs without markers/spread (pre-round-6) compare unnormalized
with a warning. Exit code: 0 = no flagged regressions, 2 = at least
one query regressed beyond noise.
"""

from __future__ import annotations

import json
import re
import sys


def load_bench(path: str) -> dict:
    with open(path) as f:
        raw = json.load(f)
    if "queries" in raw:
        return raw
    # driver wrapper: the bench line is embedded in a string field
    for v in raw.values():
        if isinstance(v, str) and '"queries"' in v:
            m = re.search(r'\{"metric".*\}', v)
            if m:
                return json.loads(m.group(0))
    raise SystemExit(f"{path}: no bench JSON found (no 'queries' key)")


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
    shared = sorted(set(oq) & set(nq))
    flagged = []
    print(f"{'query':36} {'old':>8} {'new':>8} {'norm_ratio':>10}")
    for q in shared:
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 1.25
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    if len(args) != 2:
        raise SystemExit(__doc__)
    sys.exit(compare(load_bench(args[0]), load_bench(args[1]), threshold))


if __name__ == "__main__":
    main()
