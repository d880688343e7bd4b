"""bench.py error isolation: one broken query must never cost the
round its performance signal (BENCH_r03 was lost to exactly that)."""

from __future__ import annotations

import json
import os
import sys
from types import SimpleNamespace

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

from bench import run_headline  # noqa: E402

from .conftest import SF_DIR


def test_broken_query_is_isolated(spark):
    def ok_query(s, sf_dir):
        return s.range(5).selectExpr("id", "id * 2 AS double_id")

    def broken_query(s, sf_dir):
        raise RuntimeError("synthetic analysis failure")

    fake = {
        "good_a": SimpleNamespace(fn=ok_query),
        "explodes": SimpleNamespace(fn=broken_query),
        "good_b": SimpleNamespace(fn=ok_query),
    }
    times, errors, spreads = run_headline(
        spark, list(fake), SF_DIR, n_samples=1, get=fake.__getitem__
    )
    assert set(times) == {"good_a", "good_b"}
    assert all(v >= 0 for v in times.values())
    assert set(errors) == {"explodes"}
    assert "synthetic analysis failure" in errors["explodes"]
    # spread rides along per timed query (min <= median <= max)
    assert set(spreads) == set(times)
    for name, s in spreads.items():
        assert s["min"] <= times[name] <= s["max"]


def test_compare_bench_normalizes_and_flags():
    """tools/compare_bench.py: the box factor divides before flagging,
    and overlapping spread bands suppress a nominal regression."""
    from compare_bench import compare, marker_median

    def run(queries, spread, marker_med):
        return {
            "queries": queries,
            "spread": spread,
            "marker": {
                s: {"spark_sum": {"median": marker_med, "min": marker_med, "max": marker_med}}
                for s in ("pre", "post")
            },
        }

    old = run({"q": 1.0, "r": 1.0}, {"q": {"min": 0.9, "max": 1.1}, "r": {"min": 0.9, "max": 1.1}}, 0.2)
    # 2x slower box: q doubled nominally (pure contention -> norm 1.0),
    # r quadrupled (real 2x regression even normalized, beyond spread)
    new = run({"q": 2.0, "r": 4.0}, {"q": {"min": 1.9, "max": 2.1}, "r": {"min": 3.9, "max": 4.1}}, 0.4)
    assert marker_median(old) == 0.2 and marker_median(new) == 0.4
    assert compare(old, new, threshold=1.25) == 2  # r flagged
    ok = run({"q": 2.0, "r": 2.0}, {"q": {"min": 1.9, "max": 2.1}, "r": {"min": 1.9, "max": 2.1}}, 0.4)
    assert compare(old, ok, threshold=1.25) == 0  # all pure contention


def _full_payload():
    return {
        "metric": "headline_total",
        "value": 1.5,
        "unit": "sec",
        "queries": {"q": 1.0, "r": 0.5},
        "spread": {"q": {"min": 0.9, "max": 1.1}, "r": {"min": 0.4, "max": 0.6}},
        "marker": {
            s: {"spark_sum": {"median": 0.1, "min": 0.1, "max": 0.1}}
            for s in ("pre", "post")
        },
        "sf": 0.1,
    }


def test_load_bench_survives_driver_truncation(tmp_path):
    """The r7 output contract: the driver archives only the LAST 2000
    chars of stdout, so the compact final line must survive arbitrary
    front-truncation AND route compare_bench to the sibling
    BENCH_LOCAL file for spread/markers (BENCH_r06's fat single line
    did neither — the round-over-round comparison was impossible)."""
    from compare_bench import load_bench

    full = _full_payload()
    (tmp_path / "BENCH_LOCAL_r07.json").write_text(json.dumps(full))
    compact = {k: full[k] for k in ("metric", "value", "unit", "queries", "sf")}
    compact["local"] = "BENCH_LOCAL_r07.json"
    # simulate the driver: noise before the line, keep the last 2000 chars
    stdout = "WARN noisy spark log\n" * 80 + json.dumps(compact) + "\n"
    wrapper = {"n": 7, "rc": 0, "tail": stdout[-2000:]}
    p = tmp_path / "BENCH_r07.json"
    p.write_text(json.dumps(wrapper))
    got = load_bench(str(p))
    assert got == full  # resolved through the local file: spread+markers

    # same wrapper with the local file gone: compact medians still parse
    (tmp_path / "BENCH_LOCAL_r07.json").unlink()
    got = load_bench(str(p))
    assert got["queries"] == full["queries"] and "spread" not in got


def test_load_bench_pre_r7_wrapper_still_parses(tmp_path):
    """Old-format wrapper (full single-line JSON in the tail, no local
    file) keeps working — r5-era artifacts must stay comparable."""
    from compare_bench import load_bench

    full = _full_payload()
    wrapper = {"n": 5, "rc": 0, "tail": json.dumps(full)}
    p = tmp_path / "BENCH_r05.json"
    p.write_text(json.dumps(wrapper))
    assert load_bench(str(p)) == full


def test_compare_bench_threshold_space_form(tmp_path, capsys):
    """`--threshold 1.3` (space-separated) must be consumed as the
    option value, not left in the positional list (ADVICE r6)."""
    import compare_bench

    full = _full_payload()
    p = tmp_path / "a.json"
    p.write_text(json.dumps(full))
    for argv_tail in (["--threshold", "9.9"], ["--threshold=9.9"]):
        argv = ["compare_bench.py", str(p), str(p), *argv_tail]
        old_argv = sys.argv
        sys.argv = argv
        try:
            try:
                compare_bench.main()
            except SystemExit as e:
                assert e.code == 0, f"argv {argv_tail}: exit {e.code}"
        finally:
            sys.argv = old_argv


def test_next_round_no(tmp_path):
    from bench import next_round_no

    assert next_round_no(str(tmp_path)) == 1
    (tmp_path / "BENCH_r03.json").write_text("{}")
    (tmp_path / "BENCH_r06.json").write_text("{}")
    # LOCAL files must NOT escalate the round (same-round overwrites)
    (tmp_path / "BENCH_LOCAL_r07.json").write_text("{}")
    assert next_round_no(str(tmp_path)) == 7


def test_contention_marker_shape(spark):
    from bench import contention_marker

    m = contention_marker(spark, n_samples=1)
    assert set(m) == {
        "python_md5",
        "spark_sum",
        "python_worker",
        "parquet_scan",
        "manifest_read",
        "band_join",  # round 12: the shuffle/join-tier marker
    }
    for stats in m.values():
        assert stats["min"] <= stats["median"] <= stats["max"]
        assert stats["median"] > 0


def test_compact_errors_stay_under_tail_budget():
    """A bench run where MANY queries fail with long messages must still
    emit a compact line that fits the driver's 2000-char tail: first
    line only, 80-char cap, at most 8 entries plus an overflow count."""
    import bench

    errors = {
        f"query_{i:02d}": ("X" * 500 + "\nsecond line") for i in range(28)
    }
    out = bench.compact_errors(errors)
    assert len(out["errors"]) == 8
    assert all(len(m) <= 80 and "\n" not in m for m in out["errors"].values())
    assert out["errors_truncated"] == 20
    assert len(json.dumps(out)) < 1200


def test_compact_line_fits_tail_budget_at_r12_scale():
    """r12's driver record was unparseable: 63 queries at default
    json.dumps spacing hit 2015 chars, past the 2000-char stdout
    tail. compact_line must fit the budget for the REAL r12 payload
    and keep every query at that scale."""
    import json
    import os

    import bench

    full = json.load(
        open(os.path.join(os.path.dirname(bench.__file__), "BENCH_LOCAL_r12.json"))
    )
    s = bench.compact_line(full, "BENCH_LOCAL_r13.json")
    assert len(s) <= bench.COMPACT_BUDGET
    doc = json.loads(s)
    assert doc["metric"] == "headline_total"
    assert len(doc["queries"]) == len(full["queries"])  # nothing dropped
    assert "queries_omitted" not in doc


def test_compact_line_degrades_gracefully_when_huge():
    """A pathological 300-query headline list still yields a parseable
    line: the fastest rows drop, the slowest stay, the omission is
    recorded."""
    import json

    import bench

    full = {
        "metric": "headline_total",
        "value": 1.0,
        "unit": "sec",
        "sf": 0.1,
        "queries": {
            f"very_long_query_name_padding_{i:04d}": i / 100.0
            for i in range(300)
        },
    }
    s = bench.compact_line(full, "BENCH_LOCAL_r99.json")
    assert len(s) <= bench.COMPACT_BUDGET
    doc = json.loads(s)
    assert doc["queries_omitted"] > 0
    kept = doc["queries"]
    # slowest-first retention: the max-cost query always survives
    assert "very_long_query_name_padding_0299" in kept
