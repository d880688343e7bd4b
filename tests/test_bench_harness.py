"""bench.py error isolation: one broken query must never cost the
round its performance signal (BENCH_r03 was lost to exactly that)."""

from __future__ import annotations

import sys
from types import SimpleNamespace

sys.path.insert(0, "/root/repo")

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
    import sys

    sys.path.insert(0, "/root/repo/tools")
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


def test_contention_marker_shape(spark):
    from bench import contention_marker

    m = contention_marker(spark, n_samples=1)
    assert set(m) == {"python_md5", "spark_sum"}
    for stats in m.values():
        assert stats["min"] <= stats["median"] <= stats["max"]
        assert stats["median"] > 0
