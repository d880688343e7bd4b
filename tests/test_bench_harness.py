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


def test_contention_marker_shape(spark):
    from bench import contention_marker

    m = contention_marker(spark, n_samples=1)
    assert set(m) == {"python_md5", "spark_sum"}
    for stats in m.values():
        assert stats["min"] <= stats["median"] <= stats["max"]
        assert stats["median"] > 0
