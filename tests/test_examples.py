"""The examples/ walkthroughs must stay runnable — they are the
switch-from-the-reference story, and they drift silently otherwise
(round 6 caught a stale column name in a .show() chain this way).

Each runs as a subprocess at the tiny fixture scale with its own
SparkSession; failures surface the example's stderr tail.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXAMPLES = [
    ("examples/index_and_search.py", ["--demo"]),
    ("examples/training_data_pipeline.py", ["/root/testdata/sf0.001"]),
    ("examples/event_analytics.py", ["/root/testdata/sf0.001"]),
    ("examples/vector_search.py", ["/root/testdata/sf0.001"]),
    ("examples/embedding_pipeline.py", ["/root/testdata/sf0.001"]),
    ("examples/snapshot_pipeline.py", []),
    ("examples/lakehouse_tour.py", []),
    ("examples/medallion_pipeline.py", []),
    ("examples/concurrent_lakehouse.py", []),
    ("examples/schema_evolution_tour.py", []),
]


@pytest.mark.parametrize("script,args", EXAMPLES, ids=[e[0] for e in EXAMPLES])
def test_example_runs_clean(script, args):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"{script} exited {proc.returncode}\n--- stderr tail ---\n"
        + proc.stderr[-2000:]
    )
