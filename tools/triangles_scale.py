"""Triangle-counting scaling sweep: wall time vs graph size.

The registered `rel_triangles_trade` runs over the fixture's 25-node
nation graph, where fixed job cost dominates. This sweep measures the
part that must survive a web-scale link graph: the degree-oriented
wedge self-join + closure join at growing node/edge counts.

Graphs are synthesized IN Spark (spark.range — no driver-side data):
n nodes, ~8 undirected edges per node, endpoints hash-derived
(deterministic, seed-stable), so edge count grows linearly with n and
the sweep is reproducible. Median of 3 warm runs.

The quantity to watch: with out-degree bounded by the degree
orientation, wedge count grows ~linearly for a constant-degree graph,
so wall-vs-n should stay near-linear (sub-quadratic is the claim).

Usage: python tools/triangles_scale.py [n ...]  (default 10000 80000 640000)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_indexing_spark.operators.graph import triangle_counts  # noqa: E402
from map_reduce_indexing_spark.session import get_spark  # noqa: E402

EDGES_PER_NODE = 8


def synth_und(spark, n: int):
    """Undirected simple graph: for each node, EDGES_PER_NODE
    hash-derived neighbors, canonicalized u < v and deduplicated."""
    raw = (
        spark.range(n)
        .select(
            F.col("id").alias("s"),
            F.explode(F.sequence(F.lit(1), F.lit(EDGES_PER_NODE))).alias("j"),
        )
        .select("s", F.pmod(F.xxhash64("s", "j"), F.lit(n)).alias("d"))
        .filter(F.col("s") != F.col("d"))
    )
    return (
        raw.select(
            F.least("s", "d").alias("u"), F.greatest("s", "d").alias("v")
        )
        .distinct()
    )


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [10_000, 80_000, 640_000]
    spark = get_spark()
    for n in ns:
        und = synth_und(spark, n).localCheckpoint(eager=True)
        n_edges = und.count()
        walls = []
        for _ in range(3):
            t0 = time.monotonic()
            out = triangle_counts(und)
            out.write.format("noop").mode("overwrite").save()
            walls.append(time.monotonic() - t0)
        print(
            json.dumps(
                {
                    "nodes": n,
                    "edges": n_edges,
                    "wall_sec": round(statistics.median(walls), 3),
                    "runs": [round(w, 3) for w in walls],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
