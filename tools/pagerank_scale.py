"""PageRank scaling sweep: wall time vs graph size.

The registered `rel_pagerank_trade` runs over the fixture's 25-node
nation graph, where per-round fixed cost dominates. This sweep measures
the part that must survive a 100-TB crawl graph: the per-iteration
rank⋈edges shuffle + per-dst aggregate at growing node/edge counts.

Graphs are synthesized IN Spark (spark.range — no driver-side data):
n nodes, out-degree 8, dst = hash-derived (deterministic, seed-stable),
so the sweep is reproducible and edge count grows linearly with n.
3 power-iteration rounds per run (fixed), median of 3 warm runs.

Usage: python tools/pagerank_scale.py [n ...]   (default 10000 80000 640000)
Prints one JSON line per n: nodes, edges, wall seconds, and the
wall-vs-n ratio a reader needs to confirm sub-quadratic growth.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_indexing_spark.operators.graph import pagerank  # noqa: E402
from map_reduce_indexing_spark.session import get_spark  # noqa: E402

OUT_DEGREE = 8
ROUNDS = 3


def synth_graph(spark, n: int):
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = (
        spark.range(n)
        .select(
            F.col("id").alias("src"),
            F.explode(
                F.sequence(F.lit(1), F.lit(OUT_DEGREE))
            ).alias("j"),
        )
        .select(
            "src",
            F.pmod(F.xxhash64("src", "j"), F.lit(n)).alias("dst"),
            (F.pmod(F.xxhash64("j", "src"), F.lit(5)) + 1).alias("w"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    return nodes, edges


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [10_000, 80_000, 640_000]
    spark = get_spark()
    for n in ns:
        nodes, edges = synth_graph(spark, n)
        edges = edges.localCheckpoint(eager=True)  # stage once, time iteration
        n_edges = edges.count()
        walls = []
        for _ in range(3):
            t0 = time.monotonic()
            ranks = pagerank(nodes, edges, rounds=ROUNDS)
            ranks.write.format("noop").mode("overwrite").save()
            walls.append(time.monotonic() - t0)
        print(
            json.dumps(
                {
                    "nodes": n,
                    "edges": n_edges,
                    "rounds": ROUNDS,
                    "wall_sec": round(statistics.median(walls), 3),
                    "runs": [round(w, 3) for w in walls],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
