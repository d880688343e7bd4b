"""k-dimension scaling of the quantizer training loop.

tools/scale_bench.py scales n (vectors); this sweeps k (centroids)
at fixed n — the axis the round-8 broadcast assignment path exists
for. Each k trains KMEANS_ITERS Lloyd rounds from the deterministic
data init; above ASSIGN_LITERAL_MAX_K the per-round assignment runs
as the broadcast centroid matrix + mapInPandas argmin instead of
inlined literals.

Usage: python tools/kmeans_k_sweep.py [sf_dir] [k...]
Defaults: /root/testdata/sf0.1, k = 8 64 256 1024.
Prints one JSON line per k: wall seconds (median of 3) and the
assignment path taken.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_indexing_spark.operators.similarity import (  # noqa: E402
    ASSIGN_LITERAL_MAX_K,
    train_kmeans,
)
from map_reduce_indexing_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ks = [int(a) for a in sys.argv[2:]] or [8, 64, 256, 1024]
    spark = get_spark(app_name="mri-kmeans-k-sweep")
    n = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).count()
    for k in ks:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            cents = train_kmeans(spark, sf_dir, k=k)
            runs.append(time.perf_counter() - t0)
        assert len(cents) == k
        print(
            json.dumps(
                {
                    "k": k,
                    "n_vectors": n,
                    "assign_path": (
                        "literal" if k <= ASSIGN_LITERAL_MAX_K else "broadcast"
                    ),
                    "sec": round(sorted(runs)[1], 3),
                    "runs": [round(r, 3) for r in runs],
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
