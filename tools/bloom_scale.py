"""Bloom point-lookup scaling: probe cost and pruning power vs file
count.

The sidecar design's claim (sources/generations.py): an equality
probe on an unclustered high-cardinality key prunes to O(1) files
from one manifest read + small sidecar fetches, at any store size —
where min/max stats keep everything (every file's range covers every
key) and a plain scan reads the store. This tool measures, at
several file counts over the same 200k-row store:

- kept files for a present key (expect 1 + rare false positives at
  the ~0.9% design fpp) and for an absent key (expect ~0);
- the pruned read wall vs the full scan + filter wall;
- publish-side bloom build cost (the one-time per-file column read),
  for BOTH build paths: the serial/thread-pool writer-process build
  and the distributed one-Spark-job-over-the-file-list build
  (round 10: the per-value Python hash loop is gone — encoding and
  hashing are vectorized via pyarrow/pandas/numpy — and bulk
  publishes fan out to executor tasks).

Usage: python tools/bloom_scale.py [files...]   (default 8 32 128 1024)
Prints one JSON line per file count.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_indexing_spark.session import get_spark  # noqa: E402
from map_reduce_indexing_spark.sources.generations import (  # noqa: E402
    plan_generation_scan,
    publish_generation,
    read_generation,
)

ROWS = 200_000


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [8, 32, 128, 1024]
    spark = get_spark()
    for files in counts:
        work = tempfile.mkdtemp(prefix="mri_bloom_scale_")
        base = os.path.join(work, "b")
        try:
            spark.range(ROWS).select(
                F.col("id").alias("k"),
                (F.col("id") % 997).alias("v"),
            ).repartition(files, "k").write.parquet(base)
            t0 = time.monotonic()
            publish_generation(base, bloom_cols=["k"])
            publish_s = time.monotonic() - t0
            # the distributed build, on an identical hardlinked listing
            base2 = os.path.join(work, "b2")
            os.makedirs(base2)
            for f in sorted(os.listdir(base)):
                if not f.startswith(("_", ".")):
                    os.link(os.path.join(base, f), os.path.join(base2, f))
            t0 = time.monotonic()
            publish_generation(base2, bloom_cols=["k"], spark=spark)
            publish_spark_s = time.monotonic() - t0

            present = [("k", "=", ROWS // 3)]
            absent = [("k", "=", 10**15)]
            _r, kept_p, total = plan_generation_scan(base, where=present)
            _r, kept_a, _ = plan_generation_scan(base, where=absent)

            read_generation(spark, base, where=present).count()  # warm
            t0 = time.monotonic()
            n = read_generation(spark, base, where=present).count()
            pruned_s = time.monotonic() - t0
            t0 = time.monotonic()
            n_full = (
                read_generation(spark, base)
                .filter(F.col("k") == ROWS // 3)
                .count()
            )
            full_s = time.monotonic() - t0
            assert n == n_full == 1

            print(
                json.dumps(
                    {
                        "files": total,
                        "rows": ROWS,
                        "publish_with_blooms_sec": round(publish_s, 3),
                        "publish_spark_job_sec": round(publish_spark_s, 3),
                        "kept_present_key": len(kept_p),
                        "kept_absent_key": len(kept_a),
                        "pruned_lookup_sec": round(pruned_s, 3),
                        "full_filter_sec": round(full_s, 3),
                    }
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
