"""Indexing-throughput scaling benchmark.

The reference's measured baseline is 7.7 MB/s single-threaded for the
full map+reduce indexing pipeline (BASELINE.md). This tool measures the
Spark engine's steady-state throughput on the same logical pipeline
(normalize -> COUNT(*) GROUP BY word, doc -> letter-partitioned index)
at several corpus multiples, materialized as MANY parquet files so the
scan parallelizes the way a real multi-file 100 TB table does (the sf*
fixtures are single-row-group files, which serialize the scan and
measure scheduler floor, not throughput).

Usage:
    python tools/scale_bench.py [sf_dir] [multiples...]
Defaults: /root/testdata/sf0.1, multiples 1 8 64.

Prints one JSON line per multiple: corpus MB, wall seconds (median of 3
warm runs), MB/s, and the speedup vs the reference baseline.
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

from map_reduce_indexing_spark.operators.indexing import build_postings  # noqa: E402
from map_reduce_indexing_spark.session import get_spark  # noqa: E402

REFERENCE_MBPS = 7.7  # BASELINE.md: measured single-threaded reference


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    multiples = [int(a) for a in sys.argv[2:]] or [1, 8, 64]
    spark = get_spark(app_name="mri-scale-bench")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base_bytes = docs.agg(F.sum(F.length("text"))).head()[0]

    workdir = tempfile.mkdtemp(prefix="mri_scale_")
    try:
        for m in multiples:
            staged = os.path.join(workdir, f"x{m}")
            # Replicate the corpus m times with distinct doc_ids, written
            # as ~4 files per core so the scan parallelizes.
            rep = docs.crossJoin(spark.range(m).select(F.col("id").alias("rep")))
            rep = rep.select(
                (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"), "text"
            )
            n_files = max(32, min(256, 4 * (os.cpu_count() or 8)))
            rep.repartition(n_files).write.mode("overwrite").parquet(staged)

            staged_docs = spark.read.parquet(staged)
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                build_postings(staged_docs).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - t0)
            sec = sorted(runs)[1]
            mb = base_bytes * m / 1e6
            print(
                json.dumps(
                    {
                        "multiple": m,
                        "corpus_mb": round(mb, 2),
                        "sec": round(sec, 3),
                        "mb_per_sec": round(mb / sec, 2),
                        "vs_reference_7.7MBps": round(mb / sec / REFERENCE_MBPS, 2),
                        "runs": [round(r, 3) for r in runs],
                    }
                ),
                flush=True,
            )
            shutil.rmtree(staged, ignore_errors=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
