"""Concurrent-append scaling: do optimistic writers compose?

The claim that makes append_rows worth shipping
(sources/generations.py + commitio.CASStoreIO) is that N independent
writers landing on ONE store pay ~max(writer walls), not
sum(writer walls) — the lock's scope shrank from "every mutation" to
"rewrites only", and the append critical section is one conditional
manifest put. This tool measures that shape on the sf0.1 orders
table:

- serial(N)     = N batches appended one after another through the
                  POSIX locked path (what flock-serialized writers pay);
- concurrent(N) = the same N batches raced from N threads under the
                  CAS backend (shared lease + manifest CAS + retry).

Also records the auto-compaction payoff: head-read wall on the
store left at one-file-per-batch vs after maybe_autocompact folded it
under the policy.

Usage: python tools/concurrency_scale.py [sf_dir] [writer counts...]
Defaults: /root/testdata/sf0.1, counts 2 4 8.
Prints one JSON line per count.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_indexing_spark.session import get_spark  # noqa: E402
from map_reduce_indexing_spark.sources.commitio import (  # noqa: E402
    CASStoreIO,
    using_backend,
)
from map_reduce_indexing_spark.sources.generations import (  # noqa: E402
    append_rows,
    generation_row_count,
    maybe_autocompact,
    read_generation,
    set_compaction_policy,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    counts = [int(a) for a in sys.argv[2:]] or [2, 4, 8]
    spark = get_spark(
        app_name="concurrency-scale",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price_dec"),
    )
    orders = orders.persist()
    total = orders.count()
    work = tempfile.mkdtemp(prefix="mri_conc_scale_")
    try:
        for n in counts:
            batches = [
                orders.filter(F.col("o_orderkey") % n == s).repartition(2)
                for s in range(n)
            ]
            # serial, POSIX locked path
            sp = os.path.join(work, f"serial_{n}")
            t0 = time.perf_counter()
            for b in batches:
                append_rows(spark, sp, b)
            serial = time.perf_counter() - t0
            assert generation_row_count(sp) == total

            # concurrent, CAS backend
            cp = os.path.join(work, f"conc_{n}")
            errors: list[Exception] = []
            barrier = threading.Barrier(n)

            def writer(b):
                try:
                    barrier.wait()
                    append_rows(spark, cp, b)
                except Exception as e:  # surfaced below
                    errors.append(e)

            with using_backend(CASStoreIO()):
                threads = [
                    threading.Thread(target=writer, args=(b,))
                    for b in batches
                ]
                t0 = time.perf_counter()
                for t in threads:
                    t.start()
                for t in threads:
                    t.join()
                conc = time.perf_counter() - t0
                assert not errors, errors
                assert generation_row_count(cp) == total

                # auto-compaction payoff on the many-file store
                t0 = time.perf_counter()
                read_generation(spark, cp).agg(
                    F.count(F.lit(1))
                ).collect()
                read_small = time.perf_counter() - t0
                set_compaction_policy(cp, max_files=3, n_files=4)
                t0 = time.perf_counter()
                maybe_autocompact(spark, cp)
                compact_wall = time.perf_counter() - t0
                t0 = time.perf_counter()
                read_generation(spark, cp).agg(
                    F.count(F.lit(1))
                ).collect()
                read_folded = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "writers": n,
                        "rows": total,
                        "serial_sec": round(serial, 3),
                        "concurrent_sec": round(conc, 3),
                        "speedup": round(serial / conc, 2) if conc else None,
                        "read_prefold_sec": round(read_small, 3),
                        "compact_sec": round(compact_wall, 3),
                        "read_folded_sec": round(read_folded, 3),
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
