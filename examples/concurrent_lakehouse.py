"""Round 11 end to end: the store tier under object-store rules.

What a 100 TB deployment actually has is S3-shaped storage (no flock,
no hardlinks, no atomic rename) and more than one writer. This
walkthrough runs the whole lifecycle under those rules:

1. CAS BACKEND — switch the commit protocol to commitio.CASStoreIO:
   put-if-absent leases, conditional manifest puts, journaled
   roll-forward swaps, physical copies;
2. CONCURRENT APPENDS — three writer threads land disjoint batches on
   ONE store lock-free via append_rows (losers of the manifest CAS
   retry on the new head); nothing lost, nothing doubled;
3. EXACTLY-ONCE STREAMING INGEST — run_gated_ingest with a checkpoint:
   every microbatch is gated through declared expectations and its
   batch id rides the same atomic publish, so a crash-replay is a
   recorded no-op;
4. AUTO-COMPACTION — a small-file policy recorded in the manifest
   fires optimize_store at publish time, keeping the per-microbatch
   store read-efficient while a tagged pin stays byte-stable;
5. REWRITE vs APPEND — a predicate DELETE (exclusive lease) runs after
   the appends; pinned snapshots and the change feed stay exact.

    python examples/concurrent_lakehouse.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_indexing_spark.session import get_spark  # noqa: E402
from map_reduce_indexing_spark.sources.commitio import (  # noqa: E402
    CASStoreIO,
    using_backend,
)
from map_reduce_indexing_spark.sources.expectations import (  # noqa: E402
    read_quarantine,
)
from map_reduce_indexing_spark.sources.generations import (  # noqa: E402
    append_rows,
    delete_rows,
    describe_generations,
    generation_row_count,
    load_manifest,
    read_generation,
    tag_generation,
)
from map_reduce_indexing_spark.streaming.events import (  # noqa: E402
    run_gated_ingest,
)


def main() -> None:
    spark = get_spark(
        app_name="concurrent-lakehouse",
        master="local[4]",
        shuffle_partitions=4,
    )
    work = tempfile.mkdtemp(prefix="mri_conc_example_")
    store = os.path.join(work, "facts")
    ingest = os.path.join(work, "ingest")

    with using_backend(CASStoreIO()):
        # -- 2. three concurrent writers, one store, no lock ---------
        def batch(tag: str, lo: int):
            return spark.createDataFrame(
                [(lo + i, tag, (lo + i) % 100) for i in range(2000)],
                "id long, src string, v long",
            ).repartition(2)

        barrier = threading.Barrier(3)

        def writer(tag: str, lo: int) -> None:
            df = batch(tag, lo)
            barrier.wait()
            gen = append_rows(spark, store, df)
            print(f"  writer {tag}: published generation {gen}")

        threads = [
            threading.Thread(target=writer, args=(t, lo))
            for t, lo in (("a", 0), ("b", 10_000), ("c", 20_000))
        ]
        print("== concurrent appends (CAS backend, shared lease) ==")
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        n = generation_row_count(store)  # manifest-exact, no scan
        print(f"  rows after the race: {n} (expected 6000)")
        assert n == 6000
        tag_generation(store, "after-race")

        # -- 3 + 4. exactly-once gated ingest with auto-compaction ---
        print("== gated streaming ingest + publish-time compaction ==")
        feed = spark.createDataFrame(
            [(i, "feed", i % 250) for i in range(3000)],
            "id long, src string, v long",
        )
        src = os.path.join(work, "feed_src")
        feed.repartitionByRange(12, "id").write.parquet(src)
        reports = run_gated_ingest(
            spark,
            src,
            ingest,
            {"v_cap": [("v", "<=", 200)]},
            checkpoint=os.path.join(work, "ckpt"),
            schema=feed.schema,
            compact_policy={"max_files": 5, "n_files": 2},
        )
        fired = sum(1 for r in reports if "compacted_to" in r)
        m = load_manifest(ingest)
        files = len(m["gens"][str(m["head"])]["files"])
        print(
            f"  {len(reports)} microbatches, policy fired {fired}x, "
            f"head files: {files}"
        )
        admitted = read_generation(spark, ingest).count()
        rejected = read_quarantine(spark, ingest).count()
        print(f"  admitted {admitted}, quarantined {rejected}")
        assert admitted + rejected == 3000

        # -- 5. a rewrite (exclusive lease) after the appends --------
        print("== predicate DELETE under the exclusive lease ==")
        rep = delete_rows(spark, store, [("src", "=", "b")])
        print(
            f"  deleted {rep['deleted_rows']} rows, rewrote "
            f"{rep['rewritten_files']} files, kept {rep['kept_files']}"
        )
        pinned = generation_row_count(store, at="after-race")
        live = generation_row_count(store)
        print(f"  pinned snapshot still serves {pinned}; live is {live}")
        assert pinned == 6000 and live == 4000

        describe_generations(spark, store).show(truncate=False)

        # -- 6. vacuum: GC by manifest reachability ------------------
        from map_reduce_indexing_spark.sources.generations import (
            vacuum_store,
        )

        # plant crash residue: a placed-but-never-published file
        orphan = os.path.join(store, "orphan-crashed-writer.parquet")
        with open(orphan, "wb") as fh:
            fh.write(b"\x00" * 64)
        os.utime(orphan, (0, 0))  # aged past any grace window
        rep = vacuum_store(store, grace_seconds=60)
        print(
            "== vacuum ==\n  reclaimed:",
            {k: v for k, v in rep.items() if v},
        )
        assert not os.path.exists(orphan)
        assert generation_row_count(store, at="after-race") == 6000
    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
