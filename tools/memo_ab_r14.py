"""r14: same-session A/B of the read_generation resolved-plan memo.

For each store-tier headliner: warmup once (memo OFF), then alternate
3 timed noop-sink runs with the memo disabled (_READ_GEN_MEMO_MAX=0 —
every entry is evicted on insert, so every call re-resolves) and 3
with it enabled, interleaved A B A B ... so box drift hits both arms
equally. Prints per-query medians for both arms.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import map_reduce_indexing_spark.sources.generations as G  # noqa: E402
from map_reduce_indexing_spark.plans import registry  # noqa: E402
from map_reduce_indexing_spark.session import get_spark  # noqa: E402

class _NullMemo:
    """Stands in for _READ_GEN_MEMO in the OFF arm: every lookup
    misses, every insert is dropped — read_generation resolves fresh
    on each call, exactly the pre-memo behavior."""

    def get(self, key):
        return None

    def move_to_end(self, key):
        pass

    def __setitem__(self, key, value):
        pass

    def __len__(self):
        return 0

    def clear(self):
        pass


QUERIES = [
    "rel_store_sql_travel",
    "rel_delete_dv",
    "rel_partition_evolution",
    "rel_schema_evolution",
    "rel_schema_rename",
    "rel_metadata_count",
    "rel_snapshot_pruned_scan",
    "rel_upsert_dv",
    "rel_optimize_zorder",
    "rel_store_maintenance",
    "rel_generation_changes",
    "stream_store_cdf",
]

N = 3


def run(spark, name, sf_dir):
    t0 = time.perf_counter()
    registry.get(name).fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="memo-ab-r14")
    real_memo = G._READ_GEN_MEMO
    null_memo = _NullMemo()
    for name in QUERIES:
        # warmup with the memo OFF so it does not pre-fill the cache
        G._READ_GEN_MEMO = null_memo
        spark.sparkContext.setJobDescription(f"memo-ab warmup {name}")
        run(spark, name, sf_dir)
        # pre-fill the real memo once so every ON sample is a hit
        # (steady-state session shape: bench warmup does the same)
        G._READ_GEN_MEMO = real_memo
        run(spark, name, sf_dir)
        off, on = [], []
        for _ in range(N):
            G._READ_GEN_MEMO = null_memo
            spark.sparkContext.setJobDescription(f"memo-ab OFF {name}")
            off.append(run(spark, name, sf_dir))
            G._READ_GEN_MEMO = real_memo
            spark.sparkContext.setJobDescription(f"memo-ab ON {name}")
            on.append(run(spark, name, sf_dir))
        med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
        print(
            f"{name:28s} off={med(off):6.3f} (min {min(off):.3f}) "
            f"on={med(on):6.3f} (min {min(on):.3f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
