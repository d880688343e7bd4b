"""Co-movement check: alternate the dedup_incremental_lsh_pairs query
with the round-12 band_join marker micro-job for several minutes,
print paired samples. If the query's slow mode is a host shuffle-tier
regime (the r11 hypothesis), the marker moves WITH it and
compare_bench's normalization pins future runs; if the query goes
slow while the marker stays flat, the regression is real and in the
query."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_indexing_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(os.environ.get("COMOVE_ROUNDS", "24"))


def main() -> None:
    spark = get_spark(app_name="mri-triage-comove")
    from map_reduce_indexing_spark.operators.dedup import (
        q_dedup_incremental_lsh_pairs,
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def band_join_job():
        a = spark.range(0, 400_000, 1, 32).selectExpr(
            "id % 16 AS band_idx", "id % 9973 AS band_hash", "id AS doc"
        )
        b = spark.range(0, 100_000, 1, 32).selectExpr(
            "id % 16 AS band_idx", "id % 9973 AS band_hash",
            "id + 1000000 AS doc",
        )
        noop(
            a.join(b.hint("merge"), ["band_idx", "band_hash"]).selectExpr(
                "count(*) AS n"
            )
        )

    noop(q_dedup_incremental_lsh_pairs(spark, SF_DIR))
    band_join_job()
    pairs = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        noop(q_dedup_incremental_lsh_pairs(spark, SF_DIR))
        tq = time.perf_counter() - t0
        t0 = time.perf_counter()
        band_join_job()
        tm = time.perf_counter() - t0
        pairs.append((round(tq, 3), round(tm, 3)))
    qs = sorted(p[0] for p in pairs)
    ms = sorted(p[1] for p in pairs)
    print(
        json.dumps(
            {
                "pairs": pairs,
                "query_median": qs[len(qs) // 2],
                "marker_median": ms[len(ms) // 2],
                "query_minmax": [qs[0], qs[-1]],
                "marker_minmax": [ms[0], ms[-1]],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
