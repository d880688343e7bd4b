"""Store-to-store pipeline scaling: run cost vs source size.

The claim that makes run_incremental_pipeline worth running
(sources/pipeline.py) is that a pipeline run costs the SOURCE DELTA,
not the source: at 100 TB with nightly appends, each stage reads one
night. This tool measures that shape — a generations-managed source
store grown to several multiples of the sf0.1 orders table, then:

- full  = transform + write the ENTIRE source into a fresh
          destination (what a non-incremental ETL job pays per run);
- delta = append a FIXED-SIZE batch to the source, publish, and
          run_incremental_pipeline (which consumes only the appended
          files and records the exactly-once bookmark);
- gate  = the same fixed batch admitted through
          append_with_expectations (two predicates, quarantine mode)
          versus a plain append+publish — the admission gate's
          overhead is ONE map-side-combined aggregate over the batch
          and must stay batch-sized, independent of store size.

Usage: python tools/pipeline_scale.py [sf_dir] [multiples...]
Defaults: /root/testdata/sf0.1, multiples 1 4 16.
Prints one JSON line per multiple.
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
from map_reduce_indexing_spark.sources.expectations import (  # noqa: E402
    append_with_expectations,
)
from map_reduce_indexing_spark.sources.generations import (  # noqa: E402
    publish_generation,
)
from map_reduce_indexing_spark.sources.pipeline import (  # noqa: E402
    run_incremental_pipeline,
)


def transform(df):
    return df.select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("price_dec") * 2).alias("px2"),
        F.year("o_orderdate").alias("yr"),
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    multiples = [int(a) for a in sys.argv[2:]] or [1, 4, 16]
    spark = get_spark(app_name="pipeline-scale")
    orders = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_orderdate",
            F.col("o_totalprice").cast("decimal(18,2)").alias("price_dec"),
        )
    )
    n_orders = orders.count()
    # the fixed nightly batch: ~1% of one replica
    batch = orders.filter(F.col("o_orderkey") % 100 == 7).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10_000_000_000
    )
    n_batch = batch.count()

    work = tempfile.mkdtemp(prefix="mri_pipescale_")
    try:
        for mult in multiples:
            src = os.path.join(work, f"src_{mult}")
            reps = [
                orders.withColumn(
                    "o_orderkey",
                    F.col("o_orderkey") + F.lit(i * n_orders * 10),
                )
                for i in range(mult)
            ]
            base = reps[0]
            for r in reps[1:]:
                base = base.unionByName(r)
            base.repartition(max(4, 2 * mult)).write.parquet(src)
            publish_generation(src)

            # full: transform + write the whole source
            t0 = time.monotonic()
            dst_full = os.path.join(work, f"full_{mult}")
            run_incremental_pipeline(spark, src, dst_full, transform)
            full_s = time.monotonic() - t0

            # delta: fixed batch appended, pipeline consumes it only
            batch.coalesce(1).write.mode("append").parquet(src)
            publish_generation(src)
            t0 = time.monotonic()
            rep = run_incremental_pipeline(spark, src, dst_full, transform)
            delta_s = time.monotonic() - t0
            assert rep["mode"] == "append", rep

            # gate overhead on the same fixed batch (fresh stores)
            g1 = os.path.join(work, f"plain_{mult}")
            t0 = time.monotonic()
            batch.coalesce(1).write.parquet(g1)
            publish_generation(g1)
            plain_s = time.monotonic() - t0
            g2 = os.path.join(work, f"gated_{mult}")
            t0 = time.monotonic()
            out = append_with_expectations(
                spark,
                g2,
                batch,
                {
                    "price_cap": [("price_dec", "<=", 300000)],
                    "key_pos": [("o_orderkey", ">", 0)],
                },
                mode="quarantine",
            )
            gated_s = time.monotonic() - t0

            print(
                json.dumps(
                    {
                        "multiple": mult,
                        "src_rows": n_orders * mult,
                        "batch_rows": n_batch,
                        "full_s": round(full_s, 3),
                        "delta_s": round(delta_s, 3),
                        "speedup": round(full_s / max(delta_s, 1e-9), 1),
                        "plain_append_s": round(plain_s, 3),
                        "gated_append_s": round(gated_s, 3),
                        "gate_quarantined": out["rows_quarantined"],
                    }
                ),
                flush=True,
            )
            for d in (src, dst_full, g1, g2):
                shutil.rmtree(d, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
